"""Data-layout operators (operators/layout.py): DuckDB-oracle compares for
the z-order arithmetic and skew diagnostics, a row-group pruning proof for
zorder_write, and a compaction round-trip."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.layout import (
    compact_files,
    file_stats_manifest,
    prune_files,
    pruned_read,
    skew_stats,
    write_manifest,
    z_value,
    zorder_write,
)


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def _assert_green(res):
    assert res["rows_match"], res
    assert res["cols_match"], res
    assert res["values_match"], res


def _interleave_sql(s1: str, s2: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({s1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({s2} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def test_zorder_layout_oracle(spark, con):
    scale = """
    LEAST(CAST(FLOOR((({v}::DOUBLE - {lo}) / (CASE WHEN {hi} > {lo}
      THEN {hi} - {lo} ELSE 1.0 END)) * 256.0) AS BIGINT), 255)
    """
    s1 = scale.format(v="o_custkey", lo="mn1", hi="mx1")
    s2 = scale.format(v="o_totalprice", lo="mn2", hi="mx2")
    sql = f"""
    WITH stats AS (
      SELECT MIN(o_custkey::DOUBLE) AS mn1, MAX(o_custkey::DOUBLE) AS mx1,
             MIN(o_totalprice::DOUBLE) AS mn2, MAX(o_totalprice::DOUBLE) AS mx2
      FROM orders
    ),
    z AS (
      SELECT {_interleave_sql(f'({s1})', f'({s2})', 8)} AS _z
      FROM orders, stats
    )
    SELECT _z >> 8 AS z_bucket,
           COUNT(*) AS n_rows, SUM(_z) AS z_sum
    FROM z GROUP BY z_bucket ORDER BY z_bucket
    """
    _assert_green(compare(R.QUERIES["zorder_layout"](spark, SF_DIR), con, sql))


def test_skew_topkeys_oracle(spark, con):
    sql = """
    WITH c AS (SELECT o_custkey, COUNT(*) AS key_rows FROM orders GROUP BY 1),
    t AS (SELECT SUM(key_rows) AS total, COUNT(*) AS n_keys FROM c),
    top AS (
      SELECT o_custkey, key_rows,
             ROW_NUMBER() OVER (ORDER BY key_rows DESC, o_custkey) AS rank
      FROM c ORDER BY key_rows DESC, o_custkey LIMIT 10
    )
    SELECT CAST(rank AS INTEGER) AS rank, o_custkey, key_rows,
           ROUND(key_rows / total, 6) AS share,
           ROUND(key_rows * n_keys / total, 3) AS vs_uniform
    FROM top, t ORDER BY rank
    """
    _assert_green(compare(R.QUERIES["skew_topkeys"](spark, SF_DIR), con, sql))


def _intersecting_row_groups(path, column, lo, hi) -> tuple[int, int]:
    """(row groups whose [min,max] intersects [lo,hi], total row groups)
    across every parquet part file under path."""
    from pathlib import Path

    hit = total = 0
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, total


def test_zorder_write_prunes_row_groups(spark, tmp_path):
    """The point of z-order: after clustering on (o_custkey, o_totalprice),
    a selective predicate on EITHER column intersects fewer row groups than
    the natural (orderkey-sorted) layout."""
    o = load_table(spark, SF_DIR, "orders")
    natural = str(tmp_path / "natural")
    zordered = str(tmp_path / "zorder")
    o.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(natural)
    zorder_write(o, zordered, ["o_custkey", "o_totalprice"], bits=16, n_files=8)

    back = spark.read.parquet(zordered)
    assert back.count() == o.count()
    assert sorted(back.columns) == sorted(o.columns)  # _z dropped

    lo, hi = o.agg(
        F.min("o_totalprice"), F.expr("percentile(o_totalprice, 0.1)")
    ).first()
    for col, a, b in [
        ("o_totalprice", lo, hi),
        ("o_custkey", 0, 30),
    ]:
        z_hit, z_total = _intersecting_row_groups(zordered, col, a, b)
        n_hit, n_total = _intersecting_row_groups(natural, col, a, b)
        assert z_total >= 8 and n_total >= 8
        assert z_hit < n_hit, (col, z_hit, n_hit)


def test_compact_files(spark, tmp_path):
    """Many tiny files in, few right-sized files out, same rows."""
    path = str(tmp_path / "frag")
    o = load_table(spark, SF_DIR, "orders")
    o.repartition(64).write.parquet(path)
    from pathlib import Path

    assert len(list(Path(path).glob("*.parquet"))) == 64
    n = compact_files(spark, path, target_file_bytes=256 * 1024)
    files = list(Path(path).glob("*.parquet"))
    assert len(files) == n < 64
    assert spark.read.parquet(path).count() == o.count()


def test_compact_preserves_manifest(spark, tmp_path):
    """Compaction rewrites every file — a persisted manifest must come
    back covering the NEW files (same columns), and pruned reads stay
    correct across the rewrite."""
    from vector_search_databricks_poc_spark.operators.layout import (
        list_data_files,
    )

    path = str(tmp_path / "cm")
    o = load_table(spark, SF_DIR, "orders")
    o.repartition(16).write.parquet(path)
    assert write_manifest(spark, path, ["o_custkey"]) == 16
    compact_files(spark, path, target_file_bytes=256 * 1024)

    live = {f for f, _ in list_data_files(spark, path)}
    m = spark.read.parquet(f"{path}/_stats_manifest")
    assert {r.file for r in m.select("file").distinct().collect()} == live
    assert {r.column for r in m.select("column").distinct().collect()} == {
        "o_custkey"
    }
    got = pruned_read(spark, path, {"o_custkey": (100, None)})
    want = spark.read.parquet(path).where(F.col("o_custkey") >= 100)
    assert got.count() == want.count() > 0


def test_skew_stats_salting_signal(spark):
    """A deliberately skewed frame reports the hot key first with
    vs_uniform >> 1."""
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    top = skew_stats(df, ["k"], top_n=3).collect()
    assert top[0].k == 7 and top[0].key_rows == 900
    assert top[0].vs_uniform > 50
    assert [r.rank for r in top] == [1, 2, 3]


def test_z_value_locality(spark):
    """Nearby (x, y) points share z prefixes: the max z-gap inside a small
    tile is far below the global z range (the property that makes row-group
    stats tight)."""
    import itertools

    rows = [(x, y) for x, y in itertools.product(range(16), range(16))]
    df = spark.createDataFrame(rows, ["x", "y"])
    z = z_value(df, ["x", "y"], bits=4).collect()
    by_xy = {(r.x, r.y): r._z for r in z}
    assert len(set(by_xy.values())) == 256  # bijective on the 16x16 grid
    # a 2x2 tile spans a z-range of at most 5 (Morton locality), vs 255 global
    for x, y in itertools.product(range(0, 16, 2), range(0, 16, 2)):
        tile = [by_xy[(x + dx, y + dy)] for dx in (0, 1) for dy in (0, 1)]
        assert max(tile) - min(tile) <= 5


# --------------------------- file-level skipping ---------------------------


def _basename(p: str) -> str:
    return p.rstrip("/").rsplit("/", 1)[-1]


def test_manifest_stats_match_spark_reader(spark, tmp_path):
    """The footer sweep agrees per file with what Spark's own reader sees
    (an independent path to the same numbers: groupBy input_file_name)."""
    path = str(tmp_path / "orders6")
    o = load_table(spark, SF_DIR, "orders")
    # Spark's default INT96 timestamps carry NO parquet stats; a layout
    # meant for skipping must write TIMESTAMP_MICROS (see layout.py notes)
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        o.repartitionByRange(6, "o_orderkey").write.parquet(path)
    finally:
        spark.conf.set(key, prev)

    m = {
        (r.file, r.column): r
        for r in file_stats_manifest(
            spark, path, ["o_orderkey", "o_totalprice", "o_orderdate"]
        ).collect()
    }
    assert len({f for f, _ in m}) == 6 and len(m) == 18

    via_spark = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("k_lo"),
            F.max("o_orderkey").alias("k_hi"),
            F.min("o_totalprice").alias("p_lo"),
            F.max("o_totalprice").alias("p_hi"),
            F.min(F.unix_micros("o_orderdate")).alias("d_lo"),
            F.max(F.unix_micros("o_orderdate")).alias("d_hi"),
        )
        .collect()
    )
    by_name = {_basename(f): (f, c) for f, c in m}
    for row in via_spark:
        key = _basename(row.file)
        rk = m[(by_name[key][0], "o_orderkey")]
        rp = m[(by_name[key][0], "o_totalprice")]
        rd = m[(by_name[key][0], "o_orderdate")]
        for r in (rk, rp, rd):
            assert r.has_stats and r.n_rows == row.n and r.null_count == 0
        assert (rk.min_num, rk.max_num) == (float(row.k_lo), float(row.k_hi))
        assert (rp.min_num, rp.max_num) == (row.p_lo, row.p_hi)
        # timestamps land as epoch micros (the cross-engine convention here)
        assert (rd.min_num, rd.max_num) == (float(row.d_lo), float(row.d_hi))


def test_pruned_read_equals_filtered_scan(spark, tmp_path):
    """Correctness: pruned_read == full scan + filter, while actually
    skipping files on the z-ordered layout; the re-applied range filter is
    pushed into the surviving scans."""
    path = str(tmp_path / "zo")
    o = load_table(spark, SF_DIR, "orders")
    zorder_write(o, path, ["o_custkey", "o_totalprice"], bits=16, n_files=8)

    lo, hi = 10, 40
    box = {"o_custkey": (lo, hi), "o_totalprice": (None, 50_000.0)}
    manifest = file_stats_manifest(spark, path, list(box))
    keep, dropped = prune_files(manifest.collect(), box)
    assert keep and dropped, (len(keep), len(dropped))  # real skipping

    got = pruned_read(spark, path, box, manifest=manifest)
    want = (
        spark.read.parquet(path)
        .where(F.col("o_custkey").between(lo, hi))
        .where(F.col("o_totalprice") <= 50_000.0)
    )
    key = lambda r: (r["o_orderkey"])  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)
    from vector_search_databricks_poc_spark.plans import audit as A

    assert A.has_pushed_filters(got)  # the re-applied range reaches the scan


def test_pruned_read_empty_box_zero_rows_same_schema(spark, tmp_path):
    path = str(tmp_path / "zo2")
    o = load_table(spark, SF_DIR, "orders").limit(1000)
    zorder_write(o, path, ["o_custkey", "o_totalprice"], bits=8, n_files=4)
    got = pruned_read(spark, path, {"o_custkey": (10**9, None)})
    assert got.count() == 0
    assert got.schema == spark.read.parquet(path).schema


def test_persisted_manifest_sound_under_append(spark, tmp_path):
    """A stale persisted manifest must never hide data: files appended
    after write_manifest are always read."""
    path = str(tmp_path / "grow")
    o = load_table(spark, SF_DIR, "orders")
    o.where(F.col("o_custkey") < 100).repartition(2).write.parquet(path)
    assert write_manifest(spark, path) == 2

    # append rows the manifest has never seen, in the query range
    # (sf0.001 custkeys span 0..149)
    o.where(F.col("o_custkey") >= 140).coalesce(1).write.mode("append").parquet(path)
    got = pruned_read(spark, path, {"o_custkey": (140, None)})
    want = spark.read.parquet(path).where(F.col("o_custkey") >= 140)
    assert got.count() == want.count() > 0


def test_refresh_manifest_incremental(spark, tmp_path):
    """Refresh sweeps ONLY uncovered files (O(new), not O(directory)),
    no-ops when nothing changed, and drops rows for deleted files."""
    import os
    from pathlib import Path

    from vector_search_databricks_poc_spark.operators.layout import (
        list_data_files,
        refresh_manifest,
    )

    path = str(tmp_path / "ref")
    o = load_table(spark, SF_DIR, "orders")
    o.where(F.col("o_custkey") < 50).repartition(2).write.parquet(path)
    assert write_manifest(spark, path) == 2

    o.where(F.col("o_custkey") >= 140).coalesce(1).write.mode("append").parquet(path)
    assert refresh_manifest(spark, path) == (1, 3)  # only the new file swept
    assert refresh_manifest(spark, path) == (0, 3)  # up to date: no-op

    # delete one ORIGINAL (custkey < 50) file: refresh drops its rows
    victim = next(
        f
        for f in sorted(Path(path).glob("*.parquet"))
        if pq.read_metadata(f).row_group(0).column(1).statistics.max < 100
    )
    os.remove(victim)
    swept, covered = refresh_manifest(spark, path)
    assert (swept, covered) == (0, 2)
    live = {f for f, _ in list_data_files(spark, path)}
    m = spark.read.parquet(f"{path}/_stats_manifest")
    assert {r.file for r in m.select("file").distinct().collect()} == live

    got = pruned_read(spark, path, {"o_custkey": (140, None)})
    want = spark.read.parquet(path).where(F.col("o_custkey") >= 140)
    assert got.count() == want.count() > 0


def test_pruned_read_sound_with_stale_manifest_dead_files(spark, tmp_path):
    """WITHOUT a refresh, a manifest pointing at deleted files must not
    hand dead paths to spark.read — pruned_read reconciles against the
    live listing in both directions."""
    import os
    from pathlib import Path

    path = str(tmp_path / "stale")
    o = load_table(spark, SF_DIR, "orders")
    o.repartitionByRange(4, "o_custkey").write.parquet(path)
    write_manifest(spark, path, ["o_custkey"])
    # remove the highest-custkey file; manifest still lists it
    files = sorted(
        Path(path).glob("*.parquet"),
        key=lambda f: pq.read_metadata(f).row_group(0).column(1).statistics.max,
    )
    os.remove(files[-1])
    got = pruned_read(spark, path, {"o_custkey": (0, None)})
    want = spark.read.parquet(path).where(F.col("o_custkey") >= 0)
    assert got.count() == want.count() > 0
    # all-pruned fallback must also pick a LIVE file
    assert pruned_read(spark, path, {"o_custkey": (10**9, None)}).count() == 0


def test_streaming_sink_maintains_manifest(spark, tmp_path):
    """The streaming-landing composition: a foreachBatch sink appends
    parquet and calls refresh_manifest per batch — each refresh sweeps
    only that batch's new files, and afterwards pruned reads over the
    landed corpus are correct and fully covered."""
    from vector_search_databricks_poc_spark.operators.layout import (
        list_data_files,
        refresh_manifest,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.range(0, 500).select(
        "id", (F.col("id") * 2.0).alias("v")
    ).coalesce(1).write.parquet(src)

    calls = []

    def sink(batch, _bid):
        batch.coalesce(1).write.mode("append").parquet(out)
        calls.append(refresh_manifest(spark, out))

    def run_wave():
        q = (
            spark.readStream.schema("id long, v double")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_wave()
    spark.range(500, 800).select(
        "id", (F.col("id") * 2.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(src)
    run_wave()

    # wave 1: no manifest yet -> full sweep of the 1 landed file;
    # wave 2: only the new file swept, 2 covered
    assert calls == [(1, 1), (1, 2)]
    live = {f for f, _ in list_data_files(spark, out)}
    m = spark.read.parquet(f"{out}/_stats_manifest")
    assert {r.file for r in m.select("file").distinct().collect()} == live

    got = pruned_read(spark, out, {"v": (1000.0, 1200.0)})
    want = spark.read.parquet(out).where(F.col("v").between(1000.0, 1200.0))
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )
    assert want.count() > 0


def test_prune_all_null_and_missing_stats(spark, tmp_path):
    """An all-null constrained column proves a file empty under a range
    predicate; a column with no stats at all keeps the file."""
    path = str(tmp_path / "nulls")
    spark.createDataFrame([(1, None)], "id long, v double").coalesce(1).write.parquet(
        path
    )
    spark.createDataFrame([(2, 5.0)], "id long, v double").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    rows = file_stats_manifest(spark, path, ["v"]).collect()
    keep, dropped = prune_files(rows, {"v": (0.0, 10.0)})
    assert len(keep) == 1 and len(dropped) == 1
    assert pruned_read(spark, path, {"v": (0.0, 10.0)}).collect()[0].id == 2


def test_prune_type_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "mix")
    spark.createDataFrame([(1.5,)], "x double").write.parquet(path)
    rows = file_stats_manifest(spark, path, ["x"]).collect()
    with pytest.raises(ValueError, match="numeric"):
        prune_files(rows, {"x": ("a", "z")})
    with pytest.raises(ValueError, match="sortable"):
        prune_files(rows, {"x": ([1], None)})


def test_prunable_value_padding_is_outward():
    """Lossy conversions widen, never tighten: big-int and Decimal keys
    bracket the true value on the correct side."""
    from decimal import Decimal

    from vector_search_databricks_poc_spark.operators.layout import (
        _prunable_value,
    )

    big = (1 << 60) + 1  # rounds in double
    assert _prunable_value(big, -1)[0] <= big <= _prunable_value(big, +1)[0]
    d = Decimal("0.1")
    assert _prunable_value(d, -1)[0] < 0.1000000001
    assert _prunable_value(d, -1)[0] <= float(d) <= _prunable_value(d, +1)[0]
    assert _prunable_value(float("nan"), -1) == (None, None)
    assert _prunable_value(b"bytes", -1) == (None, None)


# --------------------------- per-file bloom index ---------------------------


def test_bloom_point_lookup_prunes_and_matches(spark, tmp_path):
    """Point lookups on an UNCLUSTERED high-cardinality column (the case
    min/max cannot prune): bloom skipping drops most files, results are
    identical to the full isin scan (no false negatives), and absent
    values return zero rows."""
    from vector_search_databricks_poc_spark.operators.layout import (
        bloom_prune_files,
        bloom_pruned_lookup,
        write_file_blooms,
    )

    path = str(tmp_path / "bl")
    o = load_table(spark, SF_DIR, "orders")
    o.repartition(8).write.parquet(path)  # hash layout: keys scattered
    assert write_file_blooms(spark, path, ["o_orderkey"], m_bits=1 << 14) == 8

    probe = [3, 700, 1204]
    keep, dropped = bloom_prune_files(spark, path, "o_orderkey", probe)
    assert dropped, (len(keep), len(dropped))  # actually skips files
    assert len(keep) <= len(probe) + 1  # ~1 file per key + rare FPs

    got = bloom_pruned_lookup(spark, path, "o_orderkey", probe)
    want = spark.read.parquet(path).where(F.col("o_orderkey").isin(probe))
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    ) == sorted(probe)

    # absent keys: most/all files pruned, zero rows, schema intact
    miss = bloom_pruned_lookup(spark, path, "o_orderkey", [10**7, 10**7 + 1])
    assert miss.count() == 0 and miss.columns == want.columns


def test_bloom_lookup_sound_without_index_and_under_append(spark, tmp_path):
    """No bloom dir / unindexed column → nothing prunable, plain scan
    semantics; files appended AFTER the build are always read."""
    from vector_search_databricks_poc_spark.operators.layout import (
        bloom_prune_files,
        bloom_pruned_lookup,
        write_file_blooms,
    )

    path = str(tmp_path / "bl2")
    o = load_table(spark, SF_DIR, "orders")
    o.where(F.col("o_orderkey") < 1000).repartition(4).write.parquet(path)

    # no index at all
    keep, dropped = bloom_prune_files(spark, path, "o_orderkey", [5])
    assert len(keep) == 4 and not dropped

    write_file_blooms(spark, path, ["o_orderkey"], m_bits=1 << 14)
    # column without a bloom row
    keep, dropped = bloom_prune_files(spark, path, "o_custkey", [5])
    assert len(keep) == 4 and not dropped

    # stale index: appended rows must still be found
    o.where(F.col("o_orderkey") >= 1400).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    got = bloom_pruned_lookup(spark, path, "o_orderkey", [1450])
    assert [r.o_orderkey for r in got.collect()] == [1450]


def test_refresh_file_blooms_incremental(spark, tmp_path):
    """Bloom-index maintenance mirrors refresh_manifest: only uncovered
    files get scanned, dead rows are dropped, and after a refresh the
    appended keys both prune and resolve."""
    import os
    from pathlib import Path

    from vector_search_databricks_poc_spark.operators.layout import (
        bloom_prune_files,
        bloom_pruned_lookup,
        list_data_files,
        refresh_file_blooms,
        write_file_blooms,
    )

    (tmp_path / "no_idx").mkdir()
    with pytest.raises(ValueError, match="no bloom index"):
        refresh_file_blooms(spark, str(tmp_path / "no_idx"))

    path = str(tmp_path / "blr")
    o = load_table(spark, SF_DIR, "orders")
    o.where(F.col("o_orderkey") < 1000).repartition(4).write.parquet(path)
    assert write_file_blooms(spark, path, ["o_orderkey"], m_bits=1 << 14) == 4

    o.where(F.col("o_orderkey") >= 1400).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    assert refresh_file_blooms(spark, path) == (1, 5)
    assert refresh_file_blooms(spark, path) == (0, 5)

    keep, dropped = bloom_prune_files(spark, path, "o_orderkey", [1450])
    assert len(keep) == 1 and len(dropped) == 4  # appended key now prunes
    assert [
        r.o_orderkey
        for r in bloom_pruned_lookup(spark, path, "o_orderkey", [1450]).collect()
    ] == [1450]

    victim = next(
        f
        for f in Path(path).glob("*.parquet")
        if pq.read_metadata(f).row_group(0).column(0).statistics.max < 1000
    )
    os.remove(victim)
    assert refresh_file_blooms(spark, path) == (0, 4)
    m = spark.read.parquet(f"{path}/_bloom_index")
    live = {f for f, _ in list_data_files(spark, path)}
    assert {r.file for r in m.select("file").distinct().collect()} == live


def test_bloom_probe_casts_to_indexed_dtype(spark, tmp_path):
    """xxhash64 is type-sensitive: an int-typed column probed with Python
    ints (long literals) must still hit — the probe casts to the recorded
    dtype, so a type mismatch can never cause a false negative."""
    from vector_search_databricks_poc_spark.operators.layout import (
        bloom_pruned_lookup,
        write_file_blooms,
    )

    path = str(tmp_path / "bl3")
    spark.range(0, 2000).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4).write.parquet(path)
    write_file_blooms(spark, path, ["k"], m_bits=1 << 14)
    got = bloom_pruned_lookup(spark, path, "k", [7, 1999])
    assert sorted(r.k for r in got.collect()) == [7, 1999]


def test_compact_scratch_paths_never_hit_fs_root():
    """r6 (r5 ADVICE): a bare relative path must stage its scratch dirs
    beside the target ('.'), not '/.compact_stage__<name>' at the fs root.
    Pure derivation test — Spark resolves relative paths against the JVM
    working directory, so an end-to-end relative write would land litter
    in the repo instead of the pytest tmp dir."""
    from vector_search_databricks_poc_spark.operators.layout import (
        _compact_scratch_paths,
    )

    assert _compact_scratch_paths("rel_table") == (
        "./.compact_stage__rel_table", "./.compact_old__rel_table"
    )
    assert _compact_scratch_paths("a/b/tbl/") == (
        "a/b/.compact_stage__tbl", "a/b/.compact_old__tbl"
    )
    assert _compact_scratch_paths("/abs/tbl") == (
        "/abs/.compact_stage__tbl", "/abs/.compact_old__tbl"
    )
    assert _compact_scratch_paths("/tbl") == (
        "/.compact_stage__tbl", "/.compact_old__tbl"
    )


def test_vacuum_scratch_removes_only_aged_litter(spark, tmp_path):
    """The vacuum deletes exactly the engine's own crash-litter names
    older than the age guard; live data, fresh litter, and unknown names
    survive untouched."""
    import os
    import time

    from vector_search_databricks_poc_spark.operators.layout import vacuum_scratch

    root = tmp_path / "store"
    table = root / "idx"
    spark.range(50).write.parquet(str(table))

    # aged litter of every class
    old = time.time() - 7 * 86400
    litter = [
        root / ".compact_stage__idx",
        root / ".compact_old__idx",
        root / "idx_rebuild_stage",
        root / "idx_rebuild_old",
        table / "_temporary",
    ]
    for d in litter:
        d.mkdir(parents=True)
        (d / "part-junk.parquet").write_bytes(b"x" * 128)
        os.utime(d / "part-junk.parquet", (old, old))
        os.utime(d, (old, old))
    tmpfile = root / "wet" / "part-00001.warc.wet.gz.tmp-42"
    tmpfile.parent.mkdir()
    tmpfile.write_bytes(b"y" * 64)
    os.utime(tmpfile, (old, old))
    # fresh litter (in-flight swap) and an unknown name: both protected
    fresh = root / ".compact_stage__other"
    fresh.mkdir()
    keepme = root / "notes_backup"
    keepme.mkdir()
    (keepme / "a.txt").write_text("keep")

    report = vacuum_scratch(spark, str(root), min_age_seconds=86400, dry_run=True)
    assert len(report["removed"]) == len(litter) + 1  # + the .tmp file
    assert all(os.path.exists(p) for p in report["removed"])  # dry run

    report2 = vacuum_scratch(spark, str(root), min_age_seconds=86400)
    assert report2["removed"] == report["removed"]
    assert report2["freed_bytes"] >= 128 * len(litter) + 64
    for p in report2["removed"]:
        assert not os.path.exists(p)
    # survivors: the data, the fresh stage dir, the unknown dir
    assert spark.read.parquet(str(table)).count() == 50
    assert fresh.exists() and keepme.exists() and (keepme / "a.txt").exists()

    # age guard zero: the fresh stage dir now goes too
    report3 = vacuum_scratch(spark, str(root), min_age_seconds=0)
    assert any(p.endswith(".compact_stage__other") for p in report3["removed"])


def test_vacuum_scratch_missing_root_raises(spark, tmp_path):
    import pytest as _pytest

    from vector_search_databricks_poc_spark.operators.layout import vacuum_scratch

    with _pytest.raises(ValueError, match="does not exist"):
        vacuum_scratch(spark, str(tmp_path / "nope"))


def test_vacuum_scratch_spares_temporary_with_fresh_attempts(spark, tmp_path):
    """A live Spark write refreshes mtimes only in _temporary's nested
    task-attempt subdirs — the top-level _temporary stays stale, so aging
    it by its own mtime would delete an in-flight job's files and fail it
    at commit (r6 ADVICE).  The vacuum must age the NEWEST entry in the
    subtree instead."""
    import os
    import time

    from vector_search_databricks_poc_spark.operators.layout import vacuum_scratch

    root = tmp_path / "store"
    table = root / "idx"
    spark.range(10).write.parquet(str(table))

    old = time.time() - 7 * 86400
    live = table / "_temporary"
    attempt = live / "0" / "_temporary" / "attempt_0001_m_000000_0"
    attempt.mkdir(parents=True)
    taskfile = attempt / "part-00000.parquet"
    taskfile.write_bytes(b"z" * 32)  # freshly written by a running task
    # stale everywhere EXCEPT the task file the running attempt just wrote
    for d in (live, live / "0", live / "0" / "_temporary", attempt):
        os.utime(d, (old, old))

    report = vacuum_scratch(spark, str(root), min_age_seconds=86400)
    assert not report["removed"], report["removed"]
    assert taskfile.exists()

    # once the whole subtree is aged, the crash litter does go
    os.utime(taskfile, (old, old))
    for d in (live, live / "0", live / "0" / "_temporary", attempt):
        os.utime(d, (old, old))
    report2 = vacuum_scratch(spark, str(root), min_age_seconds=86400)
    assert any(p.endswith("_temporary") for p in report2["removed"])
    assert not live.exists()
