"""Corpus-assembly operators (operators/packing.py): DuckDB-oracle compares
for sequence packing, domain mixture sampling, shard assignment, and coarse
semantic cluster dedup, plus a write_sharded round-trip.

These queries sit outside the driver's 50-slot oracle window, so the
engine-vs-oracle comparison that the driver would run lives here instead,
using the same canonicalization (tests/oracle_utils.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection
from vector_search_databricks_poc_spark import queries_registry as R
from vector_search_databricks_poc_spark.catalog import load_table
from vector_search_databricks_poc_spark.operators.packing import (
    cluster_dedup,
    domain_mixture_sample,
    pack_sequences,
    shard_assignment,
    write_sharded,
)

MIX = 2654435761
P31 = 2147483647


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def _assert_green(res):
    assert res["rows_match"], res
    assert res["cols_match"], res
    assert res["values_match"], res


def test_sequence_packing_oracle(spark, con):
    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             ((doc_id * {MIX}) % {P31}) % 8 AS pack_group,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT pack_group, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY pack_group ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start
      FROM toks
    )
    SELECT pack_group,
           COUNT(DISTINCT pack_group * 8796093022208 + CAST(FLOOR(start / 512) AS BIGINT)) AS n_packs,
           COUNT(*) AS n_docs,
           SUM(n_tokens) AS tokens
    FROM packed GROUP BY pack_group ORDER BY pack_group
    """
    _assert_green(compare(R.QUERIES["sequence_packing"](spark, SF_DIR), con, sql))


def test_pack_boundaries(spark):
    """Every doc's pack offset is inside the budget, packs are contiguous
    per group, and a doc's pack is derived from its token start offset."""
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tokens")
    )
    rows = pack_sequences(d, budget=512, n_groups=8).collect()
    assert rows
    # recompute the concat-and-cut layout per group in plain Python
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.pack_group, []).append(r)
    for g, members in by_group.items():
        start = 0
        for r in sorted(members, key=lambda r: r.doc_id):
            assert r.pack_id == g * (1 << 43) + start // 512
            assert r.pack_pos == start % 512
            assert 0 <= r.pack_pos < 512
            start += r.n_tokens


def test_domain_mixture_oracle(spark, con):
    sql = f"""
    WITH w(dom, wt) AS (VALUES
      ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
      ('src2', CAST(0.2 AS DOUBLE))),
    t AS (SELECT d.*, w.wt FROM documents d JOIN w ON d.source = w.dom),
    c AS (SELECT source, wt, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
    n AS (SELECT MIN(FLOOR(cnt / wt)) AS nn FROM c),
    r AS (SELECT t.*, ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY ((doc_id * {MIX}) % {P31}) % {P31}, doc_id) AS rn
          FROM t)
    SELECT source, COUNT(*) AS n_docs, SUM(doc_id) AS id_sum
    FROM r, n WHERE rn <= FLOOR(wt * nn)
    GROUP BY source ORDER BY source
    """
    _assert_green(compare(R.QUERIES["domain_mixture"](spark, SF_DIR), con, sql))


def test_domain_mixture_proportions(spark):
    """Kept counts realize the largest feasible mixture: 20 domains x 25
    docs at sf0.001, weights .5/.3/.2 -> N = min(25/.5, 25/.3, 25/.2) = 50
    -> keep 25/15/10."""
    d = load_table(spark, SF_DIR, "documents")
    out = domain_mixture_sample(d, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {"src0": 25, "src1": 15, "src2": 10}


def test_shard_stats_oracle(spark, con):
    sql = f"""
    SELECT ((doc_id * {MIX}) % {P31}) % 16 AS shard,
           COUNT(*) AS n_docs, SUM(n_chars) AS chars
    FROM documents GROUP BY shard ORDER BY shard
    """
    _assert_green(compare(R.QUERIES["shard_stats"](spark, SF_DIR), con, sql))


def test_write_sharded_roundtrip(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "shards")
    write_sharded(d, path, n_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == d.count()
    assert back.select("shard").distinct().count() == 8
    # same deterministic assignment on re-read
    expect = shard_assignment(d, n_shards=8).select("doc_id", "shard")
    assert back.select("doc_id", "shard").exceptAll(expect).count() == 0


def test_cluster_dedup_oracle(spark, con):
    sql = f"""
    WITH seeds AS (
      SELECT vec_id AS sid, embedding AS sv
      FROM embeddings
      ORDER BY ((vec_id * {MIX}) % {P31}) % {P31}, vec_id LIMIT 8
    ),
    dots AS (
      SELECT e.vec_id AS id, s.sid,
             ROUND(SUM(e.embedding[i]::DOUBLE * s.sv[i]::DOUBLE)
                   / (sqrt(SUM(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
                      * sqrt(SUM(s.sv[i]::DOUBLE * s.sv[i]::DOUBLE))), 6) AS sim
      FROM embeddings e, seeds s, range(1, 65) t(i)
      GROUP BY e.vec_id, s.sid
    ),
    assigned AS (
      SELECT id, sid, sim,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY sim DESC, sid) AS rk
      FROM dots
    ),
    a AS (SELECT id, sid, sim FROM assigned WHERE rk = 1),
    rep AS (
      SELECT id, sid,
             ROW_NUMBER() OVER (PARTITION BY sid ORDER BY sim DESC, id) AS rr
      FROM a
    )
    SELECT sid AS cluster, COUNT(*) AS n_members,
           MIN(CASE WHEN rr = 1 THEN id END) AS keeper_id
    FROM rep GROUP BY sid ORDER BY cluster
    """
    _assert_green(compare(R.QUERIES["semantic_cluster_dedup"](spark, SF_DIR), con, sql))


def test_cluster_dedup_contract(spark):
    """Every vector lands in exactly one cluster; exactly one keeper per
    cluster; the keeper has its cluster's max sim (ties to smaller id)."""
    e = load_table(spark, SF_DIR, "embeddings")
    out = cluster_dedup(e, k=4).cache()
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert out.count() == n
    per = (
        out.groupBy("cluster")
        .agg(
            F.sum(F.col("is_keeper").cast("int")).alias("keepers"),
            F.max("sim").alias("best"),
            F.min(F.when(F.col("is_keeper"), F.col("sim"))).alias("keeper_sim"),
        )
        .collect()
    )
    assert per and all(r.keepers == 1 and r.keeper_sim == r.best for r in per)
    out.unpersist()


def test_assemble_training_corpus_stages(spark):
    """Stage-by-stage contract of the assembly tail: PII gone, only mixture
    domains survive at the right proportions, every pack fits the budget,
    shards are in range and deterministic."""
    from vector_search_databricks_poc_spark.pipelines import (
        assemble_training_corpus,
    )

    d = load_table(spark, SF_DIR, "documents")
    # plant deterministic PII so redaction is observable
    d = d.withColumn(
        "text", F.concat(F.col("text"), F.lit(" mail me at a@b.com"))
    )
    out = assemble_training_corpus(
        d,
        domain_col="source",
        mixture={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        pack_budget=256,
        pack_groups=4,
        n_shards=8,
    ).cache()
    rows = out.collect()
    assert rows
    assert all("a@b.com" not in r.text and "<EMAIL>" in r.text for r in rows)
    per_domain = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per_domain) == {"src0", "src1", "src2"}
    assert per_domain["src0"] == 25 and per_domain["src1"] == 15 and per_domain["src2"] == 10
    assert all(0 <= r.pack_pos < 256 for r in rows)
    assert all(0 <= r.shard < 8 for r in rows)
    # determinism: a second build assigns identical packs and shards
    again = assemble_training_corpus(
        d,
        domain_col="source",
        mixture={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        pack_budget=256,
        pack_groups=4,
        n_shards=8,
    )
    assert out.select("doc_id", "pack_id", "shard").exceptAll(
        again.select("doc_id", "pack_id", "shard")
    ).count() == 0
    out.unpersist()


def test_assemble_training_corpus_token_mixture(spark):
    """mixture_unit='tokens' routes through token_budget_mixture_sample:
    per-domain kept TOKEN mass sits at or under floor(w_d * B) for the
    feasible budget B computed on post-pipeline token counts, and the
    kept doc set matches the standalone sampler run on the same input."""
    from vector_search_databricks_poc_spark.operators.packing import (
        token_budget_mixture_sample,
    )
    from vector_search_databricks_poc_spark.operators.text import token_count
    from vector_search_databricks_poc_spark.pipelines import (
        assemble_training_corpus,
    )

    d = load_table(spark, SF_DIR, "documents")
    w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = assemble_training_corpus(
        d, domain_col="source", mixture=w, mixture_unit="tokens",
        redact=False, pack_budget=256, pack_groups=4, n_shards=8,
    ).cache()
    kept_tok = {
        r.source: r.tok
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    # recompute the feasible budget on the pipeline's own pre-mixture view
    base = d.withColumn("n_tokens", token_count(F.col("text")))
    tot = {
        r.source: r.tok
        for r in base.where(F.col("source").isin(*w))
        .groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    b = min(int(tot[dom] / w[dom]) for dom in w)
    for dom in w:
        assert kept_tok[dom] <= int(w[dom] * b), (dom, kept_tok[dom])
    # same keeper set as the standalone sampler on the same columns
    direct = token_budget_mixture_sample(
        base.select("doc_id", "source", "n_tokens"), "source", w
    )
    assert out.select("doc_id").exceptAll(direct.select("doc_id")).count() == 0
    assert direct.select("doc_id").exceptAll(out.select("doc_id")).count() == 0
    out.unpersist()
    with pytest.raises(ValueError, match="mixture_unit"):
        assemble_training_corpus(
            d, domain_col="source", mixture=w, mixture_unit="chars"
        )


def test_corpus_assembly_pipeline_query(spark):
    rows = R.QUERIES["corpus_assembly_pipeline"](spark, SF_DIR).collect()
    assert rows and all(r.n_packs >= 1 and r.n_docs >= r.n_packs - 1 for r in rows)
    assert {r.shard for r in rows} <= set(range(8))


# ---------------------------------------------------------------------------
# temperature mixture (r5)
# ---------------------------------------------------------------------------


def _skewed_corpus(spark):
    rows = []
    i = 0
    for dom, n in (("head", 64), ("mid", 24), ("tail", 8)):
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "dom"])


def test_temperature_weights_hand_computed(spark):
    from vector_search_databricks_poc_spark.operators.packing import (
        temperature_mixture_weights,
    )

    df = _skewed_corpus(spark)
    out = {r["dom"]: r for r in temperature_mixture_weights(df, "dom", 0.5).collect()}
    shares = {"head": 64 / 96, "mid": 24 / 96, "tail": 8 / 96}
    z = sum(s**0.5 for s in shares.values())
    for dom, share in shares.items():
        assert abs(out[dom]["natural_share"] - share) < 1e-12
        assert abs(out[dom]["weight"] - share**0.5 / z) < 1e-12
    # weights sum to 1 and flatten the skew: head down, tail up
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-12
    assert out["head"]["weight"] < shares["head"]
    assert out["tail"]["weight"] > shares["tail"]


def test_temperature_alpha_one_is_natural(spark):
    from vector_search_databricks_poc_spark.operators.packing import (
        temperature_mixture_weights,
    )

    df = _skewed_corpus(spark)
    for r in temperature_mixture_weights(df, "dom", 1.0).collect():
        assert abs(r["weight"] - r["natural_share"]) < 1e-12


def test_temperature_alpha_validation(spark):
    from vector_search_databricks_poc_spark.operators.packing import (
        temperature_mixture_weights,
    )

    df = _skewed_corpus(spark)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            temperature_mixture_weights(df, "dom", bad)


def test_temperature_sample_counts_are_feasible_floor(spark):
    """Sampled counts equal floor(w_d * N) with N the largest feasible
    total — recomputed independently here."""
    from vector_search_databricks_poc_spark.operators.packing import (
        temperature_mixture_sample,
        temperature_mixture_weights,
    )

    df = _skewed_corpus(spark)
    w = {r["dom"]: (r["weight"], r["n_docs"])
         for r in temperature_mixture_weights(df, "dom", 0.3).collect()}
    n_feas = min(int(cnt / wt) for wt, cnt in w.values())
    got = {
        r["dom"]: r["n"]
        for r in temperature_mixture_sample(df, "dom", 0.3)
        .groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    for dom, (wt, _) in w.items():
        assert got.get(dom, 0) == int(wt * n_feas), (dom, got, n_feas)
    # flattening actually happened: head's sampled share < natural share
    tot = sum(got.values())
    assert got["head"] / tot < 64 / 96


def test_temperature_sample_deterministic(spark):
    from vector_search_databricks_poc_spark.operators.packing import (
        temperature_mixture_sample,
    )

    df = _skewed_corpus(spark)
    a = sorted(r["doc_id"] for r in temperature_mixture_sample(df, "dom", 0.3).collect())
    b = sorted(r["doc_id"] for r in temperature_mixture_sample(df, "dom", 0.3).collect())
    assert a == b and len(a) > 0


def test_temperature_sample_survives_null_domains(spark):
    """A NULL domain row must be excluded, not collapse the feasible N to
    zero and empty the whole sampled corpus (the weight row for the NULL
    group could never equi-join back to its rows)."""
    from vector_search_databricks_poc_spark.operators.packing import (
        temperature_mixture_sample,
        temperature_mixture_weights,
    )

    base = _skewed_corpus(spark)
    with_null = base.unionByName(
        spark.createDataFrame([(999, None)], "doc_id bigint, dom string")
    )
    w = {r["dom"] for r in temperature_mixture_weights(with_null, "dom", 0.3).collect()}
    assert None not in w and w == {"head", "mid", "tail"}
    got = temperature_mixture_sample(with_null, "dom", 0.3)
    clean = temperature_mixture_sample(base, "dom", 0.3)
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(r["doc_id"] for r in clean.collect())
    assert a == b and len(a) > 0 and 999 not in a


# ---------------------------------------------------------------------------
# pack_token_ids: packed training examples
# ---------------------------------------------------------------------------


def _py_pack(rows, budget, n_groups, eos_id):
    """Independent reference: per-group eos-terminated stream in id
    order, cut every ``budget`` tokens."""
    streams: dict[int, list[int]] = {g: [] for g in range(n_groups)}
    for did, ids in sorted(rows):
        g = (did % P31) * MIX % P31 % n_groups
        streams[g].extend((ids or []) + [eos_id])
    out = {}
    for g, s in streams.items():
        for c in range(-(-len(s) // budget)):
            out[g * (1 << 43) + c] = s[c * budget:(c + 1) * budget]
    return out


def test_pack_token_ids_python_parity(spark):
    from vector_search_databricks_poc_spark.operators.packing import pack_token_ids

    rows = [(i, list(range(i % 9))) for i in range(40)] + [(100, None)]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    want = _py_pack(rows, budget=16, n_groups=4, eos_id=7)

    full = pack_token_ids(df, budget=16, n_groups=4, eos_id=7, drop_last=False)
    got = {r["seq_id"]: list(r["input_ids"]) for r in full.collect()}
    assert got == want

    # drop_last: only the full sequences survive, and token conservation
    # holds — kept + dropped-tail == whole stream
    kept = pack_token_ids(df, budget=16, n_groups=4, eos_id=7, drop_last=True)
    kept_ids = {r["seq_id"]: list(r["input_ids"]) for r in kept.collect()}
    assert kept_ids == {k: v for k, v in want.items() if len(v) == 16}
    total = sum(len(ids or []) + 1 for _, ids in rows)
    assert sum(len(v) for v in got.values()) == total


def test_pack_token_ids_deterministic_across_repartition(spark):
    from vector_search_databricks_poc_spark.operators.packing import pack_token_ids

    rows = [(i, [i, i + 1, i + 2]) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    a = {(r["seq_id"], tuple(r["input_ids"]))
         for r in pack_token_ids(df, budget=10, n_groups=3).collect()}
    b = {(r["seq_id"], tuple(r["input_ids"]))
         for r in pack_token_ids(df.repartition(17), budget=10, n_groups=3).collect()}
    assert a == b


def test_packed_sequences_query_oracle(spark, con):
    """The declared packed_sequences query re-derived END TO END in
    DuckDB: portable token-id hashing, eos termination, per-group
    running offsets, budget cuts, per-sequence checksum."""
    sql = f"""
    WITH docs AS (
      SELECT doc_id,
             list_append(
               list_transform(
                 list_filter(string_split(text, ' '), t -> t <> ''),
                 t -> list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(range(1, length(t) + 1),
                                         i -> CAST(ascii(t[i]) AS BIGINT))),
                        (a, b) -> (a * 131 + b) % {P31}) % 32000),
               0) AS ids,
             ((doc_id % {P31}) * {MIX}) % {P31} % 8 AS g
      FROM documents
    ),
    started AS (
      SELECT *,
             SUM(len(ids)) OVER (
               PARTITION BY g ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - len(ids) AS start
      FROM docs
    ),
    toks AS (
      SELECT g, start + u.i - 1 AS gpos, ids[u.i] AS tok
      FROM started, UNNEST(range(1, len(ids) + 1)) u(i)
    ),
    seqs AS (
      SELECT g * 8796093022208 + CAST(FLOOR(gpos / 512) AS BIGINT) AS seq_id,
             COUNT(*) AS n_tokens, SUM(tok) AS ids_sum
      FROM toks GROUP BY 1
    )
    SELECT seq_id, CAST(n_tokens AS INT) AS n_tokens, ids_sum
    FROM seqs WHERE n_tokens = 512
    """
    _assert_green(compare(R.QUERIES["packed_sequences"](spark, SF_DIR), con, sql))


# ---------------------------------------------------------------------------
# token_budget_mixture_sample
# ---------------------------------------------------------------------------


def test_token_budget_mixture_oracle(spark, con):
    """Full DuckDB re-derivation: token totals, feasible budget, per-domain
    mixed-hash prefix under quota."""
    from vector_search_databricks_poc_spark.operators.packing import (
        token_budget_mixture_sample,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", F.length("text").alias("n_tokens")
    )
    out = token_budget_mixture_sample(
        docs, "source", {"src1": 0.5, "src2": 0.3, "src3": 0.2}
    ).select("doc_id", "source", "n_tokens", "cum_tokens")
    sql = f"""
    WITH docs AS (
      SELECT doc_id, source, LENGTH(text) AS n_tokens FROM documents
    ),
    w AS (
      SELECT * FROM (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)) t(dom, w)
    ),
    totals AS (
      SELECT w.w, COALESCE(SUM(d.n_tokens), 0) AS tok
      FROM w LEFT JOIN docs d ON d.source = w.dom GROUP BY w.w
    ),
    b AS (SELECT MIN(FLOOR(tok / w)) AS b FROM totals),
    ranked AS (
      SELECT d.doc_id, d.source, d.n_tokens, w.w,
             SUM(d.n_tokens) OVER (
               PARTITION BY d.source
               ORDER BY ((d.doc_id % {P31}) * {MIX}) % {P31}, d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM docs d JOIN w ON w.dom = d.source
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM ranked, b WHERE cum_tokens <= FLOOR(w * b)
    """
    _assert_green(compare(out, con, sql))


def test_token_budget_mixture_quota_semantics(spark):
    """Hand-sized corpus: every domain lands at or under floor(w*B), the
    binding domain saturates its quota, and reruns are identical."""
    from vector_search_databricks_poc_spark.operators.packing import (
        token_budget_mixture_sample,
    )

    rows = [(i, "a" if i % 2 else "b", 10 + (i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    w = {"a": 0.7, "b": 0.3}
    out = token_budget_mixture_sample(df, "source", w).collect()
    tok = {d: sum(r["n_tokens"] for r in out if r["source"] == d) for d in w}
    tot = {d: sum(n for _, s, n in rows if s == d) for d in w}
    b = min(int(tot[d] / w[d]) for d in w)
    for d in w:
        assert tok[d] <= int(w[d] * b), (d, tok[d], int(w[d] * b))
    # the binding domain gets within one max-doc of its quota
    binding = min(w, key=lambda d: tot[d] / w[d])
    assert tok[binding] > int(w[binding] * b) - 13
    # deterministic
    out2 = token_budget_mixture_sample(df, "source", w).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in out2}
    # absent weighted domain clamps the budget to zero
    empty = token_budget_mixture_sample(
        df, "source", {"a": 0.5, "zzz": 0.5}
    ).collect()
    assert empty == []
