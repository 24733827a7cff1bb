"""Streaming near-dup gate (streaming/dedup_gate.py): planted waves of
near-duplicates across micro-batch boundaries, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.streaming.dedup_gate import (
    _gate_batch,
    stream_near_dup_gate,
)

_BASE_A = (
    "the committee reviewed the annual budget proposal and approved the "
    "funding allocation for the regional infrastructure projects next year"
)
_BASE_B = (
    "marine biologists tracked the seasonal migration of humpback whales "
    "along the pacific coastline using acoustic sensor arrays this spring"
)
_BASE_C = (
    "quarterly revenue exceeded analyst expectations driven by strong "
    "subscription growth and improved retention across enterprise accounts"
)
_UNIQ_D = (
    "volcanic activity reshaped the northern valley over several thousand "
    "years leaving layered basalt formations visible in the canyon walls"
)


def _near(text: str) -> str:
    # one word changed: high shingle overlap, well above threshold 0.5
    return text.replace(text.split()[0], "XQZV", 1)


def test_gate_across_waves(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    acc = str(tmp_path / "accepted")
    store = str(tmp_path / "store")
    chk = str(tmp_path / "chk")

    # wave 1: 2 near-dup of 1 (dropped within batch), 3 unique
    spark.createDataFrame(
        [(1, _BASE_A), (2, _near(_BASE_A)), (3, _BASE_B)],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q = stream_near_dup_gate(stream, acc, store, checkpoint_dir=chk, threshold=0.5)
    assert q.awaitTermination(180)
    got1 = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got1 == {1, 3}

    # wave 2: 10 near-dup of ACCEPTED 3 (store probe drops it), 11 unique
    # keeper, 12 near-dup of batch-mate 11 (greedy drops the larger id)
    spark.createDataFrame(
        [(10, _near(_BASE_B)), (11, _BASE_C), (12, _near(_BASE_C))],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q2 = stream_near_dup_gate(stream2, acc, store, checkpoint_dir=chk, threshold=0.5)
    assert q2.awaitTermination(180)
    got2 = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got2 == {1, 3, 11}

    # wave 3: near-dup of a WAVE-2 survivor plus one unique — the store
    # really accumulated across batches
    spark.createDataFrame(
        [(20, _near(_BASE_C).replace("XQZV", "WQJP")), (21, _UNIQ_D)],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream3 = spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    q3 = stream_near_dup_gate(stream3, acc, store, checkpoint_dir=chk, threshold=0.5)
    assert q3.awaitTermination(180)
    got3 = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got3 == {1, 3, 11, 21}

    # the signature store holds band rows ONLY for accepted docs
    ids_in_store = {r["doc_id"] for r in spark.read.parquet(store).select("doc_id").distinct().collect()}
    assert ids_in_store == got3


def test_gate_batch_replay_is_idempotent(spark, tmp_path):
    acc = str(tmp_path / "accepted")
    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(1, _BASE_A), (2, _BASE_B)], "doc_id long, text string"
    )
    _gate_batch(batch, 7, acc, store, threshold=0.5)
    n1 = spark.read.parquet(acc).count()
    s1 = spark.read.parquet(store).count()
    _gate_batch(batch, 7, acc, store, threshold=0.5)  # crash replay
    assert spark.read.parquet(acc).count() == n1 == 2
    assert spark.read.parquet(store).count() == s1
    # a NEW batch id against the same artifacts still lands
    batch2 = spark.createDataFrame([(9, _UNIQ_D)], "doc_id long, text string")
    _gate_batch(batch2, 8, acc, store, threshold=0.5)
    assert spark.read.parquet(acc).count() == 3


def test_wet_stream_to_gated_corpus(spark, tmp_path):
    """Full streaming front half: WET shards land -> stream decode ->
    Gopher quality gate -> near-dup gate -> accepted corpus.  Wave 2
    contains a near-dup of an ACCEPTED wave-1 doc (dropped via the
    signature store) and a fresh doc (kept); a degenerate looping doc
    never reaches the dedup stage (gate drops it in-stream)."""
    from vector_search_databricks_poc_spark.operators.text import quality_gate
    from vector_search_databricks_poc_spark.sources.warc import (
        stream_read_wet,
        write_wet,
    )

    landing = str(tmp_path / "landing")
    acc = str(tmp_path / "accepted")
    store = str(tmp_path / "store")
    chk = str(tmp_path / "chk")

    waves = [0]

    def run_wave(rows):
        df = spark.createDataFrame(rows, "url string, text string")
        # one subdir per wave: write_wet shard names are deterministic by
        # partition id, so a same-dir second wave would OVERWRITE wave 1's
        # shard — and a file-source stream tracks files by name, never
        # re-reading an overwritten one
        waves[0] += 1
        write_wet(df.coalesce(1), f"{landing}/w{waves[0]}").collect()
        stream = stream_read_wet(spark, f"{landing}/*")
        gated = (
            quality_gate(stream)
            .where(F.col("keep"))
            .select(F.xxhash64("url").alias("doc_id"), "url", "text")
        )
        q = stream_near_dup_gate(
            gated, acc, store, checkpoint_dir=chk, threshold=0.5
        )
        assert q.awaitTermination(180)
        return {r["url"] for r in spark.read.parquet(acc).collect()}

    looping = "buy now limited offer\n\n" * 12  # dup-paragraph degenerate
    got1 = run_wave(
        [("http://a/1", _BASE_A), ("http://a/2", _BASE_B), ("http://a/junk", looping)]
    )
    assert got1 == {"http://a/1", "http://a/2"}

    got2 = run_wave(
        [("http://b/1", _near(_BASE_A)), ("http://b/2", _UNIQ_D)]
    )
    assert got2 == {"http://a/1", "http://a/2", "http://b/2"}
