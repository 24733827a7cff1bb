"""Property-based tests (hypothesis) for the vector kernel and dedup math —
randomized inputs catch edge cases fixture data can't."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from vector_search_databricks_poc_spark import vectors as V
from vector_search_databricks_poc_spark.operators.dedup import jaccard

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite, min_size=2, max_size=16)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=5))
def test_cosine_bounds_and_symmetry(spark, pairs):
    pairs = [(a, b[: len(a)] + [0.0] * max(0, len(a) - len(b))) for a, b in pairs]
    df = spark.createDataFrame(
        [Row(a=[float(x) for x in a], b=[float(x) for x in b]) for a, b in pairs]
    )
    rows = df.select(
        V.cosine("a", "b").alias("ab"), V.cosine("b", "a").alias("ba")
    ).collect()
    for r in rows:
        if r["ab"] is None:
            assert r["ba"] is None  # zero-vector on either side
            continue
        assert -1.0 - 1e-9 <= r["ab"] <= 1.0 + 1e-9
        assert abs(r["ab"] - r["ba"]) < 1e-9  # symmetric


@settings(max_examples=15, deadline=None)
@given(vec)
def test_normalize_idempotent(spark, v):
    df = spark.createDataFrame([Row(a=[float(x) for x in v])])
    once = df.select(V.l2_normalize("a").alias("u"))
    twice = once.select(V.l2_normalize("u").alias("u"))
    u1 = once.first()["u"]
    u2 = twice.first()["u"]
    assert all(abs(x - y) < 1e-9 for x, y in zip(u1, u2))
    norm = math.sqrt(sum(x * x for x in u1))
    assert norm == pytest.approx(1.0, abs=1e-9) or norm == 0.0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
)
def test_jaccard_properties(spark, xs, ys):
    df = spark.createDataFrame(
        [([str(x) for x in xs], [str(y) for y in ys])],
        "a array<string>, b array<string>",
    )
    from pyspark.sql import functions as F

    j = df.select(
        jaccard(F.array_distinct("a"), F.array_distinct("b")).alias("j"),
        jaccard(F.array_distinct("b"), F.array_distinct("a")).alias("jr"),
    ).first()
    assert 0.0 <= j["j"] <= 1.0
    assert j["j"] == pytest.approx(j["jr"], abs=1e-12)
    expected = (
        len(set(xs) & set(ys)) / len(set(xs) | set(ys)) if (set(xs) | set(ys)) else 0.0
    )
    assert j["j"] == pytest.approx(expected, abs=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_portable_hash_cross_engine_parity(spark, texts):
    """The polynomial hash under every bit-exact oracle path must agree
    byte-for-byte across THREE independent implementations: the Spark
    expression, the DuckDB list_reduce SQL used in oracle queries, and a
    plain Python fold."""
    import duckdb

    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.operators.dedup import (
        _PORTABLE_P,
        portable_string_hash,
    )

    def py_hash(s):
        acc = 0
        for ch in s:
            acc = (acc * 131 + ord(ch)) % _PORTABLE_P
        return acc

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    got_spark = {
        r["i"]: r["h"]
        for r in df.select("i", portable_string_hash(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    got_duck = {
        i: con.execute(
            """
            SELECT list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(?) + 1),
                                      i -> CAST(ascii(?[i]) AS BIGINT))),
                     (a, b) -> (a * 131 + b) % 2147483647)
            """,
            [t, t],
        ).fetchone()[0]
        for i, t in enumerate(texts)
    }
    for i, t in enumerate(texts):
        assert got_spark[i] == py_hash(t) == got_duck[i], (t, got_spark[i], py_hash(t), got_duck[i])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.sampled_from([0.05, 0.1, 0.25]),
)
def test_heavy_hitters_always_exact(spark, keys, frac):
    """Property: for ANY key multiset and threshold, the 2-pass
    Misra-Gries + recount result equals the plain exact GROUP BY/HAVING
    answer (the superset guarantee makes the candidates sufficient)."""
    import math

    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(4)
    got = {(r.k, r.cnt) for r in heavy_hitters(df, "k", threshold_frac=frac).collect()}
    n = len(keys)
    thr = math.ceil(n * frac)
    from collections import Counter

    expected = {(k, c) for k, c in Counter(keys).items() if c >= thr}
    assert got == expected


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_roundtrip_error_bounded(h, w, seed):
    """Property: baseline JPEG roundtrip at quality 90 stays within a
    conservative per-pixel error bound for ANY image shape (including
    non-multiple-of-8 dims) and ANY pixel content."""
    import numpy as np

    from vector_search_databricks_poc_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    # random noise is the worst case for DCT quantization; mean error
    # stays far below this bound on real images
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 32.0


# ---------------------------------------------------------------------------
# MP3 / MP4 metadata parsers (functions/media_meta.py): construct-then-parse
# roundtrips over the parameter space — pure Python, no Spark session.
# ---------------------------------------------------------------------------

_MP3_BITRATES = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(1, 40),
    bitrate=st.sampled_from(_MP3_BITRATES),
    rate=st.sampled_from([32000, 44100, 48000]),
    channels=st.sampled_from([1, 2]),
    id3_len=st.one_of(st.none(), st.integers(0, 500)),
)
def test_mp3_construct_parse_roundtrip(n_frames, bitrate, rate, channels, id3_len):
    from vector_search_databricks_poc_spark.functions.media_meta import (
        make_mp3,
        mp3_metadata,
    )

    p = make_mp3(
        n_frames=n_frames,
        bitrate_kbps=bitrate,
        rate=rate,
        channels=channels,
        id3_tag=None if id3_len is None else b"t" * id3_len,
    )
    m = mp3_metadata(p)
    assert m["n_frames"] == n_frames
    assert m["sample_rate"] == rate
    assert m["channels"] == channels
    assert m["bitrate_kbps"] == bitrate and m["mode"] == "cbr"
    assert m["duration_s"] == pytest.approx(n_frames * 1152 / rate, abs=1e-5)


@settings(max_examples=40, deadline=None)
@given(
    dur_ms=st.integers(1, 10_000_000),
    timescale=st.sampled_from([600, 1000, 90000]),
    n_tracks=st.integers(0, 5),
    version=st.sampled_from([0, 1]),
    large=st.booleans(),
)
def test_mp4_construct_parse_roundtrip(dur_ms, timescale, n_tracks, version, large):
    from vector_search_databricks_poc_spark.functions.media_meta import (
        make_mp4,
        mp4_metadata,
    )

    dur = dur_ms / 1000.0
    m = mp4_metadata(
        make_mp4(
            duration_s=dur,
            timescale=timescale,
            n_tracks=n_tracks,
            mvhd_version=version,
            large_mdat=large,
        )
    )
    assert m["timescale"] == timescale
    assert m["n_tracks"] == n_tracks
    # duration survives the round-trip up to timescale granularity
    assert m["duration_s"] == pytest.approx(dur, abs=1.0 / timescale + 1e-9)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_media_probes_never_crash_on_arbitrary_bytes(data):
    """Fuzz: arbitrary bytes either parse or raise ValueError — never any
    other exception (the mapInPandas path catches exactly ValueError /
    struct.error, so anything else would kill a 100 TB job)."""
    import struct as _struct
    import zlib as _zlib

    from vector_search_databricks_poc_spark.functions.jpeg import decode_jpeg
    from vector_search_databricks_poc_spark.functions.media_meta import (
        mp3_metadata,
        mp4_metadata,
    )

    for fn in (mp3_metadata, mp4_metadata):
        try:
            fn(data)
        except ValueError:
            pass
    # the JPEG decoder shares the contract; force the SOI magic so the
    # fuzz reaches the marker walk instead of bailing at the first check
    try:
        decode_jpeg(b"\xff\xd8" + data)
    except (ValueError, _struct.error, _zlib.error):
        pass
    # AVI probes: plain bytes, and RIFF-prefixed so the chunk walk runs
    from vector_search_databricks_poc_spark.functions.avi import (
        avi_frame_offsets,
        avi_metadata,
        sample_avi_frames,
    )

    for fn in (avi_metadata, avi_frame_offsets, sample_avi_frames):
        for blob in (data, b"RIFF" + data, b"RIFF\x00\x01\x00\x00AVI " + data):
            try:
                fn(blob)
            except (ValueError, _struct.error):
                pass


# ---------------------------------------------------------------------------
# Randomized semantics checks: asof_join and interval_join against plain
# Python reference implementations (hypothesis generates the event layout)
# ---------------------------------------------------------------------------

_ev = st.lists(
    st.tuples(
        st.integers(0, 3),            # key (None mixed in below)
        st.integers(0, 100_000),      # seconds offset
        st.integers(0, 9),            # payload tag
    ),
    min_size=0,
    max_size=25,
)


def _mk_ts(off):
    import datetime as dt

    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off)


@settings(max_examples=12, deadline=None)
@given(left=_ev, right=_ev, how=st.sampled_from(["inner", "left"]))
def test_asof_join_matches_python_reference(spark, left, right, how):
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.operators.asof import asof_join

    # dedupe right per (key, ts): the operator's documented determinism
    # contract requires at most one right row per key+timestamp
    seen = {}
    for k, off, tag in right:
        seen[(k, off)] = tag
    right_rows = [(k, _mk_ts(off), tag) for (k, off), tag in seen.items()]
    left_rows = [(k, _mk_ts(off), tag) for k, off, tag in left]

    ldf = spark.createDataFrame(
        left_rows or [(None, None, None)],
        "k int, lts timestamp, ltag int",
    )
    if not left_rows:
        ldf = ldf.where(F.lit(False))
    rdf = spark.createDataFrame(
        right_rows or [(None, None, None)],
        "k int, rts timestamp, px int",
    )
    if not right_rows:
        rdf = rdf.where(F.lit(False))

    got = {
        (r["k"], r["lts"], r["ltag"]): r["px"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", how=how
        ).collect()
    }

    exp = {}
    for k, lts, ltag in left_rows:
        cands = [(rts, px) for rk, rts, px in right_rows if rk == k and rts <= lts]
        if cands:
            exp[(k, lts, ltag)] = max(cands)[1]
        elif how == "left":
            exp[(k, lts, ltag)] = None
    assert got == exp


@settings(max_examples=12, deadline=None)
@given(left=_ev, right=_ev, how=st.sampled_from(["inner", "left"]))
def test_interval_join_matches_python_reference(spark, left, right, how):
    from pyspark.sql import functions as F

    from vector_search_databricks_poc_spark.streaming.joins import interval_join

    upper_s = 3600
    left_rows = [(k, _mk_ts(off), tag) for k, off, tag in left]
    right_rows = [(k, _mk_ts(off), tag) for k, off, tag in right]
    ldf = spark.createDataFrame(
        left_rows or [(None, None, None)], "user_id int, ts timestamp, a int"
    )
    if not left_rows:
        ldf = ldf.where(F.lit(False))
    rdf = spark.createDataFrame(
        right_rows or [(None, None, None)], "user_id int, ts timestamp, b int"
    )
    if not right_rows:
        rdf = rdf.where(F.lit(False))

    got = sorted(
        (r["user_id"], r["l_ts"], r["l_a"], r["r_b"])
        for r in interval_join(
            ldf, rdf, key="user_id", upper="1 hour", how=how
        ).collect()
    )

    exp = []
    for k, lts, a in left_rows:
        matches = [
            b
            for rk, rts, b in right_rows
            if rk == k and rts <= lts and (lts - rts).total_seconds() <= upper_s
        ]
        if matches:
            exp.extend((k, lts, a, b) for b in matches)
        elif how == "left":
            exp.append((k, lts, a, None))
    assert got == sorted(exp)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),   # height (odd widths pad rows)
    st.integers(min_value=1, max_value=9),   # width
    st.integers(min_value=1, max_value=5),   # frames
    st.sampled_from([1.0, 5.0, 24.0]),       # fps
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_avi_construct_parse_roundtrip(h, w, n, fps, seed):
    """Property: encode_avi -> avi_metadata/decode roundtrips exactly for
    ANY frame geometry (row padding included), frame count, and fps —
    construct-then-parse like the MP3/MP4 properties above."""
    import numpy as np

    from vector_search_databricks_poc_spark.functions.avi import (
        avi_frame_offsets,
        avi_metadata,
        decode_avi_frame,
        encode_avi,
    )

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    payload = encode_avi(frames, fps=fps)
    m = avi_metadata(payload)
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)
    assert m["fps"] == pytest.approx(fps, rel=1e-3)
    assert m["duration_s"] == pytest.approx(n / fps, rel=1e-3)
    offs = avi_frame_offsets(payload)
    assert len(offs) == n
    for i, (o, ln) in enumerate(offs):
        assert np.array_equal(
            decode_avi_frame(payload[o : o + ln], w, h), frames[i]
        )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t\né中 -"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_minhash_numpy_matches_expr_on_random_text(spark, texts):
    """Property: the vectorized-numpy signature stage and the
    pure-expression twin are bit-identical on arbitrary text — unicode,
    whitespace runs, empty strings, and docs shorter than the shingle
    width all hit the sentinel/rot-0 branches."""
    from vector_search_databricks_poc_spark.operators.dedup import (
        minhash_signatures_df,
        minhash_signatures_expr_df,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r[0]: list(r[1]) for r in minhash_signatures_df(df).collect()}
    b = {r[0]: list(r[1]) for r in minhash_signatures_expr_df(df).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# pack_token_ids / DSIR properties
# ---------------------------------------------------------------------------

_ids_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.one_of(
            st.none(),
            st.lists(st.integers(min_value=0, max_value=999), max_size=12),
        ),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None)
@given(_ids_lists, st.integers(min_value=1, max_value=9))
def test_pack_token_ids_conservation_and_shape(spark, rows, budget):
    """For ANY id/array input: without drop_last the packed stream holds
    exactly every token + one eos per doc, every sequence except each
    group's last is full, and offsets reconstruct the per-group stream."""
    from vector_search_databricks_poc_spark.operators.packing import pack_token_ids

    df = spark.createDataFrame(rows, "doc_id long, input_ids array<int>")
    out = pack_token_ids(df, budget=budget, n_groups=3, eos_id=0,
                         drop_last=False).collect()
    total = sum(len(ids or []) + 1 for _, ids in rows)
    assert sum(r["n_tokens"] for r in out) == total
    by_group: dict[int, list] = {}
    for r in out:
        g, c = divmod(int(r["seq_id"]), 1 << 43)
        by_group.setdefault(g, []).append((c, r))
    for g, seqs in by_group.items():
        seqs.sort()
        cuts = [c for c, _ in seqs]
        assert cuts == list(range(len(cuts)))  # contiguous sequence ids
        for c, r in seqs[:-1]:
            assert r["n_tokens"] == budget  # only the tail may be short
        assert 1 <= seqs[-1][1]["n_tokens"] <= budget


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.text(
                alphabet="ab cd\n\t", min_size=0, max_size=40
            ),
        ),
        min_size=2,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
def test_dsir_literal_equals_join_path_on_random_text(spark, rows):
    """Arrow frozen-fit scorer == in-plan join scorer on arbitrary
    whitespace-mangled text (exercises tokenizer parity edges)."""
    from vector_search_databricks_poc_spark.operators.dsir import (
        collect_bucket_weights,
        dsir_bucket_weights,
        dsir_scores,
        dsir_scores_literal,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.limit(max(1, len(rows) // 2))
    w = dsir_bucket_weights(df, target, buckets=64)
    wl = collect_bucket_weights(w, 64)
    a = {r["doc_id"]: r["dsir_score"]
         for r in dsir_scores(df, w, buckets=64).collect()}
    b = {r["doc_id"]: r["dsir_score"]
         for r in dsir_scores_literal(df, wl).collect()}
    assert a == b
