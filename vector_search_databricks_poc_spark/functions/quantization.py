"""Vector quantization (100 TB storage/bandwidth lever).

At scale the embedding column dominates table size; int8 scalar quantization
cuts it 4x with ~1% recall loss for cosine top-k.  Pure expressions — the
quantized column is an ordinary ``array<tinyint>`` parquet column, so all
the engine's join/index machinery applies unchanged.

Scheme: symmetric per-vector scale s = max(|x|)/127; q_i = round(x_i / s);
stored as (scale float, qvec array<tinyint>).  Dequantize: x_i ~ q_i * s.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(vec: Column | str) -> tuple[Column, Column]:
    """Returns (scale, qvec) columns for a float-array column."""
    v = (F.col(vec) if isinstance(vec, str) else vec).cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(absmax != 0, absmax / 127.0).otherwise(F.lit(1.0))
    qvec = F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    return scale.cast("float").alias("q_scale"), qvec.alias("q_vec")


def dequantize(scale: Column | str, qvec: Column | str) -> Column:
    s = (F.col(scale) if isinstance(scale, str) else scale).cast("double")
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    return F.transform(q, lambda x: x.cast("double") * s)


def quantize_table(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace the float vector with (q_scale, q_vec) — 4x smaller at rest."""
    scale, qvec = quantize(vec_col)
    return df.withColumns({"q_scale": scale, "q_vec": qvec}).drop(vec_col)


def quantized_dot(
    a_scale: Column | str, a_q: Column | str, b_scale: Column | str, b_q: Column | str
) -> Column:
    """Dot product directly in the quantized domain: int8 multiply-adds,
    one float multiply at the end — the cheap first stage before exact
    rescoring of survivors."""
    aq = F.col(a_q) if isinstance(a_q, str) else a_q
    bq = F.col(b_q) if isinstance(b_q, str) else b_q
    int_dot = F.aggregate(
        F.zip_with(aq, bq, lambda x, y: (x.cast("int") * y.cast("int")).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sa = (F.col(a_scale) if isinstance(a_scale, str) else a_scale).cast("double")
    sb = (F.col(b_scale) if isinstance(b_scale, str) else b_scale).cast("double")
    return int_dot.cast("double") * sa * sb
