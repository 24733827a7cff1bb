"""Expression-only vector algebra (SURVEY.md B6).

The reference's scoring kernel is delegated to the Databricks Vector Search
service (query_endpoint.py:136-150); here it is rebuilt as pure Catalyst
expressions — ``zip_with`` + ``aggregate`` — so similarity math runs JVM-side,
never in Python.  (Precisely: higher-order-function lambdas are evaluated
interpreted, not inside whole-stage codegen — still JVM, no Arrow boundary;
callers on hot paths cut the number of folds instead: norms precomputed once
per side in ``similarity_join.brute_force_topk_join``, driver-side literal
query norms via ``python_l2_norm`` in ``topk.top_k_similar``.)  All
accumulation is done in DOUBLE regardless of the stored element type
(fixtures store float32; computing in double keeps Spark and the DuckDB
oracle bit-identical because both fold left-to-right over the array after an
exact float->double widen).

Every function takes/returns ``pyspark.sql.Column`` so it composes with any
DataFrame plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def lit_vector(values) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(x)) for x in values])


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product: fold of elementwise products, left to right."""
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def python_l2_norm(values) -> float:
    """Driver-side L2 norm of a literal query vector, bit-identical to
    ``l2_norm``'s Spark fold: exact float32->double widen, then the same
    left-to-right sequence of IEEE double multiply-adds.  Lets a literal
    query's norm be computed once on the driver instead of once per corpus
    row (the norm fold costs |dim| interpreted lambda steps per row)."""
    import math

    acc = 0.0
    for x in values:
        d = float(x)
        acc = acc + d * d
    return math.sqrt(acc)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = _as_double(a), _as_double(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity, NULL-safe on zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged (match the
    reference's clamp-don't-divide-by-zero posture, syntetic_data.py:162)."""
    a = _as_double(a)
    n = l2_norm(a)
    return F.when(n != 0, F.transform(a, lambda x: x / n)).otherwise(a)


def vec_add(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_as_double(a), _as_double(b), lambda x, y: x + y)


def vec_scale(a: Column | str, s: Column) -> Column:
    return F.transform(_as_double(a), lambda x: x * s)


def vec_dim_ok(a: Column | str, dim: int) -> Column:
    """Cheap validity pre-filter (reference's dimension assert,
    query_endpoint.py:111)."""
    c = F.col(a) if isinstance(a, str) else a
    return c.isNotNull() & (F.size(c) == F.lit(dim))
