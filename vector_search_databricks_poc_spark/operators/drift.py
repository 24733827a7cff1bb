"""Distribution drift between two corpus snapshots (pipeline monitoring).

A 100 TB ingestion pipeline re-lands sources continuously; the question
"did this drop CHANGE the data?" has two halves — row-level churn
(``operators.diff``) and DISTRIBUTION shift even when row counts look
fine (a crawler that started truncating pages, a language mix that
silently tilted).  This module covers the second half with the standard
monitoring statistic, Population Stability Index, plus the per-bin
histograms it derives from.

Scale design: each snapshot is reduced in ONE shuffle-free scan — every
(column, bin) pair is a conditional-sum column of a single global
aggregate (map-side partials to one row), then the one-row wide result
unpivots back to (column, bin, count) rows lazily.  No explode of the
corpus, no groupBy shuffle, no driver state; the PSI join touches
``n_cols × n_bins`` rows.  Bin edges are CALLER-DECLARED (lo, hi,
n_bins per column) so the plan is deterministic and oracle-checkable —
deriving edges from reference quantiles is a separate planning step at
the caller's discretion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spec: {column: (lo, hi, n_bins)} — values below lo clamp into bin 0,
# at/above hi into bin n_bins-1, so mass never silently disappears;
# nulls get their own bin (-1), because a null-rate shift IS drift.
BinSpec = dict[str, tuple[float, float, int]]


def _validate_spec(spec: BinSpec) -> None:
    """ADVICE r7: a degenerate declared grid must fail loudly, not
    misattribute mass — lo == hi makes every bin expression x/0 (NULL,
    silently clamped) and n_bins <= 0 builds an empty/negative grid."""
    if not spec:
        raise ValueError("BinSpec is empty: declare at least one column")
    for col, (lo, hi, n_bins) in spec.items():
        if not (float(lo) < float(hi)):
            raise ValueError(
                f"BinSpec[{col!r}]: lo ({lo}) must be strictly below hi ({hi})"
            )
        if int(n_bins) < 1:
            raise ValueError(f"BinSpec[{col!r}]: n_bins must be >= 1, got {n_bins}")


def _bin_expr(col: str, lo: float, hi: float, n_bins: int) -> Column:
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return F.when(F.col(col).isNull(), F.lit(-1)).otherwise(clamped)


def binned_histogram(df: DataFrame, spec: BinSpec) -> DataFrame:
    """``(column, bin, n)`` counts for every column in ``spec`` from one
    shuffle-free pass: each (column, bin) is one conditional-count column
    of a single global aggregate; the wide one-row result unpivots
    lazily.  Empty bins are emitted with n=0 (the PSI join needs the full
    grid)."""
    _validate_spec(spec)
    aggs = []
    names = []
    for col, (lo, hi, n_bins) in spec.items():
        b = _bin_expr(col, lo, hi, n_bins)
        for i in [-1, *range(n_bins)]:
            name = f"{col}__{i}"
            names.append((col, i, name))
            # coalesce: a zero-row snapshot aggregates to null, not 0
            aggs.append(
                F.coalesce(
                    F.sum(F.when(b == F.lit(i), 1).otherwise(0)), F.lit(0)
                ).alias(name)
            )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {i}L, `{name}`" for col, i, name in names
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS (column, bin, n)"
        )
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    spec: BinSpec,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-column drift report between two snapshots: ``(column, psi,
    n_old, n_new, null_frac_old, null_frac_new, max_shift_bin,
    max_shift)``.

    ``psi`` is the Population Stability Index over the declared bins,
    with ``eps``-smoothed proportions (a bin empty on one side
    contributes a large-but-finite term instead of ±inf).  Common
    operating points: psi < 0.1 stable, 0.1–0.25 moderate, > 0.25 major
    shift.  ``max_shift`` is the largest absolute proportion change and
    ``max_shift_bin`` where it happened (null bin = -1), pointing at the
    part of the distribution that moved.
    """
    o = binned_histogram(old, spec).withColumnRenamed("n", "n_o")
    n = binned_histogram(new, spec).withColumnRenamed("n", "n_n")
    # the grids are identical by construction, so this is an n_cols×n_bins
    # row join of two one-scan aggregates
    g = o.join(n, ["column", "bin"])
    tot = g.groupBy("column").agg(
        F.sum("n_o").alias("n_old"), F.sum("n_n").alias("n_new")
    )
    g = g.join(tot, "column")
    p_o = F.col("n_o") / F.greatest(F.col("n_old"), F.lit(1)) + F.lit(eps)
    p_n = F.col("n_n") / F.greatest(F.col("n_new"), F.lit(1)) + F.lit(eps)
    shift = F.abs(F.col("n_n") / F.greatest(F.col("n_new"), F.lit(1))
                  - F.col("n_o") / F.greatest(F.col("n_old"), F.lit(1)))
    terms = g.select(
        "column", "bin", "n_old", "n_new",
        ((p_n - p_o) * F.log(p_n / p_o)).alias("psi_term"),
        shift.alias("shift"),
        F.when(F.col("bin") == -1, F.col("n_o")).otherwise(0).alias("null_o"),
        F.when(F.col("bin") == -1, F.col("n_n")).otherwise(0).alias("null_n"),
    )
    return (
        terms.groupBy("column", "n_old", "n_new")
        .agg(
            F.sum("psi_term").alias("psi"),
            F.sum("null_o").alias("_nulls_o"),
            F.sum("null_n").alias("_nulls_n"),
            F.max_by("bin", F.struct("shift", F.col("bin").cast("double") * -1)).alias(
                "max_shift_bin"
            ),
            F.max("shift").alias("max_shift"),
        )
        .select(
            "column",
            "psi",
            "n_old",
            "n_new",
            (F.col("_nulls_o") / F.greatest(F.col("n_old"), F.lit(1))).alias(
                "null_frac_old"
            ),
            (F.col("_nulls_n") / F.greatest(F.col("n_new"), F.lit(1))).alias(
                "null_frac_new"
            ),
            "max_shift_bin",
            "max_shift",
        )
    )


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    model,
    n_bins: int = 10,
    n_sigma: float = 3.0,
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift of an EMBEDDING column: PSI per principal
    component of a frozen PCA ``model`` (operators/pca.py, fit on the
    reference snapshot or any fixed baseline).

    An embedding corpus can drift with no scalar symptom — a new encoder
    version, a topical tilt, a normalization bug all move the vector
    distribution while row counts and lengths look fine.  Projecting
    both snapshots onto the model's directions turns that into k scalar
    distributions; the monitor is then exactly ``profile_drift`` over
    components ``pc0..pc{k-1}``, with bin edges derived
    deterministically from the model itself (±``n_sigma``·sqrt(eigenvalue)
    — the fit distribution's own scale), so the plan stays declared and
    reproducible.

    Same scale contract as profile_drift: one shuffle-free scan per
    snapshot (the matvec projection is a codegen expression in the same
    projection), PSI join over k × n_bins rows.  The model must stay
    FROZEN across monitoring runs — refitting per run would hide drift
    by re-centering on it.
    """
    from .pca import project_expr

    def _proj(df: DataFrame) -> DataFrame:
        p = project_expr(model, vec_col)
        return df.select(
            *[F.element_at(p, i + 1).alias(f"pc{i}") for i in range(model.k)]
        )

    spec: BinSpec = {}
    for i, var in enumerate(model.explained_variance):
        sigma = max(float(var), 1e-12) ** 0.5
        spec[f"pc{i}"] = (-n_sigma * sigma, n_sigma * sigma, n_bins)
    return profile_drift(_proj(old), _proj(new), spec, eps=eps)
