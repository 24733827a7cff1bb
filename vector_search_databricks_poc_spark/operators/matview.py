"""Incremental materialized-aggregate maintenance (warehouse view refresh).

A 100 TB fact table with 0.1% daily churn should not pay a full groupBy
to keep `SELECT keys, sum(x), count(*), min(y) ... GROUP BY keys`
current.  Given the persisted aggregate STATE and a row-level change set
(operators/diff.py::snapshot_diff — the engine's CDC surface), refresh
touches only what changed:

- ``mode="recount_groups"`` (general; supports min/max): groups touched
  by any changed row are recomputed from the new snapshot restricted to
  those groups (one semi-join-pruned scan, bounded by churn x group
  size); untouched groups pass through the state anti-join unread.
- ``mode="delta"`` (sum/count only): pure arithmetic on the changed rows
  themselves — old contributions subtracted, new added; NOTHING outside
  the change set is read.  min/max are not delta-maintainable under
  deletes (removing the current extremum forces a recount), so asking
  for them in delta mode raises.

Correctness contract (asserted in tests/test_matview.py): refresh(state,
old, new, diff) == group_agg(new) exactly, for any insert/update/delete
mix, in both modes.  Count columns drop to zero => the group row is
dropped, matching the full recompute.  SQL NULL semantics for sums (an
all-NULL group sums to NULL) are preserved when the state is built with
``group_agg(null_counts=True)`` — it then carries a ``<out>__nn``
non-null count per sum measure that delta merges maintain (ADVICE r7);
without it, sum sources must be non-null, like the group keys.

At scale the changed-id set is churn-sized: it broadcasts into the
semi-joins, so neither snapshot shuffles; the only exchanges are the
churn-sized aggregates themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["group_agg", "incremental_agg_refresh"]

# measures: {out_col: (fn, src_col)} with fn in sum|count|min|max;
# count ignores src_col (pass any column or the id).
_DELTA_FNS = {"sum", "count"}
_ALL_FNS = {"sum", "count", "min", "max"}


def _agg_exprs(measures: dict) -> list[Column]:
    exprs = []
    for out, (fn, src) in measures.items():
        if fn == "sum":
            exprs.append(F.sum(src).alias(out))
        elif fn == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif fn == "min":
            exprs.append(F.min(src).alias(out))
        elif fn == "max":
            exprs.append(F.max(src).alias(out))
        else:
            raise ValueError(f"unsupported measure fn {fn!r} for {out!r}")
    return exprs


def _count_cols(measures: dict) -> list[str]:
    return [out for out, (fn, _) in measures.items() if fn == "count"]


def _sum_measures(measures: dict) -> dict:
    return {out: src for out, (fn, src) in measures.items() if fn == "sum"}


def _nn_col(out: str) -> str:
    return f"{out}__nn"


def group_agg(
    df: DataFrame, keys: list[str], measures: dict, null_counts: bool = False
) -> DataFrame:
    """The maintained aggregate, full-recompute form: one groupBy.  A
    ``count`` measure is required (it is the group-liveness signal the
    incremental path uses to drop emptied groups).

    ``null_counts=True`` additionally emits ``<out>__nn`` (the non-null
    count of each sum measure's source) — the state shape delta-mode
    refresh needs to preserve SQL NULL semantics for sums (an all-NULL
    group sums to NULL, and must STAY NULL through incremental merges;
    ADVICE r7)."""
    if not _count_cols(measures):
        raise ValueError("measures must include at least one 'count'")
    exprs = _agg_exprs(measures)
    if null_counts:
        exprs += [
            F.count(src).alias(_nn_col(out))
            for out, src in _sum_measures(measures).items()
        ]
    return df.groupBy(*keys).agg(*exprs)


def incremental_agg_refresh(
    state: DataFrame,
    old: DataFrame,
    new: DataFrame,
    diff: DataFrame,
    keys: list[str],
    measures: dict,
    id_col: str = "id",
    mode: str = "recount_groups",
) -> DataFrame:
    """Next aggregate state from the current ``state`` plus a change set.

    ``diff`` is ``snapshot_diff(old, new, id_col)`` (or any frame with an
    ``id_col`` column listing every inserted/updated/deleted id).  ``old``
    and ``new`` are the snapshots the diff relates; they are read ONLY
    semi-join-pruned to the change set (plus, in recount mode, the
    affected groups).

    Grouping keys must be non-null (the delta merge joins on key
    equality; a null group key would silently fork) — pre-coalesce null
    keys to a sentinel, the same discipline groupBy pipelines already
    need for stable group identity."""
    if mode not in ("recount_groups", "delta"):
        raise ValueError(f"mode must be recount_groups|delta, got {mode!r}")
    bad = {o for o, (fn, _) in measures.items() if fn not in _ALL_FNS}
    if bad:
        raise ValueError(f"unsupported measures: {sorted(bad)}")
    if mode == "delta":
        non_delta = {o for o, (fn, _) in measures.items() if fn not in _DELTA_FNS}
        if non_delta:
            raise ValueError(
                f"min/max are not delta-maintainable under deletes: "
                f"{sorted(non_delta)} — use mode='recount_groups'"
            )
    if not _count_cols(measures):
        raise ValueError("measures must include at least one 'count'")

    # NULL-correct sum maintenance (ADVICE r7): a state built with
    # group_agg(null_counts=True) carries <out>__nn per sum measure, and
    # the refresh preserves it — a group whose sum source is entirely
    # NULL stays NULL (exactly like the full recompute) instead of
    # collapsing to 0 through the coalesce arithmetic.  Without the __nn
    # columns the legacy contract applies: sum sources must be non-null
    # (like the group keys); a partially-present set of __nn columns is
    # a malformed state and raises.
    sums = _sum_measures(measures)
    nn_present = [out for out in sums if _nn_col(out) in state.columns]
    if nn_present and len(nn_present) != len(sums):
        raise ValueError(
            "state has null-count columns for only some sum measures: "
            f"{sorted(nn_present)} of {sorted(sums)} — rebuild with "
            "group_agg(null_counts=True)"
        )
    track_nn = bool(nn_present)

    changed = F.broadcast(diff.select(id_col).distinct())
    old_rows = old.join(changed, id_col, "left_semi")
    new_rows = new.join(changed, id_col, "left_semi")

    if mode == "recount_groups":
        # groups owning any changed row, on either side of the change
        affected = F.broadcast(
            old_rows.select(*keys).unionByName(new_rows.select(*keys)).distinct()
        )
        recomputed = group_agg(
            new.join(affected, keys, "left_semi"), keys, measures,
            null_counts=track_nn,
        )
        untouched = state.join(affected, keys, "left_anti")
        return untouched.unionByName(recomputed)

    # delta mode: subtract old contributions, add new ones, in ONE
    # churn-sized aggregate; only the changed rows are ever read.
    def _signed(df: DataFrame, sign: int) -> DataFrame:
        cols = [F.col(k) for k in keys]
        for out, (fn, src) in measures.items():
            if fn == "sum":
                cols.append((F.lit(sign) * F.col(src)).alias(out))
            else:  # count
                cols.append(F.lit(sign).cast("long").alias(out))
        if track_nn:
            for out, src in sums.items():
                cols.append(
                    (F.lit(sign) * F.col(src).isNotNull().cast("long")).alias(
                        _nn_col(out)
                    )
                )
        return df.select(*cols)

    merged_cols = list(measures) + ([_nn_col(o) for o in sums] if track_nn else [])
    deltas = (
        _signed(old_rows, -1)
        .unionByName(_signed(new_rows, +1))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in merged_cols])
    )
    s = state.alias("s")
    d = deltas.alias("d")

    def _merged(col: str) -> Column:
        return F.coalesce(F.col(f"s.{col}"), F.lit(0)) + F.coalesce(
            F.col(f"d.{col}"), F.lit(0)
        )

    out_exprs = []
    for out in measures:
        if track_nn and out in sums:
            # NULL iff no non-null source rows remain in the group
            out_exprs.append(
                F.when(_merged(_nn_col(out)) > 0, _merged(out))
                .otherwise(F.lit(None))
                .alias(out)
            )
        else:
            out_exprs.append(_merged(out).alias(out))
    if track_nn:
        out_exprs += [_merged(_nn_col(o)).alias(_nn_col(o)) for o in sums]

    merged = s.join(d, keys, "full_outer").select(
        *[F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in keys],
        *out_exprs,
    )
    liveness = _count_cols(measures)[0]
    return merged.where(F.col(liveness) > 0)
