"""Capture the OPTIMIZATION-round plan evidence that registered-query
explains cannot show: the iterative operators hide their per-round
work behind localCheckpoint RDD scans, so the committed
plans/r16/<query>_{before,after}.txt for the cluster/pagerank queries
only show the final stage. This script explains the INTERNAL
subtrees directly:

- one star-contraction materialization unit over a synthetic
  checkpointed edge set (per-round before / two-round batch after);
- the pagerank edge build (lineitem ⋈ orders → distinct pairs).

Usage: python scripts/capture_subplans_r16.py <suffix>
Writes plans/r16/star_contract_unit_<suffix>.txt and
plans/r16/pagerank_edges_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "cur"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    from nineinfra_spark.engine import Engine

    engine = Engine().open()
    spark = engine.spark

    def _explain(df, fname: str) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(plan)
        print(f"-> {fname}", flush=True)

    # --- star contraction: one materialization unit -------------------
    # The loop materializes via lazy localCheckpoint + count; this is
    # the exact plan of one such unit (whatever the current code does
    # between two checkpoints) over a representative checkpointed
    # canonical edge set.
    from pyspark.sql import functions as F

    from nineinfra_spark.operators import components as C

    edges = (
        spark.range(0, 2000)
        .select(
            (F.col("id") + 1 + F.pmod(F.xxhash64("id"), F.lit(977))).alias("x"),
            F.col("id").alias("y"),
        )
        .select(
            F.greatest("x", "y").alias("hi"), F.least("x", "y").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    edges.count()
    # mirror EXACTLY what one loop round materializes (detected by
    # source inspection so the same script captures the before and
    # after shapes): the fused form dedupes + convergence-compares in
    # the same groupBy; the original form distinct-ed inside
    # _small_star and counted separately.
    import inspect

    src = inspect.getsource(C.star_contract)
    if "_in_nxt" in src:
        unit = (
            C._small_star(C._large_star(edges))
            .select("hi", "lo", F.lit(1).alias("_t"))
            .unionAll(edges.select("hi", "lo", F.lit(-1).alias("_t")))
            .groupBy("hi", "lo")
            .agg(
                (F.max("_t") == 1).alias("_in_nxt"),
                (F.min("_t") == -1).alias("_in_prev"),
            )
        )
    else:
        unit = C._small_star(C._large_star(edges))
    _explain(unit, f"star_contract_unit_{suffix}.txt")

    # --- pagerank edge build ------------------------------------------
    from nineinfra_spark.plans._util import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    try:
        from nineinfra_spark.plans.graph import graph_pagerank_fixed  # noqa: F401
        # re-create the pairs subtree exactly as the query builds it,
        # including the spread if present
        import nineinfra_spark.plans.graph as G

        gsrc = inspect.getsource(G.graph_pagerank_fixed)
        if "spread(" in gsrc:
            from nineinfra_spark.plans._util import spread

            li = spread(li, "l_orderkey")
    except Exception:
        pass
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    _explain(pairs, f"pagerank_edges_{suffix}.txt")

    engine.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
