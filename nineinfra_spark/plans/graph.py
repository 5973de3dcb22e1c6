"""Graph analytics queries (beyond-survey: iterative algorithms).

Connected components lives with the dedup family (``ext_dedup.
dedup_connected_clusters`` — clustering is its pipeline role); this
module holds graph analytics proper. Reference parity: the reference
platform reserves an analytics cluster type over the same warehouse
tables (``api/v1alpha1/ninecluster_types.go:31-38``); ranking
entities by relationship structure is the canonical such workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.registry import query

#: 3 fixed power-iteration rounds — enough to separate hubs from the
#: teleport floor while keeping the oracle's unrolled-CTE form short.
PR_ITERS = 3
PR_TOP = 10

_PAGERANK_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                    's:' || CAST(l_suppkey AS VARCHAR) AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
    SELECT c AS src, s AS dst FROM pairs
    UNION ALL
    SELECT s AS src, c AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
r1 AS (
    SELECT n.node, CAST(150000000000 + COALESCE(SUM(
               85 * (r.rank // (100 * d.outdeg))
               + (85 * (r.rank % (100 * d.outdeg))) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
    FROM nodes n
    LEFT JOIN edges e ON e.dst = n.node
    LEFT JOIN r0 r ON r.node = e.src
    LEFT JOIN deg d ON d.src = e.src
    GROUP BY n.node
),
r2 AS (
    SELECT n.node, CAST(150000000000 + COALESCE(SUM(
               85 * (r.rank // (100 * d.outdeg))
               + (85 * (r.rank % (100 * d.outdeg))) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
    FROM nodes n
    LEFT JOIN edges e ON e.dst = n.node
    LEFT JOIN r1 r ON r.node = e.src
    LEFT JOIN deg d ON d.src = e.src
    GROUP BY n.node
),
r3 AS (
    SELECT n.node, CAST(150000000000 + COALESCE(SUM(
               85 * (r.rank // (100 * d.outdeg))
               + (85 * (r.rank % (100 * d.outdeg))) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
    FROM nodes n
    LEFT JOIN edges e ON e.dst = n.node
    LEFT JOIN r2 r ON r.node = e.src
    LEFT JOIN deg d ON d.src = e.src
    GROUP BY n.node
)
SELECT node, rank, pr_rank FROM (
    SELECT node, rank,
           ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS pr_rank
    FROM r3
) ranked
WHERE pr_rank <= 10
"""


@query(
    "graph_pagerank_fixed",
    oracle=_PAGERANK_ORACLE,
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph — the
    iterative-analytics representative alongside connected components:
    nodes are customers and suppliers, with a directed edge each way
    for every (customer, supplier) pair that traded (distinct pairs
    from lineitem ⋈ orders), so hub suppliers and broad-basket
    customers accumulate rank. 3 exact integer power-iteration rounds
    (``operators/pagerank.pagerank_fixed``: floor-division mass
    transfer, no float summation), then the top 10 nodes with a
    deterministic (rank DESC, node) tiebreak.

    The oracle states the SAME integer recurrence as a 3-step
    unrolled CTE chain — fixed iteration count is what makes an
    iterative algorithm ANSI-SQL-expressible, so this query is fully
    hash-verified rather than rows-only.

    Scale posture: edge construction is one distinct over the fact
    join's key pair; each round is one equi-join on src + one
    map-side-combined sum on dst — iters × |E| total shuffle, no
    convergence tail; ranks stay |V|-sized (dimension-scale against
    the edge fact)."""
    from nineinfra_spark.operators.pagerank import pagerank_fixed

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank_fixed(edges, iters=PR_ITERS)
    from pyspark.sql import Window

    # TakeOrdered(10) first — distributed per-partition top-k merge —
    # then the ranking window runs over just 10 rows (a global
    # row_number over all |V| nodes would single-partition them).
    top = ranks.orderBy(F.desc("rank"), "node").limit(PR_TOP)
    w = Window.orderBy(F.desc("rank"), "node")
    return top.withColumn("pr_rank", F.row_number().over(w)).select(
        "node", "rank", "pr_rank"
    )
