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

from nineinfra_spark.plans._util import spread, t
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

    # spread: the single-file lineitem scan otherwise runs the whole
    # broadcast probe + partial distinct on one core (no-op on a real
    # many-file corpus — see _util.spread; same shape as the q-series
    # lineitem paths this round)
    li = spread(
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"),
        "l_orderkey",
    )
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


# -- triangle counting ------------------------------------------------------

#: Keep only co-occurrence edges with this much support: raw pair
#: projections of a basket graph densify quadratically with basket
#: count; thresholding keeps the statistically-supported subgraph (the
#: production choice for any co-occurrence graph).
TRI_MIN_SUPPORT = 2

_TRIANGLE_ORACLE = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
    SELECT u, v FROM pairs GROUP BY u, v HAVING COUNT(*) >= 2
),
deg AS (
    SELECT node, COUNT(*) AS d
    FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
    GROUP BY node
),
tri AS (
    SELECT COUNT(*) AS n_tri
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
),
agg AS (
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COALESCE(SUM(d * (d - 1) // 2), 0) FROM deg) AS n_wedges,
           (SELECT n_tri FROM tri) AS n_triangles
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(CASE WHEN n_wedges > 0
                 THEN 10000 * 3 * n_triangles // n_wedges
            END AS BIGINT) AS clustering_bps
FROM agg
"""


@query(
    "graph_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    tags=("graph", "triangle", "bounded-nlj"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the part
    co-occurrence graph (parts bought together in ≥``TRI_MIN_SUPPORT``
    orders — the market-basket projection, thresholded so the graph
    doesn't densify with basket count).

    Scale posture: the Spark side counts triangles by DEGREE-ORDERED
    orientation (``operators/triangles.py::triangle_stats``; Suri &
    Vassilvitskii, WWW'11): every edge points from
    its (degree, id)-smaller endpoint to the larger, making a DAG in
    which each triangle u≺v≺w is found exactly once as wedge
    (u→v, u→w) closed by edge v→w. Out-degrees under this orientation
    are O(√m), so the wedge join is O(m^1.5) WORST CASE — a hub of
    degree d costs d² wedges under the oracle's id-ordered join but
    only ~m wedges here, which is why the id-ordered form is the
    ORACLE and the degree-ordered form is the plan. Basket pairing is
    bounded per order (baskets are small); every join is an equi-join;
    the only nested-loop is the tagged 1-row stats combine. Wedge
    count for the coefficient comes from the degree table
    (Σ d(d−1)/2), never from materializing wedges.

    Reference parity: graph analytics over warehouse tables is the
    reference's reserved analytics-cluster workload
    (``api/v1alpha1/ninecluster_types.go:31-38``)."""
    from nineinfra_spark.operators.triangles import triangle_stats

    return triangle_stats(_cooccur_edges(spark, sf_dir))


def _cooccur_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded part co-occurrence edges (u < v canonical, distinct,
    support ≥ TRI_MIN_SUPPORT) — shared by the triangle and
    link-prediction queries. Basket pairing is bounded per order;
    the threshold keeps the projection from densifying with basket
    count."""
    # One orderkey-keyed exchange feeds the dedup AND both sides of
    # the basket self-join (r16, guide §2.4 "two operations keyed the
    # same way can share one exchange"): hash-partitioning on
    # l_orderkey satisfies the (l_orderkey, l_partkey) dedup's
    # clustered distribution (subset rule) and the join's orderkey
    # distribution, so neither adds its own shuffle — the former
    # shape paid a (l_orderkey, l_partkey) distinct exchange plus a
    # separate orderkey join exchange. `spread` doubles as the
    # single-file scan parallelizer and no-ops on a real corpus,
    # where the distinct's own exchange re-establishes exactly the
    # old plan.
    li = spread(
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    ).dropDuplicates(["l_orderkey", "l_partkey"])
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
    )
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )


# -- link prediction --------------------------------------------------------

LP_TOP = 20

#: Same integer half-up 6-dp Jaccard as the dedup family: identical
#: integer operands → identical double on both engines → stable order.
_LP_JAC_SPARK = (
    "(2000000 * common + union_sz) div (2 * union_sz) / 1e6"
)
_LP_JAC_DUCK = "((2000000 * common + union_sz) // (2 * union_sz)) / 1e6"

_LINKPRED_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
prs AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM prs GROUP BY u, v HAVING COUNT(*) >= 2),
adj AS (
    SELECT u AS node, v AS nbr FROM edges
    UNION ALL SELECT v, u FROM edges
),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
common AS (
    SELECT x.node AS u, y.node AS v, COUNT(*) AS common
    FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
    GROUP BY x.node, y.node
),
cand AS (
    SELECT c.u, c.v, c.common, du.d + dv.d - c.common AS union_sz
    FROM common c
    JOIN deg du ON du.node = c.u
    JOIN deg dv ON dv.node = c.v
    LEFT JOIN edges e ON e.u = c.u AND e.v = c.v
    WHERE e.u IS NULL
)
SELECT u, v, CAST(common AS BIGINT) AS common,
       CAST(union_sz AS BIGINT) AS union_sz,
       {_LP_JAC_DUCK} AS jaccard
FROM cand
ORDER BY jaccard DESC, u, v
LIMIT {LP_TOP}
"""


@query(
    "graph_link_prediction",
    oracle=_LINKPRED_ORACLE,
    tags=("graph", "link-prediction"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction over the part co-occurrence graph: for
    NON-adjacent node pairs sharing at least one neighbor, score
    |N(u)∩N(v)| / |N(u)∪N(v)| and surface the top-{LP_TOP} predicted
    links — the neighborhood-overlap recommender primitive
    ("customers who buy u's companions also buy v").

    Scale posture: common-neighbor pairs come from ONE wedge
    equi-join keyed on the shared neighbor — bounded here by the
    support threshold's degree cap (a raw hub of degree d would emit
    d² wedges; at web scale, degree-cap or orient the wedge join
    exactly as `operators/triangles.py` does). Degrees join from the
    dimension-sized degree table; existing edges drop by anti-join;
    the head is TakeOrderedAndProject, never a global sort. The
    score uses the repo's integer half-up 6-dp Jaccard, then one IEEE
    division of identical operands — order-stable cross-engine."""
    edges = _cooccur_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
    adj = adj.localCheckpoint(eager=False)
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))

    x = adj.select(F.col("node").alias("u"), "nbr")
    y = adj.select(F.col("node").alias("v"), "nbr")
    common = (
        x.join(y, "nbr")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    cand = (
        common.join(edges, ["u", "v"], "left_anti")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("common").cast("bigint").alias("common"),
            (F.col("du") + F.col("dv") - F.col("common"))
            .cast("bigint")
            .alias("union_sz"),
        )
    )
    return (
        cand.select(
            "u", "v", "common", "union_sz",
            F.expr(_LP_JAC_SPARK).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(LP_TOP)
    )
