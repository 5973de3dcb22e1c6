"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

Every Python-execution path the engine exposes, each with a SQL
oracle (the kernels are deterministic, so DuckDB replicates the
semantics in plain SQL):

- row-at-a-time scalar UDF (``F.udf``) — registered AND used from
  SQL via ``spark.udf.register``;
- vectorized scalar pandas UDF (Arrow batches) — see also
  ``ext_similarity.ann_cosine_topk_pandas``;
- grouped-aggregate pandas UDF (UDAF);
- grouped-map ``applyInPandas`` (the custom-operator escape hatch);
- table function via ``explode`` / LATERAL VIEW — see also
  ``ext_text.text_token_topk``.

Scale guidance encoded in the docstrings: row-at-a-time UDFs
serialize per row (10-100× slower than Arrow) and exist for API
parity; every hot-path kernel in this repo uses built-ins or pandas
UDFs. Aggregations done in pandas keep exactness by summing integral
doubles (any summation order is exact below 2^53).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.registry import query


def _qty_band(q: float) -> str:
    """Scalar kernel: quantity banding (pure, deterministic)."""
    if q is None:
        return "unknown"
    if q < 10:
        return "low"
    if q < 30:
        return "mid"
    return "high"


#: NULL branch stated explicitly so the SQL CASE agrees with the
#: kernel's ``None -> 'unknown'`` — without it, CASE falls through to
#: ELSE 'high' and the two definitions silently diverge on NULL input.
_BAND_ORACLE = """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity IS NULL THEN 'unknown'
                WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS band
    FROM lineitem
"""


@query("udf_scalar_python", oracle=_BAND_ORACLE, tags=("udf", "scalar"))
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (API parity; the SLOW path — each row
    crosses the JVM↔Python boundary pickled. Anything expressible as
    built-ins should be built-ins; this exact logic is one CASE WHEN,
    which is how the oracle states it)."""
    band = F.udf(_qty_band, "string")
    li = t(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", band("l_quantity").alias("band"))


@query("udf_sql_registered", oracle=_BAND_ORACLE, tags=("udf", "sql"))
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same kernel registered into the SQL function namespace
    (``spark.udf.register``) and invoked from SQL text — the path a
    Kyuubi-style SQL gateway user would take (≙ registered functions
    over the SQL frontends, ``ninecluster_metadata.go:22-27``)."""
    spark.udf.register("qty_band", _qty_band, "string")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        "SELECT l_orderkey, l_linenumber, qty_band(l_quantity) AS band FROM lineitem_v"
    )


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: Arrow batch in, numpy arithmetic
    across the whole batch, Arrow batch out — the 10-100×-faster
    Python path. The kernel is pure elementwise float64 arithmetic,
    so results are bit-identical to the SQL expression."""

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "udf_grouped_agg_pandas",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(l_quantity) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf", "pandas"),
)
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface): per-group series →
    scalar. Exactness: l_quantity is integral, so sums are exact in
    float64 regardless of pandas' summation order — the same
    order-independence discipline the decimal casts give the built-in
    aggs."""

    @pandas_udf("double")
    def qty_sum(q: pd.Series) -> float:
        return float(q.sum())

    @pandas_udf("long")
    def qty_n(q: pd.Series) -> int:
        return int(q.count())

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(qty_sum("l_quantity").alias("sum_qty"), qty_n("l_quantity").alias("n"))
        .select(
            "l_returnflag",
            "sum_qty",
            "n",
            (F.col("sum_qty") / F.col("n")).alias("avg_qty"),
        )
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT l_returnflag,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           COUNT(*) AS n,
           CAST(MAX(l_quantity) - MIN(l_quantity) AS DOUBLE) AS qty_range
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "grouped-map", "applyInPandas"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: whole group as one pandas frame →
    arbitrary frame out. THE escape hatch for operators Spark lacks
    (per-group model fits, custom normalizations). Memory contract at
    scale: one group must fit in one executor's memory — group by
    something bounded, never by a skewed key (same rule as the
    reference's shuffle-disk sizing, kyuubi.go:115-122)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "min_qty": [float(q.min())],
                "max_qty": [float(q.max())],
                "n": [int(len(q))],
                "qty_range": [float(q.max() - q.min())],
            }
        )

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(
        stats,
        "l_returnflag string, min_qty double, max_qty double, n long, qty_range double",
    )


@query(
    "udf_python_udtf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(i AS INT) AS part_idx,
           CAST(CASE WHEN (i + 1) * 10 <= l_quantity THEN 10
                     ELSE l_quantity - i * 10 END AS DOUBLE) AS part_qty
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               unnest(generate_series(0, CAST(ceil(l_quantity / 10) AS BIGINT) - 1)) AS i
        FROM lineitem WHERE l_quantity > 0
    )
    """,
    tags=("udf", "udtf"),
    min_spark="3.5",  # Python UDTF

)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Python UDTF (``@udtf`` class, Spark 3.5+): one input row →
    N output rows from Python, invoked as a LATERAL table function
    from SQL — the genuine UDTF surface next to the explode-shaped
    stand-in (``ext_text.text_token_topk``). The kernel splits each
    lineitem quantity into full units of 10 plus a remainder
    (deterministic, so DuckDB replicates it with generate_series).

    Scale note: like the two scalar API-parity queries, this is the
    SLOW path (``BatchEvalPythonUDTF`` — rows cross the JVM↔Python
    boundary; the eval generator runs per row). Anything expressible
    as explode/sequence should be — see text_chunk_windows for the
    built-in-only equivalent shape. Exists to witness the API, and is
    allow-listed as such in tests/test_plan_lint.py."""
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="part_idx int, part_qty double")
    class SplitQuantity:
        def eval(self, q):
            if q is None:
                return
            q = float(q)
            if q <= 0:
                return
            for i in range(int(math.ceil(q / 10.0))):
                yield i, 10.0 if (i + 1) * 10 <= q else q - i * 10.0

    spark.udtf.register("split_qty", SplitQuantity)
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, s.part_idx, s.part_qty
        FROM lineitem_v, LATERAL split_qty(l_quantity) s
        WHERE l_quantity > 0
        """
    )
