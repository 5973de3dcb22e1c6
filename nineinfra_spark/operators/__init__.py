"""Composite operators Spark lacks natively (SURVEY.md §2.3)."""

from nineinfra_spark.operators.asof import asof_join
from nineinfra_spark.operators.ivf import IvfTrainResult, assign_cells, refine_centroids
from nineinfra_spark.operators.ivf import train as ivf_train
from nineinfra_spark.operators.merge import merge_into_table, merge_upsert
from nineinfra_spark.operators.skew import salted_join
from nineinfra_spark.operators.zorder import zorder_write, zvalue_column

__all__ = [
    "asof_join",
    "assign_cells",
    "refine_centroids",
    "ivf_train",
    "IvfTrainResult",
    "merge_upsert",
    "merge_into_table",
    "salted_join",
    "zorder_write",
    "zvalue_column",
]
