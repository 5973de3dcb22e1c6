"""Composite operators Spark lacks natively (SURVEY.md §2.3)."""

from nineinfra_spark.operators.asof import asof_join
from nineinfra_spark.operators.ivf import IvfTrainResult, assign_cells, refine_centroids
from nineinfra_spark.operators.ivf import train as ivf_train

__all__ = [
    "asof_join",
    "assign_cells",
    "refine_centroids",
    "ivf_train",
    "IvfTrainResult",
]
