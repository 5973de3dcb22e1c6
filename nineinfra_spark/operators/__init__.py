"""Composite operators Spark lacks natively (SURVEY.md §2.3)."""

from nineinfra_spark.operators.asof import asof_join

__all__ = ["asof_join"]
