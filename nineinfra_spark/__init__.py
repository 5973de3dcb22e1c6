"""nineinfra_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the lakehouse
platform the reference operator (nineinfra/nineinfra) provisions:
Spark SQL query surface over a warehouse catalog, batch + streaming
processing, and large-scale data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

The reference is a Go Kubernetes operator that deploys Kyuubi +
Spark 3.2.4 + Hive Metastore + MinIO (see SURVEY.md §0); all query
semantics it offers are Spark SQL semantics. This package provides
the same capabilities natively in PySpark with an in-process
SparkSession instead of a K8s control plane.
"""

from nineinfra_spark.engine import Engine, EngineConfig, get_spark

__all__ = ["Engine", "EngineConfig", "get_spark"]
__version__ = "0.1.0"
