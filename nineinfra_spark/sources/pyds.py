"""Custom source connector via Spark's Python DataSource API.

The reference platform's connector story is pluggable sources in
front of the engine (JDBC/object-store/Kafka wired by the operator,
``internal/controller/kyuubi.go:59-106``); Spark 4's Python DataSource
API (SPARK-44076) is the native way to ADD such a connector without a
JVM build. This module implements one end-to-end: ``nine_synth``, a
deterministic synthetic-events source (the load-generator/backfill
connector every pipeline keeps around), registered with
``spark.dataSource.register`` and read with
``spark.read.format("nine_synth")``.

Scale design: ``partitions()`` splits the keyspace into CONTIGUOUS
RANGES, one ``InputPartition`` per task — the executor-parallel shape
(each task generates only its slice; nothing flows through the
driver). Rows derive from md5(key) arithmetic, so any engine — or the
DuckDB oracle — reproduces the exact relation from the parameters
alone. Generation is Python-per-row, which is the API's contract for
a SOURCE (the rows don't exist anywhere cheaper); everything
downstream of the scan is ordinary JVM/codegen.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: value scale: cents derived from a 60-bit md5 slice
VALUE_MOD = 1_000_000
USER_MOD = 1_000
EPOCH = "2024-01-01 00:00:00"


def synth_row(k: int) -> tuple[int, int, int, float]:
    """The deterministic row for key ``k`` — factored out so tests and
    oracles can state the generator in one place:
    ``user_id = md5_60(k) % USER_MOD``, ``value = (md5_60(k) //
    USER_MOD % VALUE_MOD) / 100`` (exact cents), ``ts_offset_s = k``.
    """
    import hashlib

    h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
    return (k, h % USER_MOD, k, (h // USER_MOD % VALUE_MOD) / 100.0)


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("numPartitions", 8))

    def partitions(self):
        # contiguous key ranges, one per task
        step = -(-self.n // self.parts)
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for k in range(lo, hi):
            yield synth_row(k)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg of the connector: the OFFSET is simply the next
    unread key, so progress is exact, replays (``readBetweenOffsets``,
    invoked on recovery) regenerate the identical rows, and
    exactly-once falls out of determinism + offset tracking — the
    contract a Kafka-style reader implements with real offsets."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.step = int(options.get("step", 100))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.step, self.n)
        return iter([synth_row(k) for k in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter([synth_row(k) for k in range(start["pos"], end["pos"])])


class SynthEventsSource(DataSource):
    """``format("nine_synth")`` — batch and streaming. Options:
    ``n`` (row count), ``numPartitions`` (batch task parallelism),
    ``step`` (streaming rows per micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return "nine_synth"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, ts_offset_s bigint, value double"

    def reader(self, schema):
        return _SynthReader(self.options)

    def simpleStreamReader(self, schema):
        return _SynthStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector on ``spark``."""
    spark.dataSource.register(SynthEventsSource)
