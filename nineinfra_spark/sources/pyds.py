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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
        # validate at plan time with a clear message instead of an
        # opaque range()/ZeroDivisionError planning failure (r11
        # review finding); n=0 is a legitimate empty scan
        if self.n < 0:
            raise ValueError(f"nine_synth: n must be >= 0, got {self.n}")
        if self.parts < 1:
            raise ValueError(
                f"nine_synth: numPartitions must be >= 1, got {self.parts}"
            )

    def partitions(self):
        if self.n == 0:
            return [InputPartition((0, 0))]  # one empty split
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


def topic_row(topic: str, k: int) -> tuple[str, int, int, float]:
    """Deterministic row ``k`` of ``topic`` (the multi-topic analog of
    :func:`synth_row` — payload derives from md5(topic/k), so replays
    and oracles regenerate identical rows from the coordinates)."""
    import hashlib

    h = int(hashlib.md5(f"{topic}/{k}".encode()).hexdigest()[:15], 16)
    return (topic, k, h % USER_MOD, (h // USER_MOD % VALUE_MOD) / 100.0)


def _parse_topics(options) -> dict[str, int]:
    """``topics`` option: comma list of ``name:rowcount``."""
    spec = options.get("topics", "")
    topics: dict[str, int] = {}
    for part in spec.split(","):
        name, _, cnt = part.partition(":")
        if name.strip():
            try:
                topics[name.strip()] = int(cnt)
            except ValueError:
                raise ValueError(
                    f"nine_topics: malformed topics entry {part.strip()!r} "
                    "— expected name:rowcount (e.g. 'orders:500')"
                ) from None
    if not topics:
        raise ValueError("nine_topics: 'topics' option required (name:count,...)")
    negative = sorted(t for t, n in topics.items() if n < 0)
    if negative:
        # a negative count would silently drive the streaming offset
        # math BACKWARDS (negative remaining → negative shares) instead
        # of failing at plan time (r13 review pass)
        raise ValueError(f"nine_topics: negative row counts for {negative}")
    return topics


def _subscribed(options, topics: dict[str, int]) -> list[str]:
    """Kafka-shaped subscription: ``subscribePattern`` (anchored regex
    over topic names, Kafka's pattern-subscribe) or ``subscribe``
    (comma list). Exactly one, like ``kafka_options`` enforces."""
    import re

    pattern = options.get("subscribePattern")
    explicit = options.get("subscribe")
    if (pattern is None) == (explicit is None):
        raise ValueError(
            "nine_topics: exactly one of subscribe/subscribePattern required"
        )
    if pattern is not None:
        names = [t for t in sorted(topics) if re.fullmatch(pattern, t)]
    else:
        names = [t.strip() for t in explicit.split(",") if t.strip()]
        unknown = sorted(set(names) - set(topics))
        if unknown:
            raise ValueError(f"nine_topics: unknown topics {unknown}")
    if not names:
        raise ValueError("nine_topics: subscription matched no topics")
    return sorted(names)


class _TopicsBatchReader(DataSourceReader):
    """Batch leg: one InputPartition per topic — the same task mapping
    the Kafka batch source uses (one task per topic-partition)."""

    def __init__(self, options):
        self.topics = _parse_topics(options)
        self.names = _subscribed(options, self.topics)

    def partitions(self):
        return [InputPartition((t, self.topics[t])) for t in self.names]

    def read(self, partition):
        topic, n = partition.value
        for k in range(n):
            yield topic_row(topic, k)


class _TopicsStreamReader(SimpleDataSourceStreamReader):
    """Kafka-shaped offset contract over named topics:

    - OFFSET is ``{topic: next_unread_row}`` — the same shape as
      Kafka's ``{topic: {partition: offset}}`` offset JSON, collapsed
      to one partition per topic.
    - ``subscribePattern`` selects topics by anchored regex at reader
      construction (Kafka's pattern subscribe); only subscribed topics
      appear in offsets.
    - ``maxOffsetsPerTrigger`` caps TOTAL rows per micro-batch,
      apportioned over topics PROPORTIONALLY to their remaining
      backlog — Kafka's rate-limit distribution — with a
      deterministic floor-then-remainder split so a crash/replay
      (``readBetweenOffsets``) regenerates byte-identical batches.
    """

    def __init__(self, options):
        self.topics = _parse_topics(options)
        self.names = _subscribed(options, self.topics)
        cap = options.get("maxOffsetsPerTrigger")
        self.cap = int(cap) if cap is not None else None

    def initialOffset(self):
        return {t: 0 for t in self.names}

    def _split(self, start):
        """Per-topic row counts for the next batch under the cap."""
        remaining = {t: self.topics[t] - start.get(t, 0) for t in self.names}
        total = sum(remaining.values())
        if total == 0:
            return {t: 0 for t in self.names}
        take = total if self.cap is None else min(total, self.cap)
        shares = {t: take * remaining[t] // total for t in self.names}
        leftover = take - sum(shares.values())
        for t in self.names:  # deterministic remainder assignment
            if leftover == 0:
                break
            room = remaining[t] - shares[t]
            bump = min(room, leftover)
            shares[t] += bump
            leftover -= bump
        return shares

    def read(self, start):
        shares = self._split(start)
        rows = [
            topic_row(t, k)
            for t in self.names
            for k in range(start.get(t, 0), start.get(t, 0) + shares[t])
        ]
        end = {t: start.get(t, 0) + shares[t] for t in self.names}
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        return iter(
            [
                topic_row(t, k)
                for t in self.names
                for k in range(start.get(t, 0), end.get(t, 0))
            ]
        )


class TopicsSource(DataSource):
    """``format("nine_topics")`` — multi-topic batch + streaming with
    Kafka-shaped subscription and rate-cap semantics (the contract
    tests for the env-blocked Kafka e2e leg; ``sources/readers.py:
    kafka_options`` builds the real options for a brokered cluster).
    Options: ``topics`` (``name:count,...``), exactly one of
    ``subscribe``/``subscribePattern``, optional
    ``maxOffsetsPerTrigger``."""

    @classmethod
    def name(cls) -> str:
        return "nine_topics"

    def schema(self) -> str:
        return "topic string, event_id bigint, user_id bigint, value double"

    def reader(self, schema):
        return _TopicsBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _TopicsStreamReader(self.options)


# -- custom SINK connector (Python DataSource writer) -----------------------


@dataclass
class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file this task produced.
    Travels executor → driver, so it must stay picklable-simple."""

    staged: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    """Task-side writer + driver-side commit protocol for the
    ``nine_jsonl`` sink. Each task writes its rows to a UNIQUELY-NAMED
    staging file (never a final name — concurrent/zombie attempts of
    the same task can't collide) and reports it in its commit message;
    the DRIVER's ``commit`` renames the acknowledged stagings to
    ``part-<i>.jsonl`` and writes ``_MANIFEST.json`` LAST — the commit
    point. A reader trusts only manifested files, so a job that dies
    before commit (or whose ``abort`` ran) is invisible no matter what
    staging debris remains. This is the same
    stage→rename→manifest shape as ``operators/objstore.py``'s
    publish, at the connector layer."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("nine_jsonl sink requires option 'path'")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    # executor-side: one call per task
    def write(self, iterator) -> _JsonlCommit:
        import base64 as _b64
        import datetime as _dt
        import decimal as _dec
        import json as _json
        import os as _os
        import uuid as _uuid

        def _default(o):
            # JSON-encode the non-native Spark row types instead of
            # crashing every task with a bare TypeError (r11 review
            # finding): timestamps/dates → ISO strings, decimals →
            # exact strings, binary → base64. Anything else is still
            # a loud failure.
            if isinstance(o, (_dt.datetime, _dt.date, _dt.time)):
                return o.isoformat()
            if isinstance(o, _dec.Decimal):
                return str(o)
            if isinstance(o, (bytes, bytearray)):
                return _b64.b64encode(bytes(o)).decode("ascii")
            raise TypeError(
                f"nine_jsonl cannot encode {type(o).__name__} values"
            )

        _os.makedirs(self.path, exist_ok=True)
        staged = _os.path.join(
            self.path, f".staging-{_uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(
                    _json.dumps(
                        dict(zip(self.fields, row)),
                        sort_keys=True,
                        default=_default,
                    )
                )
                f.write("\n")
                n += 1
        return _JsonlCommit(staged=staged, rows=n)

    # driver-side: all tasks succeeded
    def commit(self, messages) -> None:
        import json as _json
        import os as _os

        existing: list[dict] = []
        start = 0
        if not self.overwrite:
            # mode("append") extends the previous commit instead of
            # destroying it (r11 review finding: part names restarted
            # at part-00000, os.replace clobbered the old files and
            # the rewritten manifest listed only the new ones). New
            # parts are numbered after every part file on disk —
            # manifested or stale — so nothing is ever overwritten,
            # and the manifest carries old + new.
            manifest_path = _os.path.join(self.path, "_MANIFEST.json")
            if _os.path.exists(manifest_path):
                with open(manifest_path, encoding="utf-8") as f:
                    existing = _json.load(f).get("files", [])
            for name in _os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".jsonl"):
                    idx = name[len("part-") : -len(".jsonl")]
                    if idx.isdigit():
                        start = max(start, int(idx) + 1)
        files = list(existing)
        for i, m in enumerate(messages):
            final = _os.path.join(self.path, f"part-{start + i:05d}.jsonl")
            _os.replace(m.staged, final)
            files.append({"file": _os.path.basename(final), "rows": m.rows})
        manifest = _os.path.join(self.path, "_MANIFEST.json")
        tmp = manifest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            _json.dump({"files": files}, f)
        _os.replace(tmp, manifest)
        if self.overwrite:
            # mode("overwrite") must not leave stale part files from a
            # previous LARGER commit: manifested readers would ignore
            # them, but a plain spark.read.json(dir) would see mixed
            # old/new data (r9 ADVICE finding). Delete every
            # part-*.jsonl not in this commit AFTER the manifest flips
            # (r10 ADVICE finding): a crash mid-deletion then leaves
            # only extra stale parts — visible solely to
            # manifest-ignoring readers — never a committed manifest
            # pointing at already-deleted files.
            keep = {f["file"] for f in files}
            for name in _os.listdir(self.path):
                if (
                    name.startswith("part-")
                    and name.endswith(".jsonl")
                    and name not in keep
                ):
                    _os.remove(_os.path.join(self.path, name))
            # also sweep orphaned .staging-* debris from earlier jobs
            # whose DRIVER died before commit/abort (r12 review
            # finding, the avro-sink sweep's twin). Overwrite mode
            # only: its contract already destroys concurrent state;
            # an append commit must not delete a concurrent writer's
            # live stagings, so append leaves them (readers never see
            # dot-files either way).
            ours = {_os.path.basename(m.staged) for m in messages}
            for name in _os.listdir(self.path):
                if name.startswith(".staging-") and name not in ours:
                    try:
                        _os.remove(_os.path.join(self.path, name))
                    except FileNotFoundError:
                        pass

    # driver-side: some task failed — drop every acknowledged staging
    def abort(self, messages) -> None:
        import os as _os

        for m in messages:
            if m is not None:
                try:
                    _os.remove(m.staged)
                except FileNotFoundError:
                    pass


class JsonlSinkSource(DataSource):
    """``format("nine_jsonl")`` — a custom SINK through the Python
    DataSource writer API: manifest-committed JSON-lines files (see
    ``_JsonlWriter``). The batch-write twin of the ``nine_synth`` /
    ``nine_topics`` readers."""

    @classmethod
    def name(cls) -> str:
        return "nine_jsonl"

    def writer(self, schema, overwrite: bool) -> _JsonlWriter:
        return _JsonlWriter(self.options, schema, overwrite)


def manifested_files(path: str) -> list[str]:
    """The committed file set: paths listed by ``_MANIFEST.json``.
    Raises if no manifest exists (an uncommitted/aborted write is NOT
    readable — that's the protocol, not an error path)."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as f:
        manifest = _json.load(f)
    return [_os.path.join(path, e["file"]) for e in manifest["files"]]


def register(spark) -> None:
    """Idempotently register the connectors on ``spark``."""
    spark.dataSource.register(SynthEventsSource)
    spark.dataSource.register(TopicsSource)
    spark.dataSource.register(JsonlSinkSource)
