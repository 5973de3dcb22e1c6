"""Kafka-semantics contract tests on the Python DataSource connector
(sources/pyds.py `nine_topics`): the broker-blocked Kafka e2e leg's
remaining semantics — pattern subscribe and maxOffsetsPerTrigger rate
capping — encoded into a connector whose offset contract has the same
shape as Kafka's, and proven under checkpoint recovery (VERDICT r8
item #7).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from nineinfra_spark.sources import pyds
from nineinfra_spark.sources.pyds import (
    _TopicsStreamReader,
    topic_row,
)

OUT = "/tmp/nineinfra_pyds_topics_test"

TOPICS = "orders.v1:50,orders.v2:30,audit:20"


class _Opts(dict):
    pass


def _reader(**kw):
    o = _Opts({"topics": TOPICS})
    o.update(kw)
    return _TopicsStreamReader(o)


# ---------- offset-contract unit level (no Spark needed) ----------


def test_pattern_subscribe_selects_matching_topics():
    r = _reader(subscribePattern=r"orders\..*")
    assert r.names == ["orders.v1", "orders.v2"]
    assert r.initialOffset() == {"orders.v1": 0, "orders.v2": 0}


def test_explicit_subscribe_list():
    r = _reader(subscribe="audit,orders.v2")
    assert r.names == ["audit", "orders.v2"]


def test_subscription_is_exactly_one_of():
    with pytest.raises(ValueError, match="exactly one"):
        _reader()
    with pytest.raises(ValueError, match="exactly one"):
        _reader(subscribe="audit", subscribePattern="a.*")
    with pytest.raises(ValueError, match="matched no topics"):
        _reader(subscribePattern="nomatch.*")
    with pytest.raises(ValueError, match="unknown topics"):
        _reader(subscribe="ghost")


def test_rate_cap_apportions_proportionally_to_backlog():
    """40-row cap over backlogs 50/30: Kafka's proportional
    distribution gives 25/15 (floor shares, deterministic remainder)."""
    r = _reader(subscribePattern=r"orders\..*", maxOffsetsPerTrigger="40")
    rows, end = r.read({"orders.v1": 0, "orders.v2": 0})
    rows = list(rows)
    assert len(rows) == 40
    assert end == {"orders.v1": 25, "orders.v2": 15}
    # second trigger drains the rest (backlog 25/15 → within cap)
    rows2, end2 = r.read(end)
    assert len(list(rows2)) == 40
    assert end2 == {"orders.v1": 50, "orders.v2": 30}
    # stream is exhausted: empty batch, offsets stable
    rows3, end3 = r.read(end2)
    assert list(rows3) == [] and end3 == end2


def test_rate_cap_never_exceeds_cap_across_uneven_backlogs():
    r = _reader(subscribePattern=".*", maxOffsetsPerTrigger="7")
    start = r.initialOffset()
    seen = []
    for _ in range(100):
        rows, end = r.read(start)
        rows = list(rows)
        if not rows:
            break
        assert len(rows) <= 7
        seen.extend(rows)
        start = end
    assert len(seen) == 100  # 50+30+20, nothing lost under capping
    assert len(set(seen)) == 100


def test_replay_between_offsets_is_exact():
    r = _reader(subscribePattern=r"orders\..*", maxOffsetsPerTrigger="40")
    rows, end = r.read(r.initialOffset())
    replayed = list(r.readBetweenOffsets(r.initialOffset(), end))
    assert sorted(replayed) == sorted(rows)


# ---------- Spark level ----------


def test_batch_read_partitions_per_topic(spark):
    pyds.register(spark)
    df = (
        spark.read.format("nine_topics")
        .option("topics", TOPICS)
        .option("subscribePattern", r"orders\..*")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one task per topic
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        [topic_row("orders.v1", k) for k in range(50)]
        + [topic_row("orders.v2", k) for k in range(30)]
    )
    assert got == want


def test_stream_restart_under_pattern_and_cap_is_exactly_once(spark):
    """Checkpoint kill/restart with BOTH semantics active: the offset
    log replays a capped, pattern-subscribed batch via
    readBetweenOffsets and the sink ends with every (topic, event_id)
    exactly once."""
    pyds.register(spark)
    sink = os.path.join(OUT, "sink")
    ckpt = os.path.join(OUT, "ckpt")
    for d in (sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def start(trigger):
        return (
            spark.readStream.format("nine_topics")
            .option("topics", TOPICS)
            .option("subscribePattern", r"orders\..*")
            .option("maxOffsetsPerTrigger", "16")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    q = start({"processingTime": "2 seconds"})
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p["batchId"] >= 1 for p in q.recentProgress):
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination()
    partial = spark.read.parquet(sink).count()
    assert 0 < partial < 80, partial

    q2 = start({"processingTime": "100 milliseconds"})
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.read.parquet(sink).count() >= 80:
                break
            time.sleep(0.3)
    finally:
        q2.stop()
        q2.awaitTermination()
    got = [(r["topic"], r["event_id"]) for r in spark.read.parquet(sink).collect()]
    assert len(got) == 80 and len(set(got)) == 80
    assert set(got) == {("orders.v1", k) for k in range(50)} | {
        ("orders.v2", k) for k in range(30)
    }
    # the audit topic never leaked past the pattern subscription
    assert all(t.startswith("orders.") for t, _ in got)


def test_negative_topic_count_rejected():
    """A negative row count would drive offset math backwards
    (negative remaining → negative shares) — refused at plan time."""
    o = _Opts({"topics": "good:5,bad:-3", "subscribe": "good"})
    with pytest.raises(ValueError, match="negative row counts.*bad"):
        _TopicsStreamReader(o)


# ---------- property sweep over the rate-split invariants ----------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(st.integers(0, 500), min_size=1, max_size=6),
    progress=st.data(),
    cap=st.one_of(st.none(), st.integers(0, 200)),
)
def test_split_invariants_property(counts, progress, cap):
    """r16 post-stamp property sweep of `_split` (the Kafka
    rate-apportioning core): for ANY topic layout, progress state, and
    cap — (a) the batch takes exactly min(cap, total_backlog) rows,
    (b) no topic is taken past its backlog, (c) no share is negative,
    (d) the split is a pure function of (start, topics, cap) — the
    determinism readBetweenOffsets replay correctness rests on."""
    topics = {f"t{i}": n for i, n in enumerate(counts)}
    spec = ",".join(f"{t}:{n}" for t, n in topics.items())
    opts = {"topics": spec, "subscribe": ",".join(topics)}
    if cap is not None:
        opts["maxOffsetsPerTrigger"] = str(cap)
    r = _TopicsStreamReader(opts)
    start = {
        t: progress.draw(st.integers(0, topics[t]), label=f"start[{t}]")
        for t in r.names
    }
    shares = r._split(start)
    remaining = {t: topics[t] - start[t] for t in r.names}
    total = sum(remaining.values())
    want_take = total if cap is None else min(total, cap)
    assert sum(shares.values()) == want_take
    for t in r.names:
        assert 0 <= shares[t] <= remaining[t], (t, shares, remaining)
    # determinism: identical inputs → identical split
    assert r._split(dict(start)) == shares


def test_malformed_topics_spec_clear_error():
    with pytest.raises(ValueError, match="malformed topics entry"):
        _TopicsStreamReader({"topics": "orders", "subscribe": "orders"})
    with pytest.raises(ValueError, match="malformed topics entry"):
        _TopicsStreamReader({"topics": "orders:abc", "subscribe": "orders"})
