"""Object-store move semantics against a REAL S3 API (moto server).

The publish protocol (operators/merge.py) commits via metastore
renames; on an s3a warehouse the DATA move under those renames is
per-object copy+delete — non-atomic in a way local-FS tests can never
show. These tests run the s3a-shaped move (operators/objstore.py)
against an in-process S3 endpoint speaking the real wire API:

- the mid-move crash leaves objects under BOTH prefixes (the split
  state), never under neither — so no crash loses data;
- re-running the move (roll-forward) from any crash point converges
  to the completed state — the property recover_versioned_table
  needs from storage when it replays an interrupted rename.

The Spark-side s3a leg (spark.read over s3a://) remains
environment-blocked: no hadoop-aws/AWS-SDK jar ships in this env's
pyspark (see NOTES.md r9 probe record).
"""

from __future__ import annotations

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from moto.server import ThreadedMotoServer  # noqa: E402

from nineinfra_spark.operators.objstore import list_prefix, rename_prefix  # noqa: E402

BUCKET = "datahouse"


@pytest.fixture(scope="module")
def s3():
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    client = boto3.client(
        "s3",
        endpoint_url=f"http://{host}:{port}",
        aws_access_key_id="test",
        aws_secret_access_key="test",
        region_name="us-east-1",
    )
    client.create_bucket(Bucket=BUCKET)
    yield client
    server.stop()


def _stage(s3, prefix: str, n: int) -> dict[str, bytes]:
    data = {}
    for i in range(n):
        key = f"{prefix}part-{i:05d}.parquet"
        body = f"row-group-{i}".encode()
        s3.put_object(Bucket=BUCKET, Key=key, Body=body)
        data[key.removeprefix(prefix)] = body
    return data


def _read_all(s3, prefix: str) -> dict[str, bytes]:
    return {
        k.removeprefix(prefix): s3.get_object(Bucket=BUCKET, Key=k)["Body"].read()
        for k in list_prefix(s3, BUCKET, prefix)
    }


def test_clean_move_transfers_every_object(s3):
    data = _stage(s3, "t1/live/", 7)
    n = rename_prefix(s3, BUCKET, "t1/live/", "t1/__v1/")
    assert n == 7
    assert list_prefix(s3, BUCKET, "t1/live/") == []
    assert _read_all(s3, "t1/__v1/") == data


def test_midmove_crash_leaves_split_state_never_loss(s3):
    """Crash after copying 3 of 6 objects: the S3 'rename' is visibly
    non-atomic — both prefixes hold objects — but every object exists
    under at least one prefix (no-loss invariant)."""
    data = _stage(s3, "t2/live/", 6)

    copied = []

    def crash_after_3(key):
        copied.append(key)
        if len(copied) == 3:
            raise RuntimeError("simulated writer death mid-copy")

    with pytest.raises(RuntimeError, match="mid-copy"):
        rename_prefix(s3, BUCKET, "t2/live/", "t2/__v1/", on_each=crash_after_3)

    src_left = _read_all(s3, "t2/live/")
    dst_got = _read_all(s3, "t2/__v1/")
    # split state: some objects on both sides (delete phase never ran)
    assert len(src_left) == 6 and len(dst_got) == 3
    # no-loss: union covers every original object with original bytes
    merged = {**dst_got, **src_left}
    assert merged == data


def test_rollforward_completes_from_any_crash_point(s3):
    """Re-running the move after a crash at EVERY possible copy index
    converges to the completed state — the storage-layer property the
    rename-replay recovery relies on."""
    for crash_at in range(1, 6):
        src, dst = f"t3c{crash_at}/live/", f"t3c{crash_at}/__v1/"
        data = _stage(s3, src, 5)

        state = {"n": 0}

        def crash(key):
            state["n"] += 1
            if state["n"] == crash_at:
                raise RuntimeError("die")

        with pytest.raises(RuntimeError):
            rename_prefix(s3, BUCKET, src, dst, on_each=crash)
        # roll-forward: plain re-run, no special recovery arguments
        rename_prefix(s3, BUCKET, src, dst)
        assert list_prefix(s3, BUCKET, src) == []
        assert _read_all(s3, dst) == data


def test_pointer_create_is_exclusive(s3):
    from nineinfra_spark.operators.objstore import (
        PointerConflict,
        publish_pointer,
        read_pointer,
    )

    assert read_pointer(s3, BUCKET, "p1/_POINTER") == (None, None)
    etag = publish_pointer(s3, BUCKET, "p1/_POINTER", "v/000", None)
    assert read_pointer(s3, BUCKET, "p1/_POINTER") == ("v/000", etag)
    # a second CREATE of the same table loses
    with pytest.raises(PointerConflict):
        publish_pointer(s3, BUCKET, "p1/_POINTER", "v/other", None)


def test_pointer_cas_race_has_exactly_one_winner(s3):
    """Two writers read the same pointer state and both try to commit:
    the S3 conditional PUT admits exactly one; the loser re-reads and
    retries successfully — the full optimistic loop."""
    from nineinfra_spark.operators.objstore import (
        PointerConflict,
        publish_pointer,
        read_pointer,
    )

    etag0 = publish_pointer(s3, BUCKET, "p2/_POINTER", "v/000", None)
    # both writers hold etag0
    publish_pointer(s3, BUCKET, "p2/_POINTER", "v/aaa", etag0)  # writer A wins
    with pytest.raises(PointerConflict):
        publish_pointer(s3, BUCKET, "p2/_POINTER", "v/bbb", etag0)  # B loses
    # B's retry: re-read, re-commit on the fresh etag
    val, etag1 = read_pointer(s3, BUCKET, "p2/_POINTER")
    assert val == "v/aaa"
    publish_pointer(s3, BUCKET, "p2/_POINTER", "v/bbb", etag1)
    assert read_pointer(s3, BUCKET, "p2/_POINTER")[0] == "v/bbb"


def test_pointer_commits_linearize_under_contention(s3):
    """8 threads × optimistic increments through the pointer: every
    commit must be distinct and sequential — no lost updates."""
    import threading

    from nineinfra_spark.operators.objstore import (
        PointerConflict,
        publish_pointer,
        read_pointer,
    )

    publish_pointer(s3, BUCKET, "p3/_POINTER", "0", None)
    PER_THREAD = 5
    committed = []
    lock = threading.Lock()

    def writer():
        done = 0
        while done < PER_THREAD:
            val, etag = read_pointer(s3, BUCKET, "p3/_POINTER")
            try:
                publish_pointer(s3, BUCKET, "p3/_POINTER", str(int(val) + 1), etag)
            except PointerConflict:
                continue
            with lock:
                committed.append(int(val) + 1)
            done += 1

    threads = [threading.Thread(target=writer) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert read_pointer(s3, BUCKET, "p3/_POINTER")[0] == str(8 * PER_THREAD)
    assert sorted(committed) == list(range(1, 8 * PER_THREAD + 1))


def test_stage_then_crash_never_disturbs_readers(s3):
    """A writer that stages a new snapshot prefix but dies before the
    pointer PUT leaves the live pointer (and its data) untouched —
    the crash-safety the pointer protocol buys over rename."""
    from nineinfra_spark.operators.objstore import publish_pointer, read_pointer

    _stage(s3, "p4/v000/", 3)
    etag = publish_pointer(s3, BUCKET, "p4/_POINTER", "p4/v000/", None)
    # writer 2 stages... and crashes here (no pointer PUT)
    _stage(s3, "p4/v001-uuid/", 3)
    val, etag_now = read_pointer(s3, BUCKET, "p4/_POINTER")
    assert (val, etag_now) == ("p4/v000/", etag)
    assert len(_read_all(s3, "p4/v000/")) == 3  # live data untouched
    # the orphan staged prefix is identifiable for vacuum
    assert len(_read_all(s3, "p4/v001-uuid/")) == 3


def test_listing_paginates_beyond_one_page(s3):
    """list_prefix must walk continuation tokens — a real partition
    directory exceeds the 1000-key page size; moto enforces MaxKeys."""
    prefix = "t4/live/"
    for i in range(1005):
        s3.put_object(Bucket=BUCKET, Key=f"{prefix}o{i:05d}", Body=b"x")
    assert len(list_prefix(s3, BUCKET, prefix)) == 1005


def test_rename_without_trailing_slash_spares_sibling_prefixes(s3):
    """r11 review finding: a raw string-prefix match on
    'warehouse/orders' also swept 'warehouse/orders_v2/...' — sibling
    tables relocated AND deleted by a rename of a different table.
    Prefixes are now directory-like: only the exact key and keys under
    'prefix/' move."""
    victim = _stage(s3, "t3/orders_v2/", 3)
    target = _stage(s3, "t3/orders/", 2)
    n = rename_prefix(s3, BUCKET, "t3/orders", "t3/archive/orders")
    assert n == len(target)
    # the sibling table is untouched, under its original keys
    assert sorted(list_prefix(s3, BUCKET, "t3/orders_v2/")) == sorted(
        "t3/orders_v2/" + k for k in victim
    )
    # the target moved completely
    assert list_prefix(s3, BUCKET, "t3/orders/") == []
    assert sorted(list_prefix(s3, BUCKET, "t3/archive/orders/")) == sorted(
        "t3/archive/orders/" + k for k in target
    )


def test_rename_rejects_mismatched_slash_styles(s3):
    """r12 continuation review finding: dst_key is dst_prefix +
    key[len(src_prefix):], so 'a/'→'b' would map 'a/x' to 'bx' and
    'a'→'b/' would map it to 'b//x' — then DELETE the source. The
    mismatch is refused before any object moves."""
    data = _stage(s3, "t6/live/", 2)
    import pytest

    with pytest.raises(ValueError, match="trailing-slash style"):
        rename_prefix(s3, BUCKET, "t6/live/", "t6/archive")
    with pytest.raises(ValueError, match="trailing-slash style"):
        rename_prefix(s3, BUCKET, "t6/live", "t6/archive/")
    # nothing moved, nothing deleted
    assert _read_all(s3, "t6/live/") == data
    assert list_prefix(s3, BUCKET, "t6/archive") == []


def test_self_rename_refused(s3):
    """rename_prefix(src == dst) would copy every object onto itself
    and then DELETE the whole prefix — a self-rename must refuse, not
    lose data (r14 review finding)."""
    from nineinfra_spark.operators.objstore import rename_prefix

    data = _stage(s3, "wh/selfsame/", 3)
    with pytest.raises(ValueError, match="same prefix"):
        rename_prefix(s3, BUCKET, "wh/selfsame/", "wh/selfsame/")
    keys = list_prefix(s3, BUCKET, "wh/selfsame/")
    assert sorted(keys) == sorted(f"wh/selfsame/{k}" for k in data)
