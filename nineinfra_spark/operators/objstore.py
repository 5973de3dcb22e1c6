"""Object-store (S3-API) directory-move semantics for the publish
protocol.

The reference platform's warehouse lives on MinIO via s3a
(``internal/controller/kyuubi.go:100-106``, ``minio.go:286-319``).
This repo's publish/merge protocol (``operators/merge.py``) commits by
``ALTER TABLE RENAME`` — and the two halves of that operation have
DIFFERENT portability to an object store:

- The **metastore name swap** is a database update: ``RENAME TO`` an
  existing name fails in the metastore whatever the storage is, so the
  optimistic version CAS (``merge_into_table_versioned``) keeps its
  atomicity on S3 unchanged. Nothing in the CAS depends on storage
  rename.
- The **data-directory move** of a managed table is ``rename()`` on
  the table location. HDFS/local rename is one atomic metadata op; the
  S3 API HAS NO RENAME — s3a emulates it as per-object COPY + DELETE,
  so a crash mid-move leaves objects split across BOTH prefixes, a
  state no local-FS test can produce.

:func:`rename_prefix` is the move s3a performs, written as an
idempotent ROLL-FORWARD: copy every object src→dst (re-copy of an
already-copied object is a no-op overwrite with identical bytes),
then delete the src prefix only after every copy landed. Re-running
it after any crash completes the move — which is exactly the property
``recover_versioned_table`` needs from the storage layer: every
rename it replays can be finished by re-issuing it.

:func:`publish_pointer` is the step past rename emulation: the
MANIFEST-POINTER commit (Delta/Iceberg's answer to object stores) —
stage data under an immutable prefix, then one conditional PUT
(``If-None-Match: *`` create / ``If-Match`` CAS) flips the live
pointer. No rename at all, atomic server-side, losers get
:class:`PointerConflict` and retry — the storage-level twin of the
metastore rename CAS in ``merge_into_table_versioned``.

Tested against a REAL S3 endpoint (moto server speaking the S3 API)
in ``tests/test_s3_semantics.py``, including a mid-move crash that
leaves the split state and the roll-forward that heals it. The
Spark-side s3a leg stays environment-blocked: no ``hadoop-aws`` /
AWS SDK bundle jar ships in this environment's pyspark (probe in
NOTES.md r9), so ``spark.read("s3a://...")`` cannot run here; the
``fs.s3a.*`` session wiring it would use is in ``engine.py:115-176``.
"""

from __future__ import annotations

from collections.abc import Callable


class PointerConflict(RuntimeError):
    """Lost the pointer CAS: another writer committed since this
    writer read the pointer. Re-read, re-stage (or re-validate), and
    retry — the optimistic-concurrency loop, same contract as
    ``merge.merge_into_table_versioned``'s metastore rename CAS."""


def list_prefix(s3, bucket: str, prefix: str) -> list[str]:
    """All object keys under ``prefix`` (paginated — an S3 listing
    page holds ≤1000 keys; a warehouse partition can hold far more)."""
    keys: list[str] = []
    token = None
    while True:
        kw = {"Bucket": bucket, "Prefix": prefix}
        if token:
            kw["ContinuationToken"] = token
        page = s3.list_objects_v2(**kw)
        keys.extend(o["Key"] for o in page.get("Contents", []))
        if not page.get("IsTruncated"):
            return keys
        token = page["NextContinuationToken"]


def rename_prefix(
    s3,
    bucket: str,
    src_prefix: str,
    dst_prefix: str,
    on_each: Callable[[str], None] | None = None,
) -> int:
    """Move every object ``src_prefix``/K → ``dst_prefix``/K — the
    operation s3a performs for a directory rename, as an idempotent
    roll-forward (safe to re-run after a crash at ANY point):

    1. copy phase: every src object is copied to its dst key. Copies
       are idempotent (same source bytes → same object), so objects
       copied by a previous interrupted run are harmlessly re-copied.
    2. delete phase: only after the full copy phase, src objects are
       deleted. A crash during deletion leaves some src objects;
       re-running re-copies (no-op) and finishes the delete.

    There is NO point at which an object exists under neither prefix,
    but there IS a window where objects exist under both — readers
    must resolve through the metastore pointer, never by listing
    storage (the invariant the publish protocol already keeps, since
    the table NAME is what flips).

    ``on_each`` (test hook) runs after each copy — the crash-injection
    seam for exercising the split state.

    Returns the number of objects moved.

    ``src_prefix`` is DIRECTORY-like: without a trailing slash, only
    the exact key and keys under ``src_prefix + '/'`` match — a raw
    string-prefix match would also sweep SIBLING prefixes sharing the
    string (renaming ``warehouse/orders`` must not relocate and delete
    ``warehouse/orders_v2/...``; r11 review finding).

    Size caveat: the S3 ``CopyObject`` API caps a single copy at 5 GB
    — objects beyond that need multipart ``UploadPartCopy``, which
    this helper (like s3a's default rename path) does not implement.
    Keep output files under the cap (the parquet writer's
    ``maxRecordsPerFile`` / split sizing already targets well below
    it) or publish via :func:`publish_pointer`, which never copies
    data at all.
    """
    if src_prefix.endswith("/") != dst_prefix.endswith("/"):
        # dst_key below is dst_prefix + key[len(src_prefix):]; with
        # mismatched trailing-slash styles that concatenation silently
        # relocates every object to a mangled key ("a/"→"b" maps
        # "a/x" to "bx"; "a"→"b/" maps it to "b//x") and then DELETES
        # the source — a lossy rename. Refuse up front.
        raise ValueError(
            f"rename_prefix: src {src_prefix!r} and dst {dst_prefix!r} "
            "must use the same trailing-slash style"
        )
    if src_prefix == dst_prefix:
        # the copy phase would no-op (every object copied onto itself)
        # and the delete phase would then REMOVE THE ENTIRE PREFIX —
        # a "rename to itself" must not be a data-loss path (r14
        # review finding).
        raise ValueError(
            f"rename_prefix: src and dst are the same prefix "
            f"{src_prefix!r} — a self-rename would delete the data"
        )
    keys = [
        k
        for k in list_prefix(s3, bucket, src_prefix)
        if src_prefix.endswith("/")
        or k == src_prefix
        or k.startswith(src_prefix + "/")
    ]
    for key in keys:
        dst_key = dst_prefix + key.removeprefix(src_prefix)
        s3.copy_object(
            Bucket=bucket,
            Key=dst_key,
            CopySource={"Bucket": bucket, "Key": key},
        )
        if on_each is not None:
            on_each(key)
    for key in keys:
        s3.delete_object(Bucket=bucket, Key=key)
    return len(keys)


# ------------------------------------------------ pointer-commit protocol


def read_pointer(s3, bucket: str, key: str) -> tuple[str | None, str | None]:
    """Current ``(value, etag)`` of the pointer object, or
    ``(None, None)`` if no commit exists yet."""
    try:
        resp = s3.get_object(Bucket=bucket, Key=key)
    except s3.exceptions.NoSuchKey:
        return None, None
    return resp["Body"].read().decode(), resp["ETag"].strip('"')


def publish_pointer(
    s3, bucket: str, key: str, value: str, expected_etag: str | None
) -> str:
    """Atomically commit ``value`` as the new pointer — the
    manifest-pointer commit that REPLACES rename on object stores
    (what Delta's ``_last_checkpoint``/log entry and Iceberg's
    catalog version swap do): data files are staged under an
    immutable prefix first, then this single conditional PUT makes
    them live.

    - ``expected_etag=None`` asserts CREATION (``If-None-Match: *``) —
      the first commit of a table.
    - otherwise asserts the pointer is UNCHANGED since this writer
      read it (``If-Match``) — the optimistic CAS.

    Either precondition failing raises :class:`PointerConflict` (a
    concurrent writer won; re-read and retry). S3 evaluates the
    precondition atomically server-side — this is real
    compare-and-swap, not read-then-write. Returns the new etag.

    Crash safety falls out of immutability: a writer dying after
    staging but before this PUT leaves the live pointer untouched
    (readers unaffected) and an orphan staged prefix for storage-level
    vacuum (``operators/vacuum.py`` is the local-warehouse analog).
    """
    kw = {"Bucket": bucket, "Key": key, "Body": value.encode()}
    if expected_etag is None:
        kw["IfNoneMatch"] = "*"
    else:
        kw["IfMatch"] = expected_etag
    try:
        resp = s3.put_object(**kw)
    except Exception as exc:  # botocore ClientError, without the import
        code = getattr(exc, "response", {}).get("Error", {}).get("Code")
        if code in ("PreconditionFailed", "ConditionalRequestConflict"):
            raise PointerConflict(
                f"pointer {key}: precondition {code} — another writer "
                f"committed since this one read the pointer"
            ) from exc
        raise
    return resp["ETag"].strip('"')
