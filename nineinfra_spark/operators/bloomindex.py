"""Per-file Bloom index: point-lookup file skipping on a secondary key.

Min-max envelopes (``operators/zorder.py``) skip files for RANGE
predicates on the clustered columns; they are useless for a point
lookup on a HIGH-CARDINALITY column the layout wasn't built on (a
``doc_id``/``content_hash`` probe against a date-laid-out table reads
every file — each file's [min, max] spans the whole key space). The
lakehouse answer is a per-file Bloom filter (Delta's ``BLOOM FILTER
INDEX``, parquet's own column bloom filters): a few bytes of bitmap
per file that answer "might this file contain key X?" with no false
NEGATIVES — so skipping stays exact — and a bounded false-positive
rate that only costs extra file reads. The reference platform
provisions the object store these tables live on
(``internal/controller/minio.go:286-319``); the index semantics are
native here, over plain parquet + a ``_bloomindex.json`` sidecar.

Determinism contract: the bit positions derive from the md5-based
``stable_hash64`` family (``nineinfra_spark.functions``) — engine-
portable integer arithmetic, so an external engine (or the DuckDB
oracle) recomputes the same bitmaps from the data alone, and a
rebuilt index over the same rows is byte-identical.

Scale posture:

- **build**: one bounds aggregate on the layout column + one hash
  exchange on the file id + the write; the bitmap aggregation is one
  map-side-combined ``(fid, bit)`` distinct — output bounded by
  ``n_files × m_bits``, sidecar-sized metadata (the same "bytes per
  file" budget real bloom indexes spend). Nothing corpus-sized
  reaches the driver.
- **probe**: the sidecar consult is driver-side over ``n_files``
  bitmaps × len(keys) probes — file-count-sized, never data-sized.
  Surviving files are read via PARTITION PRUNING (``fid`` is a
  partition column), so skipped files are never opened, and the
  residual exact filter runs only over the hit files.

NULL keys are never indexed and never probe-able (SQL equality on
NULL matches nothing) — same semantics as a filter, not a gap.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIDECAR = "_bloomindex.json"

#: default bits per file bitmap (2^13 = 8192 bits = 1 KiB packed) and
#: hash-function count. With k=4 the false-positive rate is
#: ``fill_ratio^4``, and ~1% FP needs ≈ 10.5 bits/key — so the
#: default suits ≤ ~800 keys/file. Size real tables with
#: :func:`m_bits_for`; an undersized bitmap SATURATES (fill → 1.0,
#: every file hits, skipping degrades to a full scan — still exact,
#: never wrong) and :func:`bloom_index_write` warns when it happens.
M_BITS = 8192
K_HASHES = 4


def m_bits_for(keys_per_file: int, fp: float = 0.01) -> int:
    """Bitmap size for a target false-positive rate at ``k=4`` hashes:
    solve ``fp = fill^4`` with ``fill = 1 − e^(−k·n/m)``. Rounded up
    to a multiple of 64. At the 1% default this is ≈ 10.5 bits/key —
    a 1M-key file costs ~1.3 MB of packed bitmap."""
    import math

    if keys_per_file < 1:
        return M_BITS
    if not 0 < fp < 1:
        raise ValueError(f"fp must be in (0, 1), got {fp}")
    fill = fp ** (1.0 / K_HASHES)
    m = math.ceil(-K_HASHES * keys_per_file / math.log(1.0 - fill))
    return ((m + 63) // 64) * 64


def _pack_bits(positions) -> str:
    """Sorted bit positions → base64 little-endian packed bitmap.
    Packed encoding is DENSITY-PROOF: m/8 bytes whatever the fill
    (a positions list grows with the key count and explodes exactly
    when files are dense)."""
    import base64

    if not positions:
        return ""
    size = (max(positions) // 8) + 1
    buf = bytearray(size)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


def _unpack_bits(b64: str) -> set[int]:
    import base64

    if not b64:
        return set()
    raw = base64.b64decode(b64)
    out = set()
    for i, byte in enumerate(raw):
        while byte:
            low = byte & -byte
            out.add((i << 3) + low.bit_length() - 1)
            byte ^= low
    return out


def _decode_bits(meta: dict) -> dict[int, set[int]]:
    """fid → set(bit) from either sidecar encoding (packed base64
    under ``enc: "b64"``, or the legacy positions-list)."""
    if meta.get("enc") == "b64":
        return {int(f): _unpack_bits(b) for f, b in meta["bits"].items()}
    return {int(f): set(b) for f, b in meta["bits"].items()}


def bloom_fill_ratios(meta: dict) -> dict[int, float]:
    """Per-file bitmap fill ratio (set bits / m_bits). The expected
    false-positive rate per file is ``fill^k`` — fills past ~0.5 mean
    the bitmap is undersized for the file's key count (resize with
    :func:`m_bits_for` and rebuild)."""
    m = meta["m_bits"]
    return {f: len(b) / m for f, b in _decode_bits(meta).items()}


def _hash_expr(col, salt: str):
    """60-bit non-negative md5 hash — the engine-portable family of
    ``functions.stable_hash64``, inlined so the salt composes with the
    Bloom hash index."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def _positions(col, m_bits: int, k: int):
    """The k bit positions of one key value (array<bigint>)."""
    return F.array(
        *[_hash_expr(col, f"bloom{j}/") % m_bits for j in range(k)]
    )


def _positions_py(value, m_bits: int, k: int) -> list[int]:
    """Driver-side twin of :func:`_positions` for probe keys — must
    stay bit-identical to the column expression (pinned by
    tests/test_bloomindex.py::test_probe_positions_match_column_expr)."""
    import hashlib

    out = []
    for j in range(k):
        h = hashlib.md5(f"bloom{j}/{value}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % m_bits)
    return out


def _write_sidecar(path: str, meta: dict) -> None:
    target = os.path.join(path, _SIDECAR)
    tmp = target + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, target)


def read_index_meta(path: str) -> dict:
    """The index contract of a :func:`bloom_index_write` directory."""
    with open(os.path.join(path, _SIDECAR), encoding="utf-8") as f:
        return json.load(f)


def bloom_index_write(
    df: DataFrame,
    path: str,
    layout_col: str,
    key_col: str,
    n_files: int,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
    mode: str = "error",
) -> dict:
    """Write ``df`` as ``n_files`` range-bucketed parquet files on
    ``layout_col`` (partition column ``fid``), plus a per-file Bloom
    bitmap over ``key_col`` in the ``_bloomindex.json`` sidecar.

    The file id is ``floor((layout − lo) / span · n_files)`` against
    the frozen [lo, hi] bounds — deterministic (an oracle recomputes
    the same assignment; same device as the z-order grid), clamped at
    the edges so out-of-range values land in the boundary files. Rows
    with a NULL ``layout_col`` go to file 0 (they must live
    somewhere deterministic; their keys are still indexed).

    Returns the sidecar dict. ``bits`` in the sidecar maps each fid
    (as a string — JSON object keys) to the SORTED list of set bit
    positions — positions-list encoding, compact while bitmaps are
    sparse and trivially portable."""
    if not 1 <= n_files <= 4096:
        raise ValueError(f"n_files must be in 1..4096, got {n_files}")
    if m_bits < 8 or k < 1:
        raise ValueError(f"need m_bits >= 8 and k >= 1, got {m_bits}/{k}")
    for c in (layout_col, key_col):
        if c not in df.columns:
            raise ValueError(f"bloom_index_write: column {c!r} not in frame")
    if "fid" in df.columns:
        raise ValueError(
            "bloom_index_write: column 'fid' is reserved for the file-id "
            "partition column — rename it first"
        )
    stats = df.agg(
        F.min(F.col(layout_col).cast("double")).alias("lo"),
        F.max(F.col(layout_col).cast("double")).alias("hi"),
    ).first()
    lo, hi = stats["lo"], stats["hi"]
    if lo is None or hi is None:
        lo, hi = 0.0, 0.0  # empty / all-NULL layout: single-cell grid
    span = (hi - lo) or 1.0
    fid = F.coalesce(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_files - 1),
                F.floor(
                    (F.col(layout_col).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * n_files
                ).cast("int"),
            ),
        ),
        F.lit(0),  # NULL layout values: deterministic home in file 0
    )
    tagged = df.withColumn("fid", fid)
    (
        tagged.repartition(n_files, "fid")
        .write.mode(mode)
        .partitionBy("fid")
        .parquet(path)
    )
    # bitmap build: (fid, bit) distinct → group — map-side combined,
    # ≤ n_files × m_bits rows ever shuffle. NULL keys produce a NULL
    # position array; explode drops them (never indexed).
    bits_rows = (
        tagged.select(
            "fid", F.explode(_positions(F.col(key_col), m_bits, k)).alias("bit")
        )
        .distinct()
        .groupBy("fid")
        .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
        .collect()
    )
    meta = {
        "layout_col": layout_col,
        "key_col": key_col,
        "n_files": n_files,
        "m_bits": m_bits,
        "k": k,
        "enc": "b64",
        "bounds": [lo, hi],
        "bits": {
            str(r["fid"]): _pack_bits([int(b) for b in r["bits"]])
            for r in bits_rows
        },
        # data schema (sans fid): an EMPTY table writes no parquet
        # files at all, so the probe path needs a schema source that
        # is not the files
        "schema": df.schema.json(),
    }
    _write_sidecar(path, meta)
    worst = max(bloom_fill_ratios(meta).values(), default=0.0)
    if worst > 0.5:
        import warnings

        warnings.warn(
            f"bloom_index_write({path!r}): worst bitmap fill ratio is "
            f"{worst:.2f} — expected false-positive rate "
            f"{worst ** k:.0%} per file; skipping will degrade toward a "
            f"full scan (still exact). Resize with m_bits_for(keys_per_"
            f"file) and rebuild.",
            UserWarning,
            stacklevel=2,
        )
    return meta


def bloom_index_append(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    batch_id: int | None = None,
) -> dict:
    """Incremental maintenance: append ``delta`` to a
    :func:`bloom_index_write` directory, extending the per-file
    bitmaps. The delta's file ids come from the sidecar's FROZEN
    layout bounds (same grid as the original build — the zorder
    frozen-bounds device), so out-of-range drift clamps into the edge
    files and existing files' bitmaps stay valid.

    Ordering is the correctness core: the sidecar is updated FIRST,
    the data appended SECOND. Bloom bits are monotone (they only ever
    gain), so a crash between the two steps leaves a SUPERSET bitmap
    over the committed rows — pure false positives, exactness intact.
    The reverse order would leave appended keys missing from the
    bitmap: false NEGATIVES, silently dropped rows on every later
    probe.

    With ``batch_id`` set, a batch id ≤ the sidecar's
    ``last_batch_id`` is skipped (foreachBatch re-delivers the last
    batch on restart; a blind re-append would duplicate its ROWS —
    the bitmap itself is replay-idempotent by monotonicity). The
    marker is written with the bits in the same sidecar replace, i.e.
    BEFORE the data lands: a crash inside the append window means the
    re-delivered batch is skipped and the rows of the interrupted
    append may be absent — detectable (row counts), never silently
    wrong on probes; re-run the delta with a fresh batch id to heal.

    Returns ``{"rows_appended", "files_touched", "new_bits"}``."""
    meta = read_index_meta(path)
    if batch_id is not None:
        last = meta.get("last_batch_id")
        if last is not None and batch_id <= last:
            return {
                "rows_appended": 0,
                "files_touched": 0,
                "new_bits": 0,
                "skipped_replay": True,
            }
    data_cols = [
        f["name"] for f in json.loads(meta["schema"])["fields"]
    ]
    if sorted(delta.columns) != sorted(data_cols):
        raise ValueError(
            f"bloom_index_append: delta columns {sorted(delta.columns)} "
            f"!= index columns {sorted(data_cols)}"
        )
    n_files, m_bits, k = meta["n_files"], meta["m_bits"], meta["k"]
    lo, hi = meta["bounds"]
    span = (hi - lo) or 1.0
    fid = F.coalesce(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_files - 1),
                F.floor(
                    (F.col(meta["layout_col"]).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * n_files
                ).cast("int"),
            ),
        ),
        F.lit(0),
    )
    # pin the delta once: bit discovery, the count, and the row append
    # are separate actions — a non-deterministic delta recomputed
    # between them could append keys the bitmap step never saw
    # (exactly the zorder_layout_append lesson)
    tagged = (
        delta.select(*data_cols).withColumn("fid", fid)
        .localCheckpoint(eager=True)
    )
    bits_rows = (
        tagged.select(
            "fid",
            F.explode(
                _positions(F.col(meta["key_col"]), m_bits, k)
            ).alias("bit"),
        )
        .distinct()
        .groupBy("fid")
        .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
        .collect()
    )
    decoded = _decode_bits(meta)
    new_bits = 0
    for r in bits_rows:
        f = int(r["fid"])
        merged = decoded.get(f, set()) | {int(b) for b in r["bits"]}
        new_bits += len(merged) - len(decoded.get(f, set()))
        decoded[f] = merged
    meta["enc"] = "b64"
    meta["bits"] = {str(f): _pack_bits(sorted(b)) for f, b in decoded.items()}
    if batch_id is not None:
        meta["last_batch_id"] = batch_id
    # sidecar BEFORE data (see docstring: superset bitmaps are safe,
    # subset bitmaps lose rows)
    _write_sidecar(path, meta)
    rows = tagged.count()
    (
        tagged.repartition(max(len(bits_rows), 1), "fid")
        .write.mode("append")
        .partitionBy("fid")
        .parquet(path)
    )
    return {
        "rows_appended": rows,
        "files_touched": len(bits_rows),
        "new_bits": new_bits,
    }


def bloom_index_compact(spark: SparkSession, path: str) -> dict:
    """Post-append maintenance: each :func:`bloom_index_append` adds
    one file per touched ``fid`` partition, so a long-running ingest
    degrades a fid into many small files (the classic small-files
    tax). Rewrite every MULTI-file fid back to one file — the row set
    is identical, so the bitmaps need no change and probes stay exact
    throughout.

    Cost tracks the fragmented fids only (untouched partitions are
    never opened — dynamic-partition overwrite); the combined rows
    are localCheckpoint-pinned first, the lineage break Spark needs
    to overwrite a path it is reading (the zorder-append device).
    Returns ``{"fids_compacted", "files_before", "files_after"}``."""
    frag = []
    files_before = 0
    for d in os.listdir(path):
        if not d.startswith("fid=") or not os.path.isdir(os.path.join(path, d)):
            continue
        n = sum(
            1
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        files_before += n
        if n > 1:
            frag.append(int(d.split("=", 1)[1]))
    if not frag:
        return {
            "fids_compacted": 0,
            "files_before": files_before,
            "files_after": files_before,
        }
    combined = (
        spark.read.parquet(path)
        .filter(F.col("fid").isin(frag))
        .repartition(len(frag), "fid")
        .localCheckpoint(eager=True)
    )
    (
        combined.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("fid")
        .parquet(path)
    )
    files_after = sum(
        1
        for d in os.listdir(path)
        if d.startswith("fid=") and os.path.isdir(os.path.join(path, d))
        for f in os.listdir(os.path.join(path, d))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    return {
        "fids_compacted": len(frag),
        "files_before": files_before,
        "files_after": files_after,
    }


def bloom_probe_files(meta: dict, keys: Sequence) -> list[int]:
    """File ids that MIGHT contain any of ``keys`` (no false
    negatives; false positives bounded by the bitmap geometry).

    Cost discipline: ``n_files × len(keys) × k`` BIT TESTS against
    the base64-decoded packed buffers — never a materialized
    position-set per file (the first implementation unpacked every
    set bit into Python sets, which is O(total set bits): ~2 s of
    driver time on a 64-file × 330k-bit index before any data was
    read, r13 measurement). Legacy positions-list sidecars still take
    the set path."""
    import base64

    m_bits, k = meta["m_bits"], meta["k"]
    hits: set[int] = set()
    if meta.get("enc") == "b64":
        bufs = {
            int(f): base64.b64decode(b) for f, b in meta["bits"].items()
        }

        def admits(buf: bytes, pos: list[int]) -> bool:
            for p in pos:
                i = p >> 3
                if i >= len(buf) or not buf[i] & (1 << (p & 7)):
                    return False
            return True

        for key in keys:
            if key is None:
                continue  # NULL probes match nothing, like SQL equality
            pos = _positions_py(key, m_bits, k)
            for f, buf in bufs.items():
                if f not in hits and admits(buf, pos):
                    hits.add(f)
        return sorted(hits)
    bitsets = _decode_bits(meta)
    for key in keys:
        if key is None:
            continue
        pos = _positions_py(key, m_bits, k)
        for f, bs in bitsets.items():
            if f not in hits and all(p in bs for p in pos):
                hits.add(f)
    return sorted(hits)


def bloom_skipping_read(
    spark: SparkSession, path: str, keys: Sequence
) -> tuple[DataFrame, dict]:
    """Point-lookup over a :func:`bloom_index_write` directory: consult
    the sidecar, read ONLY the files whose bitmap admits some probe
    key (partition pruning on ``fid`` — skipped files are never
    opened), then apply the exact ``key IN (...)`` filter over the
    survivors. Returns ``(rows_df, stats)`` with
    ``stats = {"files_total", "files_hit", "files_skipped"}``.

    Exactness: the bitmap has no false negatives, so the pruned read
    returns exactly the rows a full-table filter would — pinned by
    tests/test_bloomindex.py against the unpruned scan."""
    from pyspark.sql import types as T

    meta = read_index_meta(path)
    present = sorted(int(f) for f in meta["bits"])
    hit = bloom_probe_files(meta, keys)
    stats = {
        "files_total": len(present),
        "files_hit": len(hit),
        "files_skipped": len(present) - len(hit),
    }
    key_col = meta["key_col"]
    probe = [k for k in keys if k is not None]
    if not hit or not probe:
        # schema from the sidecar, never the files: an empty table
        # wrote no parquet at all, and a skipped read must not even
        # list the directory
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        return spark.createDataFrame([], schema), stats
    df = spark.read.parquet(path)
    out = (
        df.filter(F.col("fid").isin(hit))
        .filter(F.col(key_col).isin(probe))
        .drop("fid")
    )
    return out, stats
