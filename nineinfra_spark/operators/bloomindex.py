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
  ``n_files × m_bits``, index-sized (the same "bytes per file" budget
  real bloom indexes spend). Nothing corpus-sized reaches the driver.
- **bitmap storage** (default ``bits_storage="table"``): the bitmaps
  live as a parquet ``(fid, word-index, 63-bit word)`` INDEX TABLE
  under the data directory — the same shape as the dedup band index —
  built and merged entirely Spark-side, so at 10⁵–10⁶ files the
  multi-GB bitmap set never becomes a driver-resident object. The
  tiny JSON sidecar holds only the grid contract (bounds, sizes,
  schema, replay marker) plus a pointer to the current bits table.
  ``bits_storage="json"`` keeps the original all-in-sidecar form for
  SMALL indexes probed driver-side (gateway point-lookup caches);
  legacy sidecars stay read-compatible.
- **probe**: for table storage, a BROADCAST JOIN — the probe keys'
  ``(position → word, mask)`` pairs (len(keys) × k rows, tiny)
  broadcast against the bits table, admission = all-k distinct hash
  matches per (fid, key); output is fid ids, file-count-bounded. For
  JSON storage the consult is driver-side over ``n_files`` bitmaps ×
  len(keys) probes. Either way surviving files are read via
  PARTITION PRUNING (``fid`` is a partition column), so skipped
  files are never opened, and the residual exact filter runs only
  over the hit files.

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

from nineinfra_spark.operators import _sidecar

_SIDECAR = "_bloomindex.json"

#: key-column types whose Spark ``cast('string')`` rendering is
#: IDENTICAL to Python's ``str()`` — the property that keeps the
#: driver-side probe hashing (:func:`_positions_py`) bit-compatible
#: with the build's column expression (:func:`_positions`). Boolean
#: (``true`` vs ``True``), floating point (``1.0E10`` vs
#: ``10000000000.0``), decimal, and date/timestamp renderings all
#: diverge between the engines, which would turn into Bloom false
#: NEGATIVES (silently dropped probe rows) — so they are refused at
#: build time; cast such keys to string explicitly first.
_KEY_TYPE_NAMES = ("string", "tinyint", "smallint", "int", "bigint")

#: default bits per file bitmap (2^13 = 8192 bits = 1 KiB packed) and
#: hash-function count. With k=4 the false-positive rate is
#: ``fill_ratio^4``, and ~1% FP needs ≈ 10.5 bits/key — so the
#: default suits ≤ ~800 keys/file. Size real tables with
#: :func:`m_bits_for`; an undersized bitmap SATURATES (fill → 1.0,
#: every file hits, skipping degrades to a full scan — still exact,
#: never wrong) and :func:`bloom_index_write` warns when it happens.
M_BITS = 8192
K_HASHES = 4


def m_bits_for(keys_per_file: int, fp: float = 0.01, k: int = K_HASHES) -> int:
    """Bitmap size for a target false-positive rate at ``k`` hashes
    (default 4): solve ``fp = fill^k`` with ``fill = 1 − e^(−k·n/m)``.
    Rounded up to a multiple of 64. At the k=4/1% default this is
    ≈ 10.5 bits/key — a 1M-key file costs ~1.3 MB of packed bitmap.
    Pass the INDEX's own ``k`` when sizing an existing index (the
    resize loop does) — the 4-hash formula under-sizes a k>4 index,
    leaving its fill above threshold forever."""
    import math

    if keys_per_file < 1:
        return M_BITS
    if not 0 < fp < 1:
        raise ValueError(f"fp must be in (0, 1), got {fp}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    fill = fp ** (1.0 / k)
    m = math.ceil(-k * keys_per_file / math.log(1.0 - fill))
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


#: usable bits per signed-long word in the table-backed bitmap
#: encoding — 63 keeps every shift amount ≤ 62, portable to engines
#: that refuse ``1 << 63`` (the DuckDB convention the repo's bitmap
#: operators share).
WORD_BITS = 63

_BITS_TABLE = "_bloomindex_bits"  # initial bits-table dir (appends version it)


def _words_df(pairs: DataFrame, word_bits: int = WORD_BITS) -> DataFrame:
    """``(fid, bit)`` pairs (duplicates welcome — ``bit_or`` dedups
    for free, so callers skip the extra distinct exchange) → the
    ``(fid, w, word)`` bitmap words of the table-backed encoding.
    Map-side-combined aggregation; output ≤ n_files ×
    ceil(m_bits / word_bits) rows — index-sized, fully distributed."""
    return (
        pairs.select(
            "fid",
            F.floor(F.col("bit") / word_bits).cast("int").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(bit % {word_bits} AS INT))"
            ).alias("m"),
        )
        .groupBy("fid", "w")
        .agg(F.bit_or("m").alias("word"))
    )


def load_bits(spark: SparkSession, path: str) -> dict[int, set[int]]:
    """fid → set(bit) for EITHER storage — a driver-side materializer
    for tests and small-index introspection only (it is exactly the
    driver-resident object the table storage exists to avoid; never
    call it on a production-sized index)."""
    meta = read_index_meta(path)
    if meta.get("bits_storage") != "table":
        return _decode_bits(meta)
    wb = meta.get("word_bits", WORD_BITS)
    out: dict[int, set[int]] = {}
    rows = spark.read.parquet(os.path.join(path, meta["bits_dir"])).collect()
    for r in rows:
        s = out.setdefault(r["fid"], set())
        word, base = r["word"], r["w"] * wb
        for b in range(wb):
            if (word >> b) & 1:
                s.add(base + b)
    return out


def bloom_fill_ratios_table(spark: SparkSession, path: str) -> dict[int, float]:
    """Per-file fill ratio for a table-backed index — one popcount
    aggregation over the bits table (never materializes bitmaps on
    the driver); same fill^k reading as :func:`bloom_fill_ratios`."""
    meta = read_index_meta(path)
    m = meta["m_bits"]
    bits = spark.read.parquet(os.path.join(path, meta["bits_dir"]))
    return {
        r["fid"]: r["nb"] / m
        for r in bits.groupBy("fid")
        .agg(F.sum(F.bit_count("word")).alias("nb"))
        .collect()
    }


def bloom_fill_ratios(meta: dict) -> dict[int, float]:
    """Per-file bitmap fill ratio (set bits / m_bits). The expected
    false-positive rate per file is ``fill^k`` — fills past ~0.5 mean
    the bitmap is undersized for the file's key count (resize with
    :func:`m_bits_for` and rebuild)."""
    if meta.get("bits_storage") == "table":
        raise ValueError(
            "table-backed index: use bloom_fill_ratios_table(spark, path)"
        )
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


def _render_key(value) -> str:
    """Canonical probe-key rendering — the driver-side twin of the
    build's ``cast('string')``. Only ``str`` and ``int`` render
    identically on both sides (see ``_KEY_TYPE_NAMES``); anything else
    — including ``bool``, whose Python rendering is ``True`` where
    Spark says ``true`` — is refused rather than silently hashed to a
    divergent bit position (a false NEGATIVE, breaking exactness)."""
    if isinstance(value, str):
        return value
    if isinstance(value, int) and not isinstance(value, bool):
        return str(value)
    raise TypeError(
        f"bloom probe keys must be str or int (got {type(value).__name__}"
        f" {value!r}); other types render differently in Spark's "
        f"cast('string') vs Python str() and would produce false "
        f"negatives — cast the key column and the probe to string"
    )


def _check_key_type(df: DataFrame, key_col: str) -> None:
    dt = df.schema[key_col].dataType.simpleString()
    if dt not in _KEY_TYPE_NAMES:
        raise ValueError(
            f"bloom index key column {key_col!r} has type {dt}; only "
            f"{_KEY_TYPE_NAMES} render identically in Spark and on the "
            f"driver (boolean/double/decimal/timestamp renderings "
            f"diverge → false negatives) — cast it to string first"
        )


def _positions_py(value, m_bits: int, k: int) -> list[int]:
    """Driver-side twin of :func:`_positions` for probe keys — must
    stay bit-identical to the column expression (pinned by
    tests/test_bloomindex.py::test_probe_positions_match_column_expr).
    Keys go through :func:`_render_key`, which refuses any type whose
    Python rendering diverges from Spark's ``cast('string')``."""
    import hashlib

    rendered = _render_key(value)
    out = []
    for j in range(k):
        h = hashlib.md5(f"bloom{j}/{rendered}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % m_bits)
    return out


def _write_sidecar(path: str, meta: dict) -> None:
    _sidecar.write(path, _SIDECAR, meta)


def read_index_meta(path: str) -> dict:
    """The index contract of a :func:`bloom_index_write` directory."""
    with open(os.path.join(path, _SIDECAR), encoding="utf-8") as f:
        return json.load(f)


def _read_sidecar_raw(path: str) -> str:
    return _sidecar.read_raw(path, _SIDECAR)


def _guarded_sidecar_write(path: str, meta: dict, expected_raw: str) -> str:
    """Optimistic-CAS sidecar commit for the maintenance paths
    (append / compact / resize) — the shared protocol in
    ``operators/_sidecar.py``: a racing writer raises instead of
    silently replacing the other's bits pointer (false negatives)."""
    return _sidecar.guarded_write(
        path, _SIDECAR, meta, expected_raw, "bloom index"
    )


def bloom_index_write(
    df: DataFrame,
    path: str,
    layout_col: str,
    key_col: str,
    n_files: int,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
    mode: str = "error",
    bits_storage: str = "table",
) -> dict:
    """Write ``df`` as ``n_files`` range-bucketed parquet files on
    ``layout_col`` (partition column ``fid``), plus a per-file Bloom
    bitmap over ``key_col``.

    The file id is ``floor((layout − lo) / span · n_files)`` against
    the frozen [lo, hi] bounds — deterministic (an oracle recomputes
    the same assignment; same device as the z-order grid), clamped at
    the edges so out-of-range values land in the boundary files. Rows
    with a NULL ``layout_col`` go to file 0 (they must live
    somewhere deterministic; their keys are still indexed).

    ``bits_storage="table"`` (default, the 100 TB form) stores the
    bitmaps as a parquet ``(fid, w, word)`` table under
    ``_bloomindex_bits`` — built, merged, and probed Spark-side; the
    JSON sidecar carries only the grid contract and the table
    pointer. ``bits_storage="json"`` inlines the bitmaps in the
    sidecar as base64-encoded PACKED bitmaps (``enc: "b64"``,
    little-endian, m/8 bytes whatever the fill) for small indexes
    probed entirely on the driver (gateway point-lookup caches);
    legacy positions-list sidecars remain READ-compatible
    (:func:`_decode_bits`), nothing writes them anymore.

    Returns the sidecar dict."""
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
    if bits_storage not in ("table", "json"):
        raise ValueError(
            f"bits_storage must be 'table' or 'json', got {bits_storage!r}"
        )
    _check_key_type(df, key_col)
    # pin ONCE: the bounds aggregate, the parquet write, and the
    # bitmap aggregation below are three separate actions — a
    # non-deterministic source (a sample, a changing view) recomputed
    # between them yields bitmaps missing keys the files hold: false
    # NEGATIVES (the zorder_layout_append lesson, applied to the
    # build path too). LAZY checkpoint (r17): the bounds aggregate
    # right below is the materializing action, so the pin costs no
    # extra job (localCheckpoint materializes exactly once; eager vs
    # lazy changes only WHEN).
    df = df.localCheckpoint(eager=False)
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
    tagged_w = tagged.repartition(n_files, "fid")
    (
        tagged_w.write.mode(mode)
        .partitionBy("fid")
        .parquet(path)
    )
    # bitmap build: (fid, bit) pairs → one map-side-combined aggregate
    # (bit_or / collect_set dedup on their own — an explicit distinct
    # would add a second full exchange for nothing); ≤ n_files ×
    # m_bits rows ever shuffle. A NULL key hashes to an ARRAY OF
    # NULLS (not a null array), so explode emits null bits — filtered
    # here so null keys are never indexed under either storage
    # (collect_set happened to drop them; the word aggregation would
    # propagate them).
    #
    # Parallelism gate (r17, guide §2.5/§6.1): a single-file source
    # pins the checkpoint to ONE partition, which made the k·|rows|
    # md5 evaluations of the position expressions a single-task stage
    # (0.65 s of the sf0.1 build). When the pinned blocks are narrower
    # than the cluster, route the bitmap scan through the same
    # fid-keyed repartition the data write already needs (one small
    # re-exchange of the pinned blocks buys k-way × cores md5
    # parallelism); a real corpus (partitions ≥ cores) keeps the
    # natural partitioning and pays NO exchange on the bitmap side.
    ckpt_parts = df.rdd.getNumPartitions()
    par = df.sparkSession.sparkContext.defaultParallelism
    bits_src = tagged_w if ckpt_parts < min(par, n_files) else tagged
    bits_pairs = bits_src.select(
        "fid",
        F.explode(_positions(F.col(key_col), m_bits, k)).alias("bit"),
    ).filter(F.col("bit").isNotNull())
    meta = {
        "layout_col": layout_col,
        "key_col": key_col,
        "n_files": n_files,
        "m_bits": m_bits,
        "k": k,
        "bounds": [lo, hi],
        # data schema (sans fid): an EMPTY table writes no parquet
        # files at all, so the probe path needs a schema source that
        # is not the files
        "schema": df.schema.json(),
    }
    if bits_storage == "table":
        # the bitmaps never leave the cluster: words written directly
        # as the parquet index table, sized ~one file per 64 fids
        (
            _words_df(bits_pairs)
            .repartition(max(1, n_files // 64), "fid")
            .write.mode("overwrite" if mode == "overwrite" else "error")
            .parquet(os.path.join(path, _BITS_TABLE))
        )
        meta["bits_storage"] = "table"
        meta["bits_dir"] = _BITS_TABLE
        meta["word_bits"] = WORD_BITS
        _write_sidecar(path, meta)
        spark = df.sparkSession
        worst = max(bloom_fill_ratios_table(spark, path).values(), default=0.0)
    else:
        bits_rows = (
            bits_pairs.groupBy("fid")
            .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
            .collect()
        )
        meta["enc"] = "b64"
        meta["bits"] = {
            str(r["fid"]): _pack_bits([int(b) for b in r["bits"]])
            for r in bits_rows
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
    key_cols: Sequence[str] | None = None,
) -> dict:
    """Incremental maintenance: append ``delta`` to a
    :func:`bloom_index_write` directory, extending the per-file
    bitmaps. The delta's file ids come from the sidecar's FROZEN
    layout bounds (same grid as the original build — the zorder
    frozen-bounds device), so out-of-range drift clamps into the edge
    files and existing files' bitmaps stay valid.

    Ordering is the correctness core, in three steps:

    1. **bits sidecar first** (marker untouched). Bloom bits are
       monotone (they only ever gain), so a crash after this step
       leaves a SUPERSET bitmap over the committed rows — pure false
       positives, exactness intact; the reverse order would leave
       appended keys missing from the bitmap: false NEGATIVES,
       silently dropped rows on every later probe.
    2. **data second** — a blind append, or with ``key_cols`` an
       upsert: the touched fid partitions are rewritten via
       dynamic-partition overwrite with existing rows whose key the
       delta carries dropped first (delta wins). A re-delivered row
       has the same fid as the copy it supersedes (frozen grid), so
       the stale copy is always inside the rewritten set — the same
       algebra as ``zorder_layout_append``.
    3. **replay marker last**: ``last_batch_id`` commits only AFTER
       the data, so a crash anywhere inside the append re-delivers
       the batch on restart (foreachBatch semantics) and the re-run
       CONVERGES — the bits re-merge is a monotone no-op and
       ``key_cols`` dedups the rows. Without ``key_cols`` the marker
       still dedups every non-crash replay, but a crash between data
       and marker duplicates the batch's rows on replay (document
       your key or accept at-least-once, exactly as with
       ``zorder_layout_append``).

    NULL keys: when the delta carries a NULL in a ``key_cols``
    column, keys match NULL-SAFELY (``<=>``) so replayed NULL-key
    rows converge — with the consequence that NULL collapses to a
    SINGLE upsert key: one NULL-key delta row supersedes ALL existing
    NULL-key rows in the rewritten fid partitions, unlike SQL/Delta
    MERGE where NULL never matches. If NULL keys denote distinct
    rows, make the key non-null or accept the collapse. Deltas with
    zero NULL keys (detected inside the dirty-fid discovery job, no
    extra action) take the plain equi-join path, where the question
    never arises.

    SINGLE WRITER, like every sidecar-coordinated maintenance job —
    fan sources into one stream rather than racing appends. A
    violated contract is fail-fast DETECTED: every sidecar commit is
    CAS-guarded (:func:`_guarded_sidecar_write`), so a racing
    appender raises instead of silently dropping the other writer's
    bits (a false-negative class). The detection is unconditional —
    commits bump ``_cas_rev`` (byte-identical payloads still change
    the file) and same-host commits serialize under the
    ``_sidecar.py`` flock.

    Returns ``{"rows_appended", "files_touched", "new_bits"}``
    (``"skipped_replay": True`` when the marker short-circuits)."""
    raw = _read_sidecar_raw(path)  # CAS token for the sidecar commits
    meta = json.loads(raw)
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
    _check_key_type(delta, meta["key_col"])
    if key_cols:
        bad = [c for c in key_cols if c not in data_cols]
        if bad:
            raise ValueError(
                f"bloom_index_append: key columns {bad} not in index"
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
    # pin the delta once: bit discovery and the row append are
    # separate actions — a non-deterministic delta recomputed between
    # them could append keys the bitmap step never saw (exactly the
    # zorder_layout_append lesson). LAZY checkpoint (r17): the
    # discovery job right below materializes it, so the pin costs no
    # extra job; later consumers read the frozen blocks.
    tagged = (
        delta.select(*data_cols).withColumn("fid", fid)
        .localCheckpoint(eager=False)
    )
    # dirty fids from the ROWS, not the bits — NULL-key rows carry no
    # bits but still land in (and, under key_cols, must rewrite)
    # files. NULL-key probe and the rows_appended count fused into
    # the same job (zero extra actions): eqNullSafe is only needed
    # when the delta actually carries NULL keys (see
    # zorder.anti_upsert_keys); the count was a separate action until
    # r17.
    from nineinfra_spark.operators.zorder import (
        dirty_partitions_and_null_flag,
    )

    dirty, delta_has_null_keys, rows = dirty_partitions_and_null_flag(
        tagged, "fid", key_cols
    )
    delta_pairs = tagged.select(
        "fid",
        F.explode(
            _positions(F.col(meta["key_col"]), m_bits, k)
        ).alias("bit"),
    ).filter(F.col("bit").isNotNull())  # null keys are never indexed
    if meta.get("bits_storage") == "table":
        # Spark-side merge: old words ∪ delta words, bit_or per
        # (fid, w) — index-sized, nothing bitmap-shaped on the driver.
        # The merged table lands under a FRESH versioned dir; the
        # sidecar replace below is the atomic commit point (stale
        # versions are vacuumed by bloom_index_compact, not here — an
        # in-flight probe may still hold the old pointer).
        wb = meta.get("word_bits", WORD_BITS)
        old_dir = meta["bits_dir"]
        old_words = spark.read.parquet(os.path.join(path, old_dir))
        merged = (
            old_words.unionByName(_words_df(delta_pairs, wb))
            .groupBy("fid", "w")
            .agg(F.bit_or("word").alias("word"))
        )
        new_dir = f"{_BITS_TABLE}_{uuid.uuid4().hex[:8]}"
        (
            merged.repartition(max(1, n_files // 64), "fid")
            .write.parquet(os.path.join(path, new_dir))
        )

        # new_bits = popcount(new) − popcount(old), fused into ONE
        # signed-tag aggregate job (r17; was two separate read+agg
        # jobs — same sums, same difference)
        new_bits = (
            spark.read.parquet(os.path.join(path, new_dir))
            .select(F.lit(1).alias("_t"), "word")
            .unionByName(
                spark.read.parquet(os.path.join(path, old_dir)).select(
                    F.lit(-1).alias("_t"), "word"
                )
            )
            .agg(F.sum(F.bit_count("word") * F.col("_t")))
            .first()[0]
            or 0
        )
        meta["bits_dir"] = new_dir
    else:
        bits_rows = (
            delta_pairs.groupBy("fid")
            .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
            .collect()
        )
        decoded = _decode_bits(meta)
        new_bits = 0
        for r in bits_rows:
            f = int(r["fid"])
            merged_set = decoded.get(f, set()) | {int(b) for b in r["bits"]}
            new_bits += len(merged_set) - len(decoded.get(f, set()))
            decoded[f] = merged_set
        meta["enc"] = "b64"
        meta["bits"] = {
            str(f): _pack_bits(sorted(b)) for f, b in decoded.items()
        }
    # step 1: bits BEFORE data (superset bitmaps are safe, subset
    # bitmaps lose rows) — the marker is deliberately NOT in this
    # write; CAS-guarded so a racing appender's commit is detected
    # instead of silently dropped (see _guarded_sidecar_write)
    raw = _guarded_sidecar_write(path, meta, raw)
    if not dirty:
        if batch_id is not None:
            meta["last_batch_id"] = batch_id
            raw = _guarded_sidecar_write(path, meta, raw)
        return {"rows_appended": 0, "files_touched": 0, "new_bits": new_bits}
    # step 2: the data
    if key_cols:
        from pyspark.sql import types as T

        have_files = any(
            d.startswith("fid=") and os.path.isdir(os.path.join(path, d))
            for d in os.listdir(path)
        )
        if have_files:
            existing_dirty = (
                spark.read.parquet(path)
                .filter(F.col("fid").isin(dirty))
                .select(*data_cols, "fid")
            )
        else:  # empty index wrote no parquet at all
            schema = T.StructType.fromJson(json.loads(meta["schema"])).add(
                "fid", T.IntegerType()
            )
            existing_dirty = spark.createDataFrame([], schema)
        # rows whose key the delta carries are superseded — the
        # delta-keys side is delta-sized and broadcast; NULL-SAFE
        # equality (eqNullSafe) only when the delta carries NULL keys,
        # so a crash-window replay dedups NULL-key rows too (a plain
        # anti-join never matches NULL)
        from nineinfra_spark.operators.zorder import anti_upsert_keys

        existing_dirty = anti_upsert_keys(
            existing_dirty,
            tagged.select(*key_cols).distinct(),
            key_cols,
            null_safe=delta_has_null_keys,
        )
        combined = (
            existing_dirty.unionByName(tagged)
            .repartition(len(dirty), "fid")
            .localCheckpoint(eager=True)  # lineage break: overwriting a read path
        )
        (
            combined.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("fid")
            .parquet(path)
        )
    else:
        (
            tagged.repartition(len(dirty), "fid")
            .write.mode("append")
            .partitionBy("fid")
            .parquet(path)
        )
    # step 3: replay marker AFTER the data
    if batch_id is not None:
        meta["last_batch_id"] = batch_id
        raw = _guarded_sidecar_write(path, meta, raw)
    return {
        "rows_appended": rows,
        "files_touched": len(dirty),
        "new_bits": new_bits,
    }


def maintain_bloom_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: Sequence[str] | None = None,
    trigger_available_now: bool = False,
):
    """Continuous ingest for a bloom-indexed table: a Structured
    Streaming sink that merges every micro-batch through
    :func:`bloom_index_append` — the point-lookup index stays fresh
    WHILE the table ingests, the sibling of
    ``zorder.maintain_layout_stream`` (range skipping) and the
    dedup-index/rollup maintainers (managed tables).

    Exactly-once: Spark's checkpoint replays the last batch after a
    restart; the append's ``last_batch_id`` marker (committed AFTER
    the data) skips batches the index already holds, and ``key_cols``
    (recommended) closes the one data-committed/marker-unwritten
    crash window by upsert-dedup — proven through Spark's REAL
    checkpoint recovery in tests/test_bloomindex.py (delete the last
    ``commits/`` entry, restart, batch re-delivered, no duplication).

    ONE stream per index (single ``last_batch_id``) — fan sources
    into one stream rather than racing appenders. Returns the started
    ``StreamingQuery``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bloom_index_append(
            batch_df.sparkSession,
            path,
            batch_df,
            batch_id=batch_id,
            key_cols=key_cols,
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bloom_index_compact(
    spark: SparkSession,
    path: str,
    resize_if_fill_above: float | None = 0.5,
    fp_target: float = 0.01,
    retain_latest_bits_dir: bool = True,
) -> dict:
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

    Compaction is also the VACUUM point for table-backed bitmaps:
    each append commits a fresh versioned bits table and leaves the
    prior version on disk (an in-flight probe may still hold the old
    pointer — the same reader-race posture as the merge archives), so
    stale versions accumulate until this maintenance pass removes
    them. The single most RECENTLY superseded dir is retained by
    default (``retain_latest_bits_dir``): a probe that read the
    sidecar just before the append that superseded it can still be
    scanning that dir when compact runs — anything older has already
    survived two commit points and is safe to drop. Pass ``False``
    only when no probe can be in flight.

    **Resize (the sense→repair loop)**: an undersized bitmap
    SATURATES as keys accumulate (fill → 1.0, expected false-positive
    rate fill^k → 1, skipping degrades toward a full scan — still
    exact, never wrong). ``bloom_index_write`` warns at build time and
    the ``dq_bloom_fill_audit`` query detects it in an existing index;
    this is the repair: when the WORST per-file fill exceeds
    ``resize_if_fill_above`` (default 0.5, the build-warning
    threshold), the bitmaps are REBUILT from the data at
    ``m_bits_for(max per-file distinct keys, fp_target)`` — bounds,
    layout, and rows untouched, only the bitmap geometry changes,
    committed by the same atomic sidecar replace (versioned dir for
    table storage), so in-flight probes keep a consistent
    (m_bits, bits) pair whichever sidecar they read. Pass ``None`` to
    disable. Mirrors the z-order family's OPTIMIZE loop.

    Returns ``{"fids_compacted", "files_before", "files_after",
    "bits_dirs_vacuumed", "worst_fill", "resized_m_bits"}``
    (``resized_m_bits`` is None when no resize ran).

    SAME single-writer maintenance lane as :func:`bloom_index_append`:
    compact must not run concurrently with appends — its small-files
    rewrite replaces whole fid partitions from a pre-read snapshot, so
    a mid-compact append's rows would be silently dropped from the
    rewritten fids. The violation is fail-fast DETECTED both ways: the
    rewrite ends with a CAS touch-commit of the sidecar, which raises
    here if an append committed mid-compact, and trips the APPEND's
    own CAS if one is still in flight. Both directions are
    unconditional: every guarded commit bumps the sidecar's
    ``_cas_rev`` field (so even a payload-identical touch-commit — or
    an append whose delta added zero new bits — changes the bytes a
    stale token is compared against), and same-host commits serialize
    under an flock held across the whole read-check-replace
    (``operators/_sidecar.py``)."""
    import shutil

    raw = _read_sidecar_raw(path)  # CAS token: detect mid-compact appends
    meta0 = json.loads(raw)
    ref = meta0.get("bits_dir")
    stale = [
        d
        for d in os.listdir(path)
        if d.startswith(_BITS_TABLE)
        and d != ref
        and os.path.isdir(os.path.join(path, d))
    ]
    if retain_latest_bits_dir and stale:
        stale.remove(
            max(stale, key=lambda d: os.path.getmtime(os.path.join(path, d)))
        )
    vacuumed = 0
    for d in stale:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
        vacuumed += 1
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
    if frag:
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
        # touch-commit: raises if a maintenance writer committed while
        # the rewrite ran (its rows were just dropped from the
        # rewritten fids — surface the lost update instead of hiding
        # it), and trips an in-flight append's own CAS symmetrically
        raw = _guarded_sidecar_write(path, meta0, raw)
    else:
        files_after = files_before
    worst_fill, resized = _maybe_resize(
        spark, path, resize_if_fill_above, fp_target
    )
    return {
        "fids_compacted": len(frag),
        "files_before": files_before,
        "files_after": files_after,
        "bits_dirs_vacuumed": vacuumed,
        "worst_fill": worst_fill,
        "resized_m_bits": resized,
    }


def _maybe_resize(
    spark: SparkSession,
    path: str,
    fill_threshold: float | None,
    fp_target: float,
) -> tuple[float, int | None]:
    """The repair half of the bloom sense→repair loop (see
    :func:`bloom_index_compact`): measure the worst per-file fill and,
    past the threshold, rebuild the bitmaps FROM THE DATA at
    ``m_bits_for(max per-file distinct keys, fp_target)``. Only the
    bitmap geometry changes — bounds, layout, rows, and the replay
    marker are carried over verbatim; the atomic sidecar replace is
    the commit point (table storage lands in a fresh versioned dir
    first, the append protocol's reader-race posture)."""
    raw = _read_sidecar_raw(path)  # CAS token for the sidecar commit
    meta = json.loads(raw)
    table = meta.get("bits_storage") == "table"
    fills = (
        bloom_fill_ratios_table(spark, path)
        if table
        else bloom_fill_ratios(meta)
    )
    worst = max(fills.values(), default=0.0)
    if fill_threshold is None:
        return worst, None
    # k-aware effective threshold: the DESIGN fill for fp_target at k
    # hashes is fp^(1/k) (0.32 at k=4, 0.56 at k=8) — a correctly
    # sized high-k index sits just under it, so a flat 0.5 would trip
    # the resize check forever on k>=7 geometries that cannot be
    # improved at this fp_target
    eff = max(fill_threshold, fp_target ** (1.0 / meta["k"]))
    if worst <= eff:
        return worst, None
    have_files = any(
        d.startswith("fid=") and os.path.isdir(os.path.join(path, d))
        for d in os.listdir(path)
    )
    if not have_files:
        return worst, None
    key_col, k = meta["key_col"], meta["k"]
    # no localCheckpoint pin here: the parquet files are immutable
    # during maintenance (single writer, and compact's own rewrite is
    # already done), so the sizing aggregate and the pairs build may
    # scan twice — pinning would materialize the WHOLE table for a
    # bitmap rebuild, the wrong trade at 100 TB
    data = spark.read.parquet(path)
    max_keys = (
        data.filter(F.col(key_col).isNotNull())
        .groupBy("fid")
        .agg(F.count_distinct(key_col).alias("nk"))
        .agg(F.max("nk"))
        .first()[0]
        or 0
    )
    m_new = m_bits_for(max_keys, fp_target, k)
    if m_new <= meta["m_bits"]:
        # fill is high but the geometry is already at (or past) the
        # target size — rebuilding at the same m cannot lower it
        return worst, None
    pairs = data.select(
        "fid", F.explode(_positions(F.col(key_col), m_new, k)).alias("bit")
    ).filter(F.col("bit").isNotNull())
    meta["m_bits"] = m_new
    if table:
        wb = meta.get("word_bits", WORD_BITS)
        new_dir = f"{_BITS_TABLE}_{uuid.uuid4().hex[:8]}"
        (
            _words_df(pairs, wb)
            .repartition(max(1, meta["n_files"] // 64), "fid")
            .write.parquet(os.path.join(path, new_dir))
        )
        meta["bits_dir"] = new_dir
    else:
        bits_rows = (
            pairs.groupBy("fid")
            .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
            .collect()
        )
        meta["enc"] = "b64"
        meta["bits"] = {
            str(r["fid"]): _pack_bits([int(b) for b in r["bits"]])
            for r in bits_rows
        }
    _guarded_sidecar_write(path, meta, raw)
    return worst, m_new


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


def bloom_probe_files_table(
    spark: SparkSession, path: str, keys: Sequence, meta: dict | None = None
) -> list[int]:
    """Table-backed twin of :func:`bloom_probe_files`: the probe keys'
    ``(word, mask)`` pairs (len(keys) × k rows — probe-sized, tiny)
    BROADCAST against the parquet bits table; admission = all k hash
    functions matched per (fid, key). The bits table — the side that
    is 10⁵–10⁶ rows × ~1 MB bitmaps at 100 TB — never moves and never
    reaches the driver; the output is fid ids, file-count-bounded."""
    if meta is None:
        meta = read_index_meta(path)
    hits = _probe_hits_df(spark, path, meta, keys)
    if hits is None:
        return []
    return sorted(r["fid"] for r in hits.collect())


def _probe_hits_df(
    spark: SparkSession, path: str, meta: dict, keys: Sequence
) -> DataFrame | None:
    """The hit-fids plan of the table probe (None when no non-null
    keys) — factored out so tests can pin its SHAPE: the probe side
    broadcast (BroadcastHashJoin on ``w``, never a shuffle of the
    bits table, never a cartesian)."""
    m_bits, k = meta["m_bits"], meta["k"]
    wb = meta.get("word_bits", WORD_BITS)
    rows = []
    for key in keys:
        if key is None:
            continue  # NULL probes match nothing, like SQL equality
        rk = _render_key(key)
        for j, p in enumerate(_positions_py(rk, m_bits, k)):
            rows.append((rk, j, p // wb, 1 << (p % wb)))
    if not rows:
        return None
    probe_df = spark.createDataFrame(
        rows, "pkey string, j int, w int, m bigint"
    )
    # the probe's word indexes are a small known set — push them into
    # the bits-table scan as an IN filter so parquet min/max row-group
    # stats skip everything outside it (the join alone would still
    # read every row group of the (n_files x m/63)-row table)
    words = sorted({r[2] for r in rows})
    bits = spark.read.parquet(os.path.join(path, meta["bits_dir"])).filter(
        F.col("w").isin(words)
    )
    return (
        bits.join(F.broadcast(probe_df), "w")
        .filter(F.col("word").bitwiseAND(F.col("m")) != 0)
        .groupBy("fid", "pkey")
        .agg(F.count_distinct("j").alias("nj"))
        .filter(F.col("nj") == F.lit(k))
        .select("fid")
        .distinct()
    )


def bloom_skipping_read(
    spark: SparkSession, path: str, keys: Sequence
) -> tuple[DataFrame, dict]:
    """Point-lookup over a :func:`bloom_index_write` directory: consult
    the bitmaps (broadcast-join probe for table storage, driver-side
    for JSON sidecars), read ONLY the files whose bitmap admits some
    probe key (partition pruning on ``fid`` — skipped files are never
    opened), then apply the exact ``key IN (...)`` filter over the
    survivors. Returns ``(rows_df, stats)`` with
    ``stats = {"files_total", "files_hit", "files_skipped"}``.

    Exactness: the bitmap has no false negatives, so the pruned read
    returns exactly the rows a full-table filter would — pinned by
    tests/test_bloomindex.py against the unpruned scan."""
    from pyspark.sql import types as T

    meta = read_index_meta(path)
    # files_total is the PHYSICAL file count — the denominator a naive
    # reader would open; a free directory listing, not a Spark job
    # (and unlike the bits table it also counts files holding only
    # NULL keys, which carry no bitmap yet still exist on disk)
    n_present = sum(
        1
        for d in os.listdir(path)
        if d.startswith("fid=") and os.path.isdir(os.path.join(path, d))
    )
    if meta.get("bits_storage") == "table":
        hit = bloom_probe_files_table(spark, path, keys, meta)
    else:
        hit = bloom_probe_files(meta, keys)
    stats = {
        "files_total": n_present,
        "files_hit": len(hit),
        "files_skipped": n_present - len(hit),
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
