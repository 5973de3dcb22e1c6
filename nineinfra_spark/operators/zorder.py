"""Z-order (Morton) file-layout clustering for multi-dimensional data
skipping.

Parquet readers prune row groups / files by min-max statistics. A
table sorted by one column skips beautifully on that column and not at
all on others; interleaving the BITS of several columns' ranks (the
Z-order curve) gives every participating column locality, so filters
on ANY of them skip most files. This is the layout optimization the
lakehouse engines expose as ``OPTIMIZE ... ZORDER BY``; here it is a
native operator over plain parquet: compute the z-value, range-
partition + sort by it, write.

Scale design: rank normalization uses ``percent_rank`` per column —
one pass per column of (value)-keyed window over a RANGE-partitioned
sort... which would serialize; instead we normalize by MIN/MAX scaling
(one tiny global aggregate, broadcast back) — the standard practical
choice (Delta's implementation samples range boundaries the same way).
Skew in value distributions degrades z-locality but never correctness.
The final ``repartitionByRange(z)`` is one range exchange — identical
cost to any global sort-write — and each output task writes one
z-contiguous file, which is what makes the min-max envelopes tight.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits of z-resolution per column. The k-column z-value uses
#: k*bits bits and must stay inside a signed 64-bit long (≤ 62), so
#: the DEFAULT auto-fits: min(ZBITS, 62 // k) — 16 bits up to 3 cols,
#: 15 bits at 4 cols (r11 review finding: the old fixed default made
#: the documented 4-column form unconditionally raise).
ZBITS = 16


def anti_upsert_keys(
    existing: DataFrame,
    delta_keys: DataFrame,
    key_cols: Sequence[str],
    null_safe: bool = True,
) -> DataFrame:
    """Drop ``existing`` rows whose key tuple ``delta_keys`` carries
    (delta wins — the upsert half of the append maintainers' replay
    convergence). NULL-SAFE on every key column (``eqNullSafe``) by
    default: a plain equi anti-join never matches NULL keys
    (NULL != NULL), so a crash-window replay would silently DUPLICATE
    NULL-key rows despite ``key_cols`` — exactly the convergence
    guarantee the maintainers document. EqualNullSafe still extracts
    as a hash-join key, so the delta-sized ``delta_keys`` side (must
    be distinct) stays a broadcast hash join, never a nested loop.

    NULL-collapse consequence (by design, callers must document):
    under ``null_safe=True`` every NULL in a key column matches every
    other NULL — a delta carrying any NULL-key row supersedes ALL
    existing NULL-key rows (in the partitions being rewritten), unlike
    SQL/Delta MERGE where NULL never matches. Callers that know the
    delta carries ZERO NULL keys may pass ``null_safe=False``: the two
    forms are then semantically IDENTICAL — a non-null delta key
    matches the same rows under ``=`` and ``<=>``, and a NULL-key
    ``existing`` row is KEPT by both (never matched either way). Note
    Spark does NOT null-prune the left/preserved side of a left_anti
    join (pruning it would drop rows the join must keep); the plain
    form buys semantic clarity plus build-side null filtering only —
    measured ~flat at sf0.1."""
    from functools import reduce

    renamed = delta_keys.select(
        *[F.col(c).alias(f"__dk_{c}") for c in key_cols]
    )
    if null_safe:
        pairs = [
            existing[c].eqNullSafe(renamed[f"__dk_{c}"]) for c in key_cols
        ]
    else:
        pairs = [existing[c] == renamed[f"__dk_{c}"] for c in key_cols]
    cond = reduce(lambda a, b: a & b, pairs)
    return existing.join(F.broadcast(renamed), cond, "left_anti")


def dirty_partitions_and_null_flag(
    delta: DataFrame, part_col: str, key_cols: Sequence[str] | None
) -> tuple[list, bool, int]:
    """Distinct ``part_col`` ids of ``delta``, whether any
    ``key_cols`` value is NULL, and the delta ROW COUNT — all fused
    into the ONE job both append maintainers already run for
    dirty-partition discovery, so the eqNullSafe gate (see
    :func:`anti_upsert_keys`) and the ``rows_appended`` stat (r17:
    formerly a separate ``delta.count()`` action per micro-batch)
    cost no extra action. The count is the sum of the per-partition
    group counts — exact by definition. Shared by
    ``zorder_layout_append`` (part_col="zb") and
    ``bloom_index_append`` (part_col="fid") — one implementation, one
    gating rule."""
    from functools import reduce

    if key_cols:
        null_any = reduce(
            lambda a, b: a | b, [F.col(c).isNull() for c in key_cols]
        )
        agg = (
            delta.groupBy(part_col)
            .agg(
                F.max(F.when(null_any, 1).otherwise(0)).alias("__nk"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        return (
            [r[part_col] for r in agg],
            any(r["__nk"] for r in agg),
            sum(r["__n"] for r in agg),
        )
    agg = (
        delta.groupBy(part_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    return [r[part_col] for r in agg], False, sum(r["__n"] for r in agg)


def _resolve_bits(k: int, bits: int | None) -> int:
    if not 1 <= k <= 4:
        raise ValueError(f"zorder supports 1..4 columns, got {k}")
    if bits is None:
        bits = min(ZBITS, 62 // k)
    if bits * k > 62:
        raise ValueError(f"bits={bits} × {k} cols exceeds a signed long")
    return bits


def zvalue_expr(
    cols: Sequence[str],
    bounds: dict[str, tuple[float | None, float | None]],
    bits: int | None = None,
) -> Column:
    """Morton code over ``cols`` with CALLER-SUPPLIED normalization
    bounds — the frozen-bounds form incremental layout maintenance
    needs (new batches must land in the SAME cells as the original
    layout job, so the bounds are persisted, not recomputed). Values
    outside ``[lo, hi]`` clamp to the edge cells (the least/greatest
    pair) — correct for skipping because file envelopes are always
    computed from the actual data at read time, never from the grid.

    ``bounds[c] = (lo, hi)``; a ``(None, None)`` entry means the
    layout job saw no data for the column (empty frame / all-NULL) —
    any constants work, so 0-span constants are used."""
    k = len(cols)
    bits = _resolve_bits(k, bits)
    grid = (1 << bits) - 1
    cells = []
    for c in cols:
        lo, hi = bounds[c]
        if lo is None or hi is None:
            # empty frame or all-NULL column: no data to scale; any
            # constants work (NULL inputs fall through least/greatest
            # to a deterministic cell) — just don't crash the layout
            # job on a None - None subtraction (r11 review finding)
            lo, hi = 0.0, 0.0
        span = (hi - lo) or 1.0
        cell = F.least(
            F.lit(grid),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * grid).cast(
                "long"
            ),
        )
        cells.append(F.greatest(F.lit(0), cell))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    return z


def column_bounds(
    df: DataFrame, cols: Sequence[str]
) -> dict[str, tuple[float | None, float | None]]:
    """Min/max normalization constants for ``cols`` — one global
    aggregate over ``df``, a broadcast-sized side input (at 100 TB:
    one column-pruned scan-speed agg)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).first()
    return {c: (stats[f"_lo_{c}"], stats[f"_hi_{c}"]) for c in cols}


def zvalue_column(
    df: DataFrame, cols: Sequence[str], bits: int | None = None
) -> Column:
    """Morton code over ``cols``: each column is min-max scaled to an
    unsigned ``bits``-bit integer grid, then the columns' bits are
    interleaved (column i contributes bit b to z-bit ``b*k + i``).
    Pure integer/bit arithmetic after the scaling divide — the
    rounding to grid cells uses floor on a non-negative ratio, so the
    same row always lands in the same cell. Bounds come from one
    global aggregate over ``df`` (see :func:`column_bounds`); for
    frozen caller-supplied bounds use :func:`zvalue_expr`."""
    _resolve_bits(len(cols), bits)
    return zvalue_expr(cols, column_bounds(df, cols), bits=bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int | None = None,
    mode: str = "error",
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve over ``cols`` — after this, a min-max-pruning reader
    skips most files for a selective filter on ANY of ``cols``.
    One range exchange + per-task sort; no driver materialization."""
    if "_z" in df.columns:
        raise ValueError(
            "zorder_write: column '_z' is reserved for the z-value — "
            "rename it first (withColumn would silently replace it)"
        )
    z = zvalue_column(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


# ------------------------------------------ incremental layout maintenance

#: sidecar filename; the leading underscore makes Spark's parquet
#: reader skip it as a non-data file.
_LAYOUT_SIDECAR = "_zlayout.json"


def _write_sidecar(path: str, meta: dict) -> None:
    from nineinfra_spark.operators import _sidecar

    _sidecar.write(path, _LAYOUT_SIDECAR, meta)


def _read_sidecar_raw(path: str) -> str:
    from nineinfra_spark.operators import _sidecar

    return _sidecar.read_raw(path, _LAYOUT_SIDECAR)


def _guarded_sidecar_write(path: str, meta: dict, expected_raw: str) -> str:
    """Optimistic-CAS marker commit for the append maintainer — the
    shared protocol in ``operators/_sidecar.py``: two racing appenders
    interleaving dynamic-partition overwrites is the single-writer
    contract's failure mode; the conflict raises at the marker commit
    instead of silently diverging."""
    from nineinfra_spark.operators import _sidecar

    return _sidecar.guarded_write(
        path, _LAYOUT_SIDECAR, meta, expected_raw, "z-order layout"
    )


def read_layout_meta(path: str) -> dict:
    """The frozen layout contract of a :func:`zorder_layout_write`
    directory: z columns, bit widths, and the normalization bounds
    every later append must reuse."""
    import json
    import os

    with open(os.path.join(path, _LAYOUT_SIDECAR), encoding="utf-8") as f:
        return json.load(f)


def zorder_layout_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    bucket_bits: int = 5,
    mode: str = "error",
) -> dict:
    """Write ``df`` as a z-BUCKETED parquet directory: Morton code
    over ``cols``, top ``bucket_bits`` bits → partition column ``zb``
    (≤ ``2**bucket_bits`` directories, each holding one z-contiguous
    file), plus a ``_zlayout.json`` sidecar freezing the layout
    contract (columns, bits, normalization bounds). This is the
    OPTIMIZE-style full layout job; :func:`zorder_layout_append` is
    its incremental maintenance loop.

    The frozen bounds are what make increments possible: a later
    batch normalized against ITS OWN min/max would scatter into
    different cells than the original layout, dirtying every bucket.
    Values beyond the frozen range clamp into the edge buckets —
    envelope-based skipping stays SOUND (envelopes are computed from
    actual file contents at read time); it merely degrades toward a
    fat edge bucket under heavy drift, which a periodic full
    re-layout (re-running this function) re-freezes away.

    Returns the sidecar dict. Scale posture: one bounds aggregate +
    one hash exchange on ``zb`` + the write — identical cost to any
    clustered rewrite of the same data."""
    k = len(cols)
    rbits = _resolve_bits(k, bits)
    if not 1 <= bucket_bits <= rbits * k:
        raise ValueError(
            f"bucket_bits={bucket_bits} outside 1..{rbits * k} (= bits*k)"
        )
    if "zb" in df.columns:
        raise ValueError(
            "zorder_layout_write: column 'zb' is reserved for the z-bucket "
            "partition column — rename it first (withColumn would silently "
            "replace it and corrupt the layout's data_columns contract)"
        )
    bounds = column_bounds(df, cols)
    z = zvalue_expr(cols, bounds, bits=rbits)
    zb = F.shiftright(z, rbits * k - bucket_bits)
    n_buckets = 1 << bucket_bits
    (
        df.withColumn("zb", zb)
        .repartition(n_buckets, "zb")
        .write.mode(mode)
        .partitionBy("zb")
        .parquet(path)
    )
    meta = {
        "cols": list(cols),
        "bits": rbits,
        "bucket_bits": bucket_bits,
        "bounds": {c: list(bounds[c]) for c in cols},
        "data_columns": [c for c in df.columns],
    }
    _write_sidecar(path, meta)
    return meta


def zorder_layout_append(
    spark,
    path: str,
    delta: DataFrame,
    batch_id: int | None = None,
    key_cols: Sequence[str] | None = None,
) -> dict:
    """Incremental z-order maintenance: merge ``delta`` into an
    existing :func:`zorder_layout_write` directory, rewriting ONLY the
    buckets the delta touches. The cost is proportional to the dirty
    buckets' data, not the table — the OPTIMIZE loop a continuously-
    ingesting 100 TB table needs (a full re-layout per batch would be
    a full table rewrite per batch).

    Mechanics: the delta's ``zb`` is computed with the sidecar's
    FROZEN bounds (same cells as the original job); its distinct
    bucket ids (≤ ``2**bucket_bits`` — driver-bounded by construction)
    select the dirty partitions; those partitions' current rows union
    the delta and are rewritten via dynamic-partition overwrite, so
    untouched buckets' files are never opened, and each dirty bucket
    ends as ONE z-bucketed file again. The combined dirty rows are
    localCheckpoint-ed first — the lineage break Spark requires to
    overwrite a path it is reading — sized to the dirty buckets, not
    the table. Readers racing the append see each bucket either whole
    old or whole new (parquet dynamic-overwrite commits per
    partition).

    Streaming/replay semantics (the :func:`maintain_layout_stream`
    sink contract): with ``batch_id`` set, a batch id ≤ the sidecar's
    ``last_batch_id`` is SKIPPED — foreachBatch re-delivers the last
    batch after a restart, and a blind re-append would duplicate it.
    The sidecar marker is written after the partition-overwrite
    commits, so one crash window remains (data committed, marker not);
    ``key_cols`` closes it: existing rows whose key appears in the
    delta are dropped before the union (delta wins), so REPLAYING a
    batch converges — a re-delivered row has the same z-cell as the
    copy it supersedes, so the stale copy is always inside the dirty
    set. As a GENERAL upsert the same mechanism is exact only while
    an update doesn't move the row's z-cell (z columns part of the
    key, or unchanged by updates); an update that changes a z column
    leaves the superseded copy in a non-dirty bucket this function
    deliberately never opens — route such updates through a full
    re-layout or the merge protocol. Without ``key_cols`` the marker
    alone still dedups every non-crash replay.

    NULL keys: when the delta carries a NULL in a key column, keys
    match NULL-SAFELY (``<=>``) so replayed NULL-key rows converge —
    with the consequence that NULL collapses to a SINGLE upsert key:
    one NULL-key delta row supersedes ALL existing NULL-key rows in
    the dirty buckets, unlike SQL/Delta MERGE where NULL never
    matches. If NULL keys denote distinct rows in your data, make the
    key non-null (coalesce a surrogate) or accept the collapse.
    Deltas with zero NULL keys (detected per batch inside the
    dirty-bucket discovery job, no extra action) take the plain
    equi-join path, where the question never arises.

    Returns ``{"rows_appended", "buckets_dirty", "buckets_total"}``
    (``"skipped_replay": True`` added when the marker short-circuits).

    SINGLE WRITER: like every OPTIMIZE-style maintenance job on plain
    parquet, concurrent appends to one layout are not coordinated —
    two racing appends that share a dirty bucket each read the
    pre-race rows and the last partition commit wins, dropping the
    loser's rows. Schedule one maintenance job per layout (the
    streaming sink enforces this shape naturally); tables needing
    multi-writer semantics belong in the versioned-merge protocol. A
    CRASHED append, by contrast, converges: dynamic overwrite commits
    per partition, so re-running the same delta with ``key_cols``
    anti-joins away whichever buckets already carry it and rewrites
    the dirty set whole (the algebra `test_key_dedup_closes_the_crash_
    window` pins).
    """
    import json
    import os

    raw = _read_sidecar_raw(path)  # CAS token for the marker commit
    meta = json.loads(raw)
    if batch_id is not None:
        last = meta.get("last_batch_id")
        if last is not None and batch_id <= last:
            return {
                "rows_appended": 0,
                "buckets_dirty": 0,
                "buckets_total": -1,
                "skipped_replay": True,
            }
    cols, bits, bucket_bits = meta["cols"], meta["bits"], meta["bucket_bits"]
    data_columns = meta["data_columns"]
    if sorted(delta.columns) != sorted(data_columns):
        raise ValueError(
            f"zorder_layout_append: delta columns {sorted(delta.columns)} "
            f"!= layout columns {sorted(data_columns)}"
        )
    bounds = {c: tuple(v) for c, v in meta["bounds"].items()}
    z = zvalue_expr(cols, bounds, bits=bits)
    zb = F.shiftright(z, bits * len(cols) - bucket_bits)
    # pin the delta ONCE: the dirty-bucket discovery and the rewrite
    # below are separate actions — a non-deterministic delta (a
    # sample, a changing view) recomputed between them could surface
    # NEW buckets at write time whose old rows were never read into
    # `existing_dirty`, silently dropping them in the overwrite. The
    # checkpoint is LAZY (r17): the discovery job right below is the
    # materializing action, so the pin costs zero extra jobs — every
    # later consumer reads the frozen blocks (localCheckpoint
    # materializes exactly once; eager vs lazy changes only WHEN).
    delta_b = (
        delta.select(*data_columns).withColumn("zb", zb)
        .localCheckpoint(eager=False)
    )
    if key_cols:
        bad = [c for c in key_cols if c not in data_columns]
        if bad:
            raise ValueError(
                f"zorder_layout_append: key columns {bad} not in layout"
            )
    # NULL-key probe AND the rows_appended count fused into the
    # dirty-bucket discovery job (zero extra actions): eqNullSafe is
    # only NEEDED when the delta actually carries NULL keys (see
    # anti_upsert_keys); the count was a separate per-batch action
    # until r17.
    dirty, delta_has_null_keys, rows_appended = (
        dirty_partitions_and_null_flag(delta_b, "zb", key_cols)
    )
    n_total = sum(
        1
        for d in os.listdir(path)
        if d.startswith("zb=") and os.path.isdir(os.path.join(path, d))
    )
    if not dirty:
        return {
            "rows_appended": 0,
            "buckets_dirty": 0,
            "buckets_total": n_total,
        }
    existing_dirty = (
        spark.read.parquet(path)
        .filter(F.col("zb").isin(dirty))
        .select(*data_columns, "zb")
    )
    if key_cols:
        # upsert: rows whose key the delta carries are superseded —
        # the delta-keys side is delta-sized and broadcast; null-safe
        # equality (only when the delta carries NULL keys) so NULL-key
        # rows dedup on replay too
        existing_dirty = anti_upsert_keys(
            existing_dirty,
            delta_b.select(*key_cols).distinct(),
            key_cols,
            null_safe=delta_has_null_keys,
        )
    combined = (
        existing_dirty.unionByName(delta_b)
        .repartition(max(len(dirty), 1), "zb")
        .localCheckpoint(eager=True)
    )
    (
        combined.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("zb")
        .parquet(path)
    )
    if batch_id is not None:
        meta["last_batch_id"] = batch_id
        _guarded_sidecar_write(path, meta, raw)
    new_ids = {
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("zb=") and os.path.isdir(os.path.join(path, d))
    }
    return {
        "rows_appended": rows_appended,
        "buckets_dirty": len(dirty),
        "buckets_total": len(new_ids),
    }


def maintain_layout_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols: Sequence[str] | None = None,
    trigger_available_now: bool = False,
):
    """Continuous-ingestion layout maintenance: a Structured Streaming
    sink that merges every micro-batch into a
    :func:`zorder_layout_write` directory through
    :func:`zorder_layout_append` — the table stays z-clustered WHILE
    it ingests, instead of degrading until a nightly OPTIMIZE.

    Exactly-once: Spark's checkpoint replays the last batch after a
    restart; the append's ``batch_id`` marker skips batches the layout
    already holds, and ``key_cols`` (recommended — any natural unique
    id) additionally dedups the one crash window between the data
    commit and the marker write (see :func:`zorder_layout_append`).

    ONE stream per layout: the sidecar holds a single
    ``last_batch_id``, so a second concurrent stream (its own
    checkpoint, its own batch-id sequence) would skip batches the
    FIRST stream's marker happens to dominate. Fan multiple sources
    into one stream (union) instead of running parallel writers.

    Returns the started ``StreamingQuery``. Scale posture: per batch,
    cost tracks the batch's dirty buckets (measured flat for 10×
    table size at fixed batch size); the stream's own state is
    nothing but Spark's source offsets."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        zorder_layout_append(
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
