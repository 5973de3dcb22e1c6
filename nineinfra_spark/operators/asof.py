"""As-of (temporal) join — a composite operator Spark lacks natively.

Semantics: for each left row, attach the payload of the most recent
right row with ``right.ts <= left.ts`` (direction="backward"),
matching per key. Ties on timestamp: the right row counts (inclusive).

The reference reserves a streaming/temporal mode it never implemented
("Todo support flink", ``internal/controller/kyuubi.go:205``,
``api/v1alpha1/ninecluster_types.go:41``); this provides the batch
as-of primitive.

Scale design: implemented as union → single window over (key, ts) —
ONE shuffle on the key, no range cross-product. At 100 TB this is the
only shape that works: a naive `l.ts >= r.ts` join explodes
quadratically per key, while this is O(n log n) per partition with
last(ignorenulls) carried forward. Skewed keys are handled by AQE;
for a known-hot key, pre-salt the window by bucketing ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _has_map_type(dt: T.DataType) -> bool:
    """True if the type contains a MapType anywhere — Spark's one
    non-orderable data type (sorting a struct that embeds one raises
    AnalysisException)."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_map_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_map_type(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    Parameters
    ----------
    on : key column name (same on both sides)
    ts : timestamp column name (same on both sides)
    payload : right columns to attach (default: all non-key/ts columns).
        Payload columns must have ORDERABLE types (no map<...>): the
        duplicate-right-row tie-break sorts the payload struct, which
        is what makes the winning payload value-deterministic instead
        of partition-layout-dependent. Non-orderable payloads are
        rejected up front with a clear error.
    direction : "backward" (<=), "forward" (>=), or "nearest" (the
        closer of the two by |gap|, ties backward — pandas
        merge_asof(direction="nearest") semantics; gaps compare as
        exact integer microseconds for timestamp ts)
    tolerance_s : optional max |left.ts - right.ts| in seconds (the
        pandas ``merge_asof(tolerance=...)`` semantic): a match farther
        away than this is treated as NO match — payload columns come
        back NULL, exactly as for a key with no prior right row. The
        comparison happens AFTER the single-window fill, so the plan
        shape (one shuffle, no range product) is unchanged.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance_s is not None and tolerance_s < 0:
        raise ValueError(f"tolerance_s must be >= 0, got {tolerance_s}")
    if payload is None:
        payload = [c for c in right.columns if c not in (on, ts)]
    # reserved working columns / output-name collisions are refused up
    # front — withColumn/select would otherwise silently duplicate or
    # clobber them (same guard class as snapshot_diff's old_/new_ and
    # zorder's 'zb' checks, r13 review pass):
    reserved = {"__is_left", "__r"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join: columns {sorted(reserved)} collide with the "
            "join's internal working columns — rename them first"
        )
    if "__ts" in payload:
        raise ValueError(
            "asof_join: payload column '__ts' collides with the matched "
            "right-row timestamp field — rename it first"
        )
    out_clash = sorted(
        {f"{c}{suffix}" for c in [*payload, ts]} & set(left.columns)
    )
    if out_clash:
        raise ValueError(
            f"asof_join: left columns {out_clash} collide with the "
            f"suffixed right-payload output names (suffix={suffix!r}) — "
            "rename them or pass a different suffix"
        )
    unorderable = [c for c in payload if _has_map_type(right.schema[c].dataType)]
    if unorderable:
        raise TypeError(
            "asof_join payload columns must be orderable (used as the "
            f"deterministic tie-break); map-typed columns: {unorderable}. "
            "Drop them from `payload` or recast them (e.g. map_entries)."
        )

    # The matched right row travels as ONE struct(ts, *payload) so a
    # single last(ignorenulls) fill attaches an atomic right-row
    # snapshot — per-column fills could mix payloads from different
    # right rows whenever a payload value is NULL.
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None)
        .cast(
            "struct<" + ",".join(
                [f"__ts:{right.schema[ts].dataType.simpleString()}"]
                + [f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload]
            ) + ">"
        )
        .alias("__r"),
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(ts).alias("__ts"), *[F.col(c) for c in payload]
        ).alias("__r"),
    )
    combined = l_tag.unionByName(r_tag)

    # Right rows sort before left rows at equal ts (inclusive match);
    # among duplicate right rows at equal (key, ts) the struct value is
    # the tie-break, so the winning payload is value-deterministic, not
    # partition-layout-dependent.
    def _frame(ascending: bool):
        order = [F.col(ts).asc() if ascending else F.col(ts).desc(),
                 F.col("__is_left").asc(),
                 F.col("__r").asc()]
        return (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if direction == "nearest":
        # Both directional fills over the SAME partitioning — one
        # exchange, two sorts — then choose per row by exact
        # integer-microsecond gap; ties go backward (the pandas
        # merge_asof(direction="nearest") convention).
        filled = combined.select(
            *[c for c in combined.columns if c != "__r"],
            F.last("__r", ignorenulls=True).over(_frame(True)).alias("__rb"),
            F.last("__r", ignorenulls=True).over(_frame(False)).alias("__rf"),
        )

        def _micros(col):
            # TIMESTAMP_NTZ gaps must be WALL-CLOCK arithmetic: routing
            # through TIMESTAMP maps through the session timezone,
            # which is non-linear at DST transitions — a gap crossing
            # the spring-forward hole shrinks by an hour and 'nearest'
            # picks the wrong side (r11 review finding; the session-tz
            # dependence also made results vary per session). DST-free
            # via timestamp_diff against the NTZ epoch.
            dt = left.schema[ts].dataType
            if isinstance(dt, T.TimestampNTZType):
                return F.timestamp_diff(
                    "MICROSECOND",
                    F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
                    col,
                )
            if isinstance(dt, T.TimestampType):
                return F.unix_micros(col)
            return col.cast("double")

        gap_b = _micros(F.col(ts)) - _micros(F.col("__rb.__ts"))
        gap_f = _micros(F.col("__rf.__ts")) - _micros(F.col(ts))
        chosen = (
            F.when(F.col("__rb").isNull(), F.col("__rf"))
            .when(F.col("__rf").isNull(), F.col("__rb"))
            .when(gap_f < gap_b, F.col("__rf"))
            .otherwise(F.col("__rb"))
        )
        filled = filled.select(
            *[c for c in filled.columns if c not in ("__rb", "__rf")],
            chosen.alias("__r"),
        )
    else:
        filled = combined.select(
            *[c for c in combined.columns if c != "__r"],
            F.last("__r", ignorenulls=True)
            .over(_frame(direction == "backward"))
            .alias("__r"),
        )
    matched = F.col("__r")
    if tolerance_s is not None:
        # gap in seconds regardless of ts type. TIMESTAMP_NTZ must use
        # wall-clock arithmetic, NOT a session-tz cast: across a DST
        # transition the cast distorts the gap by up to an hour,
        # mis-admitting/mis-dropping matches at the tolerance boundary
        # (r11 review finding — same distortion as the 'nearest' gap).
        def _secs(col):
            if isinstance(left.schema[ts].dataType, T.TimestampNTZType):
                return (
                    F.timestamp_diff(
                        "MICROSECOND",
                        F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
                        col,
                    ).cast("double")
                    / 1_000_000.0
                )
            return col.cast("double")

        gap = F.abs(_secs(F.col(ts)) - _secs(F.col("__r.__ts")))
        matched = F.when(gap <= F.lit(float(tolerance_s)), F.col("__r"))
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *[c for c in filled.columns if c not in ("__is_left", "__r")],
            *[matched.getField(c).alias(f"{c}{suffix}") for c in payload],
            matched.getField("__ts").alias(f"{ts}{suffix}"),
        )
    )
