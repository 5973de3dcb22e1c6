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


def zvalue_column(
    df: DataFrame, cols: Sequence[str], bits: int | None = None
) -> Column:
    """Morton code over ``cols``: each column is min-max scaled to an
    unsigned ``bits``-bit integer grid, then the columns' bits are
    interleaved (column i contributes bit b to z-bit ``b*k + i``).
    Pure integer/bit arithmetic after the scaling divide — the
    rounding to grid cells uses floor on a non-negative ratio, so the
    same row always lands in the same cell.

    The min/max normalization constants come from one global aggregate
    over ``df`` — a broadcast-sized side input, computed once per
    layout job (at 100 TB: one column-pruned scan-speed agg)."""
    k = len(cols)
    if not 1 <= k <= 4:
        raise ValueError(f"zorder supports 1..4 columns, got {k}")
    if bits is None:
        bits = min(ZBITS, 62 // k)
    if bits * k > 62:
        raise ValueError(f"bits={bits} × {k} cols exceeds a signed long")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).first()
    grid = (1 << bits) - 1
    cells = []
    for c in cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
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
    z = zvalue_column(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
