"""Z-order (Morton-curve) layout for multi-column data skipping.

Parquet scans skip whole files/row-groups when the pushed predicate falls
outside the footer's min/max stats. Sorting by ONE column gives perfect
skipping on that column and none on others; interleaving the bits of
several columns (the Z-order curve every lakehouse engine exposes as
``OPTIMIZE ... ZORDER BY``) gives each column a tight per-file bounding
box, so selective filters on ANY of the z-ordered columns prune files.

The z-value here is a deterministic pure-integer expression (clamp each
column to ``bits`` bits, interleave), so it is portable to the DuckDB
oracle — the LAYOUT machinery itself is hash-checkable, not just trusted.

At 100 TB: ``zorder_write`` = repartitionByRange on the z-value (range
exchange — contiguous curve segments per output file) + sortWithinPartitions
+ parquet write. The skipping effect is asserted in tests from the actual
parquet footer statistics (per-file min/max volume shrinks by orders of
magnitude vs an unsorted write).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_write"]


def zvalue(cols: Sequence[Column | str], *, bits: int = 16) -> Column:
    """Morton z-value of ``len(cols)`` non-negative integer columns.

    Each column is clamped to ``[0, 2^bits)``; bit b of column i lands at
    output bit ``b * ncols + i``. ncols * bits must fit in 63 bits.
    """
    ncols = len(cols)
    if ncols < 1:
        raise ValueError("zvalue needs at least one column")
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a signed long")
    cap = (1 << bits) - 1
    z: Column | None = None
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.greatest(F.lit(0), F.least(col.cast("long"), F.lit(cap)))
        for b in range(bits):
            piece = F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * ncols + i
            )
            z = piece if z is None else z + piece
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    *,
    zorder_by: Sequence[str],
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``zorder_by``: range-partition on the z-value (contiguous curve segments
    per file) and sort within each file, so every file's min/max footer
    stats form a tight box in all z-ordered dimensions."""
    with_z = df.withColumn("_z", zvalue(list(zorder_by), bits=bits))
    (
        with_z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
