"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning, plus a key-skew profiler's natural
companion — the range-clustered writer.

Why this exists at 100 TB: parquet scans prune on row-group min/max
stats and on partition values. A table range-sorted on ONE column
prunes only predicates on that column; interleaving the bits of two
quantized columns (the Morton / Z-order curve) gives locality in BOTH
dimensions, so `WHERE x BETWEEN .. AND y BETWEEN ..` skips most files
on either predicate. This is the same layout trick Delta's OPTIMIZE
ZORDER BY applies; here it is expressed as plain Spark — a pure
column expression plus ``repartitionByRange(zkey)`` +
``sortWithinPartitions(zkey)`` — so it works on vanilla parquet.

All bit math is int64 mask/shift (whole-stage codegen, no UDFs) and is
mirrored exactly by the DuckDB oracles (registry11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize", "part1by1", "morton_key", "zorder_write"]

# magic-number bit spreads for 16-bit -> 32-bit interleave
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Quantize a numeric column into ``[0, 2^bits)`` over the explicit
    domain ``[lo, hi]`` (values outside clamp to the edge cells).

    The domain is an explicit argument — deriving it from the data
    would add a full pass and make the key non-deterministic under
    appends; layout keys must be stable as the table grows.
    """
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    cells = (1 << bits) - 1
    scaled = F.floor((col.cast("double") - F.lit(float(lo)))
                     / F.lit((hi - lo) / cells + 0.0))
    # least/greatest SKIP nulls (a NULL input would silently clamp to
    # the top cell) — pass NULL through explicitly
    return F.when(
        col.isNull(), F.lit(None).cast("long")
    ).otherwise(F.greatest(F.lit(0), F.least(F.lit(cells), scaled)).cast("long"))


def part1by1(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` so bit i lands at bit 2i
    (Morton 'part1by1', the standard mask-shift ladder)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(xcell: Column, ycell: Column) -> Column:
    """Interleave two 16-bit cell ids into one 32-bit Z-order key:
    x occupies even bits, y odd bits. Pure int64 expression."""
    return part1by1(xcell).bitwiseOR(F.shiftleft(part1by1(ycell), 1))


def zorder_write(
    df: DataFrame,
    path: str,
    zkey_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` parquet clustered on ``zkey_col``: a range exchange
    into ``n_files`` partitions followed by an in-partition sort, so
    each output file covers a narrow, (near-)disjoint zkey range and
    row-group min/max stats prune on BOTH interleaved dimensions.

    ``repartitionByRange`` samples the key distribution for balanced
    split points (skew-proof vs hash partitioning on a clustered key);
    the in-partition sort is a spillable local sort, never a global
    one.
    """
    (
        df.repartitionByRange(n_files, F.col(zkey_col))
        .sortWithinPartitions(zkey_col)
        .write.mode(mode)
        .parquet(path)
    )
