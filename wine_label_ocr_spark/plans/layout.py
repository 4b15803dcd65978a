"""Z-order (Morton) data layout — multi-dimensional data skipping.

Single-column sorting makes parquet min/max stats razor-sharp on ONE
column and useless on every other; interleaving the bits of several
columns' normalized values (the Iceberg/Delta ``ZORDER BY`` technique)
makes every file cover a small HYPERCUBE of the key space, so footer
stats prune scans filtered on ANY of the participating columns. At
100 TB this is the difference between "point lookups on (host, ts) read
0.1% of files" and "read everything unless you filtered on the sort key".

Pure column algebra (shift/and/or over a scaled value — whole-stage
codegen), one range repartition + in-partition sort at write. Composes
with ``sources.table.ManifestTable``'s footer-stats pruning: a z-ordered
commit gets tight per-file [min, max] on every z'd column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(specs: list[tuple[Column, float, float]],
                 bits: int = 16) -> Column:
    """Morton key: interleave the top ``bits`` bits of each column scaled
    into [0, 2^bits) by its (lo, hi) range (clamped outside). Ranges come
    from the caller — at scale they're table-level stats you already
    track; an exact-rank variant would need a global sort, which defeats
    the point.

    ``len(specs) * bits`` must stay below 64: bit 63 is the bigint sign
    bit (high keys would sort negative/first and silently invert the
    layout benefit), and 65+ wraps the shift entirely. Raises instead —
    shrink ``bits`` (e.g. 4 columns → bits<=15)."""
    n = len(specs)
    if n * bits >= 64:
        raise ValueError(
            f"len(specs)*bits = {n}*{bits} = {n * bits} >= 64 would "
            f"interleave into the bigint sign bit (or wrap); use bits <= "
            f"{63 // n} for {n} columns")
    scaled = []
    for c, lo, hi in specs:
        span = float(hi) - float(lo) or 1.0
        s = ((c.cast("double") - float(lo)) / span * ((1 << bits) - 1))
        s = F.least(F.greatest(s.cast("bigint"), F.lit(0)),
                    F.lit((1 << bits) - 1))
        scaled.append(s)
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for ci, s in enumerate(scaled):
            bit = F.shiftright(s, j).bitwiseAND(F.lit(1)).cast("bigint")
            z = z.bitwiseOR(F.shiftleft(bit, j * n + ci))
    return z


def zorder_write(df: DataFrame, path: str,
                 specs: list[tuple[str, float, float]],
                 n_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` z-ordered on ``specs`` (column name, lo, hi): range
    repartition on the Morton key (→ ``n_files`` files covering disjoint
    z ranges = compact hypercubes) + in-partition sort (→ tight row-group
    stats inside each file)."""
    z = zorder_value([(F.col(c), lo, hi) for c, lo, hi in specs], bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))
