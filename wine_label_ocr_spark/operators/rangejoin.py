"""Scalable interval (range) join — equi-join a time predicate.

A join on ``same key AND |l.ts − r.ts| ≤ bound`` is a classic Spark trap:
the planner sees a non-equi predicate and falls back to
BroadcastNestedLoop/Cartesian — quadratic per key. The standard fix
(Flint/IEJoin folklore): quantize time into ``bound``-sized cells,
explode ONE side to its cell and both neighbors, and join on
``(key, cell)`` — a pure hash-partitioned EQUI join — then apply the
exact bound as a post-filter. Any qualifying pair's timestamps differ by
≤ bound, so their cells differ by ≤ 1 and the 3-cell explode covers it;
the right side keeps ONE cell per row, so each qualifying pair matches
exactly once (no dedup pass). Cost: 3× one side's rows through the
shuffle instead of |L|·|R| per key.

Reference analog: the stream-stream interval join in
``streaming/state.py::interval_join_stream`` (watermarked); this is its
batch twin with the 10^12-row plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bound_ms(bound_sec: float) -> int:
    """Validate + convert the bound to whole milliseconds.

    Sub-millisecond bounds would make the cell width zero (divide by
    zero), and a non-integer-millisecond bound would silently truncate
    the effective window — both rejected loudly instead.
    """
    ms = bound_sec * 1000
    if ms < 1:
        raise ValueError(f"bound_sec must be >= 0.001, got {bound_sec}")
    if abs(ms - round(ms)) > 1e-9:
        raise ValueError(
            f"bound_sec must be a whole number of milliseconds "
            f"(got {bound_sec}: the sub-ms fraction would silently "
            f"truncate the bound)")
    return int(round(ms))


def _cell(ts: Column, bound_ms: int) -> Column:
    ms = F.unix_millis(ts.cast("timestamp"))
    return F.floor(ms / F.lit(bound_ms)).cast("bigint")


def bucketed_interval_join(left: DataFrame, right: DataFrame,
                           keys: list[str], ts_col: str = "ts",
                           bound_sec: float = 5.0,
                           how: str = "inner") -> DataFrame:
    """Join rows with equal ``keys`` whose ``ts_col`` values differ by at
    most ``bound_sec``. Left columns keep their names; right columns are
    suffixed ``_r`` (including its ``ts_col``). The plan is an equi join
    on (keys…, cell) — never a nested-loop — with the exact |Δt| bound as
    a filter after the match.

    Inner only: the 3-cell explode + post-join |Δt| filter cannot express
    an outer join (the filter would drop null-extended rows, and the
    explode would emit duplicate null-extensions), so anything except
    ``how='inner'`` raises rather than silently degenerating to inner.
    Outer-join semantics at scale: run the inner form, then anti-join the
    preserved side against the matches.
    """
    if how != "inner":
        raise ValueError(
            f"bucketed_interval_join supports how='inner' only (got "
            f"{how!r}); for outer semantics anti-join the preserved side "
            f"against this inner result")
    bound_ms = _bound_ms(bound_sec)
    lcell = _cell(F.col(ts_col), bound_ms)
    l = left.withColumn(
        "_cell", F.explode(F.array(lcell - 1, lcell, lcell + 1)))
    r = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{c}_r") for c in right.columns if c not in keys])
    r = r.withColumn("_cell", _cell(F.col(f"{ts_col}_r"), bound_ms))
    dt_ms = F.abs(F.unix_millis(F.col(ts_col).cast("timestamp"))
                  - F.unix_millis(F.col(f"{ts_col}_r").cast("timestamp")))
    return (l.join(r, [*keys, "_cell"], "inner")
            .filter(dt_ms <= bound_ms)
            .drop("_cell"))
