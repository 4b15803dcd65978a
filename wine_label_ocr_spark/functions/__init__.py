"""Column-expression utilities shared across operators."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Single-evaluation binding for an expensive sub-expression.

    Catalyst's CollapseProject inlines aliased columns into every use site,
    and codegen's common-subexpression elimination skips expressions that
    contain lambda functions — so an expensive higher-order expression
    referenced k times is computed k times. ``let`` forces one evaluation
    by routing the value through a one-element array ``transform``: inside
    the lambda the value is a *lambda variable* (already computed), so the
    body can reference it any number of times for free.

    Measured effect on the MinHash signature (sf0.1 documents): 55s → 7s.
    """
    return F.get(F.transform(F.array(value), body), 0)
