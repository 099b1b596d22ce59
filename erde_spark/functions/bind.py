"""Let-binding for Spark SQL expressions used inside higher-order
lambdas.

Spark's higher-order functions (``transform`` / ``filter`` / ``exists``
/ ``aggregate``) evaluate their lambda INTERPRETED, per element, and do
no common-subexpression elimination across elements: any outer
expression referenced inside the lambda body is re-evaluated on every
element. For a per-element body that slices a normalized/derived value
of the whole row, that turns a linear pass quadratic — measured in this
repo three times (exactsubstr's in-lambda ``array_sort``, the LM gram
explode re-splitting the document per position, char-shingles
re-normalizing per shingle; 7-10x wall-clock each at sf0.1).

The projection fix (materialize the derived value as its own column
first) needs a DataFrame. When only a Column can be returned, route the
value through a ONE-element array and let the lambda variable bind it:
``transform`` evaluates its input array once per row, and lambda
variables are bound values, so every reference inside the body is a
cheap attribute read.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(value: Column, body: Callable[[Column], Column]) -> Column:
    """``let value = <expr> in body(value)`` for Column expressions:
    evaluates ``value`` exactly once per row even when ``body`` uses it
    inside higher-order lambdas. Implemented as
    ``transform(array(value), v -> body(v))[1]`` — the array input is
    evaluated once, the lambda variable is a bound value."""
    return F.element_at(F.transform(F.array(value), body), 1)
