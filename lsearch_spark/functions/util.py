"""Column-expression utilities shared by the operator library."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(col: Column, f: Callable[[Column], Column]) -> Column:
    """Evaluate `col` ONCE per row and hand it to `f` as a bound lambda
    variable.

    Spark higher-order functions (transform/filter/aggregate) do not
    participate in whole-stage codegen and re-evaluate any NON-lambda
    subexpression referenced inside the lambda body once per ELEMENT.
    A tokenization referenced from `transform(seq, i -> slice(toks, i,
    n))` therefore re-runs per n-gram, turning an O(len) projection
    into O(len^2) — measured 600k docs: dup_ngram_frac went from
    >12 min (never finished) to seconds once bound. Wrapping the value
    in a single-element array and transforming over it binds it as a
    NamedLambdaVariable, which IS a cheap per-element reference.
    """
    return F.transform(F.array(col), f)[0]
