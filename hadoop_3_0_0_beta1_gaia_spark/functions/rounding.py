"""Engine-portable rounding.

``round(x, d)`` disagrees between engines when the true value's shortest
decimal repr lands exactly on a half (Spark rounds the shortest decimal repr
HALF_UP; DuckDB rounds the scaled double). ``fround`` instead computes
``floor(x * 10^d + 0.5) / 10^d`` as plain double ops — when both engines hold
the bit-identical input double, the result is bit-identical too. Use it for
every derived ratio whose inputs are exact (integer counts, ordered folds);
keep plain round() only for order-dependent float sums, where last-ulp input
differences are already the dominant (and negligible) risk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(c: Column, digits: int = 4) -> Column:
    scale = 10 ** digits
    return F.floor(c * scale + F.lit(0.5)) / scale


def duck_fround(sql: str, digits: int = 4) -> str:
    scale = 10 ** digits
    return f"(floor(({sql}) * {scale} + 0.5) / {scale})"
