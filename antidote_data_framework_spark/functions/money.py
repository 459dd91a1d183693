"""Exact-decimal money aggregation.

The fixture's monetary columns are exact decimals (2 dp) and revenue
products are exact 4-6 dp decimals — so group sums routinely land
EXACTLY on a .xx5 rounding boundary.  `ROUND(SUM(double), 2)` is then
cross-engine-unstable: the double sum falls an ulp above or below the
boundary depending on summation order.  Summing in DECIMAL is exact,
rounds identically everywhere, and is the posture a financial pipeline
needs at any scale.  The result is cast back to DOUBLE so both engines
emit the same wire type (Decimal objects stringify with trailing
zeros; doubles don't).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_discounted_price(price: Column, discount: Column) -> Column:
    """CAST(ROUND(SUM(DEC(price) * DEC(1-discount)), 2) AS DOUBLE)."""
    prod = price.cast("decimal(12,2)") * (1 - discount).cast("decimal(8,2)")
    return F.round(F.sum(prod), 2).cast("double")


def sum_charged_price(price: Column, discount: Column, tax: Column) -> Column:
    """As above with the (1+tax) factor — exact 6-dp decimal terms."""
    prod = (
        price.cast("decimal(12,2)")
        * (1 - discount).cast("decimal(8,2)")
        * (1 + tax).cast("decimal(8,2)")
    )
    return F.round(F.sum(prod), 2).cast("double")
