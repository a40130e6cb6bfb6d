"""Julian-date scalar functions as Catalyst expressions.

Spark equivalents of the reference's date utilities
(/root/reference/modape/utils.py:161-222), for use when the date axis is
carried relationally instead of positionally:

- F1 fromjulian  -> to_date(col, 'yyyyDDD')
- F7 tshift      -> date_add
- date->julian   -> date_format(col, 'yyyyDDD')
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def from_julian(col) -> Column:
    """Parse YYYYDDD julian string to date (utils.py:161-171)."""
    return F.to_date(col, "yyyyDDD")


def to_julian(col) -> Column:
    return F.date_format(col, "yyyyDDD")


def julian_shift(col, days: int) -> Column:
    """tshift semantics (smooth.py:363): julian string -> shifted julian."""
    return to_julian(F.date_add(from_julian(col), days))
