"""Shared epoch-microsecond helpers for the temporal operators.

These two idioms are subtle enough to deserve exactly one home:

- ``us(col)``: NTZ-tolerant epoch micros. Driver parquet loads
  TIMESTAMP_NTZ, which ``unix_micros`` rejects; the cast to TIMESTAMP is
  interpreted in the session timezone, which `plans/session.py` and the
  driver's ``_prep`` pin to UTC — apply the same helper to every
  timestamp participating in one comparison and the arithmetic is
  consistent regardless.
- ``gran_us(granularity)``: an interval literal's length in microseconds,
  obtained by adding it to the epoch and reading the result — the one
  spelling that accepts any ``interval`` phrase Spark does without a
  per-unit parser. Only meaningful for fixed-length intervals (hours,
  minutes, days ...); calendar-length phrases like "1 month" would be
  silently interpreted as their epoch-anchored length, so don't pass
  them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def us(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def gran_us(granularity: str) -> Column:
    return F.unix_micros(
        F.lit("1970-01-01 00:00:00").cast("timestamp")
        + F.expr(f"interval {granularity}")
    )
