"""Datetime scalar functions.

``parse_ts`` re-expresses the reference's one UDF (F1): Precisely CDC
timestamp strings ``yyyyMMddHHmmss`` followed by 0-9 fractional-second
digits -> timestamp (reference DateParser.java:12-17, registered as
``parseTs`` at StreamingJob.java:82, used in sql/{states,address,
orders}.sql).

Unlike the reference (a Java ScalarFunction returning epoch millis),
this is a pure Spark column expression — it stays inside whole-stage
codegen, costs no Python round-trip, and is usable in both batch and
streaming plans. Precision: the reference truncates to milliseconds
(``toInstant().toEpochMilli()``); Spark timestamps carry microseconds,
so we keep up to 6 fractional digits (a superset — digits 7-9 are
truncated, matching java.time's parse-then-truncate behavior at our
precision). All parsing is UTC (reference ZoneOffset.UTC).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_ts(col: Column | str) -> Column:
    """Parse 'yyyyMMddHHmmss[F{0,9}]' -> TimestampType (UTC, micros).

    Strategy: parse the fixed 14-char prefix, then add the fractional
    part as microseconds. The fraction is right-padded to 6 digits
    ('123' -> 123000 us, i.e. 123 ms) and truncated past 6.

    Deliberate deviation from the reference: malformed strings yield
    NULL (try_to_timestamp/try_cast) instead of throwing — a single
    poison-pill CDC record must not abort a 100 TB job; filter or
    side-output NULLs downstream instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    base = F.try_to_timestamp(F.substring(c, 1, 14), F.lit("yyyyMMddHHmmss"))
    micros = F.rpad(F.substring(c, 15, 6), 6, "0").try_cast("long")
    return F.timestamp_add("MICROSECOND", micros, base)


def parse_ts_millis(col: Column | str) -> Column:
    """Epoch milliseconds variant — the reference UDF's literal return
    type (DateParser.java:12 returns long)."""
    ts = parse_ts(col)
    return (F.unix_micros(ts) / F.lit(1000)).cast("long")


def format_ts(col: Column | str, frac_digits: int = 6) -> Column:
    """Inverse of parse_ts — render a timestamp as a Precisely CDC
    string. Used to synthesize envelope fixtures from test data."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("timestamp")  # NTZ-safe: identity under the UTC session tz
    body = F.date_format(c, "yyyyMMddHHmmss")
    if frac_digits <= 0:
        return body
    frac = F.lpad((F.unix_micros(c) % 1_000_000).cast("string"), 6, "0")
    return F.concat(body, F.substring(frac, 1, frac_digits))
