"""Date/time parsing and range semantics.

Re-expresses the reference's CLI time handling (reference:
``KinesisVcr.java:113-128`` parse, ``KinesisPlayer.java:196-204`` range
defaulting/validation, ``KinesisVcr.java:133-148`` humanizing) as pure
Python — these are driver-side concerns, not data-plane operators.

Quirks preserved exactly (SURVEY.md §4):

- Accepts ``2015-08-01`` (date-only → midnight) or
  ``2015-08-01T12:12:00``; anything else → ``None``.
- Missing end ⇒ ``start + 1 day − 1 second`` (single-day replay that
  never touches the next day's partition).
- ``start > end`` ⇒ ``ValueError``.
- Humanizer floors: minutes < 60 → mins, < 24h → hours, < 30d → days,
  else months (30-day months).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

DATE_FMT = "%Y-%m-%d"
DATETIME_FMT = "%Y-%m-%dT%H:%M:%S"

# Java's DateTimeFormatter is strict about zero-padding; Python's strptime
# is not — enforce the exact shapes the reference accepts. Java's
# ISO_LOCAL_DATE_TIME (KinesisVcr.java:118, LocalDateTime.parse) also
# accepts minutes-only times and fractional seconds up to nanos; the
# fraction is truncated to microseconds (Python datetime resolution).
_SHAPES = (
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"), DATETIME_FMT),
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}$"), "%Y-%m-%dT%H:%M"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), DATE_FMT),
)
_FRACTION = re.compile(r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})\.(\d{1,9})$")


def parse_datetime(value: str | None) -> datetime | None:
    """Parse ``yyyy-MM-dd`` (→ midnight) or an ISO_LOCAL_DATE_TIME
    (``yyyy-MM-ddTHH:mm[:ss[.fraction]]``); None on failure.

    Mirrors reference ``parseToLocalDateTime`` (KinesisVcr.java:113-128):
    try the datetime format first, fall back to date-at-midnight, return
    null (None) when both fail.
    """
    if not value:
        return None
    frac = _FRACTION.match(value)
    if frac:
        base = parse_datetime(frac.group(1))
        if base is None:
            return None
        micros = int(frac.group(2)[:6].ljust(6, "0"))
        return base.replace(microsecond=micros)
    for shape, fmt in _SHAPES:
        if shape.match(value):
            try:
                return datetime.strptime(value, fmt)
            except ValueError:  # shape ok but invalid date (e.g. month 13)
                return None
    return None


def default_end(start: datetime, end: datetime | None) -> datetime:
    """``end is None`` ⇒ start + 1 day − 1 s (KinesisPlayer.java:199-204)."""
    if end is None:
        return start + timedelta(days=1) - timedelta(seconds=1)
    return end


def validate_range(start: datetime, end: datetime) -> None:
    """start > end is an error (KinesisPlayer.java:196-198)."""
    if start > end:
        raise ValueError(
            f"start time {start.isoformat()} is after end time {end.isoformat()}"
        )


def day_range(start: datetime, end: datetime) -> list[datetime]:
    """Midnights of every UTC day touched by [start, end].

    The reference's day-granularity partition enumeration
    (KinesisPlayer.java:219-221). In Spark this becomes a partition-column
    predicate (``dt BETWEEN``) — this helper exists for the listing-based
    estimate path and tests.
    """
    validate_range(start, end)
    days = []
    cur = start.replace(hour=0, minute=0, second=0, microsecond=0)
    while cur <= end:
        days.append(cur)
        cur += timedelta(days=1)
    return days


def humanize_minutes(minutes: int) -> str:
    """mins → "N mins/hours/days/months" (KinesisVcr.java:133-148).

    Floor division at each unit boundary; months are 30 days.
    """
    if minutes < 60:
        return f"{minutes} mins"
    hours = minutes // 60
    if hours < 24:
        return f"{hours} hours"
    days = hours // 24
    if days < 30:
        return f"{days} days"
    months = days // 30
    return f"{months} months"
