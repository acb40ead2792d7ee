"""Time parsing / range semantics — reference T6, F4, F5, T8 quirks."""

from datetime import datetime, timedelta

import pytest

from kinesis_vcr_spark.timeparse import (
    day_range,
    default_end,
    humanize_minutes,
    parse_datetime,
    validate_range,
)


def test_parse_date_only_is_midnight():
    assert parse_datetime("2015-08-01") == datetime(2015, 8, 1, 0, 0, 0)


def test_parse_datetime():
    assert parse_datetime("2015-08-01T12:12:00") == datetime(2015, 8, 1, 12, 12, 0)


@pytest.mark.parametrize("bad", ["", None, "08/01/2015", "2015-8-1", "garbage"])
def test_parse_invalid_returns_none(bad):
    assert parse_datetime(bad) is None


def test_default_end_is_start_plus_day_minus_second():
    start = datetime(2015, 8, 1, 0, 0, 0)
    assert default_end(start, None) == datetime(2015, 8, 1, 23, 59, 59)
    # explicit end passes through
    explicit = datetime(2015, 8, 3)
    assert default_end(start, explicit) == explicit


def test_validate_range_rejects_inverted():
    with pytest.raises(ValueError):
        validate_range(datetime(2015, 8, 2), datetime(2015, 8, 1))


def test_day_range_enumerates_touched_days():
    days = day_range(datetime(2015, 8, 1, 13, 0), datetime(2015, 8, 3, 1, 0))
    assert [d.day for d in days] == [1, 2, 3]
    assert all(d.hour == 0 for d in days)


@pytest.mark.parametrize(
    "minutes,expected",
    [
        (0, "0 mins"),
        (59, "59 mins"),
        (60, "1 hours"),
        (60 * 24 - 1, "23 hours"),
        (60 * 24, "1 days"),
        (60 * 24 * 30 - 1, "29 days"),
        (60 * 24 * 30, "1 months"),
        (60 * 24 * 30 * 7, "7 months"),
    ],
)
def test_humanize_floor_divisions(minutes, expected):
    # KinesisVcr.java:133-148 — floor at each unit, 30-day months
    assert humanize_minutes(minutes) == expected


def test_default_end_never_touches_next_day():
    start = datetime(2015, 8, 1, 0, 0, 0)
    end = default_end(start, None)
    assert end + timedelta(seconds=1) == datetime(2015, 8, 2)


def test_parse_iso_minutes_only():
    from kinesis_vcr_spark.timeparse import parse_datetime

    assert parse_datetime("2015-08-01T12:12") == datetime(2015, 8, 1, 12, 12)


def test_parse_fractional_seconds():
    from kinesis_vcr_spark.timeparse import parse_datetime

    assert parse_datetime("2015-08-01T12:12:00.5") == datetime(
        2015, 8, 1, 12, 12, 0, 500000
    )
    # nanos truncate to micros (Python datetime resolution)
    assert parse_datetime("2015-08-01T12:12:00.123456789") == datetime(
        2015, 8, 1, 12, 12, 0, 123456
    )
    assert parse_datetime("2015-08-01T12:12.5") is None
