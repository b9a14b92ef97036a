"""Vendored holiday calendars + holiday-effect operators."""

import datetime as dt


def test_computus_known_dates():
    from functime_spark.operators.holidays_vendored import _easter

    assert _easter(2000) == dt.date(2000, 4, 23)
    assert _easter(2024) == dt.date(2024, 3, 31)
    assert _easter(2025) == dt.date(2025, 4, 20)


def test_us_nth_weekday_rules():
    from functime_spark.operators.holidays_vendored import vendored_holidays

    h = dict((n, d) for d, n in vendored_holidays("US", [2024]))
    assert h["martin_luther_king_jr._day"] == dt.date(2024, 1, 15)
    assert h["memorial_day"] == dt.date(2024, 5, 27)
    assert h["thanksgiving"] == dt.date(2024, 11, 28)
    assert h["labor_day"] == dt.date(2024, 9, 2)


def test_add_holiday_effects_flags_rows(spark):
    from functime_spark.operators.seasonality import add_holiday_effects

    rows = [
        ("a", dt.datetime(2024, 1, 1, 9), 1.0),
        ("a", dt.datetime(2024, 1, 2, 9), 2.0),
        ("a", dt.datetime(2024, 1, 15, 9), 3.0),
    ]
    df = spark.createDataFrame(rows, "e string, t timestamp, v double")
    out = {r["t"].day: r["holiday__us"] for r in add_holiday_effects(df, ["US"]).collect()}
    assert out[1] == "new_years_day"
    assert out[2] is None
    assert out[15] == "martin_luther_king_jr._day"
