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


def test_gb_fr_jp_known_dates():
    """Spot-check the round-3 vendored calendars against well-known
    published dates (2024): UK bank holidays, French jours feries,
    and Japan's equinox-formula holidays."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    gb = dict((n, d) for d, n in vendored_holidays("GB", [2024]))
    assert gb["good_friday"] == dt.date(2024, 3, 29)
    assert gb["may_day"] == dt.date(2024, 5, 6)
    assert gb["spring_bank_holiday"] == dt.date(2024, 5, 27)
    assert gb["summer_bank_holiday"] == dt.date(2024, 8, 26)

    fr = dict((n, d) for d, n in vendored_holidays("FR", [2024]))
    assert fr["lundi_de_paques"] == dt.date(2024, 4, 1)
    assert fr["ascension"] == dt.date(2024, 5, 9)
    assert fr["lundi_de_pentecote"] == dt.date(2024, 5, 20)

    jp = dict((n, d) for d, n in vendored_holidays("JP", [2024]))
    assert jp["shunbun_no_hi"] == dt.date(2024, 3, 20)
    assert jp["shubun_no_hi"] == dt.date(2024, 9, 22)
    assert jp["seijin_no_hi"] == dt.date(2024, 1, 8)
    assert jp["umi_no_hi"] == dt.date(2024, 7, 15)
    assert jp["supotsu_no_hi"] == dt.date(2024, 10, 14)
    # pre-2016 has no Mountain Day; pre-2020 no Feb 23 Emperor birthday
    jp15 = dict((n, d) for d, n in vendored_holidays("JP", [2015]))
    assert "yama_no_hi" not in jp15 and "tenno_tanjobi" not in jp15


def test_ca_au_known_dates():
    """Spot-check the CA and AU vendored calendars against published
    2024/2025 dates (Victoria Day's Monday-on-or-before-May-24 rule,
    AU's second-Monday-of-June sovereign's birthday)."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    ca = dict((n, d) for d, n in vendored_holidays("CA", [2024]))
    assert ca["victoria_day"] == dt.date(2024, 5, 20)
    assert ca["good_friday"] == dt.date(2024, 3, 29)
    assert ca["labour_day"] == dt.date(2024, 9, 2)
    assert ca["thanksgiving"] == dt.date(2024, 10, 14)
    assert ca["national_day_for_truth_and_reconciliation"] == dt.date(2024, 9, 30)
    ca21 = dict((n, d) for d, n in vendored_holidays("CA", [2021]))
    # May 24 2021 IS a Monday -> Victoria Day falls on it
    assert ca21["victoria_day"] == dt.date(2021, 5, 24)
    ca20 = dict((n, d) for d, n in vendored_holidays("CA", [2020]))
    assert "national_day_for_truth_and_reconciliation" not in ca20

    au = dict((n, d) for d, n in vendored_holidays("AU", [2025]))
    assert au["australia_day"] == dt.date(2025, 1, 26)
    assert au["good_friday"] == dt.date(2025, 4, 18)
    assert au["easter_monday"] == dt.date(2025, 4, 21)
    assert au["anzac_day"] == dt.date(2025, 4, 25)
    assert au["sovereigns_birthday"] == dt.date(2025, 6, 9)


def test_vendored_es_it_nl_known_dates():
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    es = dict((d, n) for d, n in vendored_holidays("ES", [2024]))
    assert es[dt.date(2024, 3, 29)] == "viernes_santo"  # Good Friday 2024
    assert es[dt.date(2024, 10, 12)] == "fiesta_nacional_de_espana"

    it = dict((d, n) for d, n in vendored_holidays("IT", [2024]))
    assert it[dt.date(2024, 4, 1)] == "lunedi_dellangelo"  # Easter Monday
    assert it[dt.date(2024, 6, 2)] == "festa_della_repubblica"

    nl24 = dict((d, n) for d, n in vendored_holidays("NL", [2024]))
    assert nl24[dt.date(2024, 4, 27)] == "koningsdag"
    # 2025-04-27 is a Sunday -> Koningsdag shifts to Saturday the 26th
    nl25 = dict((d, n) for d, n in vendored_holidays("NL", [2025]))
    assert dt.date(2025, 4, 27) not in nl25
    assert nl25[dt.date(2025, 4, 26)] == "koningsdag"
    assert nl24[dt.date(2024, 5, 9)] == "hemelvaartsdag"  # Ascension 2024
    # pre-2014: Koninginnedag on April 30
    nl13 = dict((d, n) for d, n in vendored_holidays("NL", [2013]))
    assert nl13[dt.date(2013, 4, 30)] == "koninginnedag"


def test_holiday_same_date_names_merge(spark):
    """Two rules landing on one date must merge into one '; '-joined
    name, not fan out the panel (NL: Ascension can fall on May 5)."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays
    from functime_spark.operators.seasonality import add_holiday_effects

    # 2016: Easter Mar 27 -> Ascension = May 5 = bevrijdingsdag
    nl16 = vendored_holidays("NL", [2016])
    dates = [d for d, _ in nl16]
    assert dates.count(dt.date(2016, 5, 5)) == 2
    df = spark.createDataFrame(
        [("a", dt.datetime(2016, 5, 5)), ("a", dt.datetime(2016, 5, 6))],
        "user_id string, ts timestamp",
    )
    out = add_holiday_effects(df, ["NL"]).collect()
    assert len(out) == 2  # no fan-out
    row = {r["ts"].day: r["holiday__nl"] for r in out}
    assert row[5] == "bevrijdingsdag; hemelvaartsdag"
    assert row[6] is None


def test_vendored_round4_calendars_known_dates():
    """BR/IN/MX/CN/KR spot checks against published dates: nth-weekday
    reform rules (MX 2006), the sexennial transition day, the Qingming
    solar-term approximation, and the vendored lunar tables."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    br = dict((n, d) for d, n in vendored_holidays("BR", [2024]))
    assert br["sexta_feira_santa"] == dt.date(2024, 3, 29)
    assert br["dia_da_consciencia_negra"] == dt.date(2024, 11, 20)
    assert "dia_da_consciencia_negra" not in dict(
        (n, d) for d, n in vendored_holidays("BR", [2023])
    )

    ind = dict((n, d) for d, n in vendored_holidays("IN", [2025]))
    assert ind["republic_day"] == dt.date(2025, 1, 26)
    assert ind["gandhi_jayanti"] == dt.date(2025, 10, 2)

    mx24 = dict((n, d) for d, n in vendored_holidays("MX", [2024]))
    assert mx24["dia_de_la_constitucion"] == dt.date(2024, 2, 5)
    assert mx24["natalicio_de_benito_juarez"] == dt.date(2024, 3, 18)
    assert mx24["dia_de_la_revolucion"] == dt.date(2024, 11, 18)
    assert mx24["transmision_del_poder_ejecutivo"] == dt.date(2024, 10, 1)
    mx05 = dict((n, d) for d, n in vendored_holidays("MX", [2005]))
    assert mx05["dia_de_la_constitucion"] == dt.date(2005, 2, 5)
    assert "transmision_del_poder_ejecutivo" not in mx05

    cn = dict((n, d) for d, n in vendored_holidays("CN", [2024]))
    assert cn["spring_festival"] == dt.date(2024, 2, 10)
    assert cn["qingming_festival"] == dt.date(2024, 4, 4)
    assert cn["mid_autumn_festival"] == dt.date(2024, 9, 17)
    cn25 = dict((n, d) for d, n in vendored_holidays("CN", [2025]))
    assert cn25["spring_festival"] == dt.date(2025, 1, 29)
    assert cn25["qingming_festival"] == dt.date(2025, 4, 4)

    kr = dict((n, d) for d, n in vendored_holidays("KR", [2025]))
    assert kr["seollal"] == dt.date(2025, 1, 29)
    assert kr["chuseok"] == dt.date(2025, 10, 6)
    assert kr["hangul_day"] == dt.date(2025, 10, 9)
    # outside the vendored lunar table: fixed holidays only, no crash
    kr99 = dict((n, d) for d, n in vendored_holidays("KR", [2099]))
    assert "seollal" not in kr99 and kr99["liberation_day"] == dt.date(2099, 8, 15)


def test_vendored_nordic_european_calendars():
    """SE floating Saturdays, DK Store Bededag abolition (2024), PL
    Wigilia addition (2025), computus-offset days — spot-checked
    against published dates."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    se = dict((n, d) for d, n in vendored_holidays("SE", [2024]))
    assert se["midsommardagen"] == dt.date(2024, 6, 22)
    assert se["alla_helgons_dag"] == dt.date(2024, 11, 2)
    se26 = dict((n, d) for d, n in vendored_holidays("SE", [2026]))
    assert se26["midsommardagen"] == dt.date(2026, 6, 20)

    dk23 = dict((n, d) for d, n in vendored_holidays("DK", [2023]))
    assert dk23["store_bededag"] == dt.date(2023, 5, 5)
    assert "store_bededag" not in dict(
        (n, d) for d, n in vendored_holidays("DK", [2024])
    )

    pl24 = dict((n, d) for d, n in vendored_holidays("PL", [2024]))
    assert pl24["boze_cialo"] == dt.date(2024, 5, 30)
    assert "wigilia" not in pl24
    pl25 = dict((n, d) for d, n in vendored_holidays("PL", [2025]))
    assert pl25["wigilia"] == dt.date(2025, 12, 24)

    no = dict((n, d) for d, n in vendored_holidays("NO", [2025]))
    assert no["skjaertorsdag"] == dt.date(2025, 4, 17)
    assert no["grunnlovsdagen"] == dt.date(2025, 5, 17)

    at = dict((n, d) for d, n in vendored_holidays("AT", [2024]))
    assert at["fronleichnam"] == dt.date(2024, 5, 30)
    ch = dict((n, d) for d, n in vendored_holidays("CH", [2025]))
    assert ch["auffahrt"] == dt.date(2025, 5, 29)
    pt = dict((n, d) for d, n in vendored_holidays("PT", [2025]))
    assert pt["corpo_de_deus"] == dt.date(2025, 6, 19)


def test_vendored_round5_calendars():
    """Spot-check the round-5 vendored calendars (IE, BE, FI, NZ, ZA,
    CZ, GR, RU) against well-known published dates, covering the two
    new hard rules: the ORTHODOX Easter computus (GR: Julian Meeus +13
    days) and the ZA statutory Sunday->Monday observance."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import (
        _orthodox_easter,
        vendored_holidays,
    )

    # Orthodox Easter: published dates
    assert _orthodox_easter(2024) == dt.date(2024, 5, 5)
    assert _orthodox_easter(2025) == dt.date(2025, 4, 20)
    assert _orthodox_easter(2016) == dt.date(2016, 5, 1)

    gr = dict((n, d) for d, n in vendored_holidays("GR", [2024]))
    assert gr["clean_monday"] == dt.date(2024, 3, 18)
    assert gr["monday_of_the_holy_spirit"] == dt.date(2024, 6, 24)

    za = dict((n, d) for d, n in vendored_holidays("ZA", [2025]))
    # Apr 27 2025 is a Sunday -> statutory Monday observance
    assert za["freedom_day_(observed)"] == dt.date(2025, 4, 28)
    assert za["family_day"] == dt.date(2025, 4, 21)
    za24 = dict((n, d) for d, n in vendored_holidays("ZA", [2024]))
    assert "freedom_day_(observed)" not in za24  # Apr 27 2024 is a Saturday

    ie = dict((n, d) for d, n in vendored_holidays("IE", [2024]))
    assert ie["st._brigids_day"] == dt.date(2024, 2, 5)  # first Monday
    ie30 = dict((n, d) for d, n in vendored_holidays("IE", [2030]))
    assert ie30["st._brigids_day"] == dt.date(2030, 2, 1)  # Feb 1 is a Friday
    assert ie["october_bank_holiday"] == dt.date(2024, 10, 28)

    fi = dict((n, d) for d, n in vendored_holidays("FI", [2024]))
    assert fi["midsummer_day"] == dt.date(2024, 6, 22)  # Sat in Jun 20-26
    assert fi["all_saints_day"] == dt.date(2024, 11, 2)  # Sat in Oct31-Nov6

    nz = dict((n, d) for d, n in vendored_holidays("NZ", [2024]))
    assert nz["labour_day"] == dt.date(2024, 10, 28)  # 4th Monday Oct
    # statutory Mondayisation (Holidays Act 2003 / 2013 amendment):
    nz22 = dict((n, d) for d, n in vendored_holidays("NZ", [2022]))
    assert nz22["new_years_day_(observed)"] == dt.date(2022, 1, 3)  # Sat->Mon
    assert nz22["day_after_new_years_day_(observed)"] == dt.date(2022, 1, 4)
    assert nz22["christmas_day_(observed)"] == dt.date(2022, 12, 27)  # Sun->Tue
    assert "boxing_day_(observed)" not in nz22  # Dec 26 2022 is a Monday
    nz21 = dict((n, d) for d, n in vendored_holidays("NZ", [2021]))
    assert nz21["waitangi_day_(observed)"] == dt.date(2021, 2, 8)  # Sat->Mon
    assert nz21["anzac_day_(observed)"] == dt.date(2021, 4, 26)  # Sun->Mon
    nz10 = dict((n, d) for d, n in vendored_holidays("NZ", [2010]))
    assert "waitangi_day_(observed)" not in nz10  # pre-2014: actual date only

    be = dict((n, d) for d, n in vendored_holidays("BE", [2024]))
    assert be["ascension_day"] == dt.date(2024, 5, 9)

    cz = dict((n, d) for d, n in vendored_holidays("CZ", [2024]))
    assert cz["good_friday"] == dt.date(2024, 3, 29)
    assert "good_friday" not in dict(
        (n, d) for d, n in vendored_holidays("CZ", [2015])
    )  # statutory only since 2016

    ru = dict((n, d) for d, n in vendored_holidays("RU", [2024]))
    assert ru["victory_day"] == dt.date(2024, 5, 9)


def test_vendored_hijri_sa():
    """The tabular Islamic calendar + gazetted overrides (SA): exact
    gazetted dates inside the override span, civil-tabular arithmetic
    outside it, and the double-Eid Gregorian years handled."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import (
        _hijri_to_gregorian,
        vendored_holidays,
    )

    # civil tabular epoch + a known alignment year (tabular == gazetted)
    assert _hijri_to_gregorian(1, 1, 1) == dt.date(622, 7, 19)
    assert _hijri_to_gregorian(1445, 10, 1) == dt.date(2024, 4, 10)

    sa24 = dict((n, d) for d, n in vendored_holidays("SA", [2024]))
    assert sa24["eid_al_fitr"] == dt.date(2024, 4, 10)
    assert sa24["eid_al_adha"] == dt.date(2024, 6, 16)
    assert sa24["founding_day"] == dt.date(2024, 2, 22)
    assert sa24["saudi_national_day"] == dt.date(2024, 9, 23)
    # gazetted override year where tabular is off by one
    sa23 = dict((n, d) for d, n in vendored_holidays("SA", [2023]))
    assert sa23["eid_al_fitr"] == dt.date(2023, 4, 21)
    # double-Eid Gregorian year: both Jan and Dec occurrences emitted
    fitr_2033 = sorted(
        d for d, n in vendored_holidays("SA", [2033]) if n == "eid_al_fitr"
    )
    assert len(fitr_2033) == 2 and fitr_2033[0].month == 1
    # founding day is statutory only since 2022
    assert "founding_day" not in dict(
        (n, d) for d, n in vendored_holidays("SA", [2021])
    )
    # TR shares the Hijri machinery: multi-day bayrams off the anchors
    tr24 = dict((n, d) for d, n in vendored_holidays("TR", [2024]))
    assert tr24["ramazan_bayrami_day_1"] == dt.date(2024, 4, 10)
    assert tr24["ramazan_bayrami_day_3"] == dt.date(2024, 4, 12)
    assert tr24["kurban_bayrami_day_4"] == dt.date(2024, 6, 19)
    assert tr24["republic_day"] == dt.date(2024, 10, 29)
    assert "democracy_and_national_unity_day" not in dict(
        (n, d) for d, n in vendored_holidays("TR", [2016])
    )


def test_vendored_indonesia():
    """ID on the Hijri machinery (r7): SKB-gazetted Eid dates inside
    the override span — including the years Indonesia's sighted dates
    DIFFER from Umm al-Qura — the statutory two-day Idul Fitri, the
    vendored Nyepi/Waisak/Imlek tables, Easter-computus Christian
    days, and the year-guarded fixed days."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    id24 = dict((n, d) for d, n in vendored_holidays("ID", [2024]))
    assert id24["idul_fitri_day_1"] == dt.date(2024, 4, 10)
    assert id24["idul_fitri_day_2"] == dt.date(2024, 4, 11)
    # 2024 Idul Adha gazetted Jun 17 — Umm al-Qura had Jun 16
    assert id24["idul_adha"] == dt.date(2024, 6, 17)
    assert id24["hari_suci_nyepi"] == dt.date(2024, 3, 11)
    assert id24["hari_raya_waisak"] == dt.date(2024, 5, 23)
    assert id24["tahun_baru_imlek"] == dt.date(2024, 2, 10)
    assert id24["wafat_isa_almasih"] == dt.date(2024, 3, 29)  # Good Friday
    assert id24["kenaikan_isa_almasih"] == dt.date(2024, 5, 9)  # Ascension
    assert id24["hari_kemerdekaan"] == dt.date(2024, 8, 17)
    assert id24["hari_lahir_pancasila"] == dt.date(2024, 6, 1)

    # 2025: Fitr Mar 31 (SKB) — Umm al-Qura gazetted Mar 30
    id25 = dict((n, d) for d, n in vendored_holidays("ID", [2025]))
    assert id25["idul_fitri_day_1"] == dt.date(2025, 3, 31)
    assert id25["idul_fitri_day_2"] == dt.date(2025, 4, 1)
    assert id25["hari_suci_nyepi"] == dt.date(2025, 3, 29)

    # 2019: Fitr Jun 5 (SKB) vs Umm al-Qura Jun 4
    id19 = dict((n, d) for d, n in vendored_holidays("ID", [2019]))
    assert id19["idul_fitri_day_1"] == dt.date(2019, 6, 5)

    # year guards: Pancasila Day statutory since 2017, Labour Day 2014
    id16 = dict((n, d) for d, n in vendored_holidays("ID", [2016]))
    assert "hari_lahir_pancasila" not in id16
    assert "hari_buruh" in id16
    id13 = dict((n, d) for d, n in vendored_holidays("ID", [2013]))
    assert "hari_buruh" not in id13
    # outside the vendored tables: Hijri days fall back to tabular
    # arithmetic; Nyepi/Waisak (gazette-only) are absent
    id33 = dict((n, d) for d, n in vendored_holidays("ID", [2033]))
    assert "hari_suci_nyepi" not in id33
    assert "tahun_baru_islam" in id33


def test_vendored_egypt():
    """EG on the shared machinery: Coptic Christmas + Sham El Nessim
    off the Julian computus, the statutory multi-day Eids + Arafat day
    off the Hijri anchors, and the year-guarded revolution days."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    eg24 = dict((n, d) for d, n in vendored_holidays("EG", [2024]))
    assert eg24["coptic_christmas"] == dt.date(2024, 1, 7)
    # Orthodox Easter 2024 = May 5 -> Sham El Nessim May 6
    assert eg24["sham_el_nessim"] == dt.date(2024, 5, 6)
    assert eg24["eid_al_fitr_day_1"] == dt.date(2024, 4, 10)
    assert eg24["eid_al_fitr_day_3"] == dt.date(2024, 4, 12)
    assert eg24["arafat_day"] == dt.date(2024, 6, 15)
    assert eg24["eid_al_adha_day_1"] == dt.date(2024, 6, 16)
    assert eg24["eid_al_adha_day_3"] == dt.date(2024, 6, 18)
    assert eg24["january_25_revolution_day"] == dt.date(2024, 1, 25)
    assert eg24["june_30_revolution_day"] == dt.date(2024, 6, 30)

    eg23 = dict((n, d) for d, n in vendored_holidays("EG", [2023]))
    assert eg23["eid_al_fitr_day_1"] == dt.date(2023, 4, 21)
    assert eg23["sham_el_nessim"] == dt.date(2023, 4, 17)  # O-Easter Apr 16

    # year guards
    eg11 = dict((n, d) for d, n in vendored_holidays("EG", [2011]))
    assert "january_25_revolution_day" not in eg11
    assert "june_30_revolution_day" not in eg11


def test_lunisolar_arithmetic_vs_published_tables():
    """The vendored 1900-2049 lunisolar table must reproduce EVERY
    published Lunar-New-Year and Mid-Autumn date in the 2015-2030
    anchor tables, plus spread historical new years — the new-year
    dates are cumulative sums of year lengths, so matching anchors
    across decades pins every intermediate year length too."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import (
        _LUNAR_NEW_YEAR,
        _MID_AUTUMN,
        _lunisolar_to_gregorian,
    )

    for y, (m, d) in _LUNAR_NEW_YEAR.items():
        assert _lunisolar_to_gregorian(y, 1, 1) == dt.date(y, m, d)
    for y, (m, d) in _MID_AUTUMN.items():
        assert _lunisolar_to_gregorian(y, 8, 15) == dt.date(y, m, d)
    for y, m, d in [
        (1900, 1, 31), (1950, 2, 17), (1968, 1, 30), (1984, 2, 2),
        (1997, 2, 7), (2000, 2, 5), (2008, 2, 7),
    ]:
        assert _lunisolar_to_gregorian(y, 1, 1) == dt.date(y, m, d)
    # intra-year month lengths: published Dragon Boat (5/5) and
    # Buddha's Birthday (4/8) dates
    assert _lunisolar_to_gregorian(2023, 5, 5) == dt.date(2023, 6, 22)
    assert _lunisolar_to_gregorian(2024, 5, 5) == dt.date(2024, 6, 10)
    assert _lunisolar_to_gregorian(2025, 5, 5) == dt.date(2025, 5, 31)
    assert _lunisolar_to_gregorian(2024, 4, 8) == dt.date(2024, 5, 15)
    assert _lunisolar_to_gregorian(2025, 4, 8) == dt.date(2025, 5, 5)
    # leap-month handling: 2023 has leap month 2 -> dates in months
    # >= 3 include the 29-day leap month (Hung Kings 2023 = Apr 29)
    assert _lunisolar_to_gregorian(2023, 3, 10) == dt.date(2023, 4, 29)


def test_vendored_lunisolar_calendars_cn_kr_vn_tw_hk():
    """CN/KR upgraded to the lunisolar arithmetic (Dragon Boat and
    Buddha's Birthday now modeled); VN/TW/HK on the same machinery —
    spot-checked against published dates."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    cn = dict((n, d) for d, n in vendored_holidays("CN", [2024]))
    assert cn["dragon_boat_festival"] == dt.date(2024, 6, 10)
    cn49 = dict((n, d) for d, n in vendored_holidays("CN", [2049]))
    assert cn49["spring_festival"] == dt.date(2049, 2, 2)

    kr = dict((n, d) for d, n in vendored_holidays("KR", [2024]))
    assert kr["buddhas_birthday"] == dt.date(2024, 5, 15)
    assert kr["seollal"] == dt.date(2024, 2, 10)

    vn = dict((n, d) for d, n in vendored_holidays("VN", [2024]))
    assert vn["giao_thua"] == dt.date(2024, 2, 9)
    assert vn["tet_day_1"] == dt.date(2024, 2, 10)
    assert vn["tet_day_3"] == dt.date(2024, 2, 12)
    assert vn["gio_to_hung_vuong"] == dt.date(2024, 4, 18)
    assert vn["quoc_khanh"] == dt.date(2024, 9, 2)
    vn06 = dict((n, d) for d, n in vendored_holidays("VN", [2006]))
    assert "gio_to_hung_vuong" not in vn06  # statutory since 2007

    tw = dict((n, d) for d, n in vendored_holidays("TW", [2025]))
    assert tw["lunar_new_years_eve"] == dt.date(2025, 1, 28)
    assert tw["lunar_new_year_day_1"] == dt.date(2025, 1, 29)
    assert tw["tomb_sweeping_day"] == dt.date(2025, 4, 4)
    assert tw["dragon_boat_festival"] == dt.date(2025, 5, 31)
    assert tw["mid_autumn_festival"] == dt.date(2025, 10, 6)
    tw96 = dict((n, d) for d, n in vendored_holidays("TW", [1996]))
    assert "peace_memorial_day" not in tw96  # since 1997

    hk = dict((n, d) for d, n in vendored_holidays("HK", [2024]))
    assert hk["good_friday"] == dt.date(2024, 3, 29)
    assert hk["ching_ming_festival"] == dt.date(2024, 4, 4)
    assert hk["the_birthday_of_the_buddha"] == dt.date(2024, 5, 15)
    assert hk["tuen_ng_festival"] == dt.date(2024, 6, 10)
    assert hk["the_day_following_the_mid_autumn_festival"] == dt.date(2024, 9, 18)
    assert hk["chung_yeung_festival"] == dt.date(2024, 10, 11)


def test_hebrew_calendar_vs_published_dates():
    """The arithmetic Hebrew calendar (molad + dechiyot, anchored at
    the published Rosh Hashanah 5785) against published Gregorian
    dates across four decades, including the variable Cheshvan/Kislev
    lengths and leap-year Adar I insertion."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import (
        _hebrew_to_gregorian,
        _rosh_hashanah,
        vendored_holidays,
    )

    for hy, y, m, d in [
        (5750, 1989, 9, 30), (5760, 1999, 9, 11), (5780, 2019, 9, 30),
        (5783, 2022, 9, 26), (5784, 2023, 9, 16), (5785, 2024, 10, 3),
        (5786, 2025, 9, 23),
    ]:
        assert _rosh_hashanah(hy) == dt.date(y, m, d)
    # Pesach (15 Nisan) — crosses the variable months + leap Adar I
    assert _hebrew_to_gregorian(5783, "nisan", 15) == dt.date(2023, 4, 6)
    assert _hebrew_to_gregorian(5784, "nisan", 15) == dt.date(2024, 4, 23)
    assert _hebrew_to_gregorian(5785, "nisan", 15) == dt.date(2025, 4, 13)
    assert _hebrew_to_gregorian(5785, "kislev", 25) == dt.date(2024, 12, 26)

    il24 = dict((n, d) for d, n in vendored_holidays("IL", [2024]))
    assert il24["rosh_hashanah"] == dt.date(2024, 10, 3)
    assert il24["rosh_hashanah_day_2"] == dt.date(2024, 10, 4)
    assert il24["yom_kippur"] == dt.date(2024, 10, 12)
    assert il24["sukkot"] == dt.date(2024, 10, 17)
    assert il24["shemini_atzeret"] == dt.date(2024, 10, 24)
    assert il24["pesach"] == dt.date(2024, 4, 23)
    assert il24["seventh_of_pesach"] == dt.date(2024, 4, 29)
    assert il24["shavuot"] == dt.date(2024, 6, 12)
    # independence-day shifts: Mon->Tue (2024), Sat->Thu (2025),
    # Wed stays (2023)
    assert il24["independence_day"] == dt.date(2024, 5, 14)
    il25 = dict((n, d) for d, n in vendored_holidays("IL", [2025]))
    assert il25["independence_day"] == dt.date(2025, 5, 1)
    il23 = dict((n, d) for d, n in vendored_holidays("IL", [2023]))
    assert il23["independence_day"] == dt.date(2023, 4, 26)


def test_vendored_rule_only_european_calendars():
    """HU/SK/RO/BG/HR (round 7): pure fixed + computus rules — RO/BG
    on the ORTHODOX computus, HR's 2020 statehood-day move and the SK
    2024 Constitution-Day removal year-guarded — spot-checked against
    published dates."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    hu = dict((n, d) for d, n in vendored_holidays("HU", [2024]))
    assert hu["nagypentek"] == dt.date(2024, 3, 29)
    assert hu["punkosdhetfo"] == dt.date(2024, 5, 20)
    hu16 = dict((n, d) for d, n in vendored_holidays("HU", [2016]))
    assert "nagypentek" not in hu16  # statutory since 2017

    sk = dict((n, d) for d, n in vendored_holidays("SK", [2025]))
    assert sk["velky_piatok"] == dt.date(2025, 4, 18)
    assert "den_ustavy_slovenskej_republiky" not in sk  # removed 2024
    sk23 = dict((n, d) for d, n in vendored_holidays("SK", [2023]))
    assert sk23["den_ustavy_slovenskej_republiky"] == dt.date(2023, 9, 1)

    ro = dict((n, d) for d, n in vendored_holidays("RO", [2024]))
    assert ro["pastele"] == dt.date(2024, 5, 5)  # Orthodox Easter
    assert ro["vinerea_mare"] == dt.date(2024, 5, 3)
    assert ro["rusaliile"] == dt.date(2024, 6, 23)
    ro11 = dict((n, d) for d, n in vendored_holidays("RO", [2011]))
    assert "sfantul_andrei" not in ro11  # statutory since 2012

    bg = dict((n, d) for d, n in vendored_holidays("BG", [2025]))
    assert bg["velikden"] == dt.date(2025, 4, 20)  # calendars coincide
    assert bg["den_na_osvobozhdenieto"] == dt.date(2025, 3, 3)
    bg24 = dict((n, d) for d, n in vendored_holidays("BG", [2024]))
    assert bg24["velikden"] == dt.date(2024, 5, 5)  # they diverge

    hr = dict((n, d) for d, n in vendored_holidays("HR", [2024]))
    assert hr["tijelovo"] == dt.date(2024, 5, 30)
    assert hr["dan_drzavnosti"] == dt.date(2024, 5, 30)  # 2020 act
    hr19 = dict((n, d) for d, n in vendored_holidays("HR", [2019]))
    assert hr19["dan_drzavnosti"] == dt.date(2019, 6, 25)
    assert hr19["dan_neovisnosti"] == dt.date(2019, 10, 8)


def test_vendored_philippines():
    """PH (round 7): regular + recurring special days — computus
    triduum, last-Monday National Heroes rule, lunisolar Chinese New
    Year, year-guarded Ninoy Aquino Day; proclamation-gazetted days
    (Eids, one-offs) are deliberately absent."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    ph = dict((n, d) for d, n in vendored_holidays("PH", [2024]))
    assert ph["maundy_thursday"] == dt.date(2024, 3, 28)
    assert ph["black_saturday"] == dt.date(2024, 3, 30)
    assert ph["national_heroes_day"] == dt.date(2024, 8, 26)
    assert ph["chinese_new_year"] == dt.date(2024, 2, 10)
    assert ph["rizal_day"] == dt.date(2024, 12, 30)
    ph25 = dict((n, d) for d, n in vendored_holidays("PH", [2025]))
    assert ph25["national_heroes_day"] == dt.date(2025, 8, 25)
    ph03 = dict((n, d) for d, n in vendored_holidays("PH", [2003]))
    assert "ninoy_aquino_day" not in ph03  # statutory since 2004
    # pre-RA-9492 (2007) National Heroes Day was the last SUNDAY of
    # August (EO 292): 2005-08-28 was a Sunday (last Monday would be
    # the 29th); 2007 onward the last Monday (2007-08-27)
    ph05 = dict((n, d) for d, n in vendored_holidays("PH", [2005]))
    assert ph05["national_heroes_day"] == dt.date(2005, 8, 28)
    ph07 = dict((n, d) for d, n in vendored_holidays("PH", [2007]))
    assert ph07["national_heroes_day"] == dt.date(2007, 8, 27)


def test_vendored_thailand_vs_published_dates():
    """TH: gazetted Thai-lunisolar Bucha days (vendored — NOT
    derivable from the Chinese tables: Visakha 2025 is May 11 while
    the Chinese 4th-month full moon is May 12) + rule-based royal
    days with reign-change year guards."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    th24 = dict((n, d) for d, n in vendored_holidays("TH", [2024]))
    assert th24["makha_bucha"] == dt.date(2024, 2, 24)
    assert th24["visakha_bucha"] == dt.date(2024, 5, 22)
    assert th24["asalha_bucha"] == dt.date(2024, 7, 20)
    assert th24["khao_phansa"] == dt.date(2024, 7, 21)
    assert th24["songkran_festival_day_1"] == dt.date(2024, 4, 13)
    assert th24["coronation_day"] == dt.date(2024, 5, 4)
    th25 = dict((n, d) for d, n in vendored_holidays("TH", [2025]))
    assert th25["makha_bucha"] == dt.date(2025, 2, 12)
    assert th25["visakha_bucha"] == dt.date(2025, 5, 11)
    assert th25["asalha_bucha"] == dt.date(2025, 7, 10)
    # 2023 was an athikamat (leap-month) Thai year: Visakha in June
    th23 = dict((n, d) for d, n in vendored_holidays("TH", [2023]))
    assert th23["visakha_bucha"] == dt.date(2023, 6, 3)
    assert th23["makha_bucha"] == dt.date(2023, 3, 6)
    # reign change: no coronation holiday 2017-2018; May 5 under
    # Rama IX, May 4 under Rama X; Rama X's birthday from 2017
    th16 = dict((n, d) for d, n in vendored_holidays("TH", [2016]))
    th17 = dict((n, d) for d, n in vendored_holidays("TH", [2017]))
    assert th16["coronation_day"] == dt.date(2016, 5, 5)
    assert "coronation_day" not in th17
    assert "king_vajiralongkorns_birthday" not in th16
    assert th17["king_vajiralongkorns_birthday"] == dt.date(2017, 7, 28)
    assert th17["king_bhumibol_memorial_day"] == dt.date(2017, 10, 13)
    # outside the vendored lunisolar span the rule days still emit
    th10 = dict((n, d) for d, n in vendored_holidays("TH", [2010]))
    assert "makha_bucha" not in th10
    assert th10["chakri_memorial_day"] == dt.date(2010, 4, 6)


def test_vendored_malaysia_vs_published_dates():
    """MY: rukyah-gazetted Islamic dates (differ from Umm al-Qura in
    several years), CNY off the shared lunisolar tables, vendored
    Wesak/Deepavali, first-Monday-of-June Agong rule."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    my24 = dict((n, d) for d, n in vendored_holidays("MY", [2024]))
    assert my24["chinese_new_year"] == dt.date(2024, 2, 10)
    assert my24["chinese_new_year_day_2"] == dt.date(2024, 2, 11)
    assert my24["hari_raya_aidilfitri"] == dt.date(2024, 4, 10)
    assert my24["hari_raya_aidilfitri_day_2"] == dt.date(2024, 4, 11)
    # MY sighted Aidiladha 2024 on Jun 17 (Umm al-Qura: Jun 16)
    assert my24["hari_raya_aidiladha"] == dt.date(2024, 6, 17)
    assert my24["awal_muharram"] == dt.date(2024, 7, 7)
    # Maulid 2024 coincides with Malaysia Day
    assert my24["maulidur_rasul"] == dt.date(2024, 9, 16)
    assert my24["malaysia_day"] == dt.date(2024, 9, 16)
    assert my24["wesak_day"] == dt.date(2024, 5, 22)
    assert my24["deepavali"] == dt.date(2024, 10, 31)
    assert my24["agongs_birthday"] == dt.date(2024, 6, 3)  # 1st Mon June
    my23 = dict((n, d) for d, n in vendored_holidays("MY", [2023]))
    # MY/ID sighted Aidilfitri 2023 on Apr 22 (Umm al-Qura: Apr 21)
    assert my23["hari_raya_aidilfitri"] == dt.date(2023, 4, 22)
    assert my23["wesak_day"] == dt.date(2023, 5, 4)
    my25 = dict((n, d) for d, n in vendored_holidays("MY", [2025]))
    assert my25["hari_raya_aidilfitri"] == dt.date(2025, 3, 31)
    assert my25["hari_raya_aidiladha"] == dt.date(2025, 6, 7)
    assert my25["agongs_birthday"] == dt.date(2025, 6, 2)
    # 2015 contained TWO Maulids (Hijri 1436 + 1437) — the tabular
    # arithmetic produces the gazetted Jan 3 and Dec 24 exactly
    maulids = sorted(
        d for d, n in vendored_holidays("MY", [2015]) if n == "maulidur_rasul"
    )
    assert maulids == [dt.date(2015, 1, 3), dt.date(2015, 12, 24)]


def test_vendored_singapore_vs_published_dates():
    """SG: Vesak rides the Chinese lunar 4/15 (unlike Malaysia's
    May-full-moon Wesak — 2023 is the separating year: SG Jun 2 vs MY
    May 4), MUIS-gazetted Islamic dates (Puasa 2022 = May 3, one day
    after Malaysia), vendored Deepavali."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    sg23 = dict((n, d) for d, n in vendored_holidays("SG", [2023]))
    assert sg23["vesak_day"] == dt.date(2023, 6, 2)
    assert sg23["hari_raya_puasa"] == dt.date(2023, 4, 22)
    assert sg23["hari_raya_haji"] == dt.date(2023, 6, 29)
    assert sg23["deepavali"] == dt.date(2023, 11, 12)
    sg22 = dict((n, d) for d, n in vendored_holidays("SG", [2022]))
    assert sg22["hari_raya_puasa"] == dt.date(2022, 5, 3)  # MY: May 2
    sg24 = dict((n, d) for d, n in vendored_holidays("SG", [2024]))
    assert sg24["vesak_day"] == dt.date(2024, 5, 22)
    assert sg24["chinese_new_year"] == dt.date(2024, 2, 10)
    assert sg24["national_day"] == dt.date(2024, 8, 9)
    assert sg24["good_friday"] == dt.date(2024, 3, 29)


def test_vendored_colombia_vs_published_dates():
    """CO: the Ley-Emiliani next-Monday moves and the fixed
    Easter-offset landing spots of the three movable feasts, checked
    against the published 2024 calendar (Easter 2024 = Mar 31)."""
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    co = dict((n, d) for d, n in vendored_holidays("CO", [2024]))
    assert co["ano_nuevo"] == dt.date(2024, 1, 1)
    assert co["dia_de_los_reyes_magos"] == dt.date(2024, 1, 8)  # Sat -> Mon
    assert co["dia_de_san_jose"] == dt.date(2024, 3, 25)  # Tue -> next Mon
    assert co["jueves_santo"] == dt.date(2024, 3, 28)
    assert co["viernes_santo"] == dt.date(2024, 3, 29)
    assert co["ascension_del_senor"] == dt.date(2024, 5, 13)  # Easter+43
    assert co["corpus_christi"] == dt.date(2024, 6, 3)  # Easter+64
    assert co["sagrado_corazon"] == dt.date(2024, 6, 10)  # Easter+71
    assert co["san_pedro_y_san_pablo"] == dt.date(2024, 7, 1)
    assert co["dia_de_la_independencia"] == dt.date(2024, 7, 20)
    assert co["batalla_de_boyaca"] == dt.date(2024, 8, 7)
    assert co["asuncion_de_la_virgen"] == dt.date(2024, 8, 19)  # Thu -> Mon
    assert co["dia_de_la_raza"] == dt.date(2024, 10, 14)
    assert co["dia_de_todos_los_santos"] == dt.date(2024, 11, 4)
    assert co["independencia_de_cartagena"] == dt.date(2024, 11, 11)  # Mon
    # movable already on Monday stays put
    co18 = dict((n, d) for d, n in vendored_holidays("CO", [2018]))
    assert co18["dia_de_los_reyes_magos"] == dt.date(2018, 1, 8)
    assert co18["dia_de_la_raza"] == dt.date(2018, 10, 15)


def test_vendored_peru_vs_published_dates():
    import datetime as dt

    from functime_spark.operators.holidays_vendored import vendored_holidays

    pe = dict((n, d) for d, n in vendored_holidays("PE", [2024]))
    assert pe["jueves_santo"] == dt.date(2024, 3, 28)
    assert pe["fiestas_patrias"] == dt.date(2024, 7, 28)
    assert pe["fiestas_patrias_day_2"] == dt.date(2024, 7, 29)
    assert pe["santa_rosa_de_lima"] == dt.date(2024, 8, 30)
    assert pe["combate_de_angamos"] == dt.date(2024, 10, 8)
