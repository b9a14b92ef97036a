"""Minimal vendored holiday calendars (US federal, DE national).

The reference's add_holiday_effects (calendar.py:56-113) builds its
holiday table from the `holidays` PyPI package, which is not installed
in this environment. These generators reproduce the same (date, name)
rows for two common country codes from first principles — fixed-date
rules, nth-weekday rules, and the standard Anonymous Gregorian
computus for Easter-based holidays — so the operator is runnable and
gate-testable here. When the `holidays` package IS importable it is
preferred (full country coverage); this module is the fallback.

Names are normalized the same way the operator normalizes package
output: lowercase, spaces->underscores, apostrophes stripped.
"""

from __future__ import annotations

import datetime as _dt


def _easter(year: int) -> _dt.date:
    """Anonymous Gregorian computus (public algorithm)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return _dt.date(year, month, day + 1)


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> _dt.date:
    """n-th (1-based) `weekday` (Mon=0) of a month; n=-1 for last."""
    if n > 0:
        first = _dt.date(year, month, 1)
        off = (weekday - first.weekday()) % 7
        return first + _dt.timedelta(days=off + 7 * (n - 1))
    nxt = _dt.date(year + (month == 12), month % 12 + 1, 1)
    last = nxt - _dt.timedelta(days=1)
    off = (last.weekday() - weekday) % 7
    return last - _dt.timedelta(days=off)


def _us(year: int) -> list:
    e = []
    e.append((_dt.date(year, 1, 1), "new_years_day"))
    e.append((_nth_weekday(year, 1, 0, 3), "martin_luther_king_jr._day"))
    e.append((_nth_weekday(year, 2, 0, 3), "washingtons_birthday"))
    e.append((_nth_weekday(year, 5, 0, -1), "memorial_day"))
    if year >= 2021:
        e.append((_dt.date(year, 6, 19), "juneteenth_national_independence_day"))
    e.append((_dt.date(year, 7, 4), "independence_day"))
    e.append((_nth_weekday(year, 9, 0, 1), "labor_day"))
    e.append((_nth_weekday(year, 10, 0, 2), "columbus_day"))
    e.append((_dt.date(year, 11, 11), "veterans_day"))
    e.append((_nth_weekday(year, 11, 3, 4), "thanksgiving"))
    e.append((_dt.date(year, 12, 25), "christmas_day"))
    return e


def _de(year: int) -> list:
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "neujahr"),
        (easter - d(2), "karfreitag"),
        (easter + d(1), "ostermontag"),
        (_dt.date(year, 5, 1), "erster_mai"),
        (easter + d(39), "christi_himmelfahrt"),
        (easter + d(50), "pfingstmontag"),
        (_dt.date(year, 10, 3), "tag_der_deutschen_einheit"),
        (_dt.date(year, 12, 25), "erster_weihnachtstag"),
        (_dt.date(year, 12, 26), "zweiter_weihnachtstag"),
    ]


_COUNTRIES = {"US": _us, "DE": _de}


def vendored_holidays(country_code: str, years) -> list:
    """[(date, normalized_name)] for the given years, or raise KeyError
    for an unvendored country."""
    gen = _COUNTRIES[country_code.upper()]
    out = []
    for y in years:
        out.extend(gen(y))
    return out


def _gb(year: int) -> list:
    """England & Wales bank holidays (standard public rules; one-off
    royal-event holidays and substitute days are not modeled)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "new_years_day"),
        (easter - d(2), "good_friday"),
        (easter + d(1), "easter_monday"),
        (_nth_weekday(year, 5, 0, 1), "may_day"),
        (_nth_weekday(year, 5, 0, -1), "spring_bank_holiday"),
        (_nth_weekday(year, 8, 0, -1), "summer_bank_holiday"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "boxing_day"),
    ]


def _fr(year: int) -> list:
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "jour_de_lan"),
        (easter + d(1), "lundi_de_paques"),
        (_dt.date(year, 5, 1), "fete_du_travail"),
        (_dt.date(year, 5, 8), "armistice_1945"),
        (easter + d(39), "ascension"),
        (easter + d(50), "lundi_de_pentecote"),
        (_dt.date(year, 7, 14), "fete_nationale"),
        (_dt.date(year, 8, 15), "assomption"),
        (_dt.date(year, 11, 1), "toussaint"),
        (_dt.date(year, 11, 11), "armistice_1918"),
        (_dt.date(year, 12, 25), "noel"),
    ]


def _jp_equinox(year: int, vernal: bool) -> _dt.date:
    """Standard astronomical approximation for Japan's equinox
    holidays, valid 1980-2099 (public formula)."""
    base = 20.8431 if vernal else 23.2488
    day = int(base + 0.242194 * (year - 1980) - (year - 1980) // 4)
    return _dt.date(year, 3 if vernal else 9, day)


def _jp(year: int) -> list:
    """Japan national holidays, current-law rules (substitute-holiday
    shifts not modeled)."""
    e = [
        (_dt.date(year, 1, 1), "ganjitsu"),
        (_dt.date(year, 2, 11), "kenkoku_kinen_no_hi"),
        (_jp_equinox(year, True), "shunbun_no_hi"),
        (_dt.date(year, 4, 29), "showa_no_hi"),
        (_dt.date(year, 5, 3), "kenpo_kinenbi"),
        (_dt.date(year, 5, 4), "midori_no_hi"),
        (_dt.date(year, 5, 5), "kodomo_no_hi"),
        (_jp_equinox(year, False), "shubun_no_hi"),
        (_dt.date(year, 11, 3), "bunka_no_hi"),
        (_dt.date(year, 11, 23), "kinro_kansha_no_hi"),
    ]
    if year >= 2000:
        e.append((_nth_weekday(year, 1, 0, 2), "seijin_no_hi"))
        e.append((_nth_weekday(year, 10, 0, 2), "supotsu_no_hi"))
    if year >= 2003:
        e.append((_nth_weekday(year, 7, 0, 3), "umi_no_hi"))
        e.append((_nth_weekday(year, 9, 0, 3), "keiro_no_hi"))
    if year >= 2016:
        e.append((_dt.date(year, 8, 11), "yama_no_hi"))
    if year >= 2020:
        e.append((_dt.date(year, 2, 23), "tenno_tanjobi"))
    return e


_COUNTRIES.update({"GB": _gb, "FR": _fr, "JP": _jp})


def _ca(year: int) -> list:
    """Canada national (federal) holidays — standard public rules;
    provincial holidays and observed-day shifts are not modeled."""
    easter = _easter(year)
    d = _dt.timedelta
    # Victoria Day: the Monday on or before May 24
    may24 = _dt.date(year, 5, 24)
    victoria = may24 - _dt.timedelta(days=may24.weekday())
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (easter - d(2), "good_friday"),
        (victoria, "victoria_day"),
        (_dt.date(year, 7, 1), "canada_day"),
        (_nth_weekday(year, 9, 0, 1), "labour_day"),
        (_nth_weekday(year, 10, 0, 2), "thanksgiving"),
        (_dt.date(year, 11, 11), "remembrance_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "boxing_day"),
    ]
    if year >= 2021:
        e.append((_dt.date(year, 9, 30), "national_day_for_truth_and_reconciliation"))
    return e


def _au(year: int) -> list:
    """Australia national public holidays (standard rules; state-level
    days and observed-day substitutions are not modeled)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 1, 26), "australia_day"),
        (easter - d(2), "good_friday"),
        (easter + d(1), "easter_monday"),
        (_dt.date(year, 4, 25), "anzac_day"),
        # King's/Queen's Birthday (most states): second Monday of June
        (_nth_weekday(year, 6, 0, 2), "sovereigns_birthday"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "boxing_day"),
    ]


_COUNTRIES.update({"CA": _ca, "AU": _au})


def _es(year: int) -> list:
    """Spain national holidays (fiestas nacionales; regional days and
    observed-day shifts are not modeled)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "ano_nuevo"),
        (_dt.date(year, 1, 6), "epifania_del_senor"),
        (easter - d(2), "viernes_santo"),
        (_dt.date(year, 5, 1), "fiesta_del_trabajo"),
        (_dt.date(year, 8, 15), "asuncion_de_la_virgen"),
        (_dt.date(year, 10, 12), "fiesta_nacional_de_espana"),
        (_dt.date(year, 11, 1), "todos_los_santos"),
        (_dt.date(year, 12, 6), "dia_de_la_constitucion_espanola"),
        (_dt.date(year, 12, 8), "inmaculada_concepcion"),
        (_dt.date(year, 12, 25), "natividad_del_senor"),
    ]


def _it(year: int) -> list:
    """Italy national holidays (standard public rules)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "capodanno"),
        (_dt.date(year, 1, 6), "epifania_del_signore"),
        (easter + d(1), "lunedi_dellangelo"),
        (_dt.date(year, 4, 25), "festa_della_liberazione"),
        (_dt.date(year, 5, 1), "festa_dei_lavoratori"),
        (_dt.date(year, 6, 2), "festa_della_repubblica"),
        (_dt.date(year, 8, 15), "assunzione_della_vergine"),
        (_dt.date(year, 11, 1), "tutti_i_santi"),
        (_dt.date(year, 12, 8), "immacolata_concezione"),
        (_dt.date(year, 12, 25), "natale"),
        (_dt.date(year, 12, 26), "santo_stefano"),
    ]


def _nl(year: int) -> list:
    """Netherlands national holidays, current-law rules: Koningsdag
    Apr 27 shifting to Apr 26 when the 27th is a Sunday (since 2014;
    Koninginnedag Apr 30 before that)."""
    easter = _easter(year)
    d = _dt.timedelta
    if year >= 2014:
        kd = _dt.date(year, 4, 27)
        if kd.weekday() == 6:
            kd -= _dt.timedelta(days=1)
        kings = (kd, "koningsdag")
    else:
        kings = (_dt.date(year, 4, 30), "koninginnedag")
    return [
        (_dt.date(year, 1, 1), "nieuwjaarsdag"),
        (easter - d(2), "goede_vrijdag"),
        (easter, "eerste_paasdag"),
        (easter + d(1), "tweede_paasdag"),
        kings,
        (_dt.date(year, 5, 5), "bevrijdingsdag"),
        (easter + d(39), "hemelvaartsdag"),
        (easter + d(49), "eerste_pinksterdag"),
        (easter + d(50), "tweede_pinksterdag"),
        (_dt.date(year, 12, 25), "eerste_kerstdag"),
        (_dt.date(year, 12, 26), "tweede_kerstdag"),
    ]


_COUNTRIES.update({"ES": _es, "IT": _it, "NL": _nl})


def _br(year: int) -> list:
    """Brazil national statutory holidays (feriados nacionais; Carnival
    and Corpus Christi are pontos facultativos, not modeled)."""
    easter = _easter(year)
    d = _dt.timedelta
    e = [
        (_dt.date(year, 1, 1), "confraternizacao_universal"),
        (easter - d(2), "sexta_feira_santa"),
        (_dt.date(year, 4, 21), "tiradentes"),
        (_dt.date(year, 5, 1), "dia_do_trabalhador"),
        (_dt.date(year, 9, 7), "independencia_do_brasil"),
        (_dt.date(year, 10, 12), "nossa_senhora_aparecida"),
        (_dt.date(year, 11, 2), "finados"),
        (_dt.date(year, 11, 15), "proclamacao_da_republica"),
        (_dt.date(year, 12, 25), "natal"),
    ]
    if year >= 2024:  # Lei 14.759/2023
        e.append((_dt.date(year, 11, 20), "dia_da_consciencia_negra"))
    return e


def _in(year: int) -> list:
    """India national (gazetted central) holidays — the three
    all-India days; religious/regional holidays are not modeled."""
    return [
        (_dt.date(year, 1, 26), "republic_day"),
        (_dt.date(year, 8, 15), "independence_day"),
        (_dt.date(year, 10, 2), "gandhi_jayanti"),
    ]


def _mx(year: int) -> list:
    """Mexico statutory holidays (Ley Federal del Trabajo art. 74):
    the 2006 reform moved Constitution/Juarez/Revolution days to
    long-weekend Mondays; the sexennial presidential-transition day
    is Oct 1 from 2024 (Dec 1 before)."""
    e = [(_dt.date(year, 1, 1), "ano_nuevo")]
    if year >= 2006:
        e.append((_nth_weekday(year, 2, 0, 1), "dia_de_la_constitucion"))
        e.append((_nth_weekday(year, 3, 0, 3), "natalicio_de_benito_juarez"))
    else:
        e.append((_dt.date(year, 2, 5), "dia_de_la_constitucion"))
        e.append((_dt.date(year, 3, 21), "natalicio_de_benito_juarez"))
    e.append((_dt.date(year, 5, 1), "dia_del_trabajo"))
    e.append((_dt.date(year, 9, 16), "dia_de_la_independencia"))
    if year >= 2006:
        e.append((_nth_weekday(year, 11, 0, 3), "dia_de_la_revolucion"))
    else:
        e.append((_dt.date(year, 11, 20), "dia_de_la_revolucion"))
    if year >= 2024 and (year - 2024) % 6 == 0:
        e.append((_dt.date(year, 10, 1), "transmision_del_poder_ejecutivo"))
    elif 1934 <= year < 2024 and (year - 1934) % 6 == 0:
        e.append((_dt.date(year, 12, 1), "transmision_del_poder_ejecutivo"))
    e.append((_dt.date(year, 12, 25), "navidad"))
    return e


#: Lunar New Year (first day, Chinese lunisolar calendar) — widely
#: published astronomical dates; shared by CN Spring Festival and KR
#: Seollal. Years outside the table omit the lunar holidays (the
#: `holidays` package, preferred when importable, has full coverage).
_LUNAR_NEW_YEAR = {
    2015: (2, 19), 2016: (2, 8), 2017: (1, 28), 2018: (2, 16),
    2019: (2, 5), 2020: (1, 25), 2021: (2, 12), 2022: (2, 1),
    2023: (1, 22), 2024: (2, 10), 2025: (1, 29), 2026: (2, 17),
    2027: (2, 6), 2028: (1, 26), 2029: (2, 13), 2030: (2, 3),
}

#: Mid-Autumn Festival (lunar 8/15) — CN zhongqiu / KR Chuseok.
_MID_AUTUMN = {
    2015: (9, 27), 2016: (9, 15), 2017: (10, 4), 2018: (9, 24),
    2019: (9, 13), 2020: (10, 1), 2021: (9, 21), 2022: (9, 10),
    2023: (9, 29), 2024: (9, 17), 2025: (10, 6), 2026: (9, 25),
    2027: (9, 15), 2028: (10, 3), 2029: (9, 22), 2030: (9, 12),
}


def _qingming(year: int) -> _dt.date:
    """Qingming solar term (standard 21st-century approximation,
    valid 2000-2099)."""
    y2 = year % 100
    return _dt.date(year, 4, int(y2 * 0.2422 + 4.81) - y2 // 4)


def _cn(year: int) -> list:
    """China statutory public holidays (first day of each; the
    multi-day golden-week extensions and weekend make-up days are
    scheduling, not holidays). Lunar dates from the vendored
    lunisolar calendar (1900-2049; the published `_LUNAR_NEW_YEAR` /
    `_MID_AUTUMN` tables below pin the arithmetic in tests)."""
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 5, 1), "labour_day"),
        (_dt.date(year, 10, 1), "national_day"),
    ]
    if 2000 <= year <= 2099:
        e.append((_qingming(year), "qingming_festival"))
    for lm, ld, name in (
        (1, 1, "spring_festival"),
        (5, 5, "dragon_boat_festival"),
        (8, 15, "mid_autumn_festival"),
    ):
        d = _lunar_date(year, lm, ld)
        if d is not None:
            e.append((d, name))
    return e


def _kr(year: int) -> list:
    """South Korea public holidays (main day of each; substitute
    holidays are not modeled). Seollal / Buddha's Birthday (lunar
    4/8) / Chuseok from the vendored lunisolar calendar."""
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 3, 1), "independence_movement_day"),
        (_dt.date(year, 5, 5), "childrens_day"),
        (_dt.date(year, 6, 6), "memorial_day"),
        (_dt.date(year, 8, 15), "liberation_day"),
        (_dt.date(year, 10, 3), "national_foundation_day"),
        (_dt.date(year, 10, 9), "hangul_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
    ]
    for lm, ld, name in (
        (1, 1, "seollal"),
        (4, 8, "buddhas_birthday"),
        (8, 15, "chuseok"),
    ):
        d = _lunar_date(year, lm, ld)
        if d is not None:
            e.append((d, name))
    return e


_COUNTRIES.update({"BR": _br, "IN": _in, "MX": _mx, "CN": _cn, "KR": _kr})


def _sat_on_or_after(year: int, month: int, day: int) -> _dt.date:
    """First Saturday on or after the given date (SE midsummer-style
    floating-Saturday rules)."""
    d = _dt.date(year, month, day)
    return d + _dt.timedelta(days=(5 - d.weekday()) % 7)


def _at(year: int) -> list:
    """Austria national holidays (standard current-law rules)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "neujahr"),
        (_dt.date(year, 1, 6), "heilige_drei_konige"),
        (easter + d(1), "ostermontag"),
        (_dt.date(year, 5, 1), "staatsfeiertag"),
        (easter + d(39), "christi_himmelfahrt"),
        (easter + d(50), "pfingstmontag"),
        (easter + d(60), "fronleichnam"),
        (_dt.date(year, 8, 15), "maria_himmelfahrt"),
        (_dt.date(year, 10, 26), "nationalfeiertag"),
        (_dt.date(year, 11, 1), "allerheiligen"),
        (_dt.date(year, 12, 8), "maria_empfangnis"),
        (_dt.date(year, 12, 25), "christtag"),
        (_dt.date(year, 12, 26), "stefanitag"),
    ]


def _ch(year: int) -> list:
    """Switzerland FEDERAL holidays only (cantonal days like Good
    Friday/Easter Monday are not modeled)."""
    easter = _easter(year)
    return [
        (_dt.date(year, 1, 1), "neujahrstag"),
        (easter + _dt.timedelta(39), "auffahrt"),
        (_dt.date(year, 8, 1), "bundesfeier"),
        (_dt.date(year, 12, 25), "weihnachtstag"),
    ]


def _se(year: int) -> list:
    """Sweden public holidays: fixed + computus + the floating-
    Saturday rules (midsummer: Sat in Jun 20-26; All Saints: Sat in
    Oct 31-Nov 6)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "nyarsdagen"),
        (_dt.date(year, 1, 6), "trettondedag_jul"),
        (easter - d(2), "langfredagen"),
        (easter + d(1), "annandag_pask"),
        (_dt.date(year, 5, 1), "forsta_maj"),
        (easter + d(39), "kristi_himmelsfardsdag"),
        (easter, "paskdagen"),
        (easter + d(49), "pingstdagen"),
        (_dt.date(year, 6, 6), "nationaldagen"),
        (_sat_on_or_after(year, 6, 20), "midsommardagen"),
        (_sat_on_or_after(year, 10, 31), "alla_helgons_dag"),
        (_dt.date(year, 12, 25), "juldagen"),
        (_dt.date(year, 12, 26), "annandag_jul"),
    ]


def _no(year: int) -> list:
    """Norway public holidays (standard rules)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "forste_nyttarsdag"),
        (easter - d(3), "skjaertorsdag"),
        (easter - d(2), "langfredag"),
        (easter, "forste_paskedag"),
        (easter + d(1), "andre_paskedag"),
        (easter + d(49), "forste_pinsedag"),
        (_dt.date(year, 5, 1), "arbeidernes_dag"),
        (_dt.date(year, 5, 17), "grunnlovsdagen"),
        (easter + d(39), "kristi_himmelfartsdag"),
        (easter + d(50), "andre_pinsedag"),
        (_dt.date(year, 12, 25), "forste_juledag"),
        (_dt.date(year, 12, 26), "andre_juledag"),
    ]


def _dk(year: int) -> list:
    """Denmark public holidays; Store Bededag (4th Friday after
    Easter) was abolished from 2024."""
    easter = _easter(year)
    d = _dt.timedelta
    e = [
        (_dt.date(year, 1, 1), "nytaarsdag"),
        (easter - d(3), "skaertorsdag"),
        (easter - d(2), "langfredag"),
        (easter, "paaskedag"),
        (easter + d(1), "anden_paaskedag"),
        (easter + d(49), "pinsedag"),
        (easter + d(39), "kristi_himmelfartsdag"),
        (easter + d(50), "anden_pinsedag"),
        (_dt.date(year, 12, 25), "juledag"),
        (_dt.date(year, 12, 26), "anden_juledag"),
    ]
    if year < 2024:
        e.append((easter + d(26), "store_bededag"))
    return e


def _pl(year: int) -> list:
    """Poland public holidays: Epiphany restored 2011, Christmas Eve
    added from 2025."""
    easter = _easter(year)
    d = _dt.timedelta
    e = [
        (_dt.date(year, 1, 1), "nowy_rok"),
        (easter, "wielkanoc"),
        (easter + d(1), "poniedzialek_wielkanocny"),
        (_dt.date(year, 5, 1), "swieto_pracy"),
        (_dt.date(year, 5, 3), "swieto_konstytucji"),
        (easter + d(49), "zielone_swiatki"),
        (easter + d(60), "boze_cialo"),
        (_dt.date(year, 8, 15), "wniebowziecie"),
        (_dt.date(year, 11, 1), "wszystkich_swietych"),
        (_dt.date(year, 11, 11), "swieto_niepodleglosci"),
        (_dt.date(year, 12, 25), "boze_narodzenie"),
        (_dt.date(year, 12, 26), "drugi_dzien_swiat"),
    ]
    if year >= 2011:
        e.append((_dt.date(year, 1, 6), "trzech_kroli"))
    if year >= 2025:
        e.append((_dt.date(year, 12, 24), "wigilia"))
    return e


def _pt(year: int) -> list:
    """Portugal national holidays (standard current-law rules)."""
    easter = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "ano_novo"),
        (easter - d(2), "sexta_feira_santa"),
        (easter, "pascoa"),
        (_dt.date(year, 4, 25), "dia_da_liberdade"),
        (_dt.date(year, 5, 1), "dia_do_trabalhador"),
        (easter + d(60), "corpo_de_deus"),
        (_dt.date(year, 6, 10), "dia_de_portugal"),
        (_dt.date(year, 8, 15), "assuncao_de_nossa_senhora"),
        (_dt.date(year, 10, 5), "implantacao_da_republica"),
        (_dt.date(year, 11, 1), "todos_os_santos"),
        (_dt.date(year, 12, 1), "restauracao_da_independencia"),
        (_dt.date(year, 12, 8), "imaculada_conceicao"),
        (_dt.date(year, 12, 25), "natal"),
    ]


_COUNTRIES.update(
    {"AT": _at, "CH": _ch, "SE": _se, "NO": _no, "DK": _dk, "PL": _pl, "PT": _pt}
)


def _orthodox_easter(year: int) -> _dt.date:
    """Julian (Meeus) computus shifted to the Gregorian calendar — the
    Eastern-church Easter that drives the Greek movable feasts. The
    13-day Julian->Gregorian offset is correct for 1900-2099."""
    a = year % 4
    b = year % 7
    c = year % 19
    d = (19 * c + 15) % 30
    e = (2 * a + 4 * b - d + 34) % 7
    month, day = divmod(d + e + 114, 31)
    return _dt.date(year, month, day + 1) + _dt.timedelta(days=13)


def _ie(year: int) -> list:
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 3, 17), "st._patricks_day"),
        (ea + _dt.timedelta(days=1), "easter_monday"),
        (_nth_weekday(year, 5, 0, 1), "may_day"),
        (_nth_weekday(year, 6, 0, 1), "june_bank_holiday"),
        (_nth_weekday(year, 8, 0, 1), "august_bank_holiday"),
        (_nth_weekday(year, 10, 0, -1), "october_bank_holiday"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "st._stephens_day"),
    ]
    if year >= 2023:
        # first Monday of February, unless Feb 1 is itself a Friday
        feb1 = _dt.date(year, 2, 1)
        d = feb1 if feb1.weekday() == 4 else _nth_weekday(year, 2, 0, 1)
        e.append((d, "st._brigids_day"))
    return e


def _be(year: int) -> list:
    ea = _easter(year)
    return [
        (_dt.date(year, 1, 1), "new_years_day"),
        (ea + _dt.timedelta(days=1), "easter_monday"),
        (_dt.date(year, 5, 1), "labour_day"),
        (ea + _dt.timedelta(days=39), "ascension_day"),
        (ea + _dt.timedelta(days=50), "whit_monday"),
        (_dt.date(year, 7, 21), "national_day"),
        (_dt.date(year, 8, 15), "assumption_day"),
        (_dt.date(year, 11, 1), "all_saints_day"),
        (_dt.date(year, 11, 11), "armistice_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
    ]


def _fi(year: int) -> list:
    ea = _easter(year)
    # Midsummer Day: the Saturday in Jun 20-26; All Saints: the
    # Saturday in Oct 31 - Nov 6
    return [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 1, 6), "epiphany"),
        (ea - _dt.timedelta(days=2), "good_friday"),
        (ea + _dt.timedelta(days=1), "easter_monday"),
        (_dt.date(year, 5, 1), "may_day"),
        (ea + _dt.timedelta(days=39), "ascension_day"),
        (_sat_on_or_after(year, 6, 20), "midsummer_day"),
        (_sat_on_or_after(year, 10, 31), "all_saints_day"),
        (_dt.date(year, 12, 6), "independence_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "second_day_of_christmas"),
    ]


def _nz(year: int) -> list:
    """New Zealand: the Holidays Act 2003 Mondayises weekend holidays
    (ADVICE r5 — ZA had its observance rule, NZ was missing its own).
    The New Year's and Christmas PAIRS shift Sat->Mon and Sun->Tue
    (+2 days: the pair occupies consecutive days, so both members
    jump over each other — e.g. Jan 1 Sat 2022 -> observed Mon Jan 3,
    Jan 2 Sun -> observed Tue Jan 4). Waitangi Day and ANZAC Day
    shift to the FOLLOWING MONDAY only, and only since the 2013
    amendment act (first weekend occurrence: 2015/2014 seasons —
    statutory from 1 Jan 2014)."""
    ea = _easter(year)
    e = [
        (ea - _dt.timedelta(days=2), "good_friday"),
        (ea + _dt.timedelta(days=1), "easter_monday"),
        (_nth_weekday(year, 6, 0, 1), "sovereigns_birthday"),
        (_nth_weekday(year, 10, 0, 4), "labour_day"),
    ]
    for m, d, name in (
        (1, 1, "new_years_day"),
        (1, 2, "day_after_new_years_day"),
        (12, 25, "christmas_day"),
        (12, 26, "boxing_day"),
    ):
        day = _dt.date(year, m, d)
        e.append((day, name))
        if day.weekday() >= 5:  # Sat/Sun -> +2 (Mon/Tue, paired days)
            e.append((day + _dt.timedelta(days=2), f"{name}_(observed)"))
    for m, d, name in ((2, 6, "waitangi_day"), (4, 25, "anzac_day")):
        day = _dt.date(year, m, d)
        e.append((day, name))
        if year >= 2014 and day.weekday() >= 5:
            e.append(
                (day + _dt.timedelta(days=7 - day.weekday()), f"{name}_(observed)")
            )
    return e


def _za(year: int) -> list:
    """South Africa: the Public Holidays Act shifts any Sunday holiday
    to the following Monday (observed) — the one vendored calendar
    with a statutory observance rule."""
    ea = _easter(year)
    fixed = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 3, 21), "human_rights_day"),
        (_dt.date(year, 4, 27), "freedom_day"),
        (_dt.date(year, 5, 1), "workers_day"),
        (_dt.date(year, 6, 16), "youth_day"),
        (_dt.date(year, 8, 9), "national_womens_day"),
        (_dt.date(year, 9, 24), "heritage_day"),
        (_dt.date(year, 12, 16), "day_of_reconciliation"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "day_of_goodwill"),
    ]
    e = [
        (ea - _dt.timedelta(days=2), "good_friday"),
        (ea + _dt.timedelta(days=1), "family_day"),
    ]
    for d, name in fixed:
        e.append((d, name))
        if d.weekday() == 6:
            e.append((d + _dt.timedelta(days=1), f"{name}_(observed)"))
    return e


def _cz(year: int) -> list:
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (ea + _dt.timedelta(days=1), "easter_monday"),
        (_dt.date(year, 5, 1), "labour_day"),
        (_dt.date(year, 5, 8), "victory_day"),
        (_dt.date(year, 7, 5), "saints_cyril_and_methodius_day"),
        (_dt.date(year, 7, 6), "jan_hus_day"),
        (_dt.date(year, 9, 28), "czech_statehood_day"),
        (_dt.date(year, 10, 28), "independent_czechoslovak_state_day"),
        (_dt.date(year, 11, 17), "struggle_for_freedom_and_democracy_day"),
        (_dt.date(year, 12, 24), "christmas_eve"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "second_day_of_christmas"),
    ]
    if year >= 2016:
        e.append((ea - _dt.timedelta(days=2), "good_friday"))
    return e


def _gr(year: int) -> list:
    """Greece: movable feasts follow ORTHODOX Easter (Julian computus,
    _orthodox_easter) — a different root date than every Western
    calendar above."""
    oe = _orthodox_easter(year)
    return [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 1, 6), "epiphany"),
        (oe - _dt.timedelta(days=48), "clean_monday"),
        (_dt.date(year, 3, 25), "independence_day"),
        (oe - _dt.timedelta(days=2), "good_friday"),
        (oe + _dt.timedelta(days=1), "easter_monday"),
        (_dt.date(year, 5, 1), "labour_day"),
        (oe + _dt.timedelta(days=50), "monday_of_the_holy_spirit"),
        (_dt.date(year, 8, 15), "assumption_day"),
        (_dt.date(year, 10, 28), "ochi_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "glorifying_mother_of_god"),
    ]


def _ru(year: int) -> list:
    e = [(_dt.date(year, 1, d), f"new_year_holidays_day_{d}") for d in range(1, 7)]
    e += [
        (_dt.date(year, 1, 7), "christmas_day"),
        (_dt.date(year, 1, 8), "new_year_holidays_day_8"),
        (_dt.date(year, 2, 23), "defender_of_the_fatherland_day"),
        (_dt.date(year, 3, 8), "international_womens_day"),
        (_dt.date(year, 5, 1), "spring_and_labour_day"),
        (_dt.date(year, 5, 9), "victory_day"),
        (_dt.date(year, 6, 12), "russia_day"),
        (_dt.date(year, 11, 4), "unity_day"),
    ]
    return e


# --- Hijri (tabular Islamic calendar) ------------------------------
# 1 Muharram 1 AH in the CIVIL tabular calendar = 16 July 622 Julian
# = 19 July 622 proleptic Gregorian. The tabular (arithmetic) calendar
# — 354-day years, leap set via (11*hy + 3) // 30, alternating 30/29
# month lengths — is the standard public approximation of the
# sighting-based Umm al-Qura calendar; it lands within +/-1 day of the
# gazetted Saudi dates, so the years with known royal-court
# announcements are overridden from the published record below
# (same vendor-a-table pattern as the CN lunar new-year dates).
_HIJRI_EPOCH = _dt.date(622, 7, 19)


def _hijri_to_gregorian(hy: int, hm: int, hd: int) -> _dt.date:
    """Civil tabular conversion: day offset from the epoch is
    354*(hy-1) + leap days + ceil(29.5*(hm-1)) + hd - 1, with the
    ceil expressed integrally as 29*(hm-1) + hm//2."""
    days = (hy - 1) * 354 + (11 * hy + 3) // 30 + 29 * (hm - 1) + hm // 2 + hd - 1
    return _HIJRI_EPOCH + _dt.timedelta(days=days)


# Gazetted Saudi (Umm al-Qura / royal-court announced) Eid dates where
# they are publicly recorded; keys are Gregorian years (no year in this
# span has two occurrences of either Eid). Tabular arithmetic covers
# every other year.
_SA_EID_FITR = {
    2015: (7, 17), 2016: (7, 6), 2017: (6, 25), 2018: (6, 15),
    2019: (6, 4), 2020: (5, 24), 2021: (5, 13), 2022: (5, 2),
    2023: (4, 21), 2024: (4, 10), 2025: (3, 30),
}
_SA_EID_ADHA = {
    2015: (9, 24), 2016: (9, 12), 2017: (9, 1), 2018: (8, 21),
    2019: (8, 11), 2020: (7, 31), 2021: (7, 20), 2022: (7, 9),
    2023: (6, 28), 2024: (6, 16), 2025: (6, 6),
}


def _hijri_dates(year: int, hm: int, hd: int, overrides: dict) -> list:
    """Gregorian date(s) of Hijri (month, day) falling in `year` —
    tabular arithmetic with per-Gregorian-year overrides. A Gregorian
    year can contain the same Hijri date twice (the Hijri year is ~11
    days shorter — e.g. Eid al-Fitr fell on both Jan 8 and Dec 27 in
    2000), so up to three candidate Hijri years are scanned and
    filtered by the resulting Gregorian year."""
    import math as _math

    out = []
    for k in range(3):
        hy = int(_math.floor((year - 622) * 1.0306)) + k
        tab = _hijri_to_gregorian(hy, hm, hd)
        if tab.year != year:
            continue
        m, d = overrides.get(year, (tab.month, tab.day))
        out.append(_dt.date(year, m, d))
    return out


def _sa(year: int) -> list:
    """Saudi Arabia: fixed national days + the two Hijri Eids from the
    tabular calendar with gazetted-year overrides."""
    e = [(_dt.date(year, 9, 23), "saudi_national_day")]
    if year >= 2022:
        e.append((_dt.date(year, 2, 22), "founding_day"))
    for hm, hd, name, ov in (
        (10, 1, "eid_al_fitr", _SA_EID_FITR),
        (12, 10, "eid_al_adha", _SA_EID_ADHA),
    ):
        for d in _hijri_dates(year, hm, hd, ov):
            e.append((d, name))
    return e


def _tr(year: int) -> list:
    """Turkey: fixed national days + the multi-day Hijri bayrams
    (Ramazan Bayramı = Shawwal 1-3, Kurban Bayramı = Dhu al-Hijjah
    10-13). The Diyanet's astronomical dates track the same lunar
    months as Umm al-Qura and matched the KSA gazetted dates across
    the override span, so the day-1 anchors reuse the override tables;
    trailing days are anchor offsets. The `holidays` package takes
    precedence when importable (add_holiday_effects)."""
    e = [(_dt.date(year, 1, 1), "new_years_day"),
         (_dt.date(year, 4, 23), "national_sovereignty_and_childrens_day"),
         (_dt.date(year, 5, 19), "commemoration_of_ataturk_youth_and_sports_day"),
         (_dt.date(year, 8, 30), "victory_day"),
         (_dt.date(year, 10, 29), "republic_day")]
    if year >= 2009:
        e.append((_dt.date(year, 5, 1), "labour_and_solidarity_day"))
    if year >= 2017:
        e.append((_dt.date(year, 7, 15), "democracy_and_national_unity_day"))
    for anchor in _hijri_dates(year, 10, 1, _SA_EID_FITR):
        for i in range(3):
            e.append((anchor + _dt.timedelta(days=i), f"ramazan_bayrami_day_{i + 1}"))
    for anchor in _hijri_dates(year, 12, 10, _SA_EID_ADHA):
        for i in range(4):
            e.append((anchor + _dt.timedelta(days=i), f"kurban_bayrami_day_{i + 1}"))
    return e


# Indonesia gazettes its Islamic holidays by joint ministerial decree
# (SKB) on local sighting/astronomy — the dates differ from Umm al-Qura
# in several years (Fitr 2019/2023/2025, Adha 2018/2022/2023/2024), so
# ID carries its OWN override tables. Day 1 of Idul Fitri anchors the
# statutory two-day holiday.
_ID_EID_FITR = {
    2015: (7, 17), 2016: (7, 6), 2017: (6, 25), 2018: (6, 15),
    2019: (6, 5), 2020: (5, 24), 2021: (5, 13), 2022: (5, 2),
    2023: (4, 22), 2024: (4, 10), 2025: (3, 31),
}
_ID_EID_ADHA = {
    2015: (9, 24), 2016: (9, 12), 2017: (9, 1), 2018: (8, 22),
    2019: (8, 11), 2020: (7, 31), 2021: (7, 20), 2022: (7, 10),
    2023: (6, 29), 2024: (6, 17), 2025: (6, 6),
}
# Saka new year (Nyepi) and Vesak (Waisak) follow the Balinese-Saka and
# Buddhist lunar calendars; like NZ Matariki, the gazetted dates are
# vendored (2015-2025; later years need the SKB schedule).
_ID_NYEPI = {
    2015: (3, 21), 2016: (3, 9), 2017: (3, 28), 2018: (3, 17),
    2019: (3, 7), 2020: (3, 25), 2021: (3, 14), 2022: (3, 3),
    2023: (3, 22), 2024: (3, 11), 2025: (3, 29),
}
_ID_WAISAK = {
    2015: (6, 2), 2016: (5, 22), 2017: (5, 11), 2018: (5, 29),
    2019: (5, 19), 2020: (5, 7), 2021: (5, 26), 2022: (5, 16),
    2023: (6, 4), 2024: (5, 23), 2025: (5, 12),
}


def _id(year: int) -> list:
    """Indonesia: fixed national days, Easter-computus Christian days,
    the two-day Idul Fitri + Idul Adha / Islamic New Year / Maulid /
    Isra Mi'raj from the tabular Hijri calendar with SKB-gazetted
    overrides, and vendored Nyepi / Waisak / Imlek tables. Joint-leave
    days (cuti bersama) are government leave, not statutory holidays —
    excluded, matching the `holidays` package's default."""
    e = [
        (_dt.date(year, 1, 1), "tahun_baru_masehi"),
        (_dt.date(year, 8, 17), "hari_kemerdekaan"),
        (_dt.date(year, 12, 25), "hari_natal"),
    ]
    if year >= 2014:
        e.append((_dt.date(year, 5, 1), "hari_buruh"))
    if year >= 2017:
        e.append((_dt.date(year, 6, 1), "hari_lahir_pancasila"))
    es = _easter(year)
    e.append((es - _dt.timedelta(days=2), "wafat_isa_almasih"))
    e.append((es + _dt.timedelta(days=39), "kenaikan_isa_almasih"))
    if year >= 2003:
        lny = _lunar_date(year, 1, 1)  # vendored lunisolar arithmetic
        if lny is not None:
            e.append((lny, "tahun_baru_imlek"))
    for tbl, name in ((_ID_NYEPI, "hari_suci_nyepi"), (_ID_WAISAK, "hari_raya_waisak")):
        md = tbl.get(year)
        if md is not None:
            e.append((_dt.date(year, md[0], md[1]), name))
    for anchor in _hijri_dates(year, 10, 1, _ID_EID_FITR):
        e.append((anchor, "idul_fitri_day_1"))
        e.append((anchor + _dt.timedelta(days=1), "idul_fitri_day_2"))
    for hm, hd, name in (
        (12, 10, "idul_adha"),
        (1, 1, "tahun_baru_islam"),
        (3, 12, "maulid_nabi"),
        (7, 27, "isra_miraj"),
    ):
        for d in _hijri_dates(year, hm, hd, _ID_EID_ADHA if hm == 12 else {}):
            e.append((d, name))
    return e


def _eg(year: int) -> list:
    """Egypt: fixed national days, Coptic Christmas + Sham El Nessim
    off the Orthodox (Julian-computus) Easter, and the Hijri set —
    Eid al-Fitr spans Shawwal 1-3 and Eid al-Adha Arafat day +
    Dhu al-Hijjah 10-12, Egypt's statutory spans. Dar al-Ifta's
    announced dates tracked the Umm al-Qura gazetted dates across the
    override span, so the anchors reuse the SA override tables
    (documented approximation outside it; the `holidays` package takes
    precedence when importable)."""
    e = [
        (_dt.date(year, 1, 7), "coptic_christmas"),
        (_dt.date(year, 4, 25), "sinai_liberation_day"),
        (_dt.date(year, 5, 1), "labour_day"),
        (_dt.date(year, 7, 23), "july_23_revolution_day"),
        (_dt.date(year, 10, 6), "armed_forces_day"),
    ]
    if year >= 2012:
        e.append((_dt.date(year, 1, 25), "january_25_revolution_day"))
    if year >= 2014:
        e.append((_dt.date(year, 6, 30), "june_30_revolution_day"))
    oe = _orthodox_easter(year)
    e.append((oe + _dt.timedelta(days=1), "sham_el_nessim"))
    for anchor in _hijri_dates(year, 10, 1, _SA_EID_FITR):
        for i in range(3):
            e.append(
                (anchor + _dt.timedelta(days=i), f"eid_al_fitr_day_{i + 1}")
            )
    for anchor in _hijri_dates(year, 12, 10, _SA_EID_ADHA):
        e.append((anchor - _dt.timedelta(days=1), "arafat_day"))
        for i in range(3):
            e.append(
                (anchor + _dt.timedelta(days=i), f"eid_al_adha_day_{i + 1}")
            )
    for hm, hd, name in ((1, 1, "islamic_new_year"), (3, 12, "prophets_birthday")):
        for d in _hijri_dates(year, hm, hd, {}):
            e.append((d, name))
    return e


_COUNTRIES.update(
    {
        "IE": _ie,
        "BE": _be,
        "FI": _fi,
        "NZ": _nz,
        "ZA": _za,
        "CZ": _cz,
        "GR": _gr,
        "RU": _ru,
        "SA": _sa,
        "TR": _tr,
        "ID": _id,
        "EG": _eg,
    }
)


# Matariki (NZ, statutory since 2022) follows the Maori lunar calendar;
# the government gazettes the observed Fridays — fixed-rule computation
# is not possible, so the published list is vendored (2022-2030; later
# years need the gazetted schedule).
_NZ_MATARIKI = {
    2022: (6, 24),
    2023: (7, 14),
    2024: (6, 28),
    2025: (6, 20),
    2026: (7, 10),
    2027: (6, 25),
    2028: (7, 14),
    2029: (7, 6),
    2030: (6, 21),
}
_nz_base = _nz


def _nz_with_matariki(year: int) -> list:
    e = _nz_base(year)
    md = _NZ_MATARIKI.get(year)
    if md is not None:
        e.append((_dt.date(year, md[0], md[1]), "matariki"))
    return e


_COUNTRIES["NZ"] = _nz_with_matariki


# --- Chinese lunisolar calendar (vendored arithmetic) ---------------
# The standard compressed month-length table: one 17-bit value per
# lunar year 1900..2049 — bit (16-m) set means lunar month m has 30
# days (else 29); the low nibble is the leap-month number (0 = none);
# bit 16 gives the leap month's own length (1 = 30 days). Lunar
# 1900-01-01 = Gregorian 1900-01-31. This widely published table is
# the same public encoding the `lunarcalendar`/`zhdate`-family
# packages vendor; it is pinned in tests against 39 published
# anchors (every Lunar-New-Year and Mid-Autumn date 2015-2030 from
# the tables above, historical new years 1900/1950/1968/1984/1997/
# 2000/2008, Dragon Boat 2023-2025 and Buddha's Birthday 2024-2025).
# Because new-year dates are CUMULATIVE sums of year lengths, the
# spread anchors pin every year length in 1900-2030, not just the
# anchor years.
_LUNAR_INFO = [
    0x04BD8, 0x04AE0, 0x0A570, 0x054D5, 0x0D260, 0x0D950, 0x16554, 0x056A0,
    0x09AD0, 0x055D2,  # 1900-1909
    0x04AE0, 0x0A5B6, 0x0A4D0, 0x0D250, 0x1D255, 0x0B540, 0x0D6A0, 0x0ADA2,
    0x095B0, 0x14977,  # 1910-1919
    0x04970, 0x0A4B0, 0x0B4B5, 0x06A50, 0x06D40, 0x1AB54, 0x02B60, 0x09570,
    0x052F2, 0x04970,  # 1920-1929
    0x06566, 0x0D4A0, 0x0EA50, 0x06E95, 0x05AD0, 0x02B60, 0x186E3, 0x092E0,
    0x1C8D7, 0x0C950,  # 1930-1939
    0x0D4A0, 0x1D8A6, 0x0B550, 0x056A0, 0x1A5B4, 0x025D0, 0x092D0, 0x0D2B2,
    0x0A950, 0x0B557,  # 1940-1949
    0x06CA0, 0x0B550, 0x15355, 0x04DA0, 0x0A5B0, 0x14573, 0x052B0, 0x0A9A8,
    0x0E950, 0x06AA0,  # 1950-1959
    0x0AEA6, 0x0AB50, 0x04B60, 0x0AAE4, 0x0A570, 0x05260, 0x0F263, 0x0D950,
    0x05B57, 0x056A0,  # 1960-1969
    0x096D0, 0x04DD5, 0x04AD0, 0x0A4D0, 0x0D4D4, 0x0D250, 0x0D558, 0x0B540,
    0x0B5A0, 0x195A6,  # 1970-1979
    0x095B0, 0x049B0, 0x0A974, 0x0A4B0, 0x0B27A, 0x06A50, 0x06D40, 0x0AF46,
    0x0AB60, 0x09570,  # 1980-1989
    0x04AF5, 0x04970, 0x064B0, 0x074A3, 0x0EA50, 0x06B58, 0x055C0, 0x0AB60,
    0x096D5, 0x092E0,  # 1990-1999
    0x0C960, 0x0D954, 0x0D4A0, 0x0DA50, 0x07552, 0x056A0, 0x0ABB7, 0x025D0,
    0x092D0, 0x0CAB5,  # 2000-2009
    0x0A950, 0x0B4A0, 0x0BAA4, 0x0AD50, 0x055D9, 0x04BA0, 0x0A5B0, 0x15176,
    0x052B0, 0x0A930,  # 2010-2019
    0x07954, 0x06AA0, 0x0AD50, 0x05B52, 0x04B60, 0x0A6E6, 0x0A4E0, 0x0D260,
    0x0EA65, 0x0D530,  # 2020-2029
    0x05AA0, 0x076A3, 0x096D0, 0x04AFB, 0x04AD0, 0x0A4D0, 0x1D0B6, 0x0D250,
    0x0D520, 0x0DD45,  # 2030-2039
    0x0B5A0, 0x056D0, 0x055B2, 0x049B0, 0x0A577, 0x0A4B0, 0x0AA50, 0x1B255,
    0x06D20, 0x0ADA0,  # 2040-2049
]
_LUNAR_BASE = 1900
_LUNAR_EPOCH = _dt.date(1900, 1, 31)  # lunar 1900-01-01


def _lunar_leap_month(ly: int) -> int:
    return _LUNAR_INFO[ly - _LUNAR_BASE] & 0xF


def _lunar_leap_days(ly: int) -> int:
    if _lunar_leap_month(ly) == 0:
        return 0
    return 30 if _LUNAR_INFO[ly - _LUNAR_BASE] & 0x10000 else 29


def _lunar_month_days(ly: int, lm: int) -> int:
    return 30 if _LUNAR_INFO[ly - _LUNAR_BASE] & (0x10000 >> lm) else 29


def _lunar_year_days(ly: int) -> int:
    info = _LUNAR_INFO[ly - _LUNAR_BASE]
    return 348 + sum(
        1 for m in range(1, 13) if info & (0x10000 >> m)
    ) + _lunar_leap_days(ly)


def _lunisolar_to_gregorian(ly: int, lm: int, ld: int) -> _dt.date:
    """Gregorian date of (non-leap) lunar month `lm`, day `ld` of
    lunar year `ly` (valid 1900-2049): epoch + the cumulative year
    lengths before `ly` + the month lengths before `lm` (counting the
    leap month when it precedes `lm`) + ld - 1."""
    days = sum(_lunar_year_days(y) for y in range(_LUNAR_BASE, ly))
    days += sum(_lunar_month_days(ly, m) for m in range(1, lm))
    leap = _lunar_leap_month(ly)
    if 0 < leap < lm:
        days += _lunar_leap_days(ly)
    return _LUNAR_EPOCH + _dt.timedelta(days=days + ld - 1)


def _lunar_date(year: int, lm: int, ld: int):
    """Gregorian date of lunar (lm, ld) falling in Gregorian `year`,
    or None outside the vendored 1900-2049 span. Lunar new year falls
    in late Jan / Feb, so every lunar date of lunar year Y with month
    <= ~10 lands in Gregorian year Y — one candidate suffices for the
    holiday months used here (1..9)."""
    if not (_LUNAR_BASE <= year < _LUNAR_BASE + len(_LUNAR_INFO)):
        return None
    d = _lunisolar_to_gregorian(year, lm, ld)
    return d if d.year == year else None


def _vn(year: int) -> list:
    """Vietnam statutory public holidays: Tet eve (last day of the old
    lunar year) + Tet days 1-3 (the Labour-Code entitlement is 5 days
    with the remaining ones scheduled by decree year-to-year —
    excluded, like CN's golden-week extensions), Hung Kings'
    Commemoration (lunar 3/10, statutory since 2007), and the fixed
    national days. The second National-Day day (statutory since 2021)
    is government-scheduled to Sep 1 or Sep 3 by year — excluded."""
    e = [
        (_dt.date(year, 1, 1), "tet_duong_lich"),
        (_dt.date(year, 4, 30), "ngay_giai_phong"),
        (_dt.date(year, 5, 1), "ngay_quoc_te_lao_dong"),
        (_dt.date(year, 9, 2), "quoc_khanh"),
    ]
    lny = _lunar_date(year, 1, 1)
    if lny is not None:
        e.append((lny - _dt.timedelta(days=1), "giao_thua"))
        for i in range(3):
            e.append((lny + _dt.timedelta(days=i), f"tet_day_{i + 1}"))
    if year >= 2007:
        hk = _lunar_date(year, 3, 10)
        if hk is not None:
            e.append((hk, "gio_to_hung_vuong"))
    return e


def _tw(year: int) -> list:
    """Taiwan public holidays: lunar new year eve + days 1-3, Peace
    Memorial Day (since 1997), Children's Day (re-established 2011),
    tomb-sweeping via the Qingming solar term, Dragon Boat,
    Mid-Autumn, and the fixed national days. Make-up/adjusted rest
    days are scheduling — excluded."""
    e = [
        (_dt.date(year, 1, 1), "founding_day"),
        (_dt.date(year, 10, 10), "national_day"),
    ]
    if year >= 1997:
        e.append((_dt.date(year, 2, 28), "peace_memorial_day"))
    if year >= 2011:
        e.append((_dt.date(year, 4, 4), "childrens_day"))
    if 2000 <= year <= 2099:
        e.append((_qingming(year), "tomb_sweeping_day"))
    lny = _lunar_date(year, 1, 1)
    if lny is not None:
        e.append((lny - _dt.timedelta(days=1), "lunar_new_years_eve"))
        for i in range(3):
            e.append(
                (lny + _dt.timedelta(days=i), f"lunar_new_year_day_{i + 1}")
            )
    for lm, ld, name in (
        (5, 5, "dragon_boat_festival"),
        (8, 15, "mid_autumn_festival"),
    ):
        d = _lunar_date(year, lm, ld)
        if d is not None:
            e.append((d, name))
    return e


def _hk(year: int) -> list:
    """Hong Kong general holidays (main day of each; the statutory
    Sunday-substitution days are not modeled, matching the KR/CN
    convention here): Gregorian-computus Easter days, the lunisolar
    set (LNY days 1-3, Buddha's Birthday 4/8, Tuen Ng 5/5, the day
    FOLLOWING Mid-Autumn 8/16, Chung Yeung 9/9), the Qingming solar
    term (Ching Ming), and the fixed days."""
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "the_first_day_of_january"),
        (ea - _dt.timedelta(days=2), "good_friday"),
        (ea - _dt.timedelta(days=1), "the_day_following_good_friday"),
        (ea + _dt.timedelta(days=1), "easter_monday"),
        (_dt.date(year, 5, 1), "labour_day"),
        (_dt.date(year, 7, 1), "hksar_establishment_day"),
        (_dt.date(year, 10, 1), "national_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 26), "the_first_weekday_after_christmas_day"),
    ]
    if 2000 <= year <= 2099:
        e.append((_qingming(year), "ching_ming_festival"))
    lny = _lunar_date(year, 1, 1)
    if lny is not None:
        for i in range(3):
            e.append(
                (lny + _dt.timedelta(days=i), f"lunar_new_year_day_{i + 1}")
            )
    for lm, ld, name in (
        (4, 8, "the_birthday_of_the_buddha"),
        (5, 5, "tuen_ng_festival"),
        (8, 16, "the_day_following_the_mid_autumn_festival"),
        (9, 9, "chung_yeung_festival"),
    ):
        d = _lunar_date(year, lm, ld)
        if d is not None:
            e.append((d, name))
    return e


# --- Hebrew calendar (vendored arithmetic) --------------------------
# The classic arithmetic calendar: Rosh Hashanah of Hebrew year hy is
# fixed by the molad (mean conjunction, counted in 1/1080-hour parts)
# plus the four dechiyot (postponement rules). The day count is
# anchored at the published Rosh Hashanah 5785 = 2024-10-03 instead of
# the proleptic epoch (which predates datetime.date's range); the
# arithmetic is pinned in tests against published dates 1989-2025
# (Rosh Hashanah, Pesach, Yom Kippur, Shavuot, Hanukkah).
_HEBREW_ANCHOR = _dt.date(2024, 10, 3)  # Rosh Hashanah 5785
_HEBREW_ANCHOR_ELAPSED = 2112590  # _hebrew_elapsed_days(5785)


def _hebrew_leap(hy: int) -> bool:
    return (7 * hy + 1) % 19 < 7


def _hebrew_elapsed_days(hy: int) -> int:
    months_elapsed = (
        235 * ((hy - 1) // 19)
        + 12 * ((hy - 1) % 19)
        + (7 * ((hy - 1) % 19) + 1) // 19
    )
    parts_elapsed = 204 + 793 * (months_elapsed % 1080)
    hours_elapsed = (
        5 + 12 * months_elapsed + 793 * (months_elapsed // 1080)
        + parts_elapsed // 1080
    )
    day = 1 + 29 * months_elapsed + hours_elapsed // 24
    parts = (hours_elapsed % 24) * 1080 + parts_elapsed % 1080
    if (
        parts >= 19440
        or (day % 7 == 2 and parts >= 9924 and not _hebrew_leap(hy))
        or (day % 7 == 1 and parts >= 16789 and _hebrew_leap(hy - 1))
    ):
        day += 1
    if day % 7 in (0, 3, 5):
        day += 1
    return day


def _rosh_hashanah(hy: int) -> _dt.date:
    return _HEBREW_ANCHOR + _dt.timedelta(
        days=_hebrew_elapsed_days(hy) - _HEBREW_ANCHOR_ELAPSED
    )


def _hebrew_to_gregorian(hy: int, month: str, hd: int) -> _dt.date:
    """Gregorian date of Hebrew (month, day): Rosh Hashanah + the
    month lengths before `month`. Cheshvan/Kislev vary with the year
    length (353/355 deficient/complete regular years, 383/385 leap);
    leap years insert the 30-day Adar I before Adar."""
    yl = _hebrew_elapsed_days(hy + 1) - _hebrew_elapsed_days(hy)
    chesh = 30 if yl in (355, 385) else 29
    kis = 29 if yl in (353, 383) else 30
    months = [("tishrei", 30), ("cheshvan", chesh), ("kislev", kis),
              ("tevet", 29), ("shevat", 30)]
    if _hebrew_leap(hy):
        months.append(("adar_i", 30))
    months += [("adar", 29), ("nisan", 30), ("iyar", 29), ("sivan", 30),
               ("tammuz", 29), ("av", 30), ("elul", 29)]
    off = 0
    for nm, ln in months:
        if nm == month:
            return _rosh_hashanah(hy) + _dt.timedelta(days=off + hd - 1)
        off += ln
    raise ValueError(f"unknown Hebrew month {month!r}")


def _hebrew_dates(year: int, month: str, hd: int) -> list:
    """Gregorian date(s) of Hebrew (month, day) in Gregorian `year`.
    Rosh Hashanah of hy falls in Gregorian year hy-3761 (Sep-Oct), so
    spring dates of hy land in hy-3760: both candidates are scanned
    and filtered (each Hebrew date occurs at most once per Gregorian
    year — the Hebrew year is never shorter than ~353 days)."""
    out = []
    for hy in (year + 3760, year + 3761):
        d = _hebrew_to_gregorian(hy, month, hd)
        if d.year == year:
            out.append(d)
    return out


def _il(year: int) -> list:
    """Israel national (yom tov) holidays from the arithmetic Hebrew
    calendar: the Tishrei cluster, Pesach first/seventh days, Shavuot,
    and Independence Day (Iyar 5 shifted: Fri->Thu Iyar 4, Sat->Thu
    Iyar 3, and Mon->Tue Iyar 6 since the 2004 amendment). Chol
    hamoed / eve half-days / Purim-Hanukkah (work days) excluded."""
    e = []
    for month, hd, name in (
        ("tishrei", 1, "rosh_hashanah"),
        ("tishrei", 2, "rosh_hashanah_day_2"),
        ("tishrei", 10, "yom_kippur"),
        ("tishrei", 15, "sukkot"),
        ("tishrei", 22, "shemini_atzeret"),
        ("nisan", 15, "pesach"),
        ("nisan", 21, "seventh_of_pesach"),
        ("sivan", 6, "shavuot"),
    ):
        for d in _hebrew_dates(year, month, hd):
            e.append((d, name))
    if year >= 1948:
        for d in _hebrew_dates(year, "iyar", 5):
            wd = d.weekday()  # Mon=0 .. Sun=6
            if wd == 4:
                d -= _dt.timedelta(days=1)
            elif wd == 5:
                d -= _dt.timedelta(days=2)
            elif wd == 0 and year >= 2004:
                d += _dt.timedelta(days=1)
            e.append((d, "independence_day"))
    return e


_COUNTRIES.update({"VN": _vn, "TW": _tw, "HK": _hk, "IL": _il})


# --- round 7: rule-only European calendars (fixed + computus) --------


def _hu(year: int) -> list:
    """Hungary: Gregorian computus + fixed national days. Good Friday
    statutory since 2017."""
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "ujev"),
        (_dt.date(year, 3, 15), "nemzeti_unnep_marcius_15"),
        (ea + _dt.timedelta(days=1), "husvethetfo"),
        (_dt.date(year, 5, 1), "a_munka_unnepe"),
        (ea + _dt.timedelta(days=50), "punkosdhetfo"),
        (_dt.date(year, 8, 20), "az_allamalapitas_unnepe"),
        (_dt.date(year, 11, 1), "mindenszentek"),
        (_dt.date(year, 12, 25), "karacsony"),
        (_dt.date(year, 12, 26), "karacsony_masnapja"),
    ]
    if year >= 1991:
        e.append((_dt.date(year, 10, 23), "nemzeti_unnep_oktober_23"))
    if year >= 2017:
        e.append((ea - _dt.timedelta(days=2), "nagypentek"))
    return e


def _sk(year: int) -> list:
    """Slovakia: Constitution Day (Sep 1) lost public-holiday status
    from 2024 — the year guard mirrors the amendment."""
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "den_vzniku_slovenskej_republiky"),
        (_dt.date(year, 1, 6), "zjavenie_pana"),
        (ea - _dt.timedelta(days=2), "velky_piatok"),
        (ea + _dt.timedelta(days=1), "velkonocny_pondelok"),
        (_dt.date(year, 5, 1), "sviatok_prace"),
        (_dt.date(year, 5, 8), "den_vitazstva_nad_fasizmom"),
        (_dt.date(year, 7, 5), "sviatok_svateho_cyrila_a_metoda"),
        (_dt.date(year, 8, 29), "vyrocie_snp"),
        (_dt.date(year, 9, 15), "sedembolestna_panna_maria"),
        (_dt.date(year, 11, 1), "sviatok_vsetkych_svatych"),
        (_dt.date(year, 11, 17), "den_boja_za_slobodu_a_demokraciu"),
        (_dt.date(year, 12, 24), "stedry_den"),
        (_dt.date(year, 12, 25), "prvy_sviatok_vianocny"),
        (_dt.date(year, 12, 26), "druhy_sviatok_vianocny"),
    ]
    if year <= 2023:
        e.append((_dt.date(year, 9, 1), "den_ustavy_slovenskej_republiky"))
    return e


def _ro(year: int) -> list:
    """Romania: ORTHODOX computus for the movable feasts (Good Friday
    statutory since 2018, Union Day since 2017, Children's Day since
    2017, St Andrew since 2012)."""
    oe = _orthodox_easter(year)
    e = [
        (_dt.date(year, 1, 1), "anul_nou"),
        (_dt.date(year, 1, 2), "anul_nou_ziua_2"),
        (oe, "pastele"),
        (oe + _dt.timedelta(days=1), "a_doua_zi_de_paste"),
        (_dt.date(year, 5, 1), "ziua_muncii"),
        (oe + _dt.timedelta(days=49), "rusaliile"),
        (oe + _dt.timedelta(days=50), "a_doua_zi_de_rusalii"),
        (_dt.date(year, 8, 15), "adormirea_maicii_domnului"),
        (_dt.date(year, 12, 1), "ziua_nationala"),
        (_dt.date(year, 12, 25), "craciunul"),
        (_dt.date(year, 12, 26), "a_doua_zi_de_craciun"),
    ]
    if year >= 2012:
        e.append((_dt.date(year, 11, 30), "sfantul_andrei"))
    if year >= 2017:
        e.append((_dt.date(year, 1, 24), "ziua_unirii_principatelor_romane"))
        e.append((_dt.date(year, 6, 1), "ziua_copilului"))
    if year >= 2018:
        e.append((oe - _dt.timedelta(days=2), "vinerea_mare"))
    return e


def _bg(year: int) -> list:
    """Bulgaria: ORTHODOX computus spans Good Friday through Easter
    Monday; fixed national/cultural days."""
    oe = _orthodox_easter(year)
    return [
        (_dt.date(year, 1, 1), "nova_godina"),
        (_dt.date(year, 3, 3), "den_na_osvobozhdenieto"),
        (oe - _dt.timedelta(days=2), "velikden_petak"),
        (oe - _dt.timedelta(days=1), "velikden_sabota"),
        (oe, "velikden"),
        (oe + _dt.timedelta(days=1), "velikden_ponedelnik"),
        (_dt.date(year, 5, 1), "den_na_truda"),
        (_dt.date(year, 5, 6), "gergovden"),
        (_dt.date(year, 5, 24), "den_na_bulgarskata_prosveta_i_kultura"),
        (_dt.date(year, 9, 6), "den_na_saedinenieto"),
        (_dt.date(year, 9, 22), "den_na_nezavisimostta"),
        (_dt.date(year, 12, 24), "badni_vecher"),
        (_dt.date(year, 12, 25), "rozhdestvo_hristovo"),
        (_dt.date(year, 12, 26), "rozhdestvo_hristovo_vtori_den"),
    ]


def _hr(year: int) -> list:
    """Croatia: Gregorian computus (Easter Sunday + Monday, Corpus
    Christi = Easter + 60); the 2020 act moved Statehood Day to
    May 30 and added Remembrance Day (Nov 18), dropping the Oct 8
    Independence Day holiday (2002-2019)."""
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "nova_godina"),
        (_dt.date(year, 1, 6), "bogojavljenje"),
        (ea, "uskrs"),
        (ea + _dt.timedelta(days=1), "uskrsni_ponedjeljak"),
        (ea + _dt.timedelta(days=60), "tijelovo"),
        (_dt.date(year, 5, 1), "praznik_rada"),
        (_dt.date(year, 6, 22), "dan_antifasisticke_borbe"),
        (_dt.date(year, 8, 5), "dan_pobjede_i_domovinske_zahvalnosti"),
        (_dt.date(year, 8, 15), "velika_gospa"),
        (_dt.date(year, 11, 1), "svi_sveti"),
        (_dt.date(year, 12, 25), "bozic"),
        (_dt.date(year, 12, 26), "sveti_stjepan"),
    ]
    if year >= 2020:
        e.append((_dt.date(year, 5, 30), "dan_drzavnosti"))
        e.append((_dt.date(year, 11, 18), "dan_sjecanja_na_zrtve_domovinskog_rata"))
    elif year >= 2002:
        e.append((_dt.date(year, 6, 25), "dan_drzavnosti"))
        e.append((_dt.date(year, 10, 8), "dan_neovisnosti"))
    return e


_COUNTRIES.update({"HU": _hu, "SK": _sk, "RO": _ro, "BG": _bg, "HR": _hr})


def _ph(year: int) -> list:
    """Philippines: regular holidays + the recurring special
    (non-working) days, one row each like the `holidays` package.
    Proclamation-dependent days (the two Eids, one-off special days)
    are omitted — they are gazetted per-year, not rule-derivable.
    Chinese New Year (special day since 2012) rides the vendored
    lunisolar arithmetic."""
    ea = _easter(year)
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (ea - _dt.timedelta(days=3), "maundy_thursday"),
        (ea - _dt.timedelta(days=2), "good_friday"),
        (ea - _dt.timedelta(days=1), "black_saturday"),
        (_dt.date(year, 4, 9), "araw_ng_kagitingan"),
        (_dt.date(year, 5, 1), "labor_day"),
        (_dt.date(year, 6, 12), "independence_day"),
        # RA 9492 (2007) moved National Heroes Day to the last Monday
        # of August; before that EO 292 (Admin Code of 1987) observed
        # the last SUNDAY of August
        (
            _last_monday(year, 8)
            if year >= 2007
            else _last_monday(year, 8, weekday=6),
            "national_heroes_day",
        ),
        (_dt.date(year, 11, 1), "all_saints_day"),
        (_dt.date(year, 11, 30), "bonifacio_day"),
        (_dt.date(year, 12, 8), "feast_of_the_immaculate_conception"),
        (_dt.date(year, 12, 25), "christmas_day"),
        (_dt.date(year, 12, 30), "rizal_day"),
        (_dt.date(year, 12, 31), "last_day_of_the_year"),
    ]
    if year >= 2004:
        e.append((_dt.date(year, 8, 21), "ninoy_aquino_day"))
    if year >= 2012:
        lny = _lunar_date(year, 1, 1)
        if lny is not None:
            e.append((lny, "chinese_new_year"))
    return e


def _last_monday(year: int, month: int, weekday: int = 0) -> _dt.date:
    """Last `weekday` (0=Monday .. 6=Sunday) of the month. Monday is
    the PH National Heroes Day rule since 2007 (RA 9492); Sunday the
    pre-2007 EO 292 rule."""
    if month == 12:
        last = _dt.date(year, 12, 31)
    else:
        last = _dt.date(year, month + 1, 1) - _dt.timedelta(days=1)
    return last - _dt.timedelta(days=(last.weekday() - weekday) % 7)


_COUNTRIES["PH"] = _ph


# Thailand's Buddhist holy days follow the THAI lunisolar calendar
# (Patithin Chantarakati) — an arithmetic system whose athikamat /
# athikawan insertions are fixed by official calendar committee, not
# derivable from the Chinese month tables (e.g. Visakha Bucha 2025 is
# May 11 while the Chinese 4th-month full moon is May 12). Like NZ
# Matariki and ID Nyepi/Waisak, the gazetted dates are vendored
# (2015-2026; the 2026 dates are from the published cabinet calendar).
# Makha = 3rd-month full moon, Visakha = 6th, Asalha = 8th; Khao
# Phansa (Buddhist Lent) is the day after Asalha Bucha.
_TH_MAKHA = {
    2015: (3, 4), 2016: (2, 22), 2017: (2, 11), 2018: (3, 1),
    2019: (2, 19), 2020: (2, 8), 2021: (2, 26), 2022: (2, 16),
    2023: (3, 6), 2024: (2, 24), 2025: (2, 12), 2026: (3, 3),
}
_TH_VISAKHA = {
    2015: (6, 1), 2016: (5, 20), 2017: (5, 10), 2018: (5, 29),
    2019: (5, 18), 2020: (5, 6), 2021: (5, 26), 2022: (5, 15),
    2023: (6, 3), 2024: (5, 22), 2025: (5, 11), 2026: (5, 31),
}
_TH_ASALHA = {
    2015: (7, 30), 2016: (7, 19), 2017: (7, 8), 2018: (7, 27),
    2019: (7, 16), 2020: (7, 5), 2021: (7, 24), 2022: (7, 13),
    2023: (8, 1), 2024: (7, 20), 2025: (7, 10), 2026: (7, 29),
}


def _th(year: int) -> list:
    """Thailand: fixed/royal statutory holidays by rule + the vendored
    Thai-lunisolar Buddhist days. Substitution days (observed-on-
    Monday) and one-off cabinet 'special holidays' are scheduling, not
    rule-derivable — excluded, matching the PH treatment of gazetted
    days. Royal Ploughing Ceremony is gazetted per-year (Bureau of
    Royal Household astrology) — excluded."""
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_dt.date(year, 4, 6), "chakri_memorial_day"),
        (_dt.date(year, 5, 1), "national_labour_day"),
        (_dt.date(year, 8, 12), "the_queen_mothers_birthday"),
        (_dt.date(year, 10, 23), "chulalongkorn_memorial_day"),
        (_dt.date(year, 12, 5), "king_bhumibols_birthday"),
        (_dt.date(year, 12, 10), "constitution_day"),
        (_dt.date(year, 12, 31), "new_years_eve"),
    ]
    for i in range(3):
        e.append((_dt.date(year, 4, 13 + i), f"songkran_festival_day_{i + 1}"))
    # Rama X's coronation anniversary (May 4) is statutory from 2019;
    # Rama IX's (May 5) lapsed after 2016 with no holiday in 2017-18
    if year >= 2019:
        e.append((_dt.date(year, 5, 4), "coronation_day"))
    elif year <= 2016:
        e.append((_dt.date(year, 5, 5), "coronation_day"))
    if year >= 2019:
        e.append((_dt.date(year, 6, 3), "queen_suthidas_birthday"))
    if year >= 2017:
        e.append((_dt.date(year, 7, 28), "king_vajiralongkorns_birthday"))
        e.append((_dt.date(year, 10, 13), "king_bhumibol_memorial_day"))
    for tbl, nm in (
        (_TH_MAKHA, "makha_bucha"),
        (_TH_VISAKHA, "visakha_bucha"),
        (_TH_ASALHA, "asalha_bucha"),
    ):
        md = tbl.get(year)
        if md is not None:
            e.append((_dt.date(year, md[0], md[1]), nm))
    asalha = _TH_ASALHA.get(year)
    if asalha is not None:
        e.append(
            (_dt.date(year, asalha[0], asalha[1]) + _dt.timedelta(days=1),
             "khao_phansa")
        )
    return e


# Malaysia gazettes its Islamic holidays on national moon sighting
# (rukyah) — like Indonesia's SKB dates these differ from Umm al-Qura
# in several years (Fitr 2019/2023/2025, Adha 2018/2022/2024/2025),
# so MY carries its own override tables. Wesak (the May full-moon
# Vesak convention, NOT the Chinese 4th-month-15th used in Singapore
# before 2020s alignment) and Deepavali (Hindu lunisolar) are vendored
# gazetted dates, the ID Nyepi/Waisak treatment.
_MY_FITR = {
    2015: (7, 17), 2016: (7, 6), 2017: (6, 25), 2018: (6, 15),
    2019: (6, 5), 2020: (5, 24), 2021: (5, 13), 2022: (5, 2),
    2023: (4, 22), 2024: (4, 10), 2025: (3, 31),
}
_MY_ADHA = {
    2015: (9, 24), 2016: (9, 12), 2017: (9, 1), 2018: (8, 22),
    2019: (8, 11), 2020: (7, 31), 2021: (7, 20), 2022: (7, 10),
    2023: (6, 29), 2024: (6, 17), 2025: (6, 7),
}
_MY_MUHARRAM = {
    2015: (10, 14), 2016: (10, 2), 2017: (9, 22), 2018: (9, 11),
    2019: (9, 1), 2020: (8, 20), 2021: (8, 10), 2022: (7, 30),
    2023: (7, 19), 2024: (7, 7), 2025: (6, 27),
}
# 2015 contained TWO Maulids (Hijri years 1436 and 1437: Jan 3 and
# Dec 24) — tabular arithmetic covers that year; overrides start 2016.
_MY_MAULID = {
    2016: (12, 12), 2017: (12, 1), 2018: (11, 20), 2019: (11, 9),
    2020: (10, 29), 2021: (10, 19), 2022: (10, 10), 2023: (9, 28),
    2024: (9, 16), 2025: (9, 5),
}
_MY_WESAK = {
    2015: (5, 3), 2016: (5, 21), 2017: (5, 10), 2018: (5, 29),
    2019: (5, 19), 2020: (5, 7), 2021: (5, 26), 2022: (5, 15),
    2023: (5, 4), 2024: (5, 22), 2025: (5, 12),
}
_MY_DEEPAVALI = {
    2015: (11, 10), 2016: (10, 29), 2017: (10, 18), 2018: (11, 6),
    2019: (10, 27), 2020: (11, 14), 2021: (11, 4), 2022: (10, 24),
    2023: (11, 12), 2024: (10, 31), 2025: (10, 20),
}


def _my(year: int) -> list:
    """Malaysia: NATIONWIDE holidays only (state holidays excluded,
    matching the `holidays` package default) — Chinese New Year days
    1-2 off the shared lunisolar tables, the four Islamic days from
    the tabular Hijri calendar with rukyah-gazetted overrides (Hari
    Raya Aidilfitri is a two-day statutory holiday), vendored Wesak /
    Deepavali, and the fixed/rule days. The Agong's birthday is the
    first Monday of June from 2020 (2017-2019 it was gazetted to
    Sep 9 for Sultan Muhammad V / the new reign; first Saturday of
    June before 2017). Jan 1 is a STATE holiday in most but not all
    states — excluded nationally."""
    e = [
        (_dt.date(year, 5, 1), "labour_day"),
        (_dt.date(year, 8, 31), "national_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
    ]
    if year >= 2010:
        e.append((_dt.date(year, 9, 16), "malaysia_day"))
    if year >= 2020:
        e.append((_nth_weekday(year, 6, 0, 1), "agongs_birthday"))
    elif year >= 2017:
        e.append((_dt.date(year, 9, 9), "agongs_birthday"))
    else:
        e.append((_nth_weekday(year, 6, 5, 1), "agongs_birthday"))
    lny = _lunar_date(year, 1, 1)
    if lny is not None:
        e.append((lny, "chinese_new_year"))
        e.append((lny + _dt.timedelta(days=1), "chinese_new_year_day_2"))
    for tbl, nm in ((_MY_WESAK, "wesak_day"), (_MY_DEEPAVALI, "deepavali")):
        md = tbl.get(year)
        if md is not None:
            e.append((_dt.date(year, md[0], md[1]), nm))
    for anchor in _hijri_dates(year, 10, 1, _MY_FITR):
        e.append((anchor, "hari_raya_aidilfitri"))
        e.append((anchor + _dt.timedelta(days=1), "hari_raya_aidilfitri_day_2"))
    for d in _hijri_dates(year, 12, 10, _MY_ADHA):
        e.append((d, "hari_raya_aidiladha"))
    for d in _hijri_dates(year, 1, 1, _MY_MUHARRAM):
        e.append((d, "awal_muharram"))
    for d in _hijri_dates(year, 3, 12, _MY_MAULID):
        e.append((d, "maulidur_rasul"))
    return e


# Singapore gazettes its Islamic holidays on MUIS sighting — notably
# Hari Raya Puasa 2022 fell May 3 (Malaysia: May 2). Vesak Day in
# Singapore follows the Chinese lunar 4th-month 15th day (2023: Jun 2,
# a leap-month year — unlike Malaysia's May-full-moon Wesak on May 4),
# so it rides the shared lunisolar tables. Deepavali is gazetted.
_SG_PUASA = {
    2015: (7, 17), 2016: (7, 6), 2017: (6, 25), 2018: (6, 15),
    2019: (6, 5), 2020: (5, 24), 2021: (5, 13), 2022: (5, 3),
    2023: (4, 22), 2024: (4, 10), 2025: (3, 31),
}
_SG_HAJI = {
    2015: (9, 24), 2016: (9, 12), 2017: (9, 1), 2018: (8, 22),
    2019: (8, 11), 2020: (7, 31), 2021: (7, 20), 2022: (7, 10),
    2023: (6, 29), 2024: (6, 17), 2025: (6, 7),
}
_SG_DEEPAVALI = {
    2015: (11, 10), 2016: (10, 29), 2017: (10, 18), 2018: (11, 6),
    2019: (10, 27), 2020: (11, 14), 2021: (11, 4), 2022: (10, 24),
    2023: (11, 12), 2024: (10, 31), 2025: (10, 20),
}


def _sg(year: int) -> list:
    """Singapore: the 11 gazetted public holidays — fixed days,
    Gregorian computus (Good Friday), CNY days 1-2 AND Vesak
    (lunar 4/15) off the shared lunisolar tables, tabular Hijri with
    MUIS-gazetted overrides, vendored Deepavali. One-off Polling Days
    and SG50-style extras are proclamations — excluded."""
    e = [
        (_dt.date(year, 1, 1), "new_years_day"),
        (_easter(year) - _dt.timedelta(days=2), "good_friday"),
        (_dt.date(year, 5, 1), "labour_day"),
        (_dt.date(year, 8, 9), "national_day"),
        (_dt.date(year, 12, 25), "christmas_day"),
    ]
    lny = _lunar_date(year, 1, 1)
    if lny is not None:
        e.append((lny, "chinese_new_year"))
        e.append((lny + _dt.timedelta(days=1), "chinese_new_year_day_2"))
    vesak = _lunar_date(year, 4, 15)
    if vesak is not None:
        e.append((vesak, "vesak_day"))
    md = _SG_DEEPAVALI.get(year)
    if md is not None:
        e.append((_dt.date(year, md[0], md[1]), "deepavali"))
    for d in _hijri_dates(year, 10, 1, _SG_PUASA):
        e.append((d, "hari_raya_puasa"))
    for d in _hijri_dates(year, 12, 10, _SG_HAJI):
        e.append((d, "hari_raya_haji"))
    return e


def _next_monday(d: _dt.date) -> _dt.date:
    """Ley Emiliani (CO, Ley 51/1983): observe on the FOLLOWING Monday
    unless the date already is one."""
    return d + _dt.timedelta(days=(7 - d.weekday()) % 7)


def _co(year: int) -> list:
    """Colombia: fixed days + Easter-computus days + the Ley-Emiliani
    next-Monday moves (effective 1984). The three movable religious
    feasts land on fixed Easter offsets once moved: Ascension
    (Easter+39, a Thursday) -> Easter+43; Corpus Christi (Easter+60)
    -> Easter+64; Sagrado Corazon (Easter+68, a Friday) -> Easter+71."""
    ea = _easter(year)
    d = _dt.timedelta
    e = [
        (_dt.date(year, 1, 1), "ano_nuevo"),
        (ea - d(3), "jueves_santo"),
        (ea - d(2), "viernes_santo"),
        (_dt.date(year, 5, 1), "dia_del_trabajo"),
        (_dt.date(year, 7, 20), "dia_de_la_independencia"),
        (_dt.date(year, 8, 7), "batalla_de_boyaca"),
        (_dt.date(year, 12, 8), "inmaculada_concepcion"),
        (_dt.date(year, 12, 25), "navidad"),
    ]
    movable = [
        (_dt.date(year, 1, 6), "dia_de_los_reyes_magos"),
        (_dt.date(year, 3, 19), "dia_de_san_jose"),
        (_dt.date(year, 6, 29), "san_pedro_y_san_pablo"),
        (_dt.date(year, 8, 15), "asuncion_de_la_virgen"),
        (_dt.date(year, 10, 12), "dia_de_la_raza"),
        (_dt.date(year, 11, 1), "dia_de_todos_los_santos"),
        (_dt.date(year, 11, 11), "independencia_de_cartagena"),
    ]
    if year >= 1984:
        e.extend((_next_monday(dt_), nm) for dt_, nm in movable)
        e.append((ea + d(43), "ascension_del_senor"))
        e.append((ea + d(64), "corpus_christi"))
        e.append((ea + d(71), "sagrado_corazon"))
    else:
        e.extend(movable)
        e.append((ea + d(39), "ascension_del_senor"))
        e.append((ea + d(60), "corpus_christi"))
        e.append((ea + d(68), "sagrado_corazon"))
    return e


def _pe(year: int) -> list:
    """Peru: the long-stable statutory set (fixed + computus). The
    2020s additions (Batalla de Arica Jun 7, Dia de la Fuerza Aerea
    Jul 23, Batalla de Junin Aug 6, Batalla de Ayacucho Dec 9) are
    omitted pending their exact effective years — documented
    approximation, the PH-Eids treatment."""
    ea = _easter(year)
    d = _dt.timedelta
    return [
        (_dt.date(year, 1, 1), "ano_nuevo"),
        (ea - d(3), "jueves_santo"),
        (ea - d(2), "viernes_santo"),
        (_dt.date(year, 5, 1), "dia_del_trabajo"),
        (_dt.date(year, 6, 29), "san_pedro_y_san_pablo"),
        (_dt.date(year, 7, 28), "fiestas_patrias"),
        (_dt.date(year, 7, 29), "fiestas_patrias_day_2"),
        (_dt.date(year, 8, 30), "santa_rosa_de_lima"),
        (_dt.date(year, 10, 8), "combate_de_angamos"),
        (_dt.date(year, 11, 1), "dia_de_todos_los_santos"),
        (_dt.date(year, 12, 8), "inmaculada_concepcion"),
        (_dt.date(year, 12, 25), "navidad"),
    ]


_COUNTRIES.update({"TH": _th, "MY": _my, "SG": _sg, "CO": _co, "PE": _pe})
