"""Druid granularities -> Catalyst time-bucketing expressions.

Reference: core/src/main/java/org/apache/druid/java/util/common/granularity/
GranularityType.java:34-84 (SECOND..YEAR, ALL, NONE),
PeriodGranularity.java (ISO-8601 period + timeZone + origin),
DurationGranularity.java (fixed millis + origin).

Everything here composes built-in expressions (date_trunc, pmod on
unix millis, month arithmetic) — no UDFs, so bucketing stays inside
whole-stage codegen and, when the bucket feeds a groupBy, the shuffle
key is a plain long/timestamp column.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Simple named granularities -> date_trunc unit (Spark and DuckDB agree
# on week-starts-Monday for 'week').
_TRUNC_UNITS = {
    "second": "second",
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
    "quarter": "quarter",
    "year": "year",
}

# Named granularities that are fixed millisecond multiples.
_FIXED_MILLIS = {
    "five_minute": 5 * 60_000,
    "ten_minute": 10 * 60_000,
    "fifteen_minute": 15 * 60_000,
    "thirty_minute": 30 * 60_000,
    "six_hour": 6 * 3_600_000,
    "eight_hour": 8 * 3_600_000,
}

_PERIOD_RE = re.compile(
    r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def parse_period(period: str, allow_mixed: bool = False) -> tuple[int, int]:
    """ISO-8601 period -> (months, millis). Mixed month+millis periods
    (e.g. P1M2D) are accepted only with ``allow_mixed`` (the
    granularity floor/shift paths implement the reference's compound
    stepping); other callers keep the uniform-bucket restriction."""
    m = _PERIOD_RE.match(period.strip().upper())
    if not m:
        raise ValueError(f"bad ISO-8601 period: {period!r}")
    y, mo, w, d, h, mi, s = m.groups()
    months = int(y or 0) * 12 + int(mo or 0)
    millis = (
        int(w or 0) * 7 * 86_400_000
        + int(d or 0) * 86_400_000
        + int(h or 0) * 3_600_000
        + int(mi or 0) * 60_000
        + int(float(s or 0) * 1000)
    )
    if months and millis and not allow_mixed:
        raise ValueError(f"mixed month/time period unsupported: {period!r}")
    if not months and not millis:
        raise ValueError(f"zero-length period: {period!r}")
    return months, millis


def _period_field_count(period: str) -> int:
    """Number of non-zero fields in the period (PeriodGranularity
    isCompoundPeriod: >1 field changes the truncation algorithm)."""
    m = _PERIOD_RE.match(period.strip().upper())
    return sum(1 for g in (m.groups() if m else ()) if g and float(g))


def _period_has_day_or_week(period: str) -> bool:
    """True when the ISO period has a non-zero weeks or days field —
    the Joda fields that turn imprecise under a DST chronology."""
    m = _PERIOD_RE.match(period.strip().upper())
    if not m:
        return False
    weeks, days = m.group(3), m.group(4)
    return bool((weeks and int(weeks)) or (days and int(days)))


def _tz_is_fixed(tz: str) -> bool:
    """True when the zone has a constant UTC offset (no DST) — sampled
    at winter/summer instants across five decades, which is how far
    the engine's own test pins reach."""
    if not tz or tz.upper() in ("UTC", "ETC/UTC", "Z"):
        return True
    try:
        from datetime import datetime, timezone as _pytz
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        offs = {
            datetime(y, mo, 1, tzinfo=_pytz.utc).astimezone(z).utcoffset()
            for y in (1975, 2000, 2020, 2035) for mo in (1, 7)
        }
        return len(offs) == 1
    except Exception:  # noqa: BLE001 — unknown zone: assume DST-capable
        return False


def granularity_to_duration(gran) -> str:
    """Granularity -> Structured Streaming window duration string
    (for ``F.window(col, dur)`` tumbling windows in streaming rollup)."""
    if isinstance(gran, dict):
        if gran.get("type") == "duration":
            return f"{int(gran['duration'])} milliseconds"
        months, millis = parse_period(gran.get("period", "P1D"))
        if months:
            raise ValueError("month-based periods unsupported in streaming windows")
        return f"{millis} milliseconds"
    g = str(gran).lower()
    if g in _TRUNC_UNITS:
        return f"1 {g}"
    if g in _FIXED_MILLIS:
        return f"{_FIXED_MILLIS[g]} milliseconds"
    raise ValueError(f"unsupported streaming granularity: {gran!r}")


def _floor_millis(col: Column, dur_ms: int, origin_ms: int = 0) -> Column:
    """Floor a timestamp column to fixed millisecond buckets using pmod
    (integer-exact, codegen-friendly; no floating point)."""
    t = F.unix_millis(col)
    off = t - F.lit(origin_ms)
    return F.timestamp_millis(t - F.pmod(off, F.lit(dur_ms)))


def _tz_offset_ms(tz: str | None, instant_ms: int) -> int:
    """UTC offset of ``tz`` at an instant, in millis (0 for UTC/None).
    Accepts zone ids and fixed '+HH:MM' offsets."""
    if not tz or tz.upper() in ("UTC", "ETC/UTC", "Z"):
        return 0
    m = re.match(r"^([+-])(\d{2}):?(\d{2})$", tz.strip())
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return sign * (int(m.group(2)) * 3600 + int(m.group(3)) * 60) * 1000
    from datetime import datetime, timezone as _pytz
    from zoneinfo import ZoneInfo

    d = datetime.fromtimestamp(instant_ms / 1000, tz=_pytz.utc)
    off = d.astimezone(ZoneInfo(tz)).utcoffset()
    return int(off.total_seconds() * 1000)


def _compound_boundaries(origin_wall_ms: int, months: int,
                         millis: int) -> list[int]:
    """PeriodGranularity.truncateCompoundPeriod walks the period
    iteratively from the origin — chronology.add applies the month
    field THEN the fixed field each step, so day-of-month drifts and
    clamps as the walk proceeds (NOT equal to add_months(o, k*m) +
    k*millis). The boundary series is data-independent; precompute it
    over [1900, 2200] (wall frame) and floor via lookup."""
    import calendar
    from datetime import datetime, timedelta, timezone as _pytz

    def to_dt(ms):
        return datetime.fromtimestamp(ms / 1000, tz=_pytz.utc) \
            .replace(tzinfo=None)

    def to_ms(d):
        return int(d.replace(tzinfo=_pytz.utc).timestamp() * 1000)

    def add_months_clamp(d, n):
        mo = d.month - 1 + n
        y, m = d.year + mo // 12, mo % 12 + 1
        return d.replace(year=y, month=m,
                         day=min(d.day, calendar.monthrange(y, m)[1]))

    def step(d, sign):
        d = add_months_clamp(d, sign * months)
        return d + timedelta(milliseconds=sign * millis)

    lo, hi = datetime(1900, 1, 1), datetime(2200, 1, 1)
    out = []
    cur = to_dt(origin_wall_ms)
    while cur < hi:
        if cur >= lo:
            out.append(to_ms(cur))
        cur = step(cur, 1)
    cur = to_dt(origin_wall_ms)
    while True:
        cur = step(cur, -1)
        if cur < lo:
            break
        if cur < hi:
            out.append(to_ms(cur))
    out.sort()
    return out


def _floor_compound_walk(col: Column, months: int, millis: int,
                         origin_wall_ms: int) -> Column:
    bounds = _compound_boundaries(origin_wall_ms, months, millis)
    arr = F.lit(bounds)
    t = F.unix_millis(col)
    return F.timestamp_millis(
        F.array_max(F.filter(arr, lambda x: x <= t)))


def _floor_period_from_origin(col: Column, months: int, millis: int,
                              origin_wall_ms: int) -> Column:
    """Origin-anchored floor for periods with a month component
    (PeriodGranularity truncateCompoundPeriod / the months-with-origin
    field path): boundaries are origin + k*(months, millis); estimate k
    from calendar month distance, generate a +/-3 candidate window, and
    take the greatest boundary <= t. ``col`` and the origin are in the
    WALL frame (the caller shifts by timezone)."""
    o_day = origin_wall_ms - (origin_wall_ms % 86_400_000)
    o_tod = origin_wall_ms - o_day
    origin_ts = F.timestamp_millis(F.lit(origin_wall_ms))
    # average Gregorian month = 30.436875 days
    step_months = months + millis / 2_629_746_000.0
    k0 = F.floor(
        F.months_between(col, origin_ts) / F.lit(step_months)).cast("long")

    def cand(k: Column) -> Column:
        base = F.add_months(
            F.timestamp_millis(F.lit(o_day)), k * F.lit(months))
        return (F.unix_millis(base.cast("timestamp"))
                + F.lit(o_tod) + k * F.lit(millis))

    t = F.unix_millis(col)
    cands = F.array(*[cand(k0 + F.lit(i)) for i in range(-3, 4)])
    return F.timestamp_millis(
        F.array_max(F.filter(cands, lambda x: x <= t)))


def _floor_months(col: Column, n_months: int, origin_months: int = 0) -> Column:
    m = (F.year(col) * F.lit(12) + F.month(col) - F.lit(1)) - F.lit(origin_months)
    fm = (m - F.pmod(m, F.lit(n_months))) + F.lit(origin_months)
    return F.make_timestamp(
        F.floor(fm / 12).cast("int"),
        (F.pmod(fm, F.lit(12)) + F.lit(1)).cast("int"),
        F.lit(1), F.lit(0), F.lit(0), F.lit(0),
    )


def time_floor_col(col: Column, gran, timezone: str | None = None) -> Column:
    """The engine's TIME_FLOOR: bucket a TimestampType column by a Druid
    granularity (named, {"type":"duration"...}, or {"type":"period"...}).

    timeZone support: arithmetic runs on the wall-clock-shifted
    timestamp and shifts back (DST transitions inside a bucket follow
    the fixed-offset approximation; documented divergence).
    """
    origin_ms = 0
    period_tz = None
    if isinstance(gran, dict):
        period_tz = gran.get("timeZone")
        if gran.get("origin") is not None:
            origin_ms = _iso_to_millis(gran["origin"])
        if gran.get("type") == "duration":
            return _with_tz(
                col, period_tz or timezone,
                lambda c: _floor_millis(c, int(gran["duration"]), origin_ms),
            )
        period = gran.get("period", "P1D")
    else:
        g = str(gran).lower()
        if g in ("all",):
            return F.lit(None).cast("timestamp")
        if g in ("none",):
            return col
        if g in _TRUNC_UNITS:
            return _with_tz(
                col, timezone, lambda c: F.date_trunc(_TRUNC_UNITS[g], c)
            )
        if g in _FIXED_MILLIS:
            return _with_tz(
                col, timezone, lambda c: _floor_millis(c, _FIXED_MILLIS[g])
            )
        # allow bare ISO periods like "PT1H"
        period = gran if g.startswith("p") else None
        if period is None:
            raise ValueError(f"unsupported granularity: {gran!r}")

    months, millis = parse_period(period, allow_mixed=True)
    tz = period_tz or timezone
    has_origin = isinstance(gran, dict) and gran.get("origin") is not None
    # the origin instant expressed on the local wall clock — the
    # reference anchors via chronology field arithmetic, which works in
    # the zone's wall frame (QueryGranularityTest testPeriodTruncateDays)
    origin_wall = origin_ms + _tz_offset_ms(tz, origin_ms)
    # P1W with no origin floors to MONDAY (PeriodGranularity.java:295-299
    # — dayOfWeek roundFloor + set to 1); PnW n>1 aligns on multiples
    # from the epoch origin like every other millis period
    week_one = (period.strip().upper() == "P1W" and not has_origin)

    if not months and _period_field_count(period) >= 2:
        # compound fixed-length period (PT12H5M): the reference's
        # truncateMillisPeriod is plain modular arithmetic on UTC
        # instants — no wall-clock shift
        # (QueryGranularityTest.testCompoundPeriodMillisTruncate).
        # EXCEPTION (ADVICE r8): when the period carries a DAYS/WEEKS
        # component and the zone has DST, Joda's days field is
        # imprecise — truncateMillisPeriod throws and the reference
        # falls back to the zone-aware truncateCompoundPeriod walk
        # (day adds are wall-clock 23/25h). Floor in the WALL frame
        # there; divergence is confined to instants inside the
        # sub-day remainder straddling a transition step.
        if (_period_has_day_or_week(period) and tz
                and not _tz_is_fixed(tz)):
            return _with_tz(
                col, tz,
                lambda c: _floor_millis(
                    c, millis, origin_wall if has_origin else 0))
        return _floor_millis(col, millis, origin_ms)

    def _f(c: Column) -> Column:
        if months and millis:
            # compound month periods (P1M2D) replay the reference's
            # iterative walk from the origin (interleaved month/day
            # adds — QueryGranularityTest.testCompoundPeriodTruncate)
            return _floor_compound_walk(
                c, months, millis, origin_wall if has_origin else 0)
        if months and has_origin:
            # month periods with an origin step calendar-exactly from
            # the anchor (months-difference field path)
            return _floor_period_from_origin(
                c, months, millis, origin_wall)
        if months == 1:
            return F.date_trunc("month", c)
        if months == 12:
            return F.date_trunc("year", c)
        if months:
            return _floor_months(c, months)
        if week_one:
            return F.date_trunc("week", c)
        return _floor_millis(c, millis,
                             origin_wall if has_origin else origin_ms)

    return _with_tz(col, tz, _f)


def time_ceil_col(col: Column, gran, timezone: str | None = None) -> Column:
    """TIME_CEIL: smallest bucket boundary >= col."""
    floored = time_floor_col(col, gran, timezone)
    nxt = time_shift_col(floored, gran, 1, timezone)
    return F.when(floored == col, col).otherwise(nxt)


def time_shift_col(
    col: Column, gran, step: int, timezone: str | None = None
) -> Column:
    """TIME_SHIFT: move a timestamp by step * period."""
    if isinstance(gran, dict):
        period = gran.get("period", "P1D")
        if gran.get("type") == "duration":
            return F.timestamp_millis(
                F.unix_millis(col) + F.lit(int(gran["duration"]) * step)
            )
    else:
        g = str(gran).lower()
        if g in _TRUNC_UNITS:
            period = {"second": "PT1S", "minute": "PT1M", "hour": "PT1H",
                      "day": "P1D", "week": "P1W", "month": "P1M",
                      "quarter": "P3M", "year": "P1Y"}[g]
        elif g in _FIXED_MILLIS:
            return F.timestamp_millis(
                F.unix_millis(col) + F.lit(_FIXED_MILLIS[g] * step)
            )
        else:
            period = gran
    months, millis = parse_period(period, allow_mixed=True)
    if months:
        # add_months returns DATE; re-attach the time-of-day so P1M
        # shifts preserve sub-day precision (Druid chronology.add);
        # compound periods (P1M2D) add the fixed part on top
        day = F.date_trunc("day", col)
        tod = F.unix_millis(col) - F.unix_millis(day)
        base = F.add_months(day, months * step).cast("timestamp")
        return F.timestamp_millis(
            F.unix_millis(base) + tod + F.lit(millis * step))
    return F.timestamp_millis(F.unix_millis(col) + F.lit(millis * step))


def _with_tz(col: Column, tz: str | None, f) -> Column:
    if not tz or tz.upper() in ("UTC", "ETC/UTC", "Z"):
        return f(col)
    local = F.from_utc_timestamp(col, tz)
    return F.to_utc_timestamp(f(local), tz)


def _iso_to_millis(iso: str) -> int:
    from datetime import datetime, timezone as _tz

    s = iso.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_tz.utc)
    return int(dt.timestamp() * 1000)
