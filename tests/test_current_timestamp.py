"""Frozen CURRENT_TIMESTAMP (sqlCurrentTimestamp) + session-timezone
planning (VERDICT r8 task #4).

The reference's BaseCalciteQueryTest pins the planner clock at
2000-01-01T00:00:00Z via the ``sqlCurrentTimestamp`` context
(sql/.../planner/PlannerContext.java reads it for CURRENT_TIMESTAMP /
CURRENT_DATE), and the `bview` fixture bakes CURRENT_TIMESTAMP into a
view body that must re-plan under each query's context
(BaseCalciteQueryTest.java:1033-1038).

Ports (CalciteQueryTest.java):
- testFilterOnCurrentTimestampWithIntervalArithmetic (:7928)
- testFilterOnCurrentTimestampLosAngeles (:7953)
- testFilterOnCurrentTimestampOnView (:7977)
- testFilterOnCurrentTimestampLosAngelesOnView (:7997)
- testTimeseriesLosAngelesViaQueryContext (:8755)
- testTimeseriesLosAngelesViaPlannerConfig (:8786) — planner-config tz
  maps to the same sqlTimeZone context knob here; exercises TIME_PARSE
  defaulting its origin zone to the session timezone
- testTimeseriesLosAngelesUsingTimeFloorConnectionLosAngeles (:9007)
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

FOO_SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.ArrayType(T.StringType())),
    T.StructField("cnt", T.LongType()),
    T.StructField("m1", T.FloatType()),
])

FOO_ROWS = [
    (datetime(2000, 1, 1), "", ["a"], 1, 1.0),
    (datetime(2000, 1, 2), "10.1", [], 1, 2.0),
    (datetime(2000, 1, 3), "2", [""], 1, 3.0),
    (datetime(2001, 1, 1), "1", ["a"], 1, 4.0),
    (datetime(2001, 1, 2), "def", ["abc"], 1, 5.0),
    (datetime(2001, 1, 3), "abc", None, 1, 6.0),
]

FROZEN = {"sqlCurrentTimestamp": "2000-01-01T00:00:00Z"}
LA = {"sqlCurrentTimestamp": "2000-01-01T00:00:00Z",
      "sqlTimeZone": "America/Los_Angeles"}


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
    r.register_view("bview", """
        SELECT COUNT(*) AS a0 FROM druid.foo
        WHERE __time >= CURRENT_TIMESTAMP + INTERVAL '1' DAY
          AND __time < TIMESTAMP '2002-01-01 00:00:00'
    """)
    return r


def test_filter_on_current_timestamp_interval_arithmetic(spark, reg):
    # frozen clock + HOUR TO MINUTE / DAY TO HOUR / YEAR TO MONTH
    # interval literals -> interval [2000-01-01T01:02, 2002-01-01)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS a0 FROM druid.foo
        WHERE
          __time >= CURRENT_TIMESTAMP + INTERVAL '01:02' HOUR TO MINUTE
          AND __time < TIMESTAMP '2003-02-02 01:00:00'
              - INTERVAL '1 1' DAY TO HOUR - INTERVAL '1-1' YEAR TO MONTH
    """, reg, context=FROZEN).collect()
    assert out[0]["a0"] == 5


def test_filter_on_current_timestamp_los_angeles(spark, reg):
    # CURRENT_TIMESTAMP renders as LA wall clock 1999-12-31T16:00;
    # +1 day = 2000-01-02T00Z; the literal reads as LA local
    # (2002-01-01T08Z) -> still the same 5 rows
    out = druid_sql(spark, """
        SELECT COUNT(*) AS a0 FROM druid.foo
        WHERE __time >= CURRENT_TIMESTAMP + INTERVAL '1' DAY
          AND __time < TIMESTAMP '2002-01-01 00:00:00'
    """, reg, context=LA).collect()
    assert out[0]["a0"] == 5


def test_filter_on_current_timestamp_on_view(spark, reg):
    out = druid_sql(spark, "SELECT * FROM view.bview", reg,
                    context=FROZEN).collect()
    assert [tuple(r) for r in out] == [(5,)]


def test_filter_on_current_timestamp_los_angeles_on_view(spark, reg):
    # the query's context re-plans the view body (the reference pins
    # the same count here, over the shifted interval)
    out = druid_sql(spark, "SELECT * FROM view.bview", reg,
                    context=LA).collect()
    assert [tuple(r) for r in out] == [(5,)]


LA_MONTHS = [
    (1, datetime(1999, 12, 1, 8)),
    (2, datetime(2000, 1, 1, 8)),
    (1, datetime(2000, 12, 1, 8)),
    (2, datetime(2001, 1, 1, 8)),
]


def test_timeseries_los_angeles_via_query_context(spark, reg):
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT FLOOR(__time TO MONTH) AS gran, cnt FROM druid.foo
        ) AS x
        GROUP BY gran ORDER BY gran
    """, reg, context={"sqlTimeZone": "America/Los_Angeles"}).collect()
    assert [(r["s"], r["gran"]) for r in out] == LA_MONTHS


def test_timeseries_los_angeles_via_planner_config(spark, reg):
    # TIME_PARSE of offset-less wall clock parses in the session zone
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT FLOOR(__time TO MONTH) AS gran, cnt FROM druid.foo
          WHERE __time >= TIME_PARSE('1999-12-01 00:00:00')
            AND __time < TIME_PARSE('2002-01-01 00:00:00')
        ) AS x
        GROUP BY gran ORDER BY gran
    """, reg, context={"sqlTimeZone": "America/Los_Angeles"}).collect()
    assert [(r["s"], r["gran"]) for r in out] == LA_MONTHS


def test_timeseries_los_angeles_time_floor_connection_tz(spark, reg):
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M') AS gran, cnt FROM druid.foo
        ) AS x
        GROUP BY gran ORDER BY gran
    """, reg, context={"sqlTimeZone": "America/Los_Angeles"}).collect()
    assert [(r["s"], r["gran"]) for r in out] == LA_MONTHS
