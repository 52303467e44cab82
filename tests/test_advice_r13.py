"""Regression tests for the round-12 advisor findings (ADVICE.md r12).

1. medium — apply_post_aggregations silently REPLACED a same-named
   column; the reference's Queries.prepareAggregations
   (processing/.../query/Queries.java:113,130 — used by the
   groupBy/topN/timeseries constructors) throws
   "[name] already defined" on any output-name collision. The cited
   GroupByQueryRunnerTest.testGroupByWithUniquesAndPostAggWithSameName
   is @Test(expected = IllegalArgumentException.class). Post-aggs now
   plain-append and collisions raise; _verify_groupby_output_names
   also checks post-agg names at build time.
2. low — the supervisor's ISO-8601 period regex (PT?) made the time
   designator optional for every unit, so 'P1M' (one MONTH) parsed as
   1 minute and invalid forms like 'PT1D' were accepted. Date vs time
   designators are now position-sensitive.
3. low — the untyped numeric-dim STRING default only fired for
   dict-form specs; the bare-string shorthand (which deserializes to
   the identical DefaultDimensionSpec) bypassed it. Bare strings now
   normalize to {"type": "default", ...}.
4. low — filtered dimension-spec decorations dropped scalar NULLs
   under a deny-list: pred(NULL) fell through SQL-null to the empty
   array. The deny-list predicate is !values.contains(input)
   (ListFilteredDimensionSpec.java:148), so un-listed nulls survive;
   allow-list/regex/prefix still drop them.
5. low — supervisor timestampSpec 'auto' only cast('timestamp'), so
   epoch-millis NUMBERS were read as SECONDS (~1000x in the future).
   Numeric source columns now go through timestamp_millis.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.operators.dimensions import compile_dimension_spec
from apache_druid_spark.operators.postaggs import apply_post_aggregations
from apache_druid_spark.plans.compiler import compile_query
from apache_druid_spark.streaming.supervisor import (
    _iso_period_to_interval, supervisor_ingest)


@pytest.fixture()
def reg(spark):
    r = DatasourceRegistry(spark)
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", 10, 1.5),
         ("2024-01-01 01:00:00", "b", 20, 2.5),
         ("2024-01-02 00:00:00", None, 30, 3.5)],
        "ts string, tag string, qty long, price double",
    ).select(F.col("ts").cast("timestamp").alias("__time"),
             "tag", "qty", "price")
    r.register("advr13", df)
    return r


# -- 1: post-agg name collisions raise "[name] already defined" ------------

def test_postagg_same_name_as_agg_raises(spark, reg):
    q = {"queryType": "groupBy", "dataSource": "advr13",
         "granularity": "all",
         "intervals": ["2024-01-01/2024-02-01"],
         "dimensions": [],
         "aggregations": [{"type": "longSum", "name": "qty",
                           "fieldName": "qty"}],
         "postAggregations": [{"type": "fieldAccess", "name": "qty",
                               "fieldName": "qty"}]}
    with pytest.raises(ValueError, match=r"\[qty\] already defined"):
        compile_query(q, reg)


def test_postagg_same_name_as_dimension_raises(spark, reg):
    q = {"queryType": "groupBy", "dataSource": "advr13",
         "granularity": "all",
         "intervals": ["2024-01-01/2024-02-01"],
         "dimensions": ["tag"],
         "aggregations": [{"type": "count", "name": "rows"}],
         "postAggregations": [{"type": "constant", "name": "tag",
                               "value": 1}]}
    with pytest.raises(ValueError, match=r"\[tag\] already defined"):
        compile_query(q, reg)


def test_postagg_duplicate_postagg_names_raise(spark, reg):
    q = {"queryType": "groupBy", "dataSource": "advr13",
         "granularity": "all",
         "intervals": ["2024-01-01/2024-02-01"],
         "dimensions": [],
         "aggregations": [{"type": "count", "name": "rows"}],
         "postAggregations": [
             {"type": "constant", "name": "c", "value": 1},
             {"type": "constant", "name": "c", "value": 2}]}
    with pytest.raises(ValueError, match=r"\[c\] already defined"):
        compile_query(q, reg)


def test_postagg_collision_raises_on_timeseries_and_topn(spark, reg):
    # prepareAggregations guards ALL three ctors, not just groupBy
    base = {"dataSource": "advr13", "granularity": "all",
            "intervals": ["2024-01-01/2024-02-01"],
            "aggregations": [{"type": "longSum", "name": "qty",
                              "fieldName": "qty"}],
            "postAggregations": [{"type": "fieldAccess", "name": "qty",
                                  "fieldName": "qty"}]}
    ts = dict(base, queryType="timeseries")
    with pytest.raises(ValueError, match="already defined"):
        compile_query(ts, reg).collect()
    tn = dict(base, queryType="topN", dimension="tag",
              metric="qty", threshold=2)
    with pytest.raises(ValueError, match="already defined"):
        compile_query(tn, reg).collect()


def test_postagg_plain_append_still_works(spark, reg):
    df = reg.table("advr13").groupBy().agg(
        F.sum("qty").alias("total"))
    out = apply_post_aggregations(
        df, [{"type": "arithmetic", "name": "half", "fn": "/",
              "fields": [{"type": "fieldAccess", "fieldName": "total"},
                         {"type": "constant", "value": 2}]}])
    row = out.first()
    assert row["total"] == 60 and float(row["half"]) == 30.0


# -- 2: ISO-8601 period date vs time designators ----------------------------

def test_iso_period_month_vs_minute():
    assert _iso_period_to_interval("P1M") == "1 months"
    assert _iso_period_to_interval("PT1M") == "1 minutes"


def test_iso_period_date_and_time_units():
    assert _iso_period_to_interval("P2D") == "2 days"
    assert _iso_period_to_interval("P3W") == "3 weeks"
    assert _iso_period_to_interval("P1Y") == "1 years"
    assert _iso_period_to_interval("PT6H") == "6 hours"
    assert _iso_period_to_interval("PT30S") == "30 seconds"


def test_iso_period_invalid_forms_fall_back():
    # time-part D / date-part H are invalid ISO-8601 — None lets the
    # caller's default watermark apply instead of a silent misparse
    assert _iso_period_to_interval("PT1D") is None
    assert _iso_period_to_interval("P1H") is None
    assert _iso_period_to_interval("garbage") is None
    assert _iso_period_to_interval("") is None


# -- 3: bare-string dimension spec gets the STRING default ------------------

def test_bare_string_numeric_dim_renders_string(spark, reg):
    df = reg.table("advr13")
    name_bare, col_bare = compile_dimension_spec("qty", reg, df)
    name_dict, col_dict = compile_dimension_spec(
        {"type": "default", "dimension": "qty"}, reg, df)
    assert name_bare == name_dict == "qty"
    vals_bare = [r[0] for r in
                 df.select(col_bare.alias("d")).orderBy("d").collect()]
    vals_dict = [r[0] for r in
                 df.select(col_dict.alias("d")).orderBy("d").collect()]
    assert vals_bare == vals_dict == ["10", "20", "30"]
    assert all(isinstance(v, str) for v in vals_bare)


def test_bare_string_dim_in_groupby_matches_dict_form(spark, reg):
    base = {"queryType": "groupBy", "dataSource": "advr13",
            "granularity": "all",
            "intervals": ["2024-01-01/2024-02-01"],
            "aggregations": [{"type": "count", "name": "rows"}]}
    bare = compile_query(dict(base, dimensions=["qty"]), reg)
    dform = compile_query(dict(base, dimensions=[
        {"type": "default", "dimension": "qty"}]), reg)
    assert bare.schema["qty"].dataType == dform.schema["qty"].dataType
    assert (sorted(map(tuple, bare.select("qty", "rows").collect())) ==
            sorted(map(tuple, dform.select("qty", "rows").collect())))


# -- 4: deny-list decorations keep un-listed nulls ---------------------------

def test_listfiltered_blacklist_keeps_null(spark, reg):
    df = reg.table("advr13")
    _, col = compile_dimension_spec(
        {"type": "listFiltered", "delegate": "tag",
         "values": ["b"], "isWhitelist": False}, reg, df)
    # scalar decoration yields a value SET per row: null survives the
    # deny-list (it's not listed), 'b' is emptied out
    rows = {r["tag"]: r["vals"] for r in
            df.select("tag", col.alias("vals")).collect()}
    assert rows["a"] == ["a"]
    assert rows["b"] == []
    assert rows[None] == [None]       # was [] (row dropped)


def test_listfiltered_whitelist_still_drops_null(spark, reg):
    df = reg.table("advr13")
    _, col = compile_dimension_spec(
        {"type": "listFiltered", "delegate": "tag",
         "values": ["a"], "isWhitelist": True}, reg, df)
    rows = {r["tag"]: r["vals"] for r in
            df.select("tag", col.alias("vals")).collect()}
    assert rows["a"] == ["a"] and rows["b"] == [] and rows[None] == []


def test_regex_prefix_filtered_drop_null(spark, reg):
    df = reg.table("advr13")
    for spec in ({"type": "regexFiltered", "delegate": "tag",
                  "pattern": ".*"},
                 {"type": "prefixFiltered", "delegate": "tag",
                  "prefix": ""}):
        _, col = compile_dimension_spec(spec, reg, df)
        rows = {r["tag"]: r["vals"] for r in
                df.select("tag", col.alias("vals")).collect()}
        assert rows[None] == []       # null never matches (ref :70,:74)
        assert rows["a"] == ["a"]


# -- 5: timestampSpec 'auto' detects epoch-millis numbers --------------------

def _mk_spec(fmt):
    return {"type": "kafka", "spec": {
        "ioConfig": {"topic": "t",
                     "consumerProperties": {"bootstrap.servers": "x"}},
        "dataSchema": {
            "dataSource": "s",
            "timestampSpec": {"column": "ts", "format": fmt},
            "dimensionsSpec": {"dimensions": ["tag"]},
            "granularitySpec": {"queryGranularity": "none"},
        }}}


def test_supervisor_auto_numeric_is_millis(spark):
    millis = 1704067200000            # 2024-01-01T00:00:00Z
    src = spark.createDataFrame([(millis, "a")], "ts long, tag string")
    out = supervisor_ingest(spark, _mk_spec("auto"), source_df=src)
    got = out.select("__time").first()[0]
    assert got.year == 2024           # was ~55973 via the seconds cast


def test_supervisor_auto_string_still_iso(spark):
    src = spark.createDataFrame(
        [("2024-01-01T00:00:00", "a")], "ts string, tag string")
    out = supervisor_ingest(spark, _mk_spec("auto"), source_df=src)
    got = out.select("__time").first()[0]
    assert got == dt.datetime(2024, 1, 1, 0, 0)
