"""Golden tests ported from the reference's native-engine suite
ScanQueryRunnerTest.java (processing/src/test/java/org/apache/druid/
query/scan/, 16 methods) over the TestIndex fixture. The reference
computes expected events from the raw TSV (toFullEvents), so these
pins assert the same derived facts: row counts, column projection,
filter + limit, and time-ordering direction.

Skipped: the list-vs-compactedList resultFormat twins (the engine's
scan returns one DataFrame; serialization formats are covered by the
/druid/v2 result-format suite), lookup-extraction filter form
(SQL-layer pinned), and the timeout contract trio (query-runtime
resource limits without a Spark analogue)."""

from __future__ import annotations

from datetime import datetime

from apache_druid_spark.plans.compiler import compile_query

from testindex_fixture import testindex  # noqa: F401 (fixture)

dt = datetime
FULL_ON = ["1970-01-01/2020-01-01"]


def scan(columns=None, filt=None, limit=None, order=None,
         intervals=FULL_ON):
    q = {"queryType": "scan", "dataSource": "testindex",
         "intervals": intervals}
    if columns:
        q["columns"] = columns
    if filt:
        q["filter"] = filt
    if limit is not None:
        q["limit"] = limit
    if order:
        q["order"] = order
    return q


def test_full_on_select(spark, testindex):
    # testFullOnSelect: every row comes back with every column
    df = compile_query(scan(), testindex)
    assert df.count() == 1209
    for c in ("__time", "market", "quality", "placementish", "index",
              "partial_null_column"):
        assert c in df.columns, c


def test_select_with_dims_and_mets(spark, testindex):
    # testSelectWithDimsAndMets: projection keeps only the requested
    # columns (column pruning reaches the scan)
    df = compile_query(
        scan(columns=["__time", "market", "index"]), testindex)
    assert df.columns == ["__time", "market", "index"]
    assert df.count() == 1209


def test_full_on_select_with_filter_and_limit(spark, testindex):
    # testFullOnSelectWithFilterAndLimit: spot rows only, first 3 by
    # ascending time (the fixture's first day is 2011-01-12)
    df = compile_query(
        scan(columns=["__time", "market", "quality"],
             filt={"type": "selector", "dimension": "market",
                   "value": "spot"},
             limit=3, order="ascending"), testindex)
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["market"] == "spot" for r in rows)
    assert all(r["__time"] == dt(2011, 1, 12) for r in rows)


def test_select_time_ordering_descending(spark, testindex):
    # testFullOnSelectWithFilterLimitAndDescendingTimeOrdering*: the
    # last day of data leads
    df = compile_query(
        scan(columns=["__time", "market"],
             filt={"type": "selector", "dimension": "market",
                   "value": "spot"},
             limit=3, order="descending"), testindex)
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["__time"] == dt(2011, 4, 15) for r in rows)


def test_full_select_no_results(spark, testindex):
    # testFullSelectNoResults: a contradictory filter returns nothing
    df = compile_query(
        scan(filt={"type": "and", "fields": [
            {"type": "selector", "dimension": "market",
             "value": "spot"},
            {"type": "selector", "dimension": "market",
             "value": "foo"}]}), testindex)
    assert df.count() == 0


def test_select_with_filter_lookup_extraction_fn(spark, testindex):
    # testSelectWithFilterLookupExtractionFn: selector 'replaced'
    # through lookup(total_market -> replaced); quality/index columns
    df = compile_query(scan(
        columns=["quality", "index"],
        intervals=["2011-01-12/2011-01-14"],
        filt={"type": "selector", "dimension": "market",
              "value": "replaced",
              "extractionFn": {"type": "lookup",
                               "retainMissingValue": False,
                               "lookup": {"type": "map", "map": {
                                   "total_market": "replaced"}}}}),
        testindex)
    got = sorted((r["quality"], round(float(r["index"]), 6))
                 for r in df.collect())
    assert got == [("mezzanine", 1000.0), ("mezzanine", 1040.945505),
                   ("premium", 1000.0), ("premium", 1689.012875)]


def test_full_select_no_dimension_and_metric(spark, testindex):
    # testFullSelectNoDimensionAndMetric: nonexistent projection
    # columns come back as all-null STRING columns, one per row
    df = compile_query(scan(columns=["foo", "foo2"],
                            intervals=["2011-01-12/2011-01-14"]),
                       testindex)
    assert df.columns == ["foo", "foo2"]
    rows = df.collect()
    assert len(rows) == 26
    assert all(r["foo"] is None and r["foo2"] is None for r in rows)
