"""Native query type compiler tests (SURVEY.md §2.3) — patterned on the
reference's per-type QueryRunnerTests (processing/src/test/java/org/
apache/druid/query/{timeseries,topn,groupby,scan}/...)."""

from apache_druid_spark import compile_query


def test_timeseries_day(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "day",
         "intervals": ["2000-01-01T00:00:00Z/2002-01-01T00:00:00Z"],
         "aggregations": [{"type": "longSum", "name": "cnt", "fieldName": "cnt"},
                          {"type": "doubleSum", "name": "m1s", "fieldName": "m1"}]}
    rows = compile_query(q, registry).collect()
    assert len(rows) == 6
    assert rows[0]["cnt"] == 1 and rows[0]["m1s"] == 1.0


def test_timeseries_year(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "year",
         "aggregations": [{"type": "doubleSum", "name": "m1s", "fieldName": "m1"}]}
    rows = compile_query(q, registry).collect()
    assert [r["m1s"] for r in rows] == [6.0, 15.0]


def test_timeseries_all_granularity(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    assert len(rows) == 1 and rows[0]["rows"] == 6


def test_timeseries_descending(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "year",
         "descending": True,
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    assert rows[0]["__time"].year == 2001


def test_topn_exact(foo, registry):
    q = {"queryType": "topN", "dataSource": "foo", "dimension": "dim1",
         "metric": "m1s", "threshold": 2, "granularity": "all",
         "aggregations": [{"type": "doubleSum", "name": "m1s", "fieldName": "m1"}]}
    rows = compile_query(q, registry).collect()
    assert [r["dim1"] for r in rows] == ["abc", "def"]


def test_topn_inverted(foo, registry):
    q = {"queryType": "topN", "dataSource": "foo", "dimension": "dim1",
         "metric": {"type": "inverted", "metric": "m1s"}, "threshold": 2,
         "granularity": "all",
         "aggregations": [{"type": "doubleSum", "name": "m1s", "fieldName": "m1"}]}
    rows = compile_query(q, registry).collect()
    assert [r["dim1"] for r in rows] == ["", "10.1"]


def test_topn_multivalue_explodes(foo, registry):
    q = {"queryType": "topN", "dataSource": "foo", "dimension": "dim3",
         "metric": "rows", "threshold": 10, "granularity": "all",
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    vals = {r["dim3"]: r["rows"] for r in rows}
    assert vals["b"] == 2  # appears in two rows' arrays
    assert None in vals    # null array and explode_outer of []


def test_groupby_basic(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim1"],
         "aggregations": [{"type": "doubleSum", "name": "m1s", "fieldName": "m1"}],
         "limitSpec": {"type": "default",
                       "columns": [{"dimension": "m1s", "direction": "descending",
                                    "dimensionOrder": "numeric"}],
                       "limit": 3}}
    rows = compile_query(q, registry).collect()
    assert [r["dim1"] for r in rows] == ["abc", "def", "1"]


def test_groupby_multivalue_explode(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim2"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    vals = {r["dim2"]: r["rows"] for r in rows}
    assert vals["a"] == 2 and vals[""] == 1 and vals["abc"] == 1


def test_groupby_having(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "year",
         "dimensions": [],
         "aggregations": [{"type": "doubleSum", "name": "m1s", "fieldName": "m1"}],
         "having": {"type": "greaterThan", "aggregation": "m1s", "value": 10}}
    rows = compile_query(q, registry).collect()
    assert len(rows) == 1 and rows[0]["m1s"] == 15.0


def test_groupby_subtotals(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": ["dim1", "dim2"],
         "subtotalsSpec": [["dim1"], []],
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    grand = [r for r in rows if r["dim1"] is None and r["dim2"] is None]
    # 6 exploded rows (each dim2 array has <=1 element; []/null -> null row)
    assert len(grand) == 1 and grand[0]["rows"] == 6


def test_groupby_virtual_column(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "virtualColumns": [{"type": "expression", "name": "m1bucket",
                             "expression": "floor(m1 / 3)"}],
         "dimensions": ["m1bucket"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    vals = {r["m1bucket"]: r["rows"] for r in rows}
    # an UNTYPED dim spec over the numeric virtual column renders
    # STRING (DefaultDimensionSpec's single-arg STRING default — the
    # r13 bare-string normalization applies it to shorthand specs
    # too; this engine's floor() yields LONG, so no '.0' suffix)
    assert vals["0"] == 2 and vals["1"] == 3 and vals["2"] == 1


def test_groupby_extraction_dimension(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "extraction", "dimension": "dim1",
                         "outputName": "d",
                         "extractionFn": {"type": "substring", "index": 0,
                                          "length": 1}}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    vals = {r["d"]: r["rows"] for r in rows}
    assert vals["1"] == 2 and vals["a"] == 1


def test_scan(foo, registry):
    q = {"queryType": "scan", "dataSource": "foo",
         "columns": ["__time", "dim1", "m1"], "order": "descending", "limit": 2}
    rows = compile_query(q, registry).collect()
    assert [r["dim1"] for r in rows] == ["abc", "def"]


def test_scan_offset(foo, registry):
    q = {"queryType": "scan", "dataSource": "foo", "columns": ["dim1"],
         "order": "ascending", "offset": 4, "limit": 10}
    rows = compile_query(q, registry).collect()
    assert [r["dim1"] for r in rows] == ["def", "abc"]


def test_search(foo, registry):
    q = {"queryType": "search", "dataSource": "foo",
         "searchDimensions": ["dim1", "dim2"],
         "query": {"type": "insensitive_contains", "value": "ab"}}
    rows = compile_query(q, registry).collect()
    got = {(r["dimension"], r["value"]): r["count"] for r in rows}
    assert got[("dim1", "abc")] == 1 and got[("dim2", "abc")] == 1


def test_time_boundary(foo, registry):
    q = {"queryType": "timeBoundary", "dataSource": "foo"}
    r = compile_query(q, registry).collect()[0]
    assert r["minTime"].year == 2000 and r["maxTime"].year == 2001


def test_datasource_metadata(foo, registry):
    q = {"queryType": "dataSourceMetadata", "dataSource": "foo"}
    r = compile_query(q, registry).collect()[0]
    assert r["maxIngestedEventTime"].year == 2001


def test_segment_metadata(foo, registry):
    q = {"queryType": "segmentMetadata", "dataSource": "foo"}
    rows = compile_query(q, registry).collect()
    by_col = {r["column"]: r for r in rows}
    assert by_col["dim1"]["cardinality"] == 6
    assert by_col["m1"]["minValue"] == "1.0"


def test_join_datasource(foo, registry):
    q = {"queryType": "groupBy",
         "dataSource": {
             "type": "join", "left": "customer",
             "right": "nation", "rightPrefix": "j0.",
             "condition": 'c_nationkey == "j0.n_nationkey"',
             "joinType": "INNER"},
         "granularity": "all", "dimensions": ["j0.n_name"],
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    assert len(rows) > 0
    assert sum(r["rows"] for r in rows) == registry.table("customer").count()


def test_union_datasource(foo, registry):
    q = {"queryType": "timeseries",
         "dataSource": {"type": "union", "dataSources": ["foo", "foo"]},
         "granularity": "all",
         "aggregations": [{"type": "count", "name": "rows"}]}
    assert compile_query(q, registry).collect()[0]["rows"] == 12


def test_inline_datasource(foo, registry):
    q = {"queryType": "scan",
         "dataSource": {"type": "inline",
                        "columnNames": ["k", "n"],
                        "columnTypes": ["STRING", "LONG"],
                        "rows": [["a", 1], ["b", 2]]},
         "columns": ["k", "n"]}
    rows = compile_query(q, registry).collect()
    assert len(rows) == 2


def test_query_datasource_nesting(foo, registry):
    q = {"queryType": "timeseries",
         "dataSource": {"type": "query", "query": {
             "queryType": "groupBy", "dataSource": "foo",
             "granularity": "all", "dimensions": ["dim1"],
             "aggregations": [{"type": "doubleSum", "name": "m1s",
                               "fieldName": "m1"}]}},
         "granularity": "all",
         "aggregations": [{"type": "doubleMax", "name": "mx",
                           "fieldName": "m1s"}]}
    assert compile_query(q, registry).collect()[0]["mx"] == 6.0


def test_first_last_aggregators(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "aggregations": [
             {"type": "stringFirst", "name": "f", "fieldName": "dim1"},
             {"type": "stringLast", "name": "l", "fieldName": "dim1"},
             {"type": "doubleFirst", "name": "df", "fieldName": "m1"},
             {"type": "doubleLast", "name": "dl", "fieldName": "m1"}]}
    r = compile_query(q, registry).collect()[0]
    assert r["f"] == "" and r["l"] == "abc" and r["df"] == 1.0 and r["dl"] == 6.0


def test_filtered_aggregator(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "aggregations": [{
             "type": "filtered",
             "name": "sum_small",
             "filter": {"type": "bound", "dimension": "m1", "upper": "3",
                        "ordering": "numeric"},
             "aggregator": {"type": "doubleSum", "name": "sum_small",
                            "fieldName": "m1"}}]}
    assert compile_query(q, registry).collect()[0]["sum_small"] == 6.0


def test_post_aggregations(foo, registry):
    q = {"queryType": "timeseries", "dataSource": "foo", "granularity": "all",
         "aggregations": [
             {"type": "doubleSum", "name": "s", "fieldName": "m1"},
             {"type": "count", "name": "n"}],
         "postAggregations": [{
             "type": "arithmetic", "name": "mean", "fn": "/",
             "fields": [{"type": "fieldAccess", "fieldName": "s"},
                        {"type": "fieldAccess", "fieldName": "n"}]}]}
    assert compile_query(q, registry).collect()[0]["mean"] == 3.5


def test_lookup_dimension(foo, registry):
    q = {"queryType": "groupBy", "dataSource": "foo", "granularity": "all",
         "dimensions": [{"type": "lookup", "dimension": "dim1",
                         "outputName": "v", "name": "lookyloo",
                         "replaceMissingValueWith": "missing"}],
         "aggregations": [{"type": "count", "name": "rows"}]}
    rows = compile_query(q, registry).collect()
    vals = {r["v"]: r["rows"] for r in rows}
    assert vals["xabc"] == 1 and vals["missing"] == 5


def test_cardinality_by_value_union_semantics(spark):
    # 'x' present in both dims counts once (CardinalityAggregatorFactory
    # byValue adds every dim's value to one collector)
    from apache_druid_spark.operators.aggregations import compile_aggregator
    df = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("z", None)], "d1 string, d2 string")
    agg = compile_aggregator(
        {"type": "cardinality", "name": "card",
         "fields": ["d1", "d2"], "byRow": False}, df)
    assert df.agg(agg).collect()[0]["card"] == 3  # {x, y, z}


def test_tdigest_momentsketch_exact_percentile(spark):
    from apache_druid_spark.operators.aggregations import compile_aggregator
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    med = compile_aggregator(
        {"type": "tDigestSketch", "name": "m", "fieldName": "v",
         "fractions": [0.5]}, df)
    p25 = compile_aggregator(
        {"type": "momentSketch", "name": "q", "fieldName": "v",
         "fractions": [0.25]}, df)
    row = df.agg(med, p25).collect()[0]
    assert row["m"] == 50.5 and row["q"] == 25.75


def test_topn_nonexistent_dimension(spark, registry):
    """TopNQueryRunnerTest.java:1856-1886 — topN on a dimension the
    table lacks yields ONE null bucket aggregating every row."""
    rows = compile_query({
        "queryType": "topN", "dataSource": "nation",
        "dimension": "does_not_exist", "metric": "cnt", "threshold": 3,
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "cnt"}],
    }, registry).collect()
    assert len(rows) == 1
    assert rows[0]["does_not_exist"] is None
    assert rows[0]["cnt"] == 25


def test_null_selector_on_nonexistent_dimension_matches_all(spark, registry):
    """TopNQueryRunnerTest.java:1923-1958 — a null-selector filter on a
    missing column matches every row; a non-null selector matches none."""
    base = {"queryType": "timeseries", "dataSource": "nation",
            "granularity": "all",
            "aggregations": [{"type": "count", "name": "cnt"}]}
    all_rows = compile_query(
        {**base, "filter": {"type": "selector",
                            "dimension": "does_not_exist",
                            "value": None}}, registry).first()
    assert all_rows["cnt"] == 25
    none_rows = compile_query(
        {**base, "filter": {"type": "selector",
                            "dimension": "does_not_exist",
                            "value": "x"}}, registry).first()
    assert none_rows["cnt"] == 0


def test_groupby_existing_and_nonexistent_dimension(spark, registry):
    """Mixed schema: groupBy over (real dim, missing dim) keeps the real
    grouping and nulls the missing one (schema-evolution reads)."""
    rows = compile_query({
        "queryType": "groupBy", "dataSource": "nation",
        "granularity": "all",
        "dimensions": ["n_regionkey", "not_there_yet"],
        "aggregations": [{"type": "count", "name": "cnt"}],
    }, registry).collect()
    assert len(rows) == 5
    assert all(r["not_there_yet"] is None for r in rows)
    assert sum(r["cnt"] for r in rows) == 25


def test_aggregate_on_nonexistent_metric_is_null(spark, registry):
    """SQL-compatible null mode: aggregating a column the segments lack
    yields null, not an analysis error."""
    row = compile_query({
        "queryType": "timeseries", "dataSource": "nation",
        "granularity": "all",
        "aggregations": [
            {"type": "doubleSum", "name": "s", "fieldName": "no_metric"},
            {"type": "count", "name": "cnt"}],
    }, registry).first()
    assert row["s"] is None
    assert row["cnt"] == 25


def test_scan_projects_nonexistent_column_as_null(spark, registry):
    """Scan on a column the table lacks returns it as an all-null
    column (schema-evolution reads), not an analysis error."""
    rows = compile_query({
        "queryType": "scan", "dataSource": "nation",
        "columns": ["n_name", "added_later"], "limit": 3,
    }, registry).collect()
    assert len(rows) == 3
    assert all(r["added_later"] is None for r in rows)
