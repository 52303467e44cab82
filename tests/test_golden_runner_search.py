"""Golden tests ported from the reference's native-engine suite
SearchQueryRunnerTest.java (processing/src/test/java/org/apache/druid/
query/search/, 27 methods) over the TestIndex fixture. Hits compare as
(dimension, value, count) sets; ordered methods compare lists.

Engine fixes driven by the port: a non-existent searchDimension
contributes no hits (was an unresolved-column error), and searching
__time stringifies epoch MILLIS (testSearchOnTime).

24/27 ported — SUITE CLOSED up to the policy wall. Skipped (3):
testSearchHitSerDe (Jackson serde of the reference's wire class) and
testSearchOnLongColumnWithExFn / testSearchOnFloatColumnWithExFn
(javascript
extraction fns — policy exclusion). testSearchWithCardinality closed
in r12 as a multi-interval pin (the reference's two-segment merge
sums to the single-pass counts). r13: every ported test now cites its
reference method by exact name (the dimension-list and multi-filter
family had been ported untagged), and the sibling suite
SearchQueryRunnerWithCaseTest.java is ported 6/6 at the bottom of
this module (case-sensitive query specs over its own 4-row
mixed-case fixture).

r12 closures: testSearchWithExtractionFilter1 (lookup extraction on
both filter and searched dim), testSearchWithNullValueInDimension
(the default ALL query spec counts NULL values of an EXISTING column;
predicate specs reject nulls), testSearchWithNotExistedDimension
(a genuinely absent dimension yields no hits even under ALL)."""

from __future__ import annotations

import pytest

from apache_druid_spark.plans.compiler import compile_query

from testindex_fixture import testindex  # noqa: F401 (fixture)

FULL_ON = ["1970-01-01/2020-01-01"]


def search(q_spec, dims=None, filt=None, sort=None, intervals=FULL_ON):
    q = {"queryType": "search", "dataSource": "testindex",
         "granularity": "all", "intervals": intervals,
         "query": q_spec}
    if dims:
        q["searchDimensions"] = dims
    if filt:
        q["filter"] = filt
    if sort:
        q["sort"] = {"type": sort}
    return q


def hits(spark, reg, q):
    return {(r["dimension"], r["value"], r["count"])
            for r in compile_query(q, reg).collect()}


def ordered(spark, reg, q):
    return [(r["dimension"], r["value"], r["count"])
            for r in compile_query(q, reg).collect()]


CONTAINS_A = {"type": "insensitive_contains", "value": "a"}


def test_search(spark, testindex):
    # testSearch: default dims sweep every string dimension (incl. MV
    # elements); 'a' hits five qualities, total_market, the 'a'
    # placementish element, and partial_null 'value'
    assert hits(spark, testindex, search(CONTAINS_A)) == {
        ("quality", "automotive", 93),
        ("quality", "mezzanine", 279),
        ("quality", "travel", 93),
        ("quality", "health", 93),
        ("quality", "entertainment", 93),
        ("market", "total_market", 186),
        ("placementish", "a", 93),
        ("partial_null_column", "value", 186),
    }


def test_fragment_search(spark, testindex):
    # testFragmentSearch: all fragments must be contained
    q = search({"type": "fragment", "values": ["auto", "ve"]})
    assert hits(spark, testindex, q) == {("quality", "automotive", 93)}


def test_search_with_dimension_quality(spark, testindex):
    # testSearchWithDimensionQuality
    q = search(CONTAINS_A, dims=["quality"])
    assert hits(spark, testindex, q) == {
        ("quality", "automotive", 93), ("quality", "mezzanine", 279),
        ("quality", "travel", 93), ("quality", "health", 93),
        ("quality", "entertainment", 93)}


def test_search_with_dimension_provider(spark, testindex):
    # testSearchWithDimensionProvider (market only)
    q = search(CONTAINS_A, dims=["market"])
    assert hits(spark, testindex, q) == {("market", "total_market", 186)}


def test_search_with_dimensions_quality_and_provider(spark, testindex):
    # testSearchWithDimensionsQualityAndProvider
    q = search(CONTAINS_A, dims=["quality", "market"])
    assert hits(spark, testindex, q) == {
        ("quality", "automotive", 93), ("quality", "mezzanine", 279),
        ("quality", "travel", 93), ("quality", "health", 93),
        ("quality", "entertainment", 93),
        ("market", "total_market", 186)}


def test_search_with_dimensions_placement_and_provider(spark,
                                                       testindex):
    # testSearchWithDimensionsPlacementAndProvider: 'mark' appears
    # only in total_market
    q = search({"type": "insensitive_contains", "value": "mark"},
               dims=["placement", "market"])
    assert hits(spark, testindex, q) == {("market", "total_market", 186)}


def test_search_same_value_in_multi_dims(spark, testindex):
    # testSearchSameValueInMultiDims: 'preferred' matches in both the
    # scalar placement and the MV placementish
    q = search({"type": "insensitive_contains", "value": "e"},
               dims=["placement", "placementish"])
    assert hits(spark, testindex, q) == {
        ("placement", "preferred", 1209),
        ("placementish", "e", 93),
        ("placementish", "preferred", 1209)}


def test_search_same_value_in_multi_dims_strlen(spark, testindex):
    # testSearchSameValueInMultiDims2: strlen sort puts the 1-char
    # element first, then ties on value sort by dimension
    q = search({"type": "insensitive_contains", "value": "e"},
               dims=["placement", "placementish"], sort="strlen")
    assert ordered(spark, testindex, q) == [
        ("placementish", "e", 93),
        ("placement", "preferred", 1209),
        ("placementish", "preferred", 1209)]


def test_search_with_single_filter2(spark, testindex):
    # testSearchWithSingleFilter2: filter + search the same dimension
    q = search(CONTAINS_A, dims=["market"],
               filt={"type": "selector", "dimension": "market",
                     "value": "total_market"})
    assert hits(spark, testindex, q) == {("market", "total_market", 186)}


def test_search_multi_and_filter(spark, testindex):
    # testSearchMultiAndFilter
    q = search(CONTAINS_A, dims=["quality"],
               filt={"type": "and", "fields": [
                   {"type": "selector", "dimension": "quality",
                    "value": "automotive"},
                   {"type": "selector", "dimension": "market",
                    "value": "spot"}]})
    assert hits(spark, testindex, q) == {("quality", "automotive", 93)}


def test_search_with_multi_or_filter(spark, testindex):
    # testSearchWithMultiOrFilter
    q = search(CONTAINS_A, dims=["quality"],
               filt={"type": "or", "fields": [
                   {"type": "selector", "dimension": "quality",
                    "value": "automotive"},
                   {"type": "selector", "dimension": "quality",
                    "value": "business"}]})
    assert hits(spark, testindex, q) == {("quality", "automotive", 93)}


def test_search_with_empty_results(spark, testindex):
    # testSearchWithEmptyResults
    q = search({"type": "insensitive_contains", "value": "abcd123"})
    assert hits(spark, testindex, q) == set()


def test_search_non_existing_dimension(spark, testindex):
    # testSearchNonExistingDimension: unknown dims are silently empty
    q = search(CONTAINS_A, dims=["does_not_exist"])
    assert hits(spark, testindex, q) == set()


def test_search_with_numeric_sort(spark, testindex):
    # testSearchWithNumericSort: all-alpha values order as in the
    # lexicographic case
    q = search(CONTAINS_A, sort="numeric")
    got = ordered(spark, testindex, q)
    assert got == sorted(got, key=lambda h: (h[1], h[0]))
    assert {g[:2] for g in got} == {
        ("placementish", "a"), ("quality", "automotive"),
        ("quality", "entertainment"), ("quality", "health"),
        ("quality", "mezzanine"), ("market", "total_market"),
        ("quality", "travel"), ("partial_null_column", "value")}


def test_search_on_time(spark, testindex):
    # testSearchOnTime: __time searches as stringified epoch millis
    q = search({"type": "contains", "value": "1297123200000"},
               dims=["__time"])
    assert hits(spark, testindex, q) == {
        ("__time", "1297123200000", 13)}


# ---------------------------------------------------------------------------
# Round-9 tranche: filtered searches, search-all, typed LONG/DOUBLE
# column searches.
# ---------------------------------------------------------------------------

def test_search_with_single_filter1(spark, testindex):
    # testSearchWithSingleFilter1: AND(market, quality) filter narrows
    # the quality sweep to mezzanine 93
    q = search(CONTAINS_A, dims=["quality"],
               filt={"type": "and", "fields": [
                   {"type": "selector", "dimension": "market",
                    "value": "total_market"},
                   {"type": "selector", "dimension": "quality",
                    "value": "mezzanine"}]})
    assert hits(spark, testindex, q) == {("quality", "mezzanine", 93)}


def test_search_with_filter_empty_results(spark, testindex):
    # testSearchWithFilterEmptyResults: contradictory AND -> no hits
    q = search(CONTAINS_A,
               filt={"type": "and", "fields": [
                   {"type": "selector", "dimension": "market",
                    "value": "total_market"},
                   {"type": "selector", "dimension": "quality",
                    "value": "automotive"}]})
    assert hits(spark, testindex, q) == set()


def test_search_all(spark, testindex):
    # testSearchAll: the empty query matches every value
    want = {("market", "spot", 837), ("market", "total_market", 186),
            ("market", "upfront", 186)}
    q = search({"type": "insensitive_contains", "value": ""},
               dims=["market"])
    assert hits(spark, testindex, q) == want


def test_search_on_long_column(spark, testindex):
    # testSearchOnLongColumn: __time typed LONG searches stringified
    # epoch millis
    q = {"queryType": "search", "dataSource": "testindex",
         "granularity": "all", "intervals": FULL_ON,
         "searchDimensions": [
             {"type": "default", "dimension": "__time",
              "outputName": "__time", "outputType": "LONG"}],
         "query": {"type": "insensitive_contains",
                   "value": "1297123200000"}}
    assert hits(spark, testindex, q) == {
        ("__time", "1297123200000", 13)}


def test_search_on_float_column(spark, testindex):
    # testSearchOnFloatColumn: the double metric searched as text
    q = {"queryType": "search", "dataSource": "testindex",
         "granularity": "all", "intervals": FULL_ON,
         "searchDimensions": [
             {"type": "default", "dimension": "index",
              "outputName": "index", "outputType": "DOUBLE"}],
         "query": {"type": "insensitive_contains", "value": "100.7"}}
    assert hits(spark, testindex, q) == {
        ("index", "100.706057", 1), ("index", "100.775597", 1)}


# -- round-12 additions

def test_search_with_extraction_filter1(spark, testindex):
    # testSearchWithExtractionFilter1: lookup extraction (retain
    # missing) on both the filter and the searched dimension
    snowman = "automotive☃"
    exfn = {"type": "lookup", "retainMissingValue": True,
            "lookup": {"type": "map", "map": {"automotive": snowman}}}
    q = {"queryType": "search", "dataSource": "testindex",
         "granularity": "all", "intervals": FULL_ON,
         "filter": {"type": "selector", "dimension": "quality",
                    "value": snowman, "extractionFn": exfn},
         "searchDimensions": [{"type": "extraction",
                               "dimension": "quality",
                               "outputName": "quality",
                               "extractionFn": exfn}],
         "query": {"type": "insensitive_contains", "value": "☃"}}
    assert hits(spark, testindex, q) == {("quality", snowman, 93)}


def test_search_with_null_value_in_dimension(spark, testindex):
    # testSearchWithNullValueInDimension: the default (ALL) query spec
    # counts NULL dimension values as hits; built on a bespoke two-row
    # datasource like the reference's inline incremental index
    from datetime import datetime
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    df = spark.createDataFrame(
        [(datetime(2016, 12, 16, 7, 0, 0), "name1", "host", None),
         (datetime(2016, 12, 16, 7, 1, 10), "name2", None, "table")],
        "__time timestamp, name string, host string, table string")
    reg.register("nulldim", df)
    q = {"queryType": "search", "dataSource": "nulldim",
         "granularity": "all", "intervals": FULL_ON,
         "searchDimensions": [{"type": "default", "dimension": "table",
                               "outputName": "table"}]}
    assert hits(spark, reg, q) == {("table", "table", 1),
                                   ("table", None, 1)}
    # predicate specs still reject nulls
    q["query"] = {"type": "insensitive_contains", "value": ""}
    assert hits(spark, reg, q) == {("table", "table", 1)}


def test_search_with_not_existed_dimension(spark, testindex):
    # testSearchWithNotExistedDimension: explicit missing dim + the
    # default ALL spec -> no hits
    q = {"queryType": "search", "dataSource": "testindex",
         "granularity": "all", "intervals": FULL_ON,
         "searchDimensions": [{"type": "default", "dimension": "asdf",
                               "outputName": "asdf"}]}
    assert hits(spark, testindex, q) == set()


def test_search_with_cardinality(spark, testindex):
    # testSearchWithCardinality: the reference runs the two intervals
    # as separate segments and MERGES — summed hit counts equal this
    # engine's single multi-interval pass (note the split drops
    # 2011-02-28, hence 91 not 93)
    q = search(CONTAINS_A,
               intervals=["2011-01-12/2011-02-28",
                          "2011-03-01/2011-04-15"])
    assert hits(spark, testindex, q) == {
        ("quality", "automotive", 91), ("quality", "mezzanine", 273),
        ("quality", "travel", 91), ("quality", "health", 91),
        ("quality", "entertainment", 91),
        ("market", "total_market", 182), ("placementish", "a", 91),
        ("partial_null_column", "value", 182)}


# -- SearchQueryRunnerWithCaseTest.java (6 methods, own 4-row fixture
# at :69-73) — case-sensitive query specs over mixed-case values.
# Ported 6/6. testFallbackToCursorBasedPlan pins the numeric-dim
# stringification with EXPLICIT searchDimensions: the reference's
# default sweep covers every DIMENSION column because its segment
# schema declares them; this engine's registry has no dim/metric
# split, so the default sweep is the string/MV heuristic and numeric
# dims are searched when named (the reference test's actual subject —
# the index-vs-cursor strategy fallback — is engine-internal).

import pyspark.sql.functions as _F  # noqa: E402
import pyspark.sql.types as _T  # noqa: E402

from apache_druid_spark.model.datasource import DatasourceRegistry  # noqa: E402


@pytest.fixture(scope="module")
def case_reg(spark):
    schema = _T.StructType([
        _T.StructField("ts", _T.StringType()),
        _T.StructField("market", _T.StringType()),
        _T.StructField("quality", _T.StringType()),
        _T.StructField("qualityLong", _T.LongType()),
        _T.StructField("qualityDouble", _T.DoubleType()),
        _T.StructField("qualityFloat", _T.FloatType()),
        _T.StructField("qualityNumericString", _T.StringType()),
        _T.StructField("longNumericNull", _T.LongType()),
        _T.StructField("floatNumericNull", _T.FloatType()),
        _T.StructField("doubleNumericNull", _T.DoubleType()),
        _T.StructField("placement", _T.StringType()),
        _T.StructField("placementish",
                       _T.ArrayType(_T.StringType())),
        _T.StructField("index", _T.DoubleType()),
    ])
    rows = [
        ("2011-01-12T00:00:00", "spot", "AutoMotive", 1000, 10000.0,
         10000.0, "100000", 10, 10.0, 10.0, "PREFERRED",
         ["a", "preferred"], 100.0),
        ("2011-01-12T00:00:00", "SPot", "business", 1100, 11000.0,
         11000.0, "110000", 20, 20.0, 20.0, "preferred",
         ["b", "Preferred"], 100.0),
        ("2011-01-12T00:00:00", "spot", "entertainment", 1200,
         12000.0, 12000.0, "120000", None, None, None, "PREFERRed",
         ["e", "preferred"], 100.0),
        ("2011-01-13T00:00:00", "spot", "automotive", 1000, 10000.0,
         10000.0, "100000", 10, 10.0, 10.0, "preferred",
         ["a", "preferred"], 94.874713),
    ]
    reg = DatasourceRegistry(spark)
    reg.register("caseindex", spark.createDataFrame(rows, schema)
                 .select(_F.col("ts").cast("timestamp").alias("__time"),
                         *[f.name for f in schema.fields
                           if f.name != "ts"]))
    return reg


def _case_q(q_spec, dims=None, intervals=FULL_ON, filt=None):
    q = {"queryType": "search", "dataSource": "caseindex",
         "granularity": "all", "intervals": intervals, "query": q_spec}
    if dims:
        q["searchDimensions"] = dims
    if filt:
        q["filter"] = filt
    return q


def _values(spark, reg, q):
    out = {}
    for r in compile_query(q, reg).collect():
        out.setdefault(r["dimension"], set()).add(r["value"])
    return out


def test_case_search(spark, case_reg):
    # testSearch: insensitive 'SPOT' hits both casings; the
    # case-sensitive spec hits exactly its casing
    got = _values(spark, case_reg, _case_q(
        {"type": "insensitive_contains", "value": "SPOT"}))
    assert got["market"] == {"spot", "SPot"}
    got = _values(spark, case_reg, _case_q(
        {"type": "contains", "value": "spot", "caseSensitive": True}))
    assert got["market"] == {"spot"}
    got = _values(spark, case_reg, _case_q(
        {"type": "contains", "value": "SPot", "caseSensitive": True}))
    assert got["market"] == {"SPot"}


def test_case_search_same_value_in_multi_dims(spark, case_reg):
    # testSearchSameValueInMultiDims
    dims = ["placement", "placementish"]
    got = _values(spark, case_reg, _case_q(
        {"type": "insensitive_contains", "value": "PREFERRED"},
        dims=dims))
    assert got["placement"] == {"PREFERRED", "preferred", "PREFERRed"}
    assert got["placementish"] == {"preferred", "Preferred"}
    got = _values(spark, case_reg, _case_q(
        {"type": "contains", "value": "preferred",
         "caseSensitive": True}, dims=dims))
    assert got["placement"] == {"preferred"}
    assert got["placementish"] == {"preferred"}


def test_case_search_intervals(spark, case_reg):
    # testSearchIntervals: only the 01-12 segment rows participate
    got = _values(spark, case_reg, _case_q(
        {"type": "insensitive_contains", "value": "otive"},
        dims=["quality"], intervals=["2011-01-12/2011-01-13"]))
    assert got == {"quality": {"AutoMotive"}}


def test_case_search_no_overlapping_intervals(spark, case_reg):
    # testSearchNoOverrappingIntervals: empty interval -> no hits
    got = _values(spark, case_reg, _case_q(
        {"type": "insensitive_contains", "value": "business"},
        dims=["quality"], intervals=["2011-01-10/2011-01-11"]))
    assert got == {}


def test_case_fragment_search(spark, case_reg):
    # testFragmentSearch: all fragments contained; the case-sensitive
    # form drops the mixed-case value
    got = _values(spark, case_reg, _case_q(
        {"type": "fragment", "values": ["auto", "ve"]}))
    assert got["quality"] == {"automotive", "AutoMotive"}
    got = _values(spark, case_reg, _case_q(
        {"type": "fragment", "values": ["auto", "ve"],
         "caseSensitive": True}))
    assert got["quality"] == {"automotive"}


def test_case_fallback_to_cursor_based_plan(spark, case_reg):
    # testFallbackToCursorBasedPlan: filter qualityLong=1000, sweep
    # every dimension (explicit here — see module note); numeric
    # values stringify
    dims = ["market", "quality", "qualityLong", "qualityDouble",
            "qualityFloat", "qualityNumericString", "longNumericNull",
            "floatNumericNull", "doubleNumericNull", "placement",
            "placementish"]
    got = _values(spark, case_reg, _case_q(
        {"type": "all"}, dims=dims,
        filt={"type": "selector", "dimension": "qualityLong",
              "value": "1000"}))
    assert got["qualityLong"] == {"1000"}
    assert got["qualityDouble"] == {"10000.0"}
    assert got["qualityFloat"] == {"10000.0"}
    assert got["qualityNumericString"] == {"100000"}
    assert got["longNumericNull"] == {"10"}
    assert got["floatNumericNull"] == {"10.0"}
    assert got["doubleNumericNull"] == {"10.0"}
    assert got["quality"] == {"AutoMotive", "automotive"}
    assert got["placement"] == {"PREFERRED", "preferred"}
    assert got["placementish"] == {"a", "preferred"}
    assert got["market"] == {"spot"}
