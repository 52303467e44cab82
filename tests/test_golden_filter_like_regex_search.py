"""Golden tests ported from the reference's LikeFilterTest.java (18
methods), RegexFilterTest.java (9), and SearchQueryFilterTest.java (9)
(processing/src/test/java/org/apache/druid/segment/filter/).

Accounting — Like 16 ported / 2 skipped, Regex 6/3, Search 6/3; every
skip is either a JVM Object.equals contract (test_equals,
testEqualsContract*) or the filter-rewrite planner pin
(testRequiredColumnRewrite) — no query semantics in any of them.

LikeFilterTest uses its own 7-row fixture (LikeFilterTest.java:65-73,
including a value with an embedded newline); Regex and Search run over
the BaseFilterTest DEFAULT_ROWS. The JS null?'NOT_NULL_ANYMORE':str fn
is substituted with cascade(stringFormat '%s' -> map lookup
{'null': 'NOT_NULL_ANYMORE'} with retainMissingValue) — identical
behavior on every non-'null'-literal input.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query
from filtertest_fixture import filtertest, filter_matches  # noqa: F401

TS = datetime(2000, 1, 1)

LIKE_ROWS = [
    (TS, "0", ""),
    (TS, "1", "foo"),
    (TS, "2", "foobar"),
    (TS, "3", "bar"),
    (TS, "4", "foobarbaz"),
    (TS, "5", "foo%bar"),
    (TS, "6", "new\nline"),
]

LIKE_SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("dim1", T.StringType()),
])

ALL6 = ["0", "1", "2", "3", "4", "5"]
ALL7 = ["0", "1", "2", "3", "4", "5", "6"]

CHANGE_NULL_FN = {"type": "cascade", "extractionFns": [
    {"type": "stringFormat", "format": "%s"},
    {"type": "lookup",
     "lookup": {"type": "map", "map": {"null": "NOT_NULL_ANYMORE"}},
     "retainMissingValue": True},
]}


@pytest.fixture(scope="session")
def liketest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("liketest",
                 spark.createDataFrame(LIKE_ROWS, LIKE_SCHEMA).cache())
    return reg


def like_matches(reg, pattern, escape=None, efn=None) -> list[str]:
    flt = {"type": "like", "dimension": "dim1", "pattern": pattern}
    if escape is not None:
        flt["escape"] = escape
    if efn is not None:
        flt["extractionFn"] = efn
    q = {"queryType": "scan", "dataSource": "liketest",
         "intervals": ["1970-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def substr_fn(index, length=None):
    f = {"type": "substring", "index": index}
    if length is not None:
        f["length"] = length
    return f


# ---------------------------------------------------------------- Like

def test_like_exact_match(spark, liketest):
    # testExactMatch
    assert like_matches(liketest, "bar") == ["3"]


def test_like_exact_match_with_escape(spark, liketest):
    # testExactMatchWithEscape
    assert like_matches(liketest, "@bar", escape="@") == ["3"]


def test_like_exact_match_with_extraction_fn(spark, liketest):
    # testExactMatchWithExtractionFn: substring(3,3) of 'foobar' is 'bar'
    assert like_matches(liketest, "bar", efn=substr_fn(3, 3)) == ["2", "4"]


def test_like_prefix_match(spark, liketest):
    # testPrefixMatch
    assert like_matches(liketest, "foo%") == ["1", "2", "4", "5"]


def test_like_prefix_match_with_escape(spark, liketest):
    # testPrefixMatchWithEscape: @% is a literal percent
    assert like_matches(liketest, "foo@%%", escape="@") == ["5"]


def test_like_prefix_match_with_extraction_fn(spark, liketest):
    # testPrefixMatchWithExtractionFn: substring(1) of 'bar' is 'ar'
    assert like_matches(liketest, "a%", efn=substr_fn(1)) == ["3"]


def test_like_wildcard_match(spark, liketest):
    # testWildcardMatch
    assert like_matches(liketest, "%oba%") == ["2", "4"]


def test_like_match_empty_string(spark, liketest):
    # testMatchEmptyString
    assert like_matches(liketest, "") == ["0"]


def test_like_match_empty_string_with_extraction_fn(spark, liketest):
    # testMatchEmptyStringWithExtractionFn (sqlCompatible: substring
    # beyond every value's length extracts null, which never matches)
    assert like_matches(liketest, "", efn=substr_fn(100, 1)) == []


def test_like_wildcard_match_with_escape(spark, liketest):
    # testWildcardMatchWithEscape
    assert like_matches(liketest, "%@%ba%", escape="@") == ["5"]


def test_like_wildcard_match_everything(spark, liketest):
    # testWildcardMatchEverything
    assert like_matches(liketest, "%", escape="@") == ALL7


def test_like_prefix_and_suffix_match(spark, liketest):
    # testPrefixAndSuffixMatch
    assert like_matches(liketest, "f%r") == ["2", "5"]


def test_like_underscore_match(spark, liketest):
    # testUnderscoreMatch
    assert like_matches(liketest, "f_o") == ["1"]


def test_like_escape_escaping_itself(spark, liketest):
    # testEscapeEscapingItself: escape 'o' makes 'foooo' mean 'foo'
    assert like_matches(liketest, "foooo", escape="o") == ["1"]


def test_like_suffix_match_with_extraction_fn(spark, liketest):
    # testSuffixMatchWithExtractionFn
    assert like_matches(liketest, "%ar", efn=substr_fn(3, 3)) == ["2", "4"]


def test_like_newline_match(spark, liketest):
    # testNewlineMatch: % and _ must match across a newline
    assert like_matches(liketest, "ne%") == ["6"]
    assert like_matches(liketest, "%ine") == ["6"]
    assert like_matches(liketest, "new_line") == ["6"]


def test_like_newline_match_with_extraction_fn(spark, liketest):
    # testNewlineMatchWithExtractionFn
    assert like_matches(liketest, "e%", efn=substr_fn(1, 100)) == ["6"]
    assert like_matches(liketest, "%ine", efn=substr_fn(1, 100)) == ["6"]
    assert like_matches(liketest, "ew_line", efn=substr_fn(1, 100)) == ["6"]


# --------------------------------------------------------------- Regex

def regex(dim, pattern, efn=None):
    f = {"type": "regex", "dimension": dim, "pattern": pattern}
    if efn is not None:
        f["extractionFn"] = efn
    return f


def test_regex_single_value_string_column_without_nulls(spark, filtertest):
    # testSingleValueStringColumnWithoutNulls (find(), not full match)
    assert filter_matches(filtertest, regex("dim0", ".*")) == ALL6
    assert filter_matches(filtertest, regex("dim0", "0")) == ["0"]
    assert filter_matches(filtertest, regex("dim0", "5")) == ["5"]


def test_regex_single_value_string_column_with_nulls(spark, filtertest):
    # testSingleValueStringColumnWithNulls (sqlCompatible: '' matches
    # .*; a pattern finds anywhere in the value — '1' hits '10')
    assert filter_matches(filtertest, regex("dim1", ".*")) == ALL6
    assert filter_matches(filtertest, regex("dim1", "10")) == ["1"]
    assert filter_matches(filtertest, regex("dim1", "2")) == ["2"]
    assert filter_matches(filtertest, regex("dim1", "1")) == ["1", "3"]
    assert filter_matches(filtertest, regex("dim1", ".*def")) == ["4"]
    assert filter_matches(filtertest, regex("dim1", "abc")) == ["5"]
    assert filter_matches(filtertest, regex("dim1", "ab.*")) == ["4", "5"]


def test_regex_multi_value_string_column(spark, filtertest):
    # testMultiValueStringColumn (sqlCompatible)
    assert filter_matches(filtertest, regex("dim2", ".*")) == \
        ["0", "2", "3", "4"]
    assert filter_matches(filtertest, regex("dim2", "a")) == ["0", "3"]
    assert filter_matches(filtertest, regex("dim2", "b")) == ["0"]
    assert filter_matches(filtertest, regex("dim2", "c")) == ["4"]
    assert filter_matches(filtertest, regex("dim2", "d")) == []


def test_regex_missing_column_specified_in_dimension_list(spark, filtertest):
    # testMissingColumnSpecifiedInDimensionList
    for pat in ("", "a", "b", "c"):
        assert filter_matches(filtertest, regex("dim3", pat)) == [], pat


def test_regex_missing_column_not_specified_in_dimension_list(spark, filtertest):
    # testMissingColumnNotSpecifiedInDimensionList
    for pat in ("", "a", "b", "c"):
        assert filter_matches(filtertest, regex("dim4", pat)) == [], pat


def test_regex_with_extraction_fn(spark, filtertest):
    # testRegexWithExtractionFn (sqlCompatible branches)
    assert filter_matches(
        filtertest, regex("dim1", ".*ANYMORE", CHANGE_NULL_FN)) == []
    assert filter_matches(
        filtertest, regex("dim2", ".*ANYMORE", CHANGE_NULL_FN)) == ["1", "5"]
    assert filter_matches(
        filtertest, regex("dim1", "ab.*", CHANGE_NULL_FN)) == ["4", "5"]
    assert filter_matches(
        filtertest, regex("dim2", "a.*", CHANGE_NULL_FN)) == ["0", "3"]
    assert filter_matches(
        filtertest, regex("dim3", ".*ANYMORE", CHANGE_NULL_FN)) == ALL6
    assert filter_matches(
        filtertest, regex("dim3", "a.*", CHANGE_NULL_FN)) == []
    assert filter_matches(
        filtertest, regex("dim4", ".*ANYMORE", CHANGE_NULL_FN)) == ALL6
    assert filter_matches(
        filtertest, regex("dim4", "a.*", CHANGE_NULL_FN)) == []


# -------------------------------------------------------------- Search

def search(dim, value, efn=None):
    f = {"type": "search", "dimension": dim,
         "query": {"type": "contains", "value": value,
                   "caseSensitive": True}}
    if efn is not None:
        f["extractionFn"] = efn
    return f


def test_search_single_value_string_column_without_nulls(spark, filtertest):
    # testSingleValueStringColumnWithoutNulls
    assert filter_matches(filtertest, search("dim0", "")) == ALL6
    assert filter_matches(filtertest, search("dim0", "0")) == ["0"]
    assert filter_matches(filtertest, search("dim0", "5")) == ["5"]


def test_search_single_value_string_column_with_nulls(spark, filtertest):
    # testSingleValueStringColumnWithNulls (sqlCompatible)
    assert filter_matches(filtertest, search("dim1", "")) == ALL6
    assert filter_matches(filtertest, search("dim1", "10")) == ["1"]
    assert filter_matches(filtertest, search("dim1", "2")) == ["2"]
    assert filter_matches(filtertest, search("dim1", "1")) == ["1", "3"]
    assert filter_matches(filtertest, search("dim1", "def")) == ["4"]
    assert filter_matches(filtertest, search("dim1", "abc")) == ["5"]
    assert filter_matches(filtertest, search("dim1", "ab")) == ["4", "5"]


def test_search_multi_value_string_column(spark, filtertest):
    # testMultiValueStringColumn (sqlCompatible)
    assert filter_matches(filtertest, search("dim2", "")) == \
        ["0", "2", "3", "4"]
    assert filter_matches(filtertest, search("dim2", "a")) == ["0", "3"]
    assert filter_matches(filtertest, search("dim2", "b")) == ["0"]
    assert filter_matches(filtertest, search("dim2", "c")) == ["4"]
    assert filter_matches(filtertest, search("dim2", "d")) == []


def test_search_missing_column_specified_in_dimension_list(spark, filtertest):
    # testMissingColumnSpecifiedInDimensionList
    for v in ("", "a", "b", "c"):
        assert filter_matches(filtertest, search("dim3", v)) == [], v


def test_search_missing_column_not_specified_in_dimension_list(spark, filtertest):
    # testMissingColumnNotSpecifiedInDimensionList
    for v in ("", "a", "b", "c"):
        assert filter_matches(filtertest, search("dim4", v)) == [], v


def test_search_query_with_extraction_fn(spark, filtertest):
    # testSearchQueryWithExtractionFn (sqlCompatible branches)
    assert filter_matches(
        filtertest, search("dim1", "ANYMORE", CHANGE_NULL_FN)) == []
    assert filter_matches(
        filtertest, search("dim2", "ANYMORE", CHANGE_NULL_FN)) == ["1", "5"]
    assert filter_matches(
        filtertest, search("dim1", "ab", CHANGE_NULL_FN)) == ["4", "5"]
    assert filter_matches(
        filtertest, search("dim2", "a", CHANGE_NULL_FN)) == ["0", "3"]
    assert filter_matches(
        filtertest, search("dim3", "ANYMORE", CHANGE_NULL_FN)) == ALL6
    assert filter_matches(
        filtertest, search("dim3", "a", CHANGE_NULL_FN)) == []
    assert filter_matches(
        filtertest, search("dim4", "ANYMORE", CHANGE_NULL_FN)) == ALL6
    assert filter_matches(
        filtertest, search("dim4", "a", CHANGE_NULL_FN)) == []
