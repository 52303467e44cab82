"""Golden tests ported from the reference's SelectorFilterTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 11 @Test
methods) over the BaseFilterTest DEFAULT_ROWS fixture.

11/11 methods accounted: 10 ported below (the sqlCompatible branches —
SURVEY.md: this engine is SQL-compatible-mode only); test_equals is a
Java Object.equals/hashCode contract with no query semantics (skip
bucket: JVM-object contracts). The optimize() identity assertions inside
testSelectorWithLookupExtractionFn pin Druid's filter-rewrite planner
objects; their MATCH expectations (optFilter1-6) are all ported — in
this engine the rewrite is Catalyst's job.
"""

from __future__ import annotations

from filtertest_fixture import filtertest, filter_matches, sel  # noqa: F401

TIME_FN = {"type": "time", "timeFormat": "yyyy-MM-dd",
           "resultFormat": "yyyy-MM", "joda": True}

ALL = ["0", "1", "2", "3", "4", "5"]


def lookup_fn(mapping, retain=False, replace=None, injective=False):
    f = {"type": "lookup",
         "lookup": {"type": "map", "map": mapping},
         "retainMissingValue": retain, "optimize": True,
         "injective": injective}
    if replace is not None:
        f["replaceMissingValueWith"] = replace
    return f


def test_with_time_extraction_fn_null(spark, filtertest):
    # testWithTimeExtractionFnNull: values that fail to parse extract
    # to themselves (non-null), so the null selector matches only the
    # row whose timeDim IS null
    assert filter_matches(filtertest, sel("dim0", None, TIME_FN)) == []
    assert filter_matches(filtertest, sel("vdim0", None, TIME_FN)) == []
    assert filter_matches(filtertest, sel("timeDim", None, TIME_FN)) == ["4"]
    assert filter_matches(filtertest, sel("timeDim", "2017-07", TIME_FN)) == ["0", "1"]
    assert filter_matches(filtertest, sel("timeDim", "2017-05", TIME_FN)) == ["2"]
    assert filter_matches(filtertest, sel("timeDim", "2020-01", TIME_FN)) == ["3", "5"]


def test_single_value_string_column_without_nulls(spark, filtertest):
    # testSingleValueStringColumnWithoutNulls
    assert filter_matches(filtertest, sel("dim0", None)) == []
    assert filter_matches(filtertest, sel("dim0", "")) == []
    assert filter_matches(filtertest, sel("dim0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("dim0", "1")) == ["1"]


def test_single_value_virtual_string_column_without_nulls(spark, filtertest):
    # testSingleValueVirtualStringColumnWithoutNulls
    assert filter_matches(filtertest, sel("vdim0", None)) == []
    assert filter_matches(filtertest, sel("vdim0", "")) == []
    assert filter_matches(filtertest, sel("vdim0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("vdim0", "1")) == ["1"]


def test_list_filtered_virtual_column(spark, filtertest):
    # testListFilteredVirtualColumn: scalar delegate (dim0) keeps only
    # allow-listed values; MV delegate (dim2) filters elements
    assert filter_matches(filtertest, sel("allow-dim0", "1")) == []
    assert filter_matches(filtertest, sel("allow-dim0", "4")) == ["4"]
    assert filter_matches(filtertest, sel("deny-dim0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("deny-dim0", "4")) == []

    assert filter_matches(filtertest, sel("allow-dim2", "b")) == []
    assert filter_matches(filtertest, sel("allow-dim2", "a")) == ["0", "3"]
    assert filter_matches(filtertest, sel("deny-dim2", "b")) == ["0"]
    assert filter_matches(filtertest, sel("deny-dim2", "a")) == []


def test_single_value_string_column_with_nulls(spark, filtertest):
    # testSingleValueStringColumnWithNulls (sqlCompatible: null != "")
    assert filter_matches(filtertest, sel("dim1", None)) == []
    assert filter_matches(filtertest, sel("dim1", "")) == ["0"]
    assert filter_matches(filtertest, sel("dim1", "10")) == ["1"]
    assert filter_matches(filtertest, sel("dim1", "2")) == ["2"]
    assert filter_matches(filtertest, sel("dim1", "1")) == ["3"]
    assert filter_matches(filtertest, sel("dim1", "abdef")) == ["4"]
    assert filter_matches(filtertest, sel("dim1", "abc")) == ["5"]
    assert filter_matches(filtertest, sel("dim1", "ab")) == []


def test_single_value_virtual_string_column_with_nulls(spark, filtertest):
    # testSingleValueVirtualStringColumnWithNulls
    assert filter_matches(filtertest, sel("vdim1", None)) == []
    assert filter_matches(filtertest, sel("vdim1", "")) == ["0"]
    assert filter_matches(filtertest, sel("vdim1", "10")) == ["1"]
    assert filter_matches(filtertest, sel("vdim1", "2")) == ["2"]
    assert filter_matches(filtertest, sel("vdim1", "1")) == ["3"]
    assert filter_matches(filtertest, sel("vdim1", "abdef")) == ["4"]
    assert filter_matches(filtertest, sel("vdim1", "abc")) == ["5"]
    assert filter_matches(filtertest, sel("vdim1", "ab")) == []


def test_multi_value_string_column(spark, filtertest):
    # testMultiValueStringColumn (sqlCompatible: [] ingests as a null
    # row; [""] holds a real empty string)
    assert filter_matches(filtertest, sel("dim2", None)) == ["1", "5"]
    assert filter_matches(filtertest, sel("dim2", "")) == ["2"]
    assert filter_matches(filtertest, sel("dim2", "a")) == ["0", "3"]
    assert filter_matches(filtertest, sel("dim2", "b")) == ["0"]
    assert filter_matches(filtertest, sel("dim2", "c")) == ["4"]
    assert filter_matches(filtertest, sel("dim2", "d")) == []


def test_missing_column_specified_in_dimension_list(spark, filtertest):
    # testMissingColumnSpecifiedInDimensionList: dim3 behaves as
    # all-null STRING
    assert filter_matches(filtertest, sel("dim3", None)) == ALL
    assert filter_matches(filtertest, sel("dim3", "")) == []
    assert filter_matches(filtertest, sel("dim3", "a")) == []
    assert filter_matches(filtertest, sel("dim3", "b")) == []
    assert filter_matches(filtertest, sel("dim3", "c")) == []


def test_missing_column_not_specified_in_dimension_list(spark, filtertest):
    # testMissingColumnNotSpecifiedInDimensionList
    assert filter_matches(filtertest, sel("dim4", None)) == ALL
    assert filter_matches(filtertest, sel("dim4", "")) == []
    assert filter_matches(filtertest, sel("dim4", "a")) == []
    assert filter_matches(filtertest, sel("dim4", "b")) == []
    assert filter_matches(filtertest, sel("dim4", "c")) == []


def test_expression_virtual_column(spark, filtertest):
    # testExpressionVirtualColumn: expr = 1.0 + 0.1 (FLOAT) everywhere
    assert filter_matches(filtertest, sel("expr", "1.1")) == ALL
    assert filter_matches(filtertest, sel("expr", "1.2")) == []


def test_selector_with_lookup_extraction_fn(spark, filtertest):
    # testSelectorWithLookupExtractionFn (sqlCompatible branches)
    fn = lookup_fn({"1": "HELLO", "a": "HELLO", "abdef": "HELLO",
                    "abc": "UNKNOWN"}, retain=False, replace="UNKNOWN")
    assert filter_matches(filtertest, sel("dim0", "HELLO", fn)) == ["1"]
    assert filter_matches(filtertest, sel("dim0", "UNKNOWN", fn)) == \
        ["0", "2", "3", "4", "5"]
    assert filter_matches(filtertest, sel("dim1", "HELLO", fn)) == ["3", "4"]
    assert filter_matches(filtertest, sel("dim1", "UNKNOWN", fn)) == \
        ["0", "1", "2", "5"]
    assert filter_matches(filtertest, sel("dim2", "HELLO", fn)) == ["0", "3"]
    assert filter_matches(filtertest, sel("dim2", "UNKNOWN", fn)) == \
        ["0", "1", "2", "4", "5"]
    assert filter_matches(filtertest, sel("dim3", "HELLO", fn)) == []
    assert filter_matches(filtertest, sel("dim3", "UNKNOWN", fn)) == ALL
    assert filter_matches(filtertest, sel("dim4", "HELLO", fn)) == []
    assert filter_matches(filtertest, sel("dim4", "UNKNOWN", fn)) == ALL

    fn2 = lookup_fn({"2": "5"}, retain=True, injective=True)
    assert filter_matches(filtertest, sel("dim0", "5", fn2)) == ["2", "5"]

    fn3 = lookup_fn({"1": ""})
    assert filter_matches(filtertest, sel("dim0", None, fn3)) == \
        ["0", "2", "3", "4", "5"]
    assert filter_matches(filtertest, sel("dim0", "", fn3)) == ["1"]

    # the optimize() targets' match expectations (optFilter1-6)
    fn4 = lookup_fn({"9": "4"}, retain=True, injective=True)
    fn5 = lookup_fn({"5": "44"}, retain=True, injective=True)
    fn6 = lookup_fn({"5": "5"}, retain=True, injective=True)
    assert filter_matches(filtertest, sel("dim1", "UNKNOWN", fn)) == \
        ["0", "1", "2", "5"]
    assert filter_matches(filtertest, sel("dim0", "5", fn2)) == ["2", "5"]
    assert filter_matches(filtertest, sel("dim0", None, fn3)) == \
        ["0", "2", "3", "4", "5"]
    assert filter_matches(filtertest, sel("dim0", "5", fn4)) == ["5"]
    assert filter_matches(filtertest, sel("dim0", "5", fn5)) == []
    assert filter_matches(filtertest, sel("dim0", "5", fn6)) == ["5"]

    # ExtractionDimFilter spellings of the same contracts
    ext = {"type": "extraction", "dimension": "dim1", "value": "UNKNOWN",
           "extractionFn": fn}
    assert filter_matches(filtertest, ext) == ["0", "1", "2", "5"]
    ext2 = {"type": "extraction", "dimension": "dim0", "value": "5",
            "extractionFn": fn2}
    assert filter_matches(filtertest, ext2) == ["2", "5"]
    ext3 = {"type": "extraction", "dimension": "dim0", "value": None,
            "extractionFn": fn3}
    assert filter_matches(filtertest, ext3) == ["0", "2", "3", "4", "5"]
    ext3b = {"type": "extraction", "dimension": "dim0", "value": "",
             "extractionFn": fn3}
    assert filter_matches(filtertest, ext3b) == ["1"]


def test_numeric_column_nulls_and_defaults(spark, filtertest):
    # testNumericColumnNullsAndDefaults (sqlCompatible: nulls are real)
    assert filter_matches(filtertest, sel("f0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("d0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("l0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("f0", None)) == ["4"]
    assert filter_matches(filtertest, sel("d0", None)) == ["2"]
    assert filter_matches(filtertest, sel("l0", None)) == ["3"]


def test_virtual_numeric_column_nulls_and_defaults(spark, filtertest):
    # testVirtualNumericColumnNullsAndDefaults
    assert filter_matches(filtertest, sel("vf0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("vd0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("vl0", "0")) == ["0"]
    assert filter_matches(filtertest, sel("vf0", None)) == ["4"]
    assert filter_matches(filtertest, sel("vd0", None)) == ["2"]
    assert filter_matches(filtertest, sel("vl0", None)) == ["3"]
