"""Golden tests ported from the reference's BoundFilterTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 30 @Test
methods) over the BaseFilterTest fixture extended with two
negative-numeric-string rows (BoundFilterTest.java:52-57).

27/30 methods accounted: 26 ported below (sqlCompatible branches;
canTestNumericNullsAsDefaultValues is false in SQL-compatible mode, so
the ': ImmutableList.of(...)' arms apply); skip bucket (3): test_equals
and test_equals_boundDimFilterDruidPredicateFactory are JVM
Object.equals contracts, testRequiredColumnRewrite pins Druid's
filter-rewrite planner object (in this engine column rewrites are
Catalyst's job).

testMatchWithExtractionFn substitutes the policy-excluded JavaScript
fns with the equivalent portable extraction fns: 'super-' + str ==
stringFormat('super-%s') (both render a null input as 'super-null' —
Java String.format / JS string concat agree), and the always-null fn ==
an empty-map lookup without retainMissingValue.
"""

from __future__ import annotations

from filtertest_fixture import filtertest, filter_matches  # noqa: F401

ALL8 = ["0", "1", "2", "3", "4", "5", "6", "7"]

LEX = "lexicographic"
ALNUM = "alphanumeric"
NUM = "numeric"

SUPER_FN = {"type": "stringFormat", "format": "super-%s"}
NULL_FN = {"type": "lookup", "lookup": {"type": "map", "map": {}},
           "retainMissingValue": False}


def bound(dim, lower, upper, lower_strict=False, upper_strict=False,
          ordering=LEX, efn=None) -> dict:
    f = {"type": "bound", "dimension": dim, "ordering": ordering,
         "lowerStrict": lower_strict, "upperStrict": upper_strict}
    if lower is not None:
        f["lower"] = lower
    if upper is not None:
        f["upper"] = upper
    if efn is not None:
        f["extractionFn"] = efn
    return f


def bmatches(reg, flt):
    return filter_matches(reg, flt, datasource="boundtest")


def test_lexicographic_match_everything(spark, filtertest):
    # testLexicographicMatchEverything (vdim2/vdim3 are undeclared ->
    # all-null missing columns; (null, z) has no lower bound so null
    # rows match)
    for dim in ("dim0", "vdim0", "dim1", "vdim1", "dim2", "vdim2",
                "dim3", "vdim3"):
        assert bmatches(filtertest, bound(dim, None, "z")) == ALL8, dim


def test_lexicographic_match_with_empty_string(spark, filtertest):
    # testLexicographicMatchWithEmptyString (sqlCompatible: the ''
    # lower bound excludes null rows)
    assert bmatches(filtertest, bound("dim0", "", "z")) == ALL8
    assert bmatches(filtertest, bound("dim1", "", "z")) == ALL8
    assert bmatches(filtertest, bound("dim2", "", "z")) == \
        ["0", "2", "3", "4", "6", "7"]
    assert bmatches(filtertest, bound("dim3", "", "z")) == []


def test_lexicographic_match_null(spark, filtertest):
    # testLexicographicMatchNull
    assert bmatches(filtertest, bound("dim0", "", "")) == []
    assert bmatches(filtertest, bound("dim1", "", "")) == ["0"]
    assert bmatches(filtertest, bound("dim2", "", "")) == ["2"]


def test_lexicographic_match_missing_column(spark, filtertest):
    # testLexicographicMatchMissingColumn (sqlCompatible branches)
    assert bmatches(filtertest, bound("dim3", "", "")) == []
    assert bmatches(filtertest, bound("dim3", "", None, upper_strict=True)) == []
    assert bmatches(filtertest, bound("dim3", None, "", upper_strict=True)) == ALL8
    assert bmatches(filtertest, bound("dim3", "", "", lower_strict=True)) == []
    assert bmatches(filtertest, bound("dim3", "", "", upper_strict=True)) == []
    assert bmatches(filtertest, bound("dim3", None, "")) == ALL8


def test_lexicographic_match_too_strict(spark, filtertest):
    # testLexicographicMatchTooStrict
    assert bmatches(filtertest, bound("dim1", "abc", "abc", True, False)) == []
    assert bmatches(filtertest, bound("dim1", "abc", "abc", True, True)) == []
    assert bmatches(filtertest, bound("dim1", "abc", "abc", False, True)) == []


def test_lexicographic_match_exactly_single_value(spark, filtertest):
    # testLexicographicMatchExactlySingleValue
    assert bmatches(filtertest, bound("dim1", "abc", "abc")) == ["5"]


def test_lexicographic_match_surrounding_single_value(spark, filtertest):
    # testLexicographicMatchSurroundingSingleValue
    assert bmatches(filtertest, bound("dim1", "ab", "abd", True, True)) == ["5"]


def test_lexicographic_match_no_upper_limit(spark, filtertest):
    # testLexicographicMatchNoUpperLimit
    assert bmatches(filtertest, bound("dim1", "ab", None, True, True)) == \
        ["4", "5"]


def test_lexicographic_match_no_lower_limit(spark, filtertest):
    # testLexicographicMatchNoLowerLimit
    assert bmatches(filtertest, bound("dim1", None, "abd", True, True)) == \
        ["0", "1", "2", "3", "5", "6", "7"]


def test_lexicographic_match_numbers(spark, filtertest):
    # testLexicographicMatchNumbers ('10' is lexicographically in
    # ['1','3'])
    assert bmatches(filtertest, bound("dim1", "1", "3")) == ["1", "2", "3"]
    assert bmatches(filtertest, bound("dim1", "1", "3", True, True)) == \
        ["1", "2"]
    assert bmatches(filtertest, bound("dim1", "-1", "3", True, True)) == \
        ["1", "2", "3", "6", "7"]


def test_alphanumeric_match_null(spark, filtertest):
    # testAlphaNumericMatchNull (sqlCompatible)
    assert bmatches(filtertest, bound("dim0", "", "", ordering=ALNUM)) == []
    assert bmatches(filtertest, bound("dim1", "", "", ordering=ALNUM)) == ["0"]
    assert bmatches(filtertest, bound("dim2", "", "", ordering=ALNUM)) == ["2"]
    assert bmatches(filtertest, bound("dim3", "", "", ordering=ALNUM)) == []


def test_alphanumeric_match_too_strict(spark, filtertest):
    # testAlphaNumericMatchTooStrict
    assert bmatches(filtertest, bound("dim1", "2", "2", True, False, ALNUM)) == []
    assert bmatches(filtertest, bound("dim1", "2", "2", True, True, ALNUM)) == []
    assert bmatches(filtertest, bound("dim1", "2", "2", False, True, ALNUM)) == []


def test_alphanumeric_match_exactly_single_value(spark, filtertest):
    # testAlphaNumericMatchExactlySingleValue
    assert bmatches(filtertest, bound("dim1", "2", "2", ordering=ALNUM)) == ["2"]


def test_alphanumeric_match_surrounding_single_value(spark, filtertest):
    # testAlphaNumericMatchSurroundingSingleValue ('10' is NOT in
    # (1, 3) alphanumerically — digit runs compare as numbers)
    assert bmatches(filtertest, bound("dim1", "1", "3", True, True, ALNUM)) == \
        ["2"]


def test_alphanumeric_match_no_upper_limit(spark, filtertest):
    # testAlphaNumericMatchNoUpperLimit (text chunks sort above digit
    # chunks; '-1000' chunks as '-' + 1000)
    assert bmatches(filtertest, bound("dim1", "1", None, True, True, ALNUM)) == \
        ["1", "2", "4", "5", "6", "7"]
    assert bmatches(filtertest, bound("dim1", "-1", None, True, True, ALNUM)) == \
        ["4", "5", "6", "7"]


def test_alphanumeric_match_no_lower_limit(spark, filtertest):
    # testAlphaNumericMatchNoLowerLimit (non-digit chunks compare
    # case-insensitively: 'abdef' < 'ZZZZZ')
    assert bmatches(filtertest, bound("dim1", None, "2", True, True, ALNUM)) == \
        ["0", "3"]
    assert bmatches(filtertest,
                    bound("dim1", None, "ZZZZZ", True, True, ALNUM)) == ALL8


def test_alphanumeric_match_with_negatives(spark, filtertest):
    # testAlphaNumericMatchWithNegatives (alphanumeric has no concept
    # of negative numbers: '-' is a text chunk ABOVE digit chunks)
    assert bmatches(filtertest,
                    bound("dim1", "-2000", "3", True, True, ALNUM)) == []
    assert bmatches(filtertest,
                    bound("dim1", "3", "-2000", True, True, ALNUM)) == \
        ["1", "6", "7"]


def test_numeric_match_null(spark, filtertest):
    # testNumericMatchNull (sqlCompatible; '' is an unparseable string,
    # which sorts below every number and equals itself)
    assert bmatches(filtertest, bound("dim0", "", "", ordering=NUM)) == []
    assert bmatches(filtertest, bound("dim1", "", "", ordering=NUM)) == ["0"]
    assert bmatches(filtertest, bound("dim2", "", "", ordering=NUM)) == ["2"]
    assert bmatches(filtertest, bound("dim3", "", "", ordering=NUM)) == []


def test_numeric_match_too_strict(spark, filtertest):
    # testNumericMatchTooStrict
    assert bmatches(filtertest, bound("dim1", "2", "2", True, False, NUM)) == []
    assert bmatches(filtertest, bound("dim1", "2", "2", True, True, NUM)) == []
    assert bmatches(filtertest, bound("dim1", "2", "2", False, True, NUM)) == []


def test_numeric_match_virtual_column(spark, filtertest):
    # testNumericMatchVirtualColumn (expr = 1.1 everywhere)
    assert bmatches(filtertest, bound("expr", "1", "2", ordering=NUM)) == ALL8
    assert bmatches(filtertest, bound("expr", "2", "3", ordering=NUM)) == []


def test_list_filtered_virtual_column(spark, filtertest):
    # testListFilteredVirtualColumn
    assert bmatches(filtertest, bound("allow-dim0", "0", "2")) == []
    assert bmatches(filtertest, bound("allow-dim0", "0", "6")) == ["3", "4"]
    assert bmatches(filtertest, bound("deny-dim0", "0", "6")) == \
        ["0", "1", "2", "5", "6"]
    assert bmatches(filtertest, bound("deny-dim0", "3", "4")) == []

    assert bmatches(filtertest, bound("allow-dim2", "a", "c")) == \
        ["0", "3", "6"]
    assert bmatches(filtertest, bound("allow-dim2", "c", "z")) == []
    assert bmatches(filtertest,
                    bound("deny-dim2", "a", "b", upper_strict=True)) == []
    assert bmatches(filtertest, bound("deny-dim2", "c", "z")) == ["4", "7"]


def test_numeric_match_exactly_single_value(spark, filtertest):
    # testNumericMatchExactlySingleValue
    assert bmatches(filtertest, bound("dim1", "2", "2", ordering=NUM)) == ["2"]
    assert bmatches(filtertest,
                    bound("dim1", "-10.012", "-10.012", ordering=NUM)) == ["7"]


def test_numeric_match_surrounding_single_value(spark, filtertest):
    # testNumericMatchSurroundingSingleValue
    assert bmatches(filtertest, bound("dim1", "1", "3", True, True, NUM)) == \
        ["2"]
    assert bmatches(filtertest, bound("dim1", "-11", "-10", ordering=NUM)) == \
        ["7"]


def test_numeric_match_no_upper_limit(spark, filtertest):
    # testNumericMatchNoUpperLimit (unparseable strings are BELOW every
    # number, so they fail the lower bound)
    assert bmatches(filtertest, bound("dim1", "1", None, True, True, NUM)) == \
        ["1", "2"]


def test_numeric_match_no_lower_limit(spark, filtertest):
    # testNumericMatchNoLowerLimit (unparseable strings match any
    # numeric upper bound)
    assert bmatches(filtertest, bound("dim1", None, "2", True, True, NUM)) == \
        ["0", "3", "4", "5", "6", "7"]


def test_numeric_match_with_negatives(spark, filtertest):
    # testNumericMatchWithNegatives
    assert bmatches(filtertest,
                    bound("dim1", "-2000", "3", True, True, NUM)) == \
        ["2", "3", "6", "7"]


def test_match_with_extraction_fn(spark, filtertest):
    # testMatchWithExtractionFn (sqlCompatible branches; see module
    # docstring for the JS-fn substitutions)
    assert bmatches(filtertest, bound("dim0", "", "", efn=NULL_FN)) == []
    assert bmatches(filtertest,
                    bound("dim1", "super-ab", "super-abd", True, True,
                          LEX, SUPER_FN)) == ["5"]
    assert bmatches(filtertest,
                    bound("dim1", "super-0", "super-10", False, False,
                          ALNUM, SUPER_FN)) == ["1", "2", "3"]
    assert bmatches(filtertest,
                    bound("dim2", "super-", "super-zzzzzz", False, False,
                          LEX, SUPER_FN)) == ALL8
    assert bmatches(filtertest,
                    bound("dim2", "super-null", "super-null", False, False,
                          LEX, SUPER_FN)) == ["1", "5"]
    assert bmatches(filtertest,
                    bound("dim2", "super-", "super-", False, False,
                          NUM, SUPER_FN)) == ["2"]
    assert bmatches(filtertest,
                    bound("dim3", "super-null", "super-null", False, False,
                          LEX, SUPER_FN)) == ALL8
    assert bmatches(filtertest,
                    bound("dim4", "super-null", "super-null", False, False,
                          LEX, SUPER_FN)) == ALL8
    assert bmatches(filtertest,
                    bound("dim4", "super-null", "super-null", False, False,
                          NUM, SUPER_FN)) == ALL8


def test_numeric_nulls_and_zeros(spark, filtertest):
    # testNumericNullsAndZeros (sqlCompatible: the null rows never
    # match a both-bounded numeric filter)
    assert bmatches(filtertest, bound("d0", "0.0", "1.0", ordering=NUM)) == ["0"]
    assert bmatches(filtertest, bound("f0", "0.0", "1.0", ordering=NUM)) == ["0"]
    assert bmatches(filtertest, bound("l0", "0.0", "1.0", ordering=NUM)) == ["0"]


def test_virtual_numeric_nulls_and_zeros(spark, filtertest):
    # testVirtualNumericNullsAndZeros
    assert bmatches(filtertest, bound("vd0", "0.0", "1.0", ordering=NUM)) == ["0"]
    assert bmatches(filtertest, bound("vf0", "0.0", "1.0", ordering=NUM)) == ["0"]
    assert bmatches(filtertest, bound("vl0", "0.0", "1.0", ordering=NUM)) == ["0"]


def test_numeric_nulls(spark, filtertest):
    # testNumericNulls
    assert bmatches(filtertest, bound("f0", "1.0", None, ordering=NUM)) == \
        ["1", "2", "3", "5", "7"]
    assert bmatches(filtertest, bound("d0", "1", None, ordering=NUM)) == \
        ["1", "3", "4", "5", "6"]
    assert bmatches(filtertest, bound("l0", "1", None, ordering=NUM)) == \
        ["1", "2", "4", "5", "6"]
