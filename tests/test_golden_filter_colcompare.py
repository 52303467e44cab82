"""Golden tests ported from the reference's
ColumnComparisonFilterTest.java (processing/src/test/java/org/apache/
druid/segment/filter/, 4 @Test methods) over its own 10-row fixture
(ColumnComparisonFilterTest.java:65-76; dim2 multi-value, rows 6-9
omit columns, rows 8/9 ingest numeric values into string dims).

3/4 ported (sqlCompatible branches); testEqualsContract is a JVM
Object.equals contract (skip bucket). The ColumnComparisonFilter
contract: every PAIR of dimensions must share an element under
null-safe equality, with a null/empty multi-value row reading as
{null} (ColumnComparisonFilter.java:111-133 'overlap').
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2000, 1, 1)

# dim1 values 8L / 1.234f ingest into a STRING dimension as their
# stringified forms; row 9's scalar dim2 ingests as a one-element MV
ROWS = [
    (TS, "0", "", ["1", "2"]),
    (TS, "1", "10", []),
    (TS, "2", "2", [""]),
    (TS, "3", "1", ["3"]),
    (TS, "4", "1", ["4", "5"]),
    (TS, "5", "5", ["4", "5"]),
    (TS, "6", "1", None),
    (TS, "7", "a", None),
    (TS, "8", "8", None),
    (TS, "9", "1.234", ["1.234"]),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.ArrayType(T.StringType())),
])

ALL10 = [str(i) for i in range(10)]


@pytest.fixture(scope="session")
def colcmp(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("colcmp", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def cc_matches(reg, dims) -> list[str]:
    q = {"queryType": "scan", "dataSource": "colcmp",
         "intervals": ["1970-01-01/2021-01-01"],
         "columns": ["dim0"],
         "filter": {"type": "columnComparison", "dimensions": dims}}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def test_columns_without_nulls(spark, colcmp):
    # testColumnsWithoutNulls
    assert cc_matches(colcmp, ["dim0", "dim1"]) == ["2", "5", "8"]
    assert cc_matches(colcmp, ["dim0", "dim2"]) == ["3", "4", "5"]
    assert cc_matches(colcmp, ["dim1", "dim2"]) == ["5", "9"]
    assert cc_matches(colcmp, ["dim0", "dim1", "dim2"]) == ["5"]


def test_missing_column_not_specified_in_dimension_list(spark, colcmp):
    # testMissingColumnNotSpecifiedInDimensionList (sqlCompatible: ''
    # is not equivalent to a missing dimension)
    assert cc_matches(colcmp, ["dim6", "dim7"]) == ALL10
    assert cc_matches(colcmp, ["dim1", "dim6"]) == []
    assert cc_matches(colcmp, ["dim2", "dim6"]) == ["1", "6", "7", "8"]
    assert cc_matches(colcmp, ["dim1", "dim6"]) == []
    assert cc_matches(colcmp, ["dim2", "dim6"]) == ["1", "6", "7", "8"]


def test_selector_with_lookup_extraction_fn(spark, colcmp):
    # testSelectorWithLookupExtractionFn: lookup {a: 7} with
    # retainMissingValue bridges dim1 'a' to dim0 '7'
    fn = {"type": "lookup", "lookup": {"type": "map", "map": {"a": "7"}},
          "retainMissingValue": True, "injective": True, "optimize": True}
    assert cc_matches(colcmp, [
        {"type": "extraction", "dimension": "dim0", "outputName": "dim0",
         "extractionFn": fn},
        {"type": "extraction", "dimension": "dim1", "outputName": "dim1",
         "extractionFn": fn},
    ]) == ["2", "5", "7", "8"]
