"""Golden tests ported from the reference's
StringColumnAggregationTest.java (processing/src/test/java/org/apache/
druid/query/aggregation/, 2 @Test methods, both ported).

Numeric aggregators over a STRING column parse the value ('1.0' sums
as 1.0, longSum truncates through double), and over a MULTI-VALUE
column EVERY element contributes (the fixture's [v, null, v] rows add
2v per row, null elements skipped). The fixture ingests the arithmetic
progression '1.0'..'10.0' into both columns and runs on the segment
DUPLICATED (two identical segments), so counts and sums double:
n=10, numRows=20, singleSum=n*(n+1)=110, multiSum=2*n*(n+1)=220.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2020, 1, 1)

ROWS = [(TS, str(i * 1.0), [str(i * 1.0), None, str(i * 1.0)])
        for i in range(1, 11)]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("singleValue", T.StringType()),
    T.StructField("multiValue", T.ArrayType(T.StringType())),
])

AGGS = [
    {"type": "doubleSum", "name": "singleDoubleSum", "fieldName": "singleValue"},
    {"type": "doubleSum", "name": "multiDoubleSum", "fieldName": "multiValue"},
    {"type": "doubleMax", "name": "singleDoubleMax", "fieldName": "singleValue"},
    {"type": "doubleMax", "name": "multiDoubleMax", "fieldName": "multiValue"},
    {"type": "doubleMin", "name": "singleDoubleMin", "fieldName": "singleValue"},
    {"type": "doubleMin", "name": "multiDoubleMin", "fieldName": "multiValue"},
    {"type": "floatSum", "name": "singleFloatSum", "fieldName": "singleValue"},
    {"type": "floatSum", "name": "multiFloatSum", "fieldName": "multiValue"},
    {"type": "floatMax", "name": "singleFloatMax", "fieldName": "singleValue"},
    {"type": "floatMax", "name": "multiFloatMax", "fieldName": "multiValue"},
    {"type": "floatMin", "name": "singleFloatMin", "fieldName": "singleValue"},
    {"type": "floatMin", "name": "multiFloatMin", "fieldName": "multiValue"},
    {"type": "longSum", "name": "singleLongSum", "fieldName": "singleValue"},
    {"type": "longSum", "name": "multiLongSum", "fieldName": "multiValue"},
    {"type": "longMax", "name": "singleLongMax", "fieldName": "singleValue"},
    {"type": "longMax", "name": "multiLongMax", "fieldName": "multiValue"},
    {"type": "longMin", "name": "singleLongMin", "fieldName": "singleValue"},
    {"type": "longMin", "name": "multiLongMin", "fieldName": "multiValue"},
    {"type": "count", "name": "count"},
]

N = 10
EXPECT = {
    "count": 2 * N,
    "singleDoubleSum": float(N * (N + 1)), "multiDoubleSum": float(2 * N * (N + 1)),
    "singleDoubleMax": float(N), "multiDoubleMax": float(N),
    "singleDoubleMin": 1.0, "multiDoubleMin": 1.0,
    "singleFloatSum": float(N * (N + 1)), "multiFloatSum": float(2 * N * (N + 1)),
    "singleFloatMax": float(N), "multiFloatMax": float(N),
    "singleFloatMin": 1.0, "multiFloatMin": 1.0,
    "singleLongSum": N * (N + 1), "multiLongSum": 2 * N * (N + 1),
    "singleLongMax": N, "multiLongMax": N,
    "singleLongMin": 1, "multiLongMin": 1,
}


@pytest.fixture(scope="session")
def stragg(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    df = spark.createDataFrame(ROWS, SCHEMA)
    reg = DatasourceRegistry(spark)
    reg.register("stragg", df.union(df).cache())  # duplicated segment
    return reg


def _check(row):
    for k, v in EXPECT.items():
        got = row[k]
        assert got == pytest.approx(v, abs=1e-4), (k, got, v)


def test_group_by(spark, stragg):
    # testGroupBy
    q = {"queryType": "groupBy", "dataSource": "stragg",
         "granularity": "all", "intervals": ["1970-01-01/2050-01-01"],
         "aggregations": AGGS}
    rows = compile_query(q, stragg).collect()
    assert len(rows) == 1
    _check(rows[0])


def test_timeseries(spark, stragg):
    # testTimeseries
    q = {"queryType": "timeseries", "dataSource": "stragg",
         "granularity": "all", "intervals": ["1970-01-01/2050-01-01"],
         "aggregations": AGGS}
    rows = compile_query(q, stragg).collect()
    assert len(rows) == 1
    _check(rows[0])
