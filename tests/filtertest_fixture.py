"""The reference's BaseFilterTest fixture (processing/src/test/java/org/
apache/druid/segment/filter/BaseFilterTest.java:119-175) as a registered
datasource 'filtertest', for porting the segment/filter/*FilterTest value
contracts (SelectorFilterTest, BoundFilterTest, InFilterTest, ...).

DEFAULT_ROWS (BaseFilterTest.java:168-175): six rows keyed by dim0, with
a string dim1, a MULTI-VALUE dim2 (Druid ingests [] as a no-value row),
a date-string timeDim, and typed numeric columns d0/f0/l0 that carry
real nulls. The 'timestamp' input column is absent from every row, so
DEFAULT_TIMESTAMP_SPEC's missing-value default (DateTimes.of("2000"))
stamps all six rows at 2000-01-01.

VIRTUAL_COLUMNS (BaseFilterTest.java:122-137): the expression virtual
columns (expr/exprDouble/exprLong, vdim0/vdim1, vd0/vf0/vl0) plus the
four ListFilteredVirtualColumns (allow-dim0/deny-dim0 over the scalar
dim0, allow-dim2/deny-dim2 over the multi-value dim2).

assertFilterMatches(filter, expected) becomes: run a scan query with
these virtual columns + the filter through the public compile_query
path, collect dim0, compare sorted. Null-handling expectations follow
the suite's NullHandling.sqlCompatible() branches (SURVEY.md: this
engine is SQL-compatible-mode only, by design).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2000, 1, 1)

ROWS = [
    (TS, "0", "", ["a", "b"], "2017-07-25", 0.0, 0.0, 0),
    (TS, "1", "10", [], "2017-07-25", 10.1, 10.1, 100),
    (TS, "2", "2", [""], "2017-05-25", None, 5.5, 40),
    (TS, "3", "1", ["a"], "2020-01-25", 120.0245, 110.0, None),
    (TS, "4", "abdef", ["c"], None, 60.0, None, 9001),
    (TS, "5", "abc", None, "2020-01-25", 765.432, 123.45, 12345),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.ArrayType(T.StringType())),
    T.StructField("timeDim", T.StringType()),
    T.StructField("d0", T.DoubleType()),
    T.StructField("f0", T.FloatType()),
    T.StructField("l0", T.LongType()),
])

VIRTUAL_COLUMNS = [
    {"type": "expression", "name": "expr", "expression": "1.0 + 0.1",
     "outputType": "FLOAT"},
    {"type": "expression", "name": "exprDouble", "expression": "1.0 + 1.1",
     "outputType": "DOUBLE"},
    {"type": "expression", "name": "exprLong", "expression": "1 + 2",
     "outputType": "LONG"},
    {"type": "expression", "name": "vdim0", "expression": "dim0",
     "outputType": "STRING"},
    {"type": "expression", "name": "vdim1", "expression": "dim1",
     "outputType": "STRING"},
    {"type": "expression", "name": "vd0", "expression": "d0",
     "outputType": "DOUBLE"},
    {"type": "expression", "name": "vf0", "expression": "f0",
     "outputType": "FLOAT"},
    {"type": "expression", "name": "vl0", "expression": "l0",
     "outputType": "LONG"},
    {"type": "listFiltered", "name": "allow-dim0", "delegate": "dim0",
     "values": ["3", "4"], "isAllowList": True},
    {"type": "listFiltered", "name": "deny-dim0", "delegate": "dim0",
     "values": ["3", "4"], "isAllowList": False},
    {"type": "listFiltered", "name": "allow-dim2", "delegate": "dim2",
     "values": ["a"], "isAllowList": True},
    {"type": "listFiltered", "name": "deny-dim2", "delegate": "dim2",
     "values": ["a"], "isAllowList": False},
]

FULL_ON = ["1970-01-01/2021-01-01"]

# BoundFilterTest.java:52-57 extends DEFAULT_ROWS with two rows whose
# dim1 holds negative numeric strings
BOUND_ROWS = ROWS + [
    (TS, "6", "-1000", ["a"], None, 6.6, None, 10),
    (TS, "7", "-10.012", ["d"], None, None, 3.0, None),
]


@pytest.fixture(scope="session")
def filtertest(spark):
    """DEFAULT_ROWS registered as 'filtertest', BOUND_ROWS as 'boundtest'."""
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("filtertest", spark.createDataFrame(ROWS, SCHEMA).cache())
    reg.register("boundtest",
                 spark.createDataFrame(BOUND_ROWS, SCHEMA).cache())
    return reg


def filter_matches(registry, flt, virtual_columns=None,
                   datasource="filtertest") -> list[str]:
    """assertFilterMatches analog: dim0 of the rows the filter keeps."""
    q = {
        "queryType": "scan",
        "dataSource": datasource,
        "intervals": FULL_ON,
        "virtualColumns": VIRTUAL_COLUMNS if virtual_columns is None
        else virtual_columns,
        "columns": ["dim0"],
        "filter": flt,
    }
    df = compile_query(q, registry)
    return sorted(r["dim0"] for r in df.collect())


def sel(dim, value, efn=None) -> dict:
    """SelectorDimFilter JSON."""
    f = {"type": "selector", "dimension": dim, "value": value}
    if efn is not None:
        f["extractionFn"] = efn
    return f
