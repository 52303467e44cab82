"""Golden tests ported from the reference's MultiValuedDimensionTest.java
(processing/src/test/java/org/apache/druid/query/, 23 @Test methods)
over its two fixtures (MultiValuedDimensionTest.java:154-208): the
4-row TSV corpus ('xx': product, MV tags, MV othertags; groupBy runs on
the segment DUPLICATED so counts double; topN runs on one copy) and the
8-row JSON null-sampler (rows omitting keys / [] / ['']).

14/23 ported (sqlCompatible branches; r14 closed
testGroupByExpressionArrayExpressionFilter and
testGroupByExpressionFoldArrayToStringWithConcats). Skip buckets,
full names for grep:
- the schema-auto-discovery / pre-0.23-flag ingest-mode twins of the
  ported methods: testGroupByExpressionAuto,
  testGroupByExpressionAutoArrayFnArg,
  testGroupByExpressionMultiMultiAuto,
  testGroupByExpressionMultiMultiAutoAuto,
  testGroupByExpressionMultiMultiAutoAutoWithFilter,
  testGroupByExpressionMultiMultiBackwardsCompat0dot22andOlder — they
  re-run the SAME value contracts under ingestion-mode variants;
- testGroupByExpressionMultiConflicting and
  testGroupByExpressionMultiConflictingAlso pin the reference
  PARSER'S rejection of using one identifier as both scalar and array
  ('[tags] used as both scalar and array variables') — this engine's
  translator follows Spark's typing instead (documented divergence:
  such expressions fail Spark analysis rather than Druid's parse);
- testGroupByExpressionMultiMultiAutoAutoDupeIdentifier reuses one
  lambda identifier, covered by the ported ArrayFnArg shadowing pin.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

D = datetime

XX_ROWS = [
    (D(2011, 1, 12), "product_1", ["t1", "t2", "t3"], ["u1", "u2"]),
    (D(2011, 1, 13), "product_2", ["t3", "t4", "t5"], ["u3", "u4"]),
    (D(2011, 1, 14), "product_3", ["t5", "t6", "t7"], ["u1", "u5"]),
    (D(2011, 1, 14), "product_4", [""], ["u2"]),
]

NULLS_ROWS = [
    (D(2011, 1, 13), "product_1", [], ["u1", "u2"]),
    (D(2011, 1, 12), "product_2", None, ["u3", "u4"]),
    (D(2011, 1, 14), "product_3", [""], ["u1", "u5"]),
    (D(2011, 1, 15), "product_4", ["t1", "t2", ""], ["u6", "u7"]),
    (D(2011, 1, 16), "product_5", [], []),
    (D(2011, 1, 16), "product_6", None, None),
    (D(2011, 1, 16), "product_7", None, []),
    (D(2011, 1, 16), "product_8", [""], []),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("product", T.StringType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("othertags", T.ArrayType(T.StringType())),
])

FULL = ["1970-01-01/3000-01-01"]


@pytest.fixture(scope="session")
def mvdim(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    xx = spark.createDataFrame(XX_ROWS, SCHEMA)
    reg.register("xx", xx.union(xx).cache())        # two segments
    reg.register("xx1", xx.cache())                 # single segment
    nulls = spark.createDataFrame(NULLS_ROWS, SCHEMA)
    reg.register("xxnulls", nulls.union(nulls).cache())
    return reg


def gb(reg, ds="xx", dim="tags", filt=None, vcs=None, limit=None):
    q = {"queryType": "groupBy", "dataSource": ds, "granularity": "all",
         "intervals": FULL,
         "dimensions": [dim] if isinstance(dim, str) else [dim],
         "aggregations": [{"type": "count", "name": "count"}]}
    if filt:
        q["filter"] = filt
    if vcs:
        q["virtualColumns"] = vcs
    if limit is not None:
        q["limitSpec"] = {"type": "default", "limit": limit,
                          "columns": [{"dimension": q["dimensions"][0]
                                       if isinstance(dim, str)
                                       else dim["outputName"]}]}
    name = dim if isinstance(dim, str) else dim["outputName"]
    rows = compile_query(q, reg).collect()
    if limit is not None:
        return [(r[name], r["count"]) for r in rows]
    return sorted(((r[name], r["count"]) for r in rows),
                  key=lambda t: (t[0] is not None, t[0] or ""))


def test_group_by_no_filter(spark, mvdim):
    # testGroupByNoFilter (sqlCompatible: the [''] row is the '' bucket)
    assert gb(mvdim) == [
        ("", 2), ("t1", 2), ("t2", 2), ("t3", 4), ("t4", 2), ("t5", 4),
        ("t6", 2), ("t7", 2)]


def test_group_by_with_dim_filter(spark, mvdim):
    # testGroupByWithDimFilter: the t3 filter keeps whole ROWS, their
    # other tags still explode
    flt = {"type": "selector", "dimension": "tags", "value": "t3"}
    assert gb(mvdim, filt=flt) == [
        ("t1", 2), ("t2", 2), ("t3", 4), ("t4", 2), ("t5", 2)]


def test_group_by_with_dim_filter_empty_results(spark, mvdim):
    # testGroupByWithDimFilterEmptyResults: product_5's [] tags group
    # into the null bucket
    flt = {"type": "in", "dimension": "product", "values": ["product_5"]}
    assert gb(mvdim, ds="xxnulls", filt=flt) == [(None, 2)]


def test_group_by_with_dim_filter_nullish_results(spark, mvdim):
    # testGroupByWithDimFilterNullishResults (sqlCompatible: null and
    # [] group as null, [''] is the '' bucket)
    flt = {"type": "in", "dimension": "product",
           "values": ["product_5", "product_6", "product_8"]}
    assert gb(mvdim, ds="xxnulls", filt=flt) == [(None, 4), ("", 2)]


def test_group_by_with_dim_filter_and_filtered_dim_spec(spark, mvdim):
    # testGroupByWithDimFilterAndWithFilteredDimSpec
    dim = {"type": "regexFiltered",
           "delegate": {"type": "default", "dimension": "tags",
                        "outputName": "tags"},
           "pattern": "t3", "outputName": "tags"}
    flt = {"type": "selector", "dimension": "tags", "value": "t3"}
    assert gb(mvdim, dim=dim, filt=flt) == [("t3", 4)]


def test_group_by_expression(spark, mvdim):
    # testGroupByExpression: map(x -> concat(x, 'foo'), tags)
    vcs = [{"type": "expression", "name": "texpr",
            "expression": "map(x -> concat(x, 'foo'), tags)",
            "outputType": "STRING"}]
    assert gb(mvdim, dim="texpr", vcs=vcs) == [
        ("foo", 2), ("t1foo", 2), ("t2foo", 2), ("t3foo", 4),
        ("t4foo", 2), ("t5foo", 4), ("t6foo", 2), ("t7foo", 2)]


def test_group_by_expression_multi_multi(spark, mvdim):
    # testGroupByExpressionMultiMulti: cartesian_map over two MV
    # columns, limit 5 in dimension order
    vcs = [{"type": "expression", "name": "texpr",
            "expression": "cartesian_map((x,y) -> concat(x, y), tags,"
                          " othertags)",
            "outputType": "STRING"}]
    assert gb(mvdim, dim="texpr", vcs=vcs, limit=5) == [
        ("t1u1", 2), ("t1u2", 2), ("t2u1", 2), ("t2u2", 2), ("t3u1", 2)]


def test_group_by_expression_array_fn_arg(spark, mvdim):
    # testGroupByExpressionArrayFnArg: the lambda parameter SHADOWS the
    # column name it reads from
    vcs = [{"type": "expression", "name": "tt",
            "expression": "array_to_string(map(tags -> concat('foo',"
                          " tags), tags), ', ')",
            "outputType": "STRING"}]
    assert gb(mvdim, dim="tt", vcs=vcs) == [
        ("foo", 2), ("foot1, foot2, foot3", 2), ("foot3, foot4, foot5", 2),
        ("foot5, foot6, foot7", 2)]


def test_group_by_expression_fold_array_to_string(spark, mvdim):
    # testGroupByExpressionFoldArrayToString: fold((tag, acc) -> ...)
    vcs = [{"type": "expression", "name": "tt",
            "expression": "fold((tag, acc) -> concat(acc, tag), tags,"
                          " '')",
            "outputType": "STRING"}]
    assert gb(mvdim, dim="tt", vcs=vcs) == [
        ("", 2), ("t1t2t3", 2), ("t3t4t5", 2), ("t5t6t7", 2)]


def topn(reg, dim, vcs=None, filt=None, threshold=5):
    q = {"queryType": "topN", "dataSource": "xx1", "granularity": "all",
         "intervals": FULL, "dimension": dim, "metric": "count",
         "threshold": threshold,
         "aggregations": [{"type": "count", "name": "count"}]}
    if vcs:
        q["virtualColumns"] = vcs
    if filt:
        q["filter"] = filt
    name = dim if isinstance(dim, str) else dim["outputName"]
    return [(r[name], r["count"]) for r in compile_query(q, reg).collect()]


def test_topn_with_dim_filter_and_filtered_dim_spec(spark, mvdim):
    # testTopNWithDimFilterAndWithFilteredDimSpec (single segment)
    dim = {"type": "listFiltered",
           "delegate": {"type": "default", "dimension": "tags",
                        "outputName": "tags"},
           "values": ["t3"], "outputName": "tags"}
    flt = {"type": "selector", "dimension": "tags", "value": "t3"}
    assert topn(mvdim, dim, filt=flt) == [("t3", 2)]


def test_topn_expression(spark, mvdim):
    # testTopNExpression (single segment; ties in dimension order)
    vcs = [{"type": "expression", "name": "texpr",
            "expression": "map(x -> concat(x, 'foo'), tags)",
            "outputType": "STRING"}]
    assert topn(mvdim, {"type": "default", "dimension": "texpr",
                        "outputName": "texpr"},
                vcs=vcs, threshold=15) == [
        ("t3foo", 2), ("t5foo", 2), ("foo", 1), ("t1foo", 1),
        ("t2foo", 1), ("t4foo", 1), ("t6foo", 1), ("t7foo", 1)]


def test_topn_expression_auto_transform(spark, mvdim):
    # testTopNExpressionAutoTransform: a SCALAR expression over an MV
    # column maps per element
    vcs = [{"type": "expression", "name": "texpr",
            "expression": "concat(tags, 'foo')",
            "outputType": "STRING"}]
    assert topn(mvdim, {"type": "default", "dimension": "texpr",
                        "outputName": "texpr"},
                vcs=vcs, threshold=15) == [
        ("t3foo", 2), ("t5foo", 2), ("foo", 1), ("t1foo", 1),
        ("t2foo", 1), ("t4foo", 1), ("t6foo", 1), ("t7foo", 1)]


def test_group_by_expression_array_expression_filter(spark, mvdim):
    # testGroupByExpressionArrayExpressionFilter (r14): a LONG-typed
    # expression dim — array_offset_of(tags, 't2') — groups the rows
    # without t2 under NULL (SQL mode) and the one row carrying it at
    # offset 1; duplicated-segment counts
    dim = {"type": "default", "dimension": "tt", "outputName": "tt",
           "outputType": "LONG"}
    vcs = [{"type": "expression", "name": "tt",
            "expression": "array_offset_of(tags, 't2')",
            "outputType": "LONG"}]
    assert gb(mvdim, dim=dim, vcs=vcs) == [(None, 6), (1, 2)]


def test_group_by_expression_fold_array_to_string_with_concats(
        spark, mvdim):
    # testGroupByExpressionFoldArrayToStringWithConcats (r14): the
    # fold builds a 'foo'-prefixed comma list with a case_searched
    # separator — the empty-string MV row folds to bare 'foo'
    vcs = [{"type": "expression", "name": "tt",
            "expression": "fold((tag, acc) -> concat(concat(acc,"
                          " case_searched(acc == '', '', ', '),"
                          " concat('foo', tag))), tags, '')",
            "outputType": "STRING"}]
    assert gb(mvdim, dim="tt", vcs=vcs) == [
        ("foo", 2), ("foot1, foot2, foot3", 2),
        ("foot3, foot4, foot5", 2), ("foot5, foot6, foot7", 2)]
