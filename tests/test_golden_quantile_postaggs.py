"""Golden tests ported from the reference's DoublesSketch
post-aggregator suites (extensions-core/datasketches/src/test/java/org/
apache/druid/query/aggregation/datasketches/quantiles/DoublesSketchTo
{Quantile,Quantiles,Rank,CDF,Histogram}PostAggregatorTest.java —
the normalCase/splitPoints value methods; the serde/toString/equals/
comparator/resultArraySignature methods are JVM contracts, and
emptySketch's NaN is unreachable through a real query, which never
produces an empty per-group sketch).

The reference finalizes a DoublesSketch per group with these
post-aggregators; this engine fuses each one into a direct aggregate
at aggregation time (sort-based exact percentile / conditional
counts — synthesize_quantile_postaggs in operators/aggregations.py),
a strict-accuracy upgrade with identical contracts on these fixtures:
rank is the EXCLUSIVE mass below the value, CDF appends the trailing
1.0, the histogram's outer bins are open-ended.

Unlike the reference's unit harness, these run END-TO-END through
timeseries and grouped groupBy queries.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2020, 1, 1)


@pytest.fixture(scope="session")
def qsk(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    rows = [(TS, "a", float(i)) for i in range(1, 7)] + \
           [(TS, "b", float(i)) for i in range(1, 6)]
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    reg = DatasourceRegistry(spark)
    reg.register("qsk", spark.createDataFrame(rows, schema).cache())
    return reg


def ts_query(reg, postaggs, filt=None):
    q = {"queryType": "timeseries", "dataSource": "qsk",
         "granularity": "all", "intervals": ["2019-01-01/2021-01-01"],
         "aggregations": [{"type": "quantilesDoublesSketch",
                           "name": "sketch", "fieldName": "v", "k": 128}],
         "postAggregations": postaggs}
    if filt:
        q["filter"] = filt
    rows = compile_query(q, reg).collect()
    assert len(rows) == 1
    return rows[0]


FLT_A = {"type": "selector", "dimension": "g", "value": "a"}
FLT_B = {"type": "selector", "dimension": "g", "value": "b"}


def field(name):
    return {"type": "fieldAccess", "fieldName": name}


def test_to_rank_normal_case(spark, qsk):
    # DoublesSketchToRankPostAggregatorTest.normalCase: rank of 4 over
    # {1..6} is 0.5 (exclusive mass below)
    r = ts_query(qsk, [{"type": "quantilesDoublesSketchToRank",
                        "name": "rank", "field": field("sketch"),
                        "value": 4}], FLT_A)
    assert r["rank"] == pytest.approx(0.5)


def test_to_cdf_normal_case(spark, qsk):
    # DoublesSketchToCDFPostAggregatorTest.normalCase: split [4] over
    # {1..6} -> [0.5, 1.0]
    r = ts_query(qsk, [{"type": "quantilesDoublesSketchToCDF",
                        "name": "cdf", "field": field("sketch"),
                        "splitPoints": [4]}], FLT_A)
    assert r["cdf"] == [pytest.approx(0.5), pytest.approx(1.0)]


def test_to_histogram_split_points(spark, qsk):
    # DoublesSketchToHistogramPostAggregatorTest.splitPoints: the 3.5
    # split halves {1..6} into two bins of mass 3
    r = ts_query(qsk, [{"type": "quantilesDoublesSketchToHistogram",
                        "name": "histogram", "field": field("sketch"),
                        "splitPoints": [3.5]}], FLT_A)
    assert r["histogram"] == [3.0, 3.0]


def test_to_quantiles_normal_case(spark, qsk):
    # DoublesSketchToQuantilesPostAggregatorTest.normalCase: fractions
    # [0, 0.5, 1] over {1..5} -> [1, 3, 5]
    r = ts_query(qsk, [{"type": "quantilesDoublesSketchToQuantiles",
                        "name": "quantiles", "field": field("sketch"),
                        "fractions": [0, 0.5, 1]}], FLT_B)
    assert r["quantiles"] == [1.0, 3.0, 5.0]


def test_to_quantile(spark, qsk):
    # the single-fraction form (DoublesSketchToQuantilePostAggregator —
    # its own suite carries only serde/equals contracts; the value
    # semantics are the fractions=[0.5] slice of ToQuantiles)
    r = ts_query(qsk, [{"type": "quantilesDoublesSketchToQuantile",
                        "name": "median", "field": field("sketch"),
                        "fraction": 0.5}], FLT_B)
    assert r["median"] == 3.0


def test_grouped_fusion(spark, qsk):
    # the fused aggregates stay per-GROUP in a groupBy (one shuffle,
    # no sketch state carried)
    q = {"queryType": "groupBy", "dataSource": "qsk",
         "granularity": "all", "intervals": ["2019-01-01/2021-01-01"],
         "dimensions": ["g"],
         "aggregations": [{"type": "quantilesDoublesSketch",
                           "name": "sketch", "fieldName": "v"}],
         "postAggregations": [
             {"type": "quantilesDoublesSketchToRank", "name": "rank",
              "field": field("sketch"), "value": 4},
             {"type": "quantilesDoublesSketchToQuantiles",
              "name": "qs", "field": field("sketch"),
              "fractions": [0, 1]},
         ]}
    got = {r["g"]: (r["rank"], r["qs"])
           for r in compile_query(q, qsk).collect()}
    assert got["a"][0] == pytest.approx(0.5)
    assert got["a"][1] == [1.0, 6.0]
    assert got["b"][0] == pytest.approx(0.6)
    assert got["b"][1] == [1.0, 5.0]
