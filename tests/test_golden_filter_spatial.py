"""Golden tests ported from the reference's SpatialFilterTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 5 @Test
methods; SpatialFilterBonusTest.java is the same fixture/methods minus
the second spatial dimension).

4 ported (testSpatialQuery, testSpatialQueryWithOtherSpatialDim,
testSpatialQueryMorePoints, and SpatialFilterBonusTest's
testSpatialQueryFilteredAggregator — r14); the remaining
testEqualsContractForBoundDruidPredicateFactory is a JVM Object.equals
contract (EqualsVerifier), no row semantics to port — same bucket as
RegexFilterTest.testEqualsContractForPatternDruidPredicateFactory and
SearchQueryFilterTest.testEqualsContractForSearchQueryDruidPredicateFactory,
whose row semantics live in the regex/search golden modules. The fixture (SpatialFilterTest.java:267-380):
eight deterministic rows — five real points, one row whose lat/long
fail spatial ingestion (dim.geo null), one row with an unparseable
raw dim.geo value, one point on the SECOND spatial dim (spatialIsRad)
— plus far-away noise points (lat/long in [10,20)) that no query
bound reaches. Spatial dims ingest as 'lat,long' joined strings
(SpatialDimensionRowTransformer), which is also this engine's
encoding; the noise rows are deterministic stand-ins for the
reference's random ones (any value in [10,20) is outside every bound
asserted).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

D = datetime

ROWS = [
    (D(2013, 1, 1), "foo", "0.0,0.0", None, 17),
    (D(2013, 1, 2), "foo", "1.0,3.0", None, 29),
    (D(2013, 1, 3), "foo", "4.0,2.0", None, 13),
    (D(2013, 1, 4), "foo", "7.0,3.0", None, 91),
    (D(2013, 1, 5), "foo", "8.0,6.0", None, 47),
    (D(2013, 1, 5), "foo", None, None, 101),          # lat/long unparseable
    (D(2013, 1, 5), "foo", "_mmx.unknown", None, 501),  # raw junk value
    (D(2013, 1, 5), None, None, "0.0,0.0", 13),        # second spatial dim
] + [
    (D(2013, 1, 1), "boo", f"{10.0 + i * 0.7:.1f},{10.0 + i * 0.9:.1f}",
     None, i)
    for i in range(8, 20)
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim", T.StringType()),
    T.StructField("dim.geo", T.StringType()),
    T.StructField("spatialIsRad", T.StringType()),
    T.StructField("val", T.LongType()),
])


@pytest.fixture(scope="session")
def spatialtest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("spatialtest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def ts_query(reg, flt, granularity="all"):
    q = {"queryType": "timeseries", "dataSource": "spatialtest",
         "granularity": granularity,
         "intervals": ["2013-01-01/2013-01-07"],
         "filter": flt,
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "longSum", "name": "val", "fieldName": "val"},
         ]}
    out = compile_query(q, reg).collect()
    return [(r["__time"], r["rows"], r["val"]) for r in out]


def test_spatial_query(spark, spatialtest):
    # testSpatialQuery: radius 5 around the origin hits (0,0), (1,3),
    # (4,2). Granularity-ALL buckets carry no __time in this engine
    # (same convention as the timeseries runner port).
    flt = {"type": "spatial", "dimension": "dim.geo",
           "bound": {"type": "radius", "coords": [0.0, 0.0], "radius": 5}}
    assert [r[1:] for r in ts_query(spatialtest, flt)] == [(3, 59)]


def test_spatial_query_with_other_spatial_dim(spark, spatialtest):
    # testSpatialQueryWithOtherSpatialDim: only the spatialIsRad point
    flt = {"type": "spatial", "dimension": "spatialIsRad",
           "bound": {"type": "radius", "coords": [0.0, 0.0], "radius": 5}}
    assert [r[1:] for r in ts_query(spatialtest, flt)] == [(1, 13)]


def test_spatial_query_more_points(spark, spatialtest):
    # testSpatialQueryMorePoints: rectangle (0,0)-(9,9), day buckets
    flt = {"type": "spatial", "dimension": "dim.geo",
           "bound": {"type": "rectangular",
                     "minCoords": [0.0, 0.0], "maxCoords": [9.0, 9.0]}}
    assert ts_query(spatialtest, flt, granularity="day") == [
        (D(2013, 1, 1), 1, 17),
        (D(2013, 1, 2), 1, 29),
        (D(2013, 1, 3), 1, 13),
        (D(2013, 1, 4), 1, 91),
        (D(2013, 1, 5), 1, 47),
    ]


def test_spatial_query_filtered_aggregator(spark, spatialtest):
    # SpatialFilterBonusTest.testSpatialQueryFilteredAggregator (r14):
    # the spatial bound inside a FILTERED AGGREGATOR — unfiltered rows
    # and val aggregate everything (noise included), valFiltered sums
    # only the in-rectangle point per day. Deterministic stand-in
    # noise replaces the reference's 4995 random day-1 rows, so day
    # 1's unfiltered pins differ; the filtered column pins the
    # reference's own per-day values (17/29/13/91/47).
    q = {"queryType": "timeseries", "dataSource": "spatialtest",
         "granularity": "day",
         "intervals": ["2013-01-01/2013-01-07"],
         "aggregations": [
             {"type": "count", "name": "rows"},
             {"type": "filtered", "name": "valFiltered",
              "filter": {"type": "spatial", "dimension": "dim.geo",
                         "bound": {"type": "rectangular",
                                   "minCoords": [0.0, 0.0],
                                   "maxCoords": [9.0, 9.0]}},
              "aggregator": {"type": "longSum", "name": "valFiltered",
                             "fieldName": "val"}},
             {"type": "longSum", "name": "val", "fieldName": "val"},
         ]}
    out = compile_query(q, spatialtest).collect()
    got = [(r["__time"], r["rows"], r["valFiltered"], r["val"])
           for r in out]
    noise_val = sum(range(8, 20))
    assert got == [
        (D(2013, 1, 1), 13, 17, 17 + noise_val),
        (D(2013, 1, 2), 1, 29, 29),
        (D(2013, 1, 3), 1, 13, 13),
        (D(2013, 1, 4), 1, 91, 91),
        (D(2013, 1, 5), 4, 47, 47 + 101 + 501 + 13),
    ]
