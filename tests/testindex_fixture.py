"""The reference's TestIndex fixture (processing/src/test/java/org/
apache/druid/segment/TestIndex.java + druid.sample.numeric.tsv) as a
registered datasource, for porting the native QueryRunnerTest suites.

Reproduces the ingestion: tab-delimited columns, placementish is
multi-value on \\x01, null_column always null, partial_null_column only
on the 14-column rows, and ingest-time ROLLUP metrics — index/indexFloat
(double/float sums of the raw index), indexMin/indexMinFloat,
indexMaxFloat, indexMaxPlusTen (doubleMax of the FLOAT-typed virtual
column index+10), quality_uniques (hyperUnique of quality — modeled as
the raw quality string, sketched at query time). The rollup granularity
is NONE, so rows group by (ts, all dimensions)."""

from __future__ import annotations

import os
import struct
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F, types as T

TSV = ("/root/reference/processing/src/test/resources/"
       "druid.sample.numeric.tsv")

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("market", T.StringType()),
    T.StructField("quality", T.StringType()),
    T.StructField("qualityLong", T.LongType()),
    T.StructField("qualityFloat", T.FloatType()),
    T.StructField("qualityDouble", T.DoubleType()),
    T.StructField("qualityNumericString", T.StringType()),
    T.StructField("longNumericNull", T.LongType()),
    T.StructField("floatNumericNull", T.FloatType()),
    T.StructField("doubleNumericNull", T.DoubleType()),
    T.StructField("placement", T.StringType()),
    T.StructField("placementish", T.ArrayType(T.StringType())),
    T.StructField("index_raw", T.DoubleType()),
    T.StructField("partial_null_column", T.StringType()),
    T.StructField("null_column", T.StringType()),
])


def _f32(x: float) -> float:
    return struct.unpack("f", struct.pack("f", x))[0]


def load_rows():
    rows = []
    with open(TSV, encoding="utf-8") as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            ts = datetime.strptime(
                c[0], "%Y-%m-%dT%H:%M:%S.%fZ").replace(
                tzinfo=timezone.utc).replace(tzinfo=None)
            rows.append((
                ts, c[1], c[2],
                int(c[3]) if c[3] else None,
                float(c[4]) if c[4] else None,
                float(c[5]) if c[5] else None,
                c[6] or None,
                int(c[7]) if c[7] else None,
                float(c[8]) if c[8] else None,
                float(c[9]) if c[9] else None,
                c[10] or None,
                # Druid sorts multi-values WITHIN each row at ingest
                # (IncrementalIndex dimension processing), so the
                # stored array for the travel/technology rows is
                # ["preferred","t"], not file order
                # (testMultiValueDimensionAsArray pins the sorted form)
                sorted(c[11].split("\x01")),
                float(c[12]),
                c[13] if len(c) > 13 and c[13] else None,
                None,
            ))
    return rows


def _hll_state(col):
    from apache_druid_spark.ingest.batch import _hll_input

    return F.hll_sketch_agg(_hll_input(col), 12)


@pytest.fixture(scope="session")
def testindex(spark):
    """Rolled-up TestIndex DataFrame registered as 'testindex'."""
    from apache_druid_spark.model.datasource import DatasourceRegistry

    if not os.path.exists(TSV):
        pytest.skip("reference TestIndex fixture not available")
    raw = spark.createDataFrame(load_rows(), SCHEMA)
    dims = ["market", "quality", "qualityLong", "qualityFloat",
            "qualityDouble", "qualityNumericString", "longNumericNull",
            "floatNumericNull", "doubleNumericNull", "placement",
            "placementish", "partial_null_column", "null_column"]
    rolled = (raw.groupBy("__time", *dims).agg(
        F.sum("index_raw").alias("index"),
        F.sum(F.col("index_raw").cast("float")).alias("indexFloat"),
        F.min("index_raw").alias("indexMin"),
        F.min(F.col("index_raw").cast("float")).alias("indexMinFloat"),
        F.max(F.col("index_raw").cast("float")).alias("indexMaxFloat"),
        F.max((F.col("index_raw") + F.lit(10.0)).cast("float")
              .cast("double")).alias("indexMaxPlusTen"),
        # REAL ingest-time hyperUnique state (r9): BinaryType
        # DataSketches HLL built with the rollup path's NUL-sentinel
        # encoding, exactly like the reference's COMPLEX hyperUnique
        # column — query-time hyperUnique aggs MERGE this state
        # (estimates are exact at these cardinalities, inside the
        # suite's 0.05 tolerance vs the legacy-HLL pins), and it stays
        # invisible to the search query's string-dimension sweep
        _hll_state(F.col("quality")).alias("quality_uniques"),
    ))
    reg = DatasourceRegistry(spark)
    reg.register("testindex", rolled.cache())
    return reg
