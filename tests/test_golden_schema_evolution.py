"""Golden tests ported from the reference's SchemaEvolutionTest.java
(processing/src/test/java/org/apache/druid/query/, 3 @Test methods, all
ported) — the c1 column evolves STRING(index1) -> LONG(index2) ->
FLOAT(index3) -> NONEXISTENT(index4) across segments of one datasource,
and queries must aggregate/filter across the mix.

Architecture note: the reference keeps per-segment physical types and
merges results; this engine reconciles a mixed-type union to the
STRING supertype at registration (the same reconciliation its
heterogeneous UNION ALL path performs), and the value contracts hold
because numeric aggregators and numeric-ordered bounds coerce strings
with Druid's parse-through-double semantics (longSum '10.1' adds 10).

The zero-match filtered case (index4 only) emits one zeroed row
(count 0, null sums) in both engines.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F, types as T

from apache_druid_spark.plans.compiler import compile_query

D = datetime

RAW = [
    (D(2000, 1, 1), "9", ["a"]),
    (D(2000, 1, 2), "10.1", []),
    (D(2000, 1, 3), "2", [""]),
    (D(2001, 1, 1), "1", ["a", "c"]),
    (D(2001, 1, 2), "4", ["abc"]),
    (D(2001, 1, 3), "5", None),
]


@pytest.fixture(scope="session")
def evo(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry
    from apache_druid_spark.ingest.batch import _hll_input

    reg = DatasourceRegistry(spark)
    base = spark.createDataFrame(
        RAW, "__time timestamp, c1 string, c2 array<string>")
    # per-row HLL state of the row's own c2 elements (rollup NONE —
    # every row is its own group), the ingest-time 'uniques' metric
    rid = base.withColumn("__rid", F.monotonically_increasing_id())
    state = (rid.select("__rid", F.explode_outer("c2").alias("e"))
             .groupBy("__rid")
             .agg(F.hll_sketch_agg(_hll_input(F.col("e")), 12)
                  .alias("uniques")))
    with_state = rid.join(state, "__rid")

    # index1: c1 STRING, no c2, no uniques
    idx1 = base.select("__time", "c1")
    # index2: c1 LONG (longSum-ingested: '10.1' rolls up to 10), c2,
    # uniques state, longmin
    idx2 = with_state.select(
        "__time", F.col("c1").cast("double").cast("long").alias("c1"),
        "c2", "uniques", F.col("c1").cast("double").cast("long")
        .alias("longmin"))
    # index3: c1 DOUBLE, c2, uniques state
    idx3 = with_state.select(
        "__time", F.col("c1").cast("double").alias("c1"), "c2", "uniques")
    # index4: neither c1 nor c2
    idx4 = base.select("__time")

    reg.register("evo1", idx1.cache())
    reg.register("evo2", idx2.cache())
    reg.register("evo3", idx3.cache())
    reg.register("evo4", idx4.cache())

    # mixed-segment unions reconcile c1 to the STRING supertype
    def as_union(parts):
        out = None
        for p in parts:
            cols = [
                (F.col("c1").cast("string") if "c1" in p.columns
                 else F.lit(None).cast("string")).alias("c1"),
                (F.col("uniques") if "uniques" in p.columns
                 else F.lit(None).cast("binary")).alias("uniques"),
                F.col("__time"),
            ]
            sel = p.select("__time", *cols[:2])
            out = sel if out is None else out.unionByName(sel)
        return out

    reg.register("evo123", as_union([idx1, idx2, idx3]).cache())
    reg.register("evo234", as_union([idx2, idx3, idx4]).cache())
    reg.register("evo1234", as_union([idx1, idx2, idx3, idx4]).cache())
    return reg


def run_ts(reg, ds, aggs, filt=None):
    q = {"queryType": "timeseries", "dataSource": ds,
         "granularity": "all", "intervals": ["1000-01-01/3000-01-01"],
         "aggregations": aggs}
    if filt:
        q["filter"] = filt
    return compile_query(q, reg).collect()


NUM_AGGS = [
    {"type": "longSum", "name": "a", "fieldName": "c1"},
    {"type": "doubleSum", "name": "b", "fieldName": "c1"},
    {"type": "longSum", "name": "c", "expression": "c1 * 1"},
    {"type": "doubleSum", "name": "d", "expression": "c1 * 1"},
]


def test_hyper_unique_evolution_timeseries(spark, evo):
    # testHyperUniqueEvolutionTimeseries: index1 has no uniques column
    # (estimate 0); the 1+2+3 mix merges the existing states
    aggs = [{"type": "hyperUnique", "name": "uniques",
             "fieldName": "uniques"}]
    r1 = run_ts(evo, "evo1", aggs)
    assert len(r1) == 1 and r1[0]["uniques"] == pytest.approx(0.0, abs=0.05)
    r123 = run_ts(evo, "evo123", aggs)
    assert len(r123) == 1
    assert r123[0]["uniques"] == pytest.approx(4.003911343725148, abs=0.05)


def test_numeric_evolution_timeseries_aggregation(spark, evo):
    # testNumericEvolutionTimeseriesAggregation
    def vals(ds):
        r = run_ts(evo, ds, NUM_AGGS)
        assert len(r) == 1
        return (r[0]["a"], r[0]["b"], r[0]["c"], r[0]["d"])

    t = 31.1
    assert vals("evo1") == (31, pytest.approx(t), 31, pytest.approx(t))
    assert vals("evo2") == (31, 31.0, 31, 31.0)
    assert vals("evo3") == (31, pytest.approx(t), 31, pytest.approx(t))
    assert vals("evo4") == (None, None, None, None)
    assert vals("evo1234") == (93, pytest.approx(2 * t + 31),
                               93, pytest.approx(2 * t + 31))
    assert vals("evo234") == (62, pytest.approx(t + 31),
                              62, pytest.approx(t + 31))


def test_numeric_evolution_filtering(spark, evo):
    # testNumericEvolutionFiltering: numeric bound [9, 11] filters the
    # string, long, and float shapes alike
    aggs = [
        {"type": "longSum", "name": "a", "fieldName": "c1"},
        {"type": "doubleSum", "name": "b", "fieldName": "c1"},
        {"type": "floatSum", "name": "d", "fieldName": "c1"},
        {"type": "longMin", "name": "e", "fieldName": "c1"},
        {"type": "count", "name": "c"},
    ]
    flt = {"type": "bound", "dimension": "c1", "lower": "9",
           "upper": "11", "ordering": "numeric"}

    def vals(ds):
        r = run_ts(evo, ds, aggs, flt)
        assert len(r) == 1
        return (r[0]["a"], r[0]["b"], r[0]["c"], r[0]["d"], r[0]["e"])

    assert vals("evo1") == (19, pytest.approx(19.1), 2,
                            pytest.approx(19.1), 9)
    assert vals("evo2") == (19, 19.0, 2, 19.0, 9)
    assert vals("evo3") == (19, pytest.approx(19.1), 2,
                            pytest.approx(19.1), 9)
    # index4-only: no row matches — one zeroed row (count 0, null
    # sums), exactly the reference's grand-total shape
    assert vals("evo4") == (None, None, 0, None, None)
    assert vals("evo1234") == (57, pytest.approx(57.2), 6,
                               pytest.approx(57.2, abs=1e-4), 9)
