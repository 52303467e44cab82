"""Custom stateful streaming operators via applyInPandasWithState.

Reference: Druid's realtime tasks hold per-key in-flight aggregation
state in OnheapIncrementalIndex sinks and serve it before publish
(indexing-service/.../seekablestream/SeekableStreamIndexTaskRunner.java,
server/.../appenderator/SinkQuerySegmentWalker.java). Window aggregates
cover the rollup itself (streaming/rollup.py); this module is the
escape hatch for state a windowed aggregate cannot express — an
unbounded per-key running aggregate emitted on every update, i.e. the
"queryable in-flight sink" behavior.

Spark mapping: ``applyInPandasWithState`` keys the state store by the
group columns; state lives in the checkpoint alongside source offsets,
so restarts resume exactly-once like any other stateful operator. The
user function sees Arrow batches (no per-row Python), and each
micro-batch emits one updated row per touched key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def running_rollup(stream: DataFrame, key_col: str,
                   value_col: str) -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream.

    Emits one row per key per micro-batch in which the key received
    rows, carrying the cumulative count/total since stream start —
    state no tumbling window can hold (it never closes). Output schema:
    (key_col, cnt long, total double).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = stream.schema[key_col].dataType
    out_schema = T.StructType([
        T.StructField(key_col, key_type),
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        yield pd.DataFrame({key_col: [key[0]], "cnt": [cnt],
                            "total": [total]})

    return (stream.groupBy(key_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def run_updates_to_memory(updates: DataFrame, name: str, checkpoint: str):
    """Drain a bounded update-mode stream into an in-memory sink and
    block until done (availableNow). Returns the started query.
    Micro-batch sizing (e.g. maxFilesPerTrigger) belongs on the source
    reader, not here."""
    q = (updates.writeStream.outputMode("update")
         .format("memory").queryName(name)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def final_state(spark: SparkSession, name: str, key_col: str) -> DataFrame:
    """Collapse the update log in memory sink ``name`` to the final
    per-key state: the running count is monotone per key, so the row
    with the max cnt is the last emitted update."""
    log = spark.table(name)
    return (log.groupBy(key_col)
            .agg(F.max("cnt").alias("cnt"),
                 F.max_by("total", "cnt").alias("total")))
