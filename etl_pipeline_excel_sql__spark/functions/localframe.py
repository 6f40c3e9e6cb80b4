"""Single-partition construction for tiny driver-local DataFrames.

``spark.createDataFrame(<python list>)`` parallelizes the rows into
``defaultParallelism`` Python-RDD partitions — at ``local[32]`` that is
32 partitions, all but one typically EMPTY for the bounded model/query
frames the engine builds (weight vectors, query batches, probe lists,
stats rows). Every downstream evaluation then pays one Python-worker
round trip PER partition (~15 ms each, serialized where the plan forces
single-threaded consumption). Measured at local[32], Spark 4.1 (round
13): a 40-row frame costs 481 ms per ``count()`` against 259 ms from a
1-slice parallelize, and a ``coalesce(1)`` artifact WRITE — which pulls
all 32 Python partitions through ONE task sequentially — costs 5.6 s
against 0.3 s. The bm25_serve_topk gated row spent more wall time
writing its 1-row stats artifact than building the index.

These frames are one-partition by NATURE (bounded by construction:
serving batches, trained model artifacts, probe grids), so a single
slice is also the right 100 TB shape — they broadcast from one
partition instead of scattering a handful of rows across the cluster.
The row-to-JVM conversion path (pickle) is unchanged; only the slice
count differs, so values and types are bit-identical to the old form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` pinned to ONE partition.

    ``rows``: a non-empty sequence of tuples/Rows (bounded by
    construction — this helper is for model/query-batch frames, not
    data). ``schema``: anything ``createDataFrame`` accepts (DDL
    string, StructType, or column-name list for inference).
    """
    rows = list(rows)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )
