"""SparkSession factory tuned for this engine.

Local-mode defaults are sized for the test harness (local[32], single
JVM); the same builder settings are what we would ship to a real
cluster, minus the master/memory knobs which come from spark-submit.

Scale posture (100 TB):
* AQE on — runtime coalescing, skew-join splitting, dynamic join
  selection replace any hand-tuned plan.
* ``spark.sql.shuffle.partitions`` here matches local cores; on a
  cluster leave it high (or let AQE coalesce) — initial partitions
  should be ~2-3x total cores, AQE coalesces the small ones.
* Arrow on — every Pandas UDF in the mapping layer rides vectorized
  Arrow batches rather than pickled rows.
* UTC session timezone — the reference force-UTCs every timestamp
  (reference: dbsink/tables.py:184-185,240,347); we pin the session so
  timestamp semantics are reproducible anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbsink_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # r12 (guide §7.3, driver-side plan cost): by default EVERY
        # pyspark Column/DataFrame call captures its Python call site
        # (inspect.stack) and ships it over THREE extra py4j round
        # trips (PySparkCurrentOrigin set/get/clear) purely to enrich
        # error messages. Measured here: ~7 ms per Column op with the
        # capture vs ~1 ms without — tens of seconds per full bench
        # pass spent labeling expressions that never fail. Scale-
        # neutral (driver-side only, identical plans/results at any
        # data size); flip back on when debugging a query's lineage.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DBSINK_SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
