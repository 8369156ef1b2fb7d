"""SparkSession factory with scale-aware defaults.

Designed for a 1000-executor cluster reading 100 TB but testable on
local[N]: AQE on (runtime coalesce + skew-join splitting), Arrow
enabled for the pandas-UDF stages, shuffle partitions sized to the
parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ungoliant-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    # one task = one core: multi-threaded BLAS inside every Python UDF
    # worker oversubscribes the box (32 workers × 32 BLAS threads)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 2 * int(n) if n not in ("*", "") else 64
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large transcripts: bound Arrow batch memory in UDF stages
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # clips carry multi-KB..multi-MB binary audio: the default 4096-row
        # columnar reader batch OOMs on wide binary columns — bound it
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        # local-mode driver == the whole JVM: with 32 task threads over
        # multi-KB binary rows an 8g heap GC-thrashes (measured: 32 cores
        # ran 2× SLOWER than 8). Size like an executor fleet instead.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # Arrow batches and row-queue pages for multi-KB binary rows
        # are 8-32 MB objects: with G1's default region size at this
        # heap they are "humongous" allocations, each triggering
        # region-scan bookkeeping — measured 2.3× slower on the
        # pipeline leg. 32 MB regions make them ordinary allocations.
        # Capped GC threads keep pauses predictable when the host
        # steals CPU (shared-VM sandbox).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:G1HeapRegionSize=32m -XX:ParallelGCThreads=8 "
            # Derby metastore beside the warehouse, not in the CWD
            f"-Dderby.system.home={os.path.abspath('.cache')}",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # catalog tables (bucketed layouts, sources/bucketed.py) land
        # under .cache instead of littering the CWD
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.abspath(".cache/spark-warehouse"),
            ),
        )
    )
    return builder.getOrCreate()
