"""SparkSession factory tuned for the KG-construction workload.

Scale posture (targets a 1000-executor cluster reading 100 TB even
though tests run on local[N]):

- AQE on: runtime coalescing of the many small post-filter partitions
  produced by ``lang=`` predicates, skew-join splitting for
  mega-dashboard repos, dynamic broadcast conversion for the dim-sized
  sides (type maps, roles, actions).
- Arrow on, bounded batches: ``content`` cells can be multi-MB model
  JSON; 512-row batches keep executor-python memory flat.
- shuffle.partitions defaults to cores locally; on a real cluster this
  is overridden by AQE's coalesce + the initial partition num config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pbi-ontology-kg",
    parallelism: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local core count; defaults to $SPARK_GRAFT_CPUS or 32.
    """
    cores = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.default.parallelism", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # cache-sized final-agg hash tables: the global triple set-dedup
        # is the scaling bottleneck when its per-task tables spill out
        # of LLC into DRAM (measured: 8 tasks × 780 MB tables scaled
        # 2.7×; 16 MB advisory targets → 3.6-3.9× at 4 executors,
        # hi-level wall 135.7→99.2 s at 36k repos — see BENCH.md)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
