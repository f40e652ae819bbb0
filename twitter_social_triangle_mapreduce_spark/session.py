"""SparkSession factory.

The engine targets a large multi-executor cluster; locally we run
``local[$SPARK_GRAFT_CPUS]``. All scale-sensitive knobs live here so every
entry point (tests, bench, driver harness) gets the same tuned session:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  selection) — replaces the reference's hand-tuned memory / join-strategy
  choices (reference ``SocialTriangle_RS.java:198`` heap tuning,
  ``ReplicatedJoinDriver.java:136`` map-only config).
- ``spark.sql.shuffle.partitions`` sized for the local harness; on a real
  cluster AQE coalesces from a deliberately high initial number.
- Broadcast threshold raised: the graph queries' filtered edge sets and the
  dimension tables are small relative to the fact side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

#: Spark's RocksDB state store provider (bundled since 3.2). The default
#: HDFS-backed store keeps every streaming-state key on the JVM heap —
#: fine locally, lethal for 100 TB stream-stream joins / dedup whose
#: bounded-event-time state still reaches tens of GB per executor.
#: RocksDB keeps state off-heap on local disk with incremental
#: (changelog) checkpointing to the checkpoint location.
ROCKSDB_STATE_STORE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf() -> dict[str, str]:
    """Session confs that move streaming state to RocksDB. Pass to
    ``get_spark(extra_conf=...)`` at session build, or set via
    ``spark.conf.set`` before ``start()`` — the provider is read per
    streaming query at start time."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            ROCKSDB_STATE_STORE_PROVIDER
        ),
        # incremental state commits per batch instead of full snapshot
        # uploads — the difference between O(delta) and O(state) per
        # micro-batch at scale
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
            "true"
        ),
    }


def get_spark(
    app_name: str = "twitter-social-triangle-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (``local[*]`` if the
    env var is unset). On a real cluster, pass ``master=None`` and submit
    through ``spark-submit`` — the builder respects an existing session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # filtered edge sets / dims broadcast comfortably; 64 MiB leaves
        # headroom without risking driver OOM at local scale
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata's events.ts is parquet TIMESTAMP(NANOS) which vanilla
        # Spark rejects; read as long and convert in sources.io.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
