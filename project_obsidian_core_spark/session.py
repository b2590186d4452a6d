"""SparkSession construction tuned for this engine.

Local testing runs ``local[N]`` single-JVM; production targets a multi-executor
cluster reading ~100 TB, so every default here is chosen to survive that
scale-up: AQE on (runtime coalescing + skew-join handling), shuffle partitions
sized to the parallelism at hand, Arrow enabled for the pandas-UDF slow path,
and UTC session time so timestamp semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "obsidian-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    silence_window_warning: bool = True,
) -> SparkSession:
    """Create (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster, ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total executor cores; locally we
    default both to the CPU budget.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local[N] runs driver+executors in ONE JVM: the 1g default heap is a
        # toy. Only read at JVM launch — a no-op if the session already exists.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        # Replay-style workloads start many short streaming queries, each
        # with fresh checkpoints; the default 60 s state-store maintenance
        # pass then churns snapshot/cleanup work across every provider ever
        # loaded (measured: intermittent 2 s → 16 s replay spikes). For
        # long-running production streams, set this back near the default.
        .config(
            "spark.sql.streaming.stateStore.maintenanceInterval",
            os.environ.get("SPARK_GRAFT_STATE_MAINT_INTERVAL", "600s"),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # the suppression is JVM-global: library consumers running their OWN
    # unwhitelisted plans in the same session can opt back into the
    # "No Partition Defined" warning (r14 advice)
    if silence_window_warning:
        _silence_bounded_window_warning(spark)
    return spark


def _silence_bounded_window_warning(spark: SparkSession) -> None:
    """Pin the WindowExec logger to ERROR.

    Every unpartitioned window in this package runs on a proven-bounded
    reduction (aggregate / distinct grid / ≤n_shards table) — the
    whitelist with per-site rationale is tests/test_global_window_whitelist.py,
    which fails on any NEW global-window site.  With boundedness enforced
    there, the per-query "No Partition Defined" WARN is pure noise
    (hundreds of lines per bench run) that buries real warnings.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # pragma: no cover - non-log4j2 runtime; warning stays
        pass


def pin_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to a session we did not build.

    The verification driver hands us its own SparkSession; timestamp
    comparisons against the DuckDB oracle require UTC session time, and AQE
    is purely beneficial. Only runtime-mutable confs are touched.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
