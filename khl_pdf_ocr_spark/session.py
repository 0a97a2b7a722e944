"""SparkSession factory with the pipeline's tuned defaults.

Every knob here exists for the 100 TB target, not the local test rig:

- AQE on (runtime coalescing + skew-join splitting for the relational
  stages);
- ``arrow.maxRecordsPerBatch`` kept LOW: the extraction input column is
  multi-KB..MB binary payloads, so the default 10k-row Arrow batches
  would hold GBs; 256 rows × ≤4 MB keeps executor-python memory bounded
  (SURVEY.md §4.3.3);
- ``files.maxPartitionBytes`` at 128 MB so a 100 TB scan yields ~800k
  input splits — large enough tasks to amortize scheduling, small
  enough for executor memory;
- shuffle partitions default to 2×cores locally; on a real cluster AQE
  coalesces from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "local_cpu_count"]


def local_cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "khl-pdf-ocr-spark", *, cpus: int | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None
              ) -> SparkSession:
    """Build the session.  Master resolution order:

    1. ``SPARK_GRAFT_MASTER`` env (explicit override);
    2. whatever ``spark-submit`` configured — detected via the Py4J
       gateway env it exports; the builder must NOT set a master then,
       or a hardcoded ``local[n]`` would silently override the
       cluster's ``--master yarn``/``k8s://...`` ON THE DRIVER (found
       by actually running ``spark-submit --py-files``, round 3);
    3. ``local[cpus]`` for plain-python runs (tests, bench, notebooks).
    """
    cpus = cpus or local_cpu_count()
    shuffle = shuffle_partitions or max(32, 2 * cpus)
    b = SparkSession.builder.appName(app_name)
    env_master = os.environ.get("SPARK_GRAFT_MASTER")
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ  # spark-submit launch
    if env_master:
        b = b.master(env_master)
    elif not submitted:
        b = b.master(f"local[{cpus}]")
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
