"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
confs hold (AQE, Arrow, sane shuffle parallelism). Nothing here is
local-mode-specific except the master default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "erde_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # match parallelism to cores locally; AQE coalesces further at runtime
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # off by default (bench noise); tools that read the /api/v1 stage
        # metrics (tools/scale_check.py) opt in via the env var
        .config("spark.ui.enabled",
                "true" if os.environ.get("SPARK_GRAFT_UI") else "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    # the driver-generated events table carries ns-precision timestamps,
    # which Spark's parquet reader rejects unless read as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _bytes_conf(v: str) -> int:
    """Parse a Spark size conf value ('134217728', '134217728b',
    '128m', '1g', ...) to bytes."""
    v = str(v).strip().lower()
    if v.endswith('b'):
        v = v[:-1]
    mult = 1
    for suf, m in (('k', 1024), ('m', 1024 ** 2), ('g', 1024 ** 3),
                   ('t', 1024 ** 4)):
        if v.endswith(suf):
            v = v[:-1]
            mult = m
            break
    return int(float(v) * mult)


def spread_to_cores(df):
    """Round-robin repartition a LOW-PARALLELISM input to the session's
    core count before a compute-heavy per-row kernel (optimization
    guide §2.5 input skew / §6 split sizing): a single small file — the
    sf test corpora, or one micro-batch file on the streaming path —
    scans as ONE partition, serializing any encode/decode/hash kernel
    downstream on one core. DATA-ADAPTIVE: inputs that already carry
    >= cores partitions (any real multi-split dataset at scale) are
    returned untouched, so no shuffle is ever added at 100 TB.

    Parallelism is probed WITHOUT ``df.rdd`` where possible (r12
    verdict ask #7: the RDD conversion forces full physical planning of
    the upstream plan on the driver — avoidable latency on a deep
    100 TB plan). File-backed frames answer from the already-listed
    file index: >= cores input files means >= cores scan partitions
    (exit without touching the plan); fewer files than cores are
    stat'ed (bounded by cores-1 driver RPCs) and their split count
    estimated against ``spark.sql.files.maxPartitionBytes``, since big
    files of a splittable format still scan wide. Non-file-backed
    frames (ExistingRDD / LocalRelation / post-checkpoint) fall back to
    the RDD probe — their physical plans are shallow by construction.
    Streaming frames are returned unchanged (``df.rdd`` would raise;
    the streaming near-dup path spreads inside ``foreachBatch`` where
    batches are plain batch frames)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= cores:
            return df
        try:
            max_pb = _bytes_conf(spark.conf.get(
                'spark.sql.files.maxPartitionBytes', '134217728b'))
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            splits = 0
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                size = p.getFileSystem(hconf).getFileStatus(p).getLen()
                splits += max(1, -(-size // max_pb))
                if splits >= cores:
                    return df
        except Exception:
            # unreadable listing (moved files, exotic scheme): fall
            # through to the spread — the repartition is correct either
            # way, this probe only decides whether it is needed
            pass
        return df.repartition(cores)
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load parquet tables from a testdata scale-factor dir as a dict.

    ``events.ts`` is stored as TIMESTAMP(NANOS); with ``nanosAsLong`` it
    scans as a long which we convert to a microsecond timestamp column.
    """
    from pyspark.sql import functions as F
    if not names:
        names = ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings")
    # the caller's session may not come from get_spark(); the events scan
    # needs this conf regardless (runtime-settable)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events" and dict(df.dtypes).get("ts") == "bigint":
            # integer div: ns epoch values overflow double precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[n] = df
    return out
