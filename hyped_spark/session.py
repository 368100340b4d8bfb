"""SparkSession factory for the engine.

One place to own the configs that matter at scale:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting);
- Arrow transport on (all custom compute is pandas-UDF based, per
  BASELINE.json input_hint: "no per-row Python");
- UTC session timezone (oracle comparisons against DuckDB are UTC-naive);
- shuffle partitions sized to cores in local mode (200 default is wrong for
  both tiny local runs and would be re-set per cluster deploy anyway).

At cluster scale the same builder is used by ``spark-submit --py-files``;
only ``master`` and memory knobs change.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _package_zip() -> str:
    """Zip the hyped_spark package for shipping to executors.

    This is the programmatic equivalent of ``spark-submit --py-files`` —
    executor Python workers must be able to unpickle the pandas UDFs, which
    reference module-level functions in this package.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "hyped_spark_pyfiles.zip")
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.join(
                    "hyped_spark", os.path.relpath(full, pkg_dir)), full))
    # Deterministic bytes (sorted entries, fixed timestamps): under
    # `spark-submit --py-files <this zip>` the driver re-zips on session
    # build, and SparkContext.addFile REFUSES a same-named file whose
    # contents differ from the already-shipped copy — byte-stable output
    # makes the re-add a no-op instead of a crash.
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, full in sorted(entries):
            with open(full, "rb") as fh:
                zf.writestr(zipfile.ZipInfo(rel, (1980, 1, 1, 0, 0, 0)),
                            fh.read())
    return out


def get_spark(
    app_name: str = "hyped_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the engine.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (default 32). Shuffle
    partitions default to the core count — partial aggregation and AQE
    coalescing make more partitions pure overhead on local data sizes,
    while on a real cluster this is overridden to ~2-3x total cores.
    """
    cores = cores or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd over snappy: smaller write/shuffle bytes for a little extra
        # CPU. On this sandbox the full 4M-event scaling protocol ties with
        # snappy within host noise (0.805 vs 0.804; a 1M single-rep probe
        # had shown +11% at 4 contended cores — see BENCH/BASELINE.md);
        # kept because at cluster scale the bytes saved dominate where
        # executors share NIC/disk bandwidth
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Under `spark-submit --py-files` this module is imported from the
    # shipped zip itself — the package dir is not a real directory, there
    # is nothing to re-zip, and executors already have the archive. Only
    # plain-checkout sessions (tests, notebooks) need the self-ship.
    if os.path.isdir(os.path.dirname(os.path.abspath(__file__))):
        spark.sparkContext.addPyFile(_package_zip())
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
