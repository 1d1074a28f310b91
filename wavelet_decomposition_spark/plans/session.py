"""SparkSession construction with the engine's scale-oriented defaults.

The sandbox runs ``local[N]`` single-JVM; the configs below are chosen to be
the right ones on a real multi-executor cluster too (AQE with skew-join
splitting, Arrow-batched Python exchange, partition coalescing), so the same
plan shapes carry from local tests to a 1000-executor deployment.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Local mode hosts all task threads in one JVM, so a large heap helps —
    but only up to what the machine has. Default: ~40% of MemTotal, clamped
    to [2g, 48g]; override with WDS_DRIVER_MEM."""
    env = os.environ.get("WDS_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            kb = int(next(ln for ln in f if ln.startswith("MemTotal")).split()[1])
        gib = max(2, min(48, int(kb * 0.4 / 1024 / 1024)))
    except (OSError, StopIteration, ValueError):
        gib = 8
    return f"{gib}g"


def package_zip() -> str:
    """Zip this package for shipping to executors (the local-mode analogue of
    ``spark-submit --py-files``; required whenever the driver script does not
    run from the repo root). Deterministic content, cached per process."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(
        tempfile.gettempdir(), "wavelet_decomposition_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return out


# glibc malloc tuning for the pandas-UDF workers (and the JVM they fork
# from). numpy temporaries in the pyramid/codec UDFs are tens-to-hundreds
# of MB; glibc's adaptive mmap threshold caps at 32 MiB, so every such
# temporary is served by mmap and returned by munmap — each UDF call then
# pays fresh page-zeroing plus cross-core TLB-shootdown IPIs, a cost that
# grows with BOTH batch size and the number of concurrently-running
# workers (measured on this box: the same bucket transform runs 43 s on a
# churning arena vs 2.9 s on a retained one). Raising the thresholds lets
# long-lived workers keep the arena at its high-watermark: bounded extra
# RSS per worker, 5-15x steadier UDF throughput. Exported both into this
# process' env (local mode: the JVM and its python workers inherit it)
# and as spark.executorEnv.* (real clusters).
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "268435456",  # 256 MiB
    "MALLOC_TRIM_THRESHOLD_": "268435456",
}


def build_session(
    app_name: str = "wavelet_decomposition_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x parallelism; AQE coalesces down when partitions are small
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # --- adaptive execution: runtime re-planning, skew-join splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep post-shuffle parallelism for Python-bound (pandas UDF) stages:
        # default 64 MB advisory size would coalesce small-but-CPU-heavy
        # shuffles down to a handful of tasks
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- Arrow exchange for pandas UDFs (the engine's only Python) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # solve groups are 23,360 rows; activity windows are bounded — large
        # batches keep the JVM<->Python round trips few
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # local-mode: the driver JVM hosts all task threads; size the heap
        # for the concurrent tasks' shuffle + Arrow buffers, bounded by the
        # machine's actual RAM (WDS_DRIVER_MEM overrides)
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _MALLOC_ENV.items():
        os.environ.setdefault(k, v)
        builder = builder.config(f"spark.executorEnv.{k}", os.environ[k])
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the engine to executor Python workers (--py-files analogue)
    spark.sparkContext.addPyFile(package_zip())
    return spark
