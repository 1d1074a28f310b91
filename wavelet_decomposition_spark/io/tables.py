"""Iceberg-first table source/sink with parquet fallback.

The engine's contract input is an Iceberg table of transcripts
(BASELINE.json `input_hint`); this sandbox ships no Iceberg runtime jar,
so every driver path reads the same tables as raw parquet. This module
makes the format an explicit, testable seam instead of a hard-coded
`spark.read.parquet`:

- ``read_table(spark, source)``: a catalog identifier (``db.tbl`` or
  ``catalog.db.tbl`` — no slashes) reads through the configured Iceberg
  catalog; a path reads parquet. ``format='iceberg'|'parquet'`` forces.
- ``write_table(df, target)``: same resolution; Iceberg targets use the
  DataFrameWriterV2 ``createOrReplace`` path (atomic swap, snapshot
  history — the idempotent-rebuild story the checkpoint manifest provides
  for parquet tiers comes free from Iceberg snapshots), parquet targets
  get a plain overwrite write.
- ``iceberg_available(spark)``: true when an Iceberg catalog is actually
  configured AND its classes load — the condition for the iceberg branch
  to be reachable. On a cluster this is
  ``--packages org.apache.iceberg:iceberg-spark-runtime-*`` plus a
  ``spark.sql.catalog.<name>`` config; nothing in the engine changes.

At 100 TB the Iceberg path is strictly better than raw parquet dirs —
metadata-tree file pruning replaces directory listing (a listing of 10^6
files is minutes; the manifest tree reads in seconds), snapshot isolation
makes tier rebuilds atomic, and hidden partitioning removes the
partition-column-in-path coupling — which is why the seam exists even
though the sandbox can only exercise the fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _looks_like_identifier(source: str) -> bool:
    return "/" not in source and "\\" not in source and not source.startswith(
        "file:"
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured and its implementation
    classes are on the classpath (checked by instantiating nothing —
    just loading the class through the JVM gateway). Catalogs registered
    AFTER session start via ``spark.conf.set("spark.sql.catalog.x", ...)``
    live only in the runtime SQL conf, not the SparkContext conf, so
    both are scanned (``SET`` enumerates explicitly-set runtime
    entries)."""
    try:
        keys = [k for k, _ in spark.sparkContext.getConf().getAll()]
        keys += [r["key"] for r in spark.sql("SET").collect()]
        if not any(k.startswith("spark.sql.catalog.") for k in keys):
            return False
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _resolve_format(
    spark: SparkSession, source: str, format: str | None
) -> str:
    """Shared format resolution for read/write: explicit format wins;
    otherwise identifiers route to iceberg when a runtime exists, paths
    to parquet. Asking for iceberg without a runtime raises here —
    silently reading the wrong thing is the failure mode this module
    exists to prevent."""
    fmt, avail = format, None
    if fmt is None:
        avail = _looks_like_identifier(source) and iceberg_available(spark)
        fmt = "iceberg" if avail else "parquet"
    if fmt == "iceberg":
        if avail is None:
            avail = iceberg_available(spark)
        if not avail:
            raise RuntimeError(
                "iceberg requested but no Iceberg catalog/runtime is "
                "configured in this SparkSession"
            )
    if fmt not in ("iceberg", "parquet"):
        raise ValueError(f"unsupported table format: {fmt!r}")
    return fmt


def read_table(
    spark: SparkSession, source: str, format: str | None = None
) -> DataFrame:
    """Read ``source`` as an Iceberg identifier when it looks like one
    (and the runtime is present), else as parquet. Explicit ``format``
    overrides the guess; asking for iceberg without a runtime raises
    rather than silently reading the wrong thing."""
    fmt = _resolve_format(spark, source, format)
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_table(
    df: DataFrame, target: str, format: str | None = None
) -> None:
    """Write ``df`` to ``target``: Iceberg identifiers go through the
    DataFrameWriterV2 atomic ``createOrReplace``; paths are parquet
    overwrite writes (compose with ``operators.layout.write_clustered``
    when scan layout matters)."""
    spark = df.sparkSession
    fmt = _resolve_format(spark, target, format)
    if fmt == "iceberg":
        df.writeTo(target).using("iceberg").createOrReplace()
        return
    df.write.mode("overwrite").parquet(target)
