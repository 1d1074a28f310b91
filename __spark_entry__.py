"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship rollup + wavelet pipeline (the north-star path)
on a deterministic synthetic transcript table.
``queries()`` — one entry per implemented operator family from SURVEY.md §2
plus the training-data operators; each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
(identical column names/order; float outputs rounded to 6 decimals on both
sides so engine-order float reassociation cannot flip the value hash).
Non-SQL-expressible ops (wavelet pyramids, codecs, LSH structures) have no
oracle entry -> rows-only driver check; their correctness is carried by the
golden-parity and property test-suite (tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKEN_REGEX = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        from wavelet_decomposition_spark.plans.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added, or running from the repo root anyway


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _norm_text(c):
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Rollup + wavelet flagship: synthetic transcripts -> 1s activity tier
    -> 1m rollup -> gap-fill -> Haar DWT energy spectrum per conversation."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import (
        activity,
        gapfill,
        rollup,
        wavelet_ops,
    )

    tx = transcripts_df(spark, 300, seed=42)
    raw = activity.activity_raw(tx)
    tier_1m = rollup.rollup_once(raw, "1m")
    filled = gapfill.gapfill_zero(
        tier_1m, activity.ACTIVITY_COUNT_COLS, step="1 minute"
    )
    return wavelet_ops.energy_windows(
        filled, "turns", wavelet="haar", levels=4, window_len=64
    )


# ---------------------------------------------------------------------------
# oracle-checked queries
# ---------------------------------------------------------------------------

def _q_activity_1m(spark, sf_dir):
    """Per-(event_type, minute) activity tier — counts and 6-dp value
    sums; the base continuous aggregate of the rollup tower."""
    _prep(spark)
    return (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def _q_rollup_1h(spark, sf_dir):
    """1m -> 1h cascade (continuous-aggregate composition; oracle aggregates
    straight from raw — equality IS the rollup-correctness statement)."""
    _prep(spark)
    one_m = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.count(F.lit(1)).alias("turns"), F.sum("value").alias("sum_value"))
    )
    return (
        one_m.groupBy(
            "event_type", F.date_trunc("hour", F.col("bucket_ts")).alias("bucket_ts")
        )
        .agg(
            F.sum("turns").alias("turns"),
            F.round(F.sum("sum_value"), 6).alias("total_value"),
        )
    )


def _q_tier_routed_read(spark, sf_dir):
    """Read-side tier routing (operators/router.py): for a 7-day range and a
    200-point budget the router picks the finest tier whose point count fits
    (raw=604,800 / 1m=10,080 / 1h=168 -> 1h), writes that tier of the rollup
    cascade day-partitioned, and reads the range back partition-pruned (day
    directories at plan time, bucket_ts via parquet row-group stats).
    Retention is exercised too: with raw expiring after 3 days and 1m after
    10 (relative to the fixed 'now'), even an unbounded point budget
    degrades to 1h for this range — both decisions are asserted in-query,
    and the oracle pins them again cross-engine: it aggregates at exactly
    date_trunc('hour'), so a router regression to any other tier changes
    every output row."""
    _prep(spark)
    import os
    import tempfile
    from datetime import datetime

    from wavelet_decomposition_spark.operators import rollup
    from wavelet_decomposition_spark.operators.router import (
        choose_tier,
        read_tier_range,
    )

    start, end = datetime(2024, 1, 5), datetime(2024, 1, 12)
    retention = {"raw": 3, "1m": 10, "1h": 60, "1d": 3650}
    now = datetime(2024, 1, 31)
    tier, _ = choose_tier(start, end, 200, retention_days=retention, now=now)
    tier_unbounded, _ = choose_tier(
        start, end, 10**9, retention_days=retention, now=now
    )
    if tier != "1h" or tier_unbounded != "1h":  # pin the routing decisions
        raise RuntimeError(f"router regression: {tier}/{tier_unbounded}")

    one_m = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.count(F.lit(1)).alias("turns"), F.sum("value").alias("sum_value"))
    )
    one_h = one_m.groupBy(
        "event_type", F.date_trunc("hour", F.col("bucket_ts")).alias("bucket_ts")
    ).agg(F.sum("turns").alias("turns"), F.sum("sum_value").alias("sum_value"))
    base = (
        f"{tempfile.gettempdir()}/wds_tier_store_"
        f"{os.path.basename(sf_dir.rstrip('/'))}"
    )
    rollup.write_tier(one_h, base, tier)
    return read_tier_range(spark, base, tier, start, end).select(
        "event_type",
        "bucket_ts",
        "turns",
        F.round(F.col("sum_value"), 6).alias("total_value"),
        F.lit(tier).alias("tier"),
    )


def _q_scd2_build(spark, sf_dir):
    """SCD2 version history (operators/scd.py): collapse each user's
    event_type change stream into validity intervals — one row per run of
    equal attribute, half-open valid_from/valid_to chaining, is_current on
    the last run. One shuffle total (the groupBy and both windows share the
    user_id hash partitioning; pinned in tests/test_scd_compact.py). The
    DuckDB oracle rebuilds the same runs with window functions."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.scd import changes_to_scd2

    return changes_to_scd2(
        _events(spark, sf_dir), "user_id", "event_type", "ts",
        tiebreak="event_id",
    )


def _q_compact_tier(spark, sf_dir):
    """Tier-store small-file compaction (operators/compact.py — the Iceberg
    rewriteDataFiles bin-pack analog): a fragmented day-partitioned 1m tier
    (16 writer tasks per refresh) is rewritten to ceil(rows/target) files
    per day and verified from the data itself. Rows-only but SELF-VERIFYING
    per day partition: files_ok (exact bin-pack file count), rows_ok, and
    checksum_ok (order-free bit_xor of xxhash64 over all value columns —
    content identity, not just cardinality); fewer_ok pins that compaction
    actually reduced the file count."""
    _prep(spark)
    import os
    import tempfile

    from wavelet_decomposition_spark.operators.compact import (
        compact_partitioned,
    )

    tag = os.path.basename(sf_dir.rstrip("/"))
    src = f"{tempfile.gettempdir()}/wds_compact_src_{tag}"
    dst = f"{tempfile.gettempdir()}/wds_compact_dst_{tag}"
    one_m = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.count(F.lit(1)).alias("turns"), F.sum("value").alias("sum_value"))
        .withColumn("day", F.to_date("bucket_ts"))
    )
    one_m.repartition(16).write.mode("overwrite").partitionBy("day").parquet(src)
    out = compact_partitioned(spark, src, dst, "day", target_rows_per_file=2000)
    return out.select(
        F.col("day").cast("string").alias("day"),
        "files_before",
        "files_after",
        "rows",
        "files_ok",
        "rows_ok",
        "checksum_ok",
        (F.col("files_after") <= F.col("files_before")).alias("fewer_ok"),
    )


def _q_tier_refresh_resume(spark, sf_dir):
    """Resumable incremental tier refresh (io/checkpoint.py refresh_tier) —
    the north rule's 'resumable from checkpoint with per-partition lineage'
    clause, driver-exposed. Three refreshes of an hourly tier over the
    per-day-fingerprinted event stream: a cold full build, an unchanged
    rerun, and a crash-resume rerun after one day's manifest fingerprint is
    poisoned (the lost-manifest-append seam — the partition write is
    idempotent overwrite, so the rebuild must be content-identical).
    Rows-only but SELF-VERIFYING per day: full_build_ok (cold build touched
    every day), idempotent_ok (unchanged rerun rebuilt nothing),
    targeted_rebuild_ok (resume rebuilt exactly the poisoned day), and
    content_stable_ok (every day's manifest content hash — including the
    rebuilt one — is byte-stable across the three refreshes)."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from wavelet_decomposition_spark.io import checkpoint as ckpt

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{tempfile.gettempdir()}/wds_refresh_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    inp = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))

    def compute(day_slice):
        return day_slice.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
        ).agg(
            F.count(F.lit(1)).alias("turns"), F.sum("value").alias("sum_value")
        )

    built1 = ckpt.refresh_tier(spark, inp, compute, base, "1h", max_concurrency=4)
    man1 = ckpt.read_manifest(base, "1h")
    built2 = ckpt.refresh_tier(spark, inp, compute, base, "1h", max_concurrency=4)
    target = sorted(man1)[0]
    poisoned = dict(man1[target])
    poisoned["input_fp"] = "lost-append-simulation"
    ckpt._append_manifest(base, "1h", poisoned)  # crash-seam simulation
    built3 = ckpt.refresh_tier(spark, inp, compute, base, "1h", max_concurrency=4)
    man3 = ckpt.read_manifest(base, "1h")
    n_days = len(man1)
    rows = [
        (
            day,
            int(man1[day]["n_rows"]),
            n_days > 0 and len(built1) == n_days,
            len(built2) == 0,
            built3 == [target],
            man3[day]["content_hash"] == man1[day]["content_hash"],
        )
        for day in sorted(man1)
    ]
    return spark.createDataFrame(
        rows,
        "day string, rows bigint, full_build_ok boolean, idempotent_ok "
        "boolean, targeted_rebuild_ok boolean, content_stable_ok boolean",
    )


def _q_scd2_asof_probe(spark, sf_dir):
    """Point-in-time probe against the SCD2 history (the table's purpose):
    which version was current for every user at a fixed instant — the
    half-open intervals guarantee exactly one row per user with history at
    or before the probe, which the oracle re-derives independently from
    the same run construction. At scale this is the dimension side of a
    temporal join: valid_from <= T < valid_to is a pure filter on the
    versioned table, no window re-evaluation at probe time."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.scd import changes_to_scd2

    probe = F.lit("2024-01-15 12:00:00").cast("timestamp_ntz")
    hist = changes_to_scd2(
        _events(spark, sf_dir), "user_id", "event_type", "ts",
        tiebreak="event_id",
    )
    return hist.where(
        (F.col("valid_from") <= probe)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > probe))
    ).select("user_id", "version", "event_type", "valid_from", "is_current")


def _q_tier_retention_expiry(spark, sf_dir):
    """Retention expiry sweep (io/checkpoint.py expire_tier/apply_retention)
    — the north rule's tier-expiry clause, driver-exposed. Builds a raw+1h
    tier store over the 30-day event stream, applies a per-tier policy
    (raw keeps 7 days, 1h keeps forever) at a fixed 'today', and verifies
    per tier-day from the store itself: dropped_ok (exactly the days
    before each tier's cutoff are gone from disk AND from the manifest),
    survivor_ok (every surviving day's partition still matches its
    manifest content hash — expiry touched nothing it kept), and
    refresh_ok (a horizon-filtered refresh after expiry rebuilds
    nothing — the manifest rewrite is consistent)."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from wavelet_decomposition_spark.io import checkpoint as ckpt

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"{tempfile.gettempdir()}/wds_expiry_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    inp = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))

    def compute_raw(day_slice):
        return day_slice.groupBy(
            "event_type", F.date_trunc("second", F.col("ts")).alias("bucket_ts")
        ).agg(F.count(F.lit(1)).alias("turns"))

    def compute_1h(day_slice):
        return day_slice.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
        ).agg(F.count(F.lit(1)).alias("turns"))

    ckpt.refresh_tier(spark, inp, compute_raw, base, "raw", max_concurrency=4)
    ckpt.refresh_tier(spark, inp, compute_1h, base, "1h", max_concurrency=4)
    man_before = {
        t: ckpt.read_manifest(base, t) for t in ("raw", "1h")
    }
    today = "2024-01-31"
    dropped = ckpt.apply_retention(base, {"raw": 7, "1h": 3650}, today)
    cutoffs = {"raw": "2024-01-24", "1h": "2021-01-31"}

    rows = []
    for tier in ("raw", "1h"):
        man_after = ckpt.read_manifest(base, tier)
        tier_dir = f"{base}/tier={tier}"
        on_disk = {
            e[4:] for e in os.listdir(tier_dir) if e.startswith("day=")
        }
        for day, meta in sorted(man_before[tier].items()):
            expired = day < cutoffs[tier]
            dropped_ok = (
                (day in dropped[tier]) == expired
                and (day in on_disk) != expired
                and (day in man_after) != expired
            )
            if expired:
                survivor_ok = True  # nothing to compare; gone is correct
            else:
                import pyspark.sql.functions as _F

                written = spark.read.parquet(f"{tier_dir}/day={day}")
                content = written.agg(
                    _F.sum(
                        _F.xxhash64(*written.columns).cast("decimal(38,0)")
                    ).alias("h")
                ).collect()[0]
                survivor_ok = str(content["h"]) == man_after[day]["content_hash"]
            rows.append((tier, day, expired, dropped_ok, survivor_ok))

    # horizon-filtered refresh after expiry must rebuild nothing
    horizon = inp.filter(F.col("day") >= F.lit(cutoffs["raw"]).cast("date"))
    refresh_ok = (
        ckpt.refresh_tier(spark, horizon, compute_raw, base, "raw",
                          max_concurrency=4) == []
    )
    return spark.createDataFrame(
        [(t, d, e, dok, sok, refresh_ok) for t, d, e, dok, sok in rows],
        "tier string, day string, expired boolean, dropped_ok boolean, "
        "survivor_ok boolean, refresh_ok boolean",
    )


def _q_table_profile(spark, sf_dir):
    """Ingest-time column profiling (operators/profile.py): one scan, one
    unpivot, one grouped aggregate — per-column rows/nulls/exact-distinct/
    min/max in long format; adding profiled columns never adds scans
    (plan-pinned in tests/test_profile.py). The 100-TB variant swaps
    count_distinct for approx_count_distinct (exact=False) — same plan
    minus the distinct pre-aggregation."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.profile import profile_columns

    src = _events(spark, sf_dir).select(
        "event_type",
        F.col("user_id").cast("string").alias("user_id"),
        "props",
        F.to_date("ts").cast("string").alias("day"),
    )
    return profile_columns(src, ["event_type", "user_id", "props", "day"])


def _q_normalize_by_group(spark, sf_dir):
    """P2 — per-group mean normalization."""
    _prep(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return _events(spark, sf_dir).select(
        "event_id",
        F.round(F.col("value") / F.avg("value").over(w), 6).alias("norm_value"),
    )


def _q_per_group_limit(spark, sf_dir):
    """P1 — per-group positional limit (leap-trim pattern)."""
    _prep(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("event_type", "event_id", "rn")
    )


def _q_circular_shift(spark, sf_dir):
    """P5 — circular index translation within each group."""
    _prep(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    cnt = Window.partitionBy("event_type")
    return _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.pmod(
            F.row_number().over(w) - 1 + F.lit(7), F.count(F.lit(1)).over(cnt)
        ).alias("shifted_idx"),
    )


def _q_series_diff(spark, sf_dir):
    """P6/J1 — aligned series subtraction via equi-join (click minus view
    counts per minute)."""
    _prep(spark)
    ev = _events(spark, sf_dir)
    minute = F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(minute).agg(F.count(F.lit(1)).alias("n_click"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(minute).agg(F.count(F.lit(1)).alias("n_view"))
    )
    return clicks.join(views, "bucket_ts").select(
        "bucket_ts", (F.col("n_click") - F.col("n_view")).alias("diff")
    )


def _q_mask_case(spark, sf_dir):
    """P7 — CASE masking before aggregation."""
    _prep(spark)
    return (
        _events(spark, sf_dir)
        .select(
            "event_type",
            F.when(
                F.col("event_type").isin("click", "view"), F.col("value")
            ).otherwise(F.lit(0.0)).alias("masked"),
        )
        .groupBy("event_type")
        .agg(F.round(F.sum("masked"), 6).alias("masked_sum"))
    )


def _q_epn_thresholds(spark, sf_dir):
    """A6 — EPN analytics via the engine operator, fed lineitem prices as
    coefficients (scale_idx = l_linenumber - 1)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.epn import epn

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    betas = li.select(
        F.lit("li").alias("series_id"),
        (F.col("l_linenumber") - 1).cast("int").alias("scale_idx"),
        F.col("l_extendedprice").alias("beta"),
    )
    out = epn(spark, betas, [90.0], n_years=1)
    return out.select(
        "scale_idx",
        "satisfaction",
        F.round("pmax", 6).alias("pmax"),
        F.round("emax", 6).alias("emax"),
        F.round("n", 6).alias("n_cycles"),
        F.round("uf", 6).alias("uf"),
        # serv = emax * n is O(1e9); oracle-compare it in scaled millions so
        # the 6-decimal rounding absorbs float reassociation (~1e-2 abs)
        # while still pinning all meaningful digits — all six calc_EPN.py
        # outputs are now DuckDB-checked (exact-value pytest oracle remains
        # in tests/test_epn.py)
        F.round(F.col("serv") / 1e6, 6).alias("serv_m"),
    )


def _q_sketch_quantiles(spark, sf_dir):
    """Sketch-based quantiles — the 100-TB path for percentiles (an exact
    percentile needs a per-group sort shuffle; the GK sketch partial-
    aggregates map-side and merges). Per event_type, p50/p95/p99 via
    ``percentile_approx(accuracy=10k)`` alongside the exact order
    statistics. Rows-only but SELF-VERIFYING the same way `epn_approx`
    is: GK guarantees rank error <= n/accuracy, so each approx value must
    lie within the exact order-statistics band around its target rank —
    ``sketch_ok`` rides on every row and the local gate asserts it."""
    _prep(spark)
    from pyspark.sql import Window

    acc = 10_000
    qs = [0.5, 0.95, 0.99]
    ev = _events(spark, sf_dir).select("event_type", "value")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, acc).alias("_ap"),
        F.count(F.lit(1)).alias("n_size"),
    )
    approx = approx.select(
        "event_type",
        "n_size",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.col("_ap").alias("approx"),
            )
        ).alias("_z"),
    ).select(
        "event_type", "n_size", F.col("_z.q").alias("q"),
        F.col("_z.approx").alias("approx"),
    )
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rnk", F.row_number().over(w))
    banded = approx.withColumn(
        "_t", F.ceil(F.col("q") * F.col("n_size")).cast("int")
    ).withColumn("_e", (F.col("n_size") / acc).cast("int") + 1)
    lo_hi = (
        ranked.join(
            F.broadcast(banded), "event_type"
        )
        .filter(
            (F.col("rnk") == F.greatest(F.col("_t") - F.col("_e"), F.lit(1)))
            | (
                F.col("rnk")
                == F.least(F.col("_t") + F.col("_e"), F.col("n_size"))
            )
        )
        .groupBy("event_type", "q")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    return (
        banded.join(lo_hi, ["event_type", "q"])
        .select(
            "event_type",
            F.round("q", 2).alias("q"),
            F.round("approx", 6).alias("approx"),
            F.round("lo", 6).alias("lo"),
            F.round("hi", 6).alias("hi"),
            (
                (F.col("approx") >= F.col("lo"))
                & (F.col("approx") <= F.col("hi"))
            ).alias("sketch_ok"),
        )
    )


def _q_sketch_distinct(spark, sf_dir):
    """HyperLogLog++ distinct counts — the 100-TB path for cardinality
    (exact distinct shuffles every key; HLL++ partial-aggregates a
    fixed-size sketch map-side). Per event_type, approx distinct users at
    rsd=2% alongside the exact count. Rows-only, SELF-VERIFYING:
    ``sketch_ok`` asserts |approx-exact| <= 5*rsd*exact — a 5-sigma band,
    and the sketch is deterministic for fixed input, so the check is
    stable, not flaky."""
    _prep(spark)
    rsd = 0.02
    ev = _events(spark, sf_dir)
    out = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return out.select(
        "event_type",
        "approx_users",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 5 * rsd * F.col("exact_users")
        ).alias("sketch_ok"),
    )


def _q_epn_approx(spark, sf_dir):
    """A6's 100-TB escape hatch, driver-exposed (round-3 verdict #8):
    ``epn(..., exact=False)`` computes the discharge threshold with
    ``percentile_approx`` (GK sketch, map-side partial aggregation — the
    per-(group, scale) sort shuffle disappears). Rows-only but
    SELF-VERIFYING: the GK sketch guarantees rank error <= n/accuracy, so
    every approximate threshold must land inside the exact
    order-statistics band around the reference's target rank — ``lo``/
    ``hi`` are computed in-query by an independent rank join and
    ``sketch_ok`` = (lo <= pmax <= hi) rides on every row. The exact form
    is the DuckDB-checked ``epn_thresholds`` above."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.epn import epn

    acc = 10_000
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    betas = li.select(
        F.lit("li").alias("series_id"),
        (F.col("l_linenumber") - 1).cast("int").alias("scale_idx"),
        F.col("l_extendedprice").alias("beta"),
    )
    out = epn(
        spark, betas, [90.0], n_years=1, exact=False, approx_accuracy=acc
    )
    # independent exact rank band: value at rank target +/- (n/acc + 1)
    coeff = betas.filter(F.col("scale_idx") < 15).select(
        "scale_idx", F.abs("beta").alias("ab")
    )
    w = Window.partitionBy("scale_idx").orderBy("ab")
    ranked = coeff.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n_size", F.count(F.lit(1)).over(Window.partitionBy("scale_idx"))
    )
    target = F.ceil(90.0 * F.col("n_size") / 100.0).cast("int")
    err = (F.col("n_size") / acc).cast("int") + 1
    band = (
        ranked.withColumn("_t", target)
        .withColumn("_e", err)
        .filter(
            (F.col("rnk") == F.greatest(F.col("_t") - F.col("_e"), F.lit(1)))
            | (F.col("rnk") == F.least(F.col("_t") + F.col("_e"), F.col("n_size")))
        )
        .groupBy("scale_idx")
        .agg(F.min("ab").alias("lo"), F.max("ab").alias("hi"))
    )
    return out.join(F.broadcast(band), "scale_idx").select(
        "scale_idx",
        "satisfaction",
        F.round("pmax", 6).alias("pmax"),
        F.round("emax", 6).alias("emax"),
        F.round("n", 6).alias("n_cycles"),
        F.round("uf", 6).alias("uf"),
        F.round(F.col("serv") / 1e6, 6).alias("serv_m"),
        (
            (F.col("pmax") >= F.col("lo") - 1e-9)
            & (F.col("pmax") <= F.col("hi") + 1e-9)
        ).alias("sketch_ok"),
    )


def _q_sketch_tier_merge(spark, sf_dir):
    """Mergeable sketch tiers (operators/sketch_tiers.py): hourly
    Datasketches KLL(value) + HLL(user_id) sketches per event_type, MERGED
    to daily sketches without re-reading raw — the only way percentiles and
    distinct counts roll up at 100 TB (hourly p95s don't average into the
    daily p95; hourly distincts double-count). Pure JVM both levels:
    kll_sketch_agg_double -> kll_merge_agg_double, hll_sketch_agg ->
    hll_union_agg; only sketch bytes ride the second exchange (24 rows per
    key-day). Rows-only, SELF-VERIFYING against raw computed in-query:
    ``conservation_ok`` = the merged KLL's own exact stream length
    (kll_sketch_get_n) AND the composed count both equal the exact raw row
    count — every raw row passed the two-level merge tree exactly once;
    ``kll_ok`` = each daily p50/p95/p99 estimate lands inside the exact
    order-statistics band at rank +/- 0.05 (KLL's merge theorem preserves
    the k=200 ~1.65%-sigma rank bound; KLL compaction is randomized so
    bands, never equality); ``hll_ok`` = merged distinct estimate within
    5*rsd of exact (rsd = 1.04/sqrt(2^12), absolute floor 2)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.sketch_tiers import (
        HLL_LG_K,
        hll_rsd,
        merge_sketch_tier,
        rank_band_columns,
        read_sketch_tier,
        sketch_tier,
    )

    probs = [0.5, 0.95, 0.99]
    eps = 0.05
    ev = _events(spark, sf_dir).select("event_type", "ts", "value", "user_id")
    hourly = sketch_tier(ev, ["event_type"], "ts", "value", "user_id", "1h")
    daily = read_sketch_tier(
        merge_sketch_tier(hourly, ["event_type"], "1d"), probs
    )
    # verification side (exact, raw-scan — exists only to check the cascade)
    exact = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.countDistinct("user_id").alias("d_exact"),
        *rank_band_columns(F.col("value"), probs, eps),
    )
    kll_ok = None
    for p in probs:
        tag = f"p{int(round(p * 100)):02d}"
        c = (F.col(f"{tag}_est") >= F.col(f"{tag}_lo")) & (
            F.col(f"{tag}_est") <= F.col(f"{tag}_hi")
        )
        kll_ok = c if kll_ok is None else (kll_ok & c)
    return (
        daily.join(F.broadcast(exact), ["event_type", "bucket_ts"])
        .select(
            "event_type",
            "bucket_ts",
            "n_rows",
            "distinct_est",
            "d_exact",
            *[f"p{int(round(p * 100)):02d}_est" for p in probs],
            (
                (F.col("kll_n") == F.col("n_exact"))
                & (F.col("n_rows") == F.col("n_exact"))
            ).alias("conservation_ok"),
            kll_ok.alias("kll_ok"),
            (
                F.abs(F.col("distinct_est") - F.col("d_exact"))
                <= F.greatest(
                    F.lit(5 * hll_rsd(HLL_LG_K)) * F.col("d_exact"), F.lit(2.0)
                )
            ).alias("hll_ok"),
        )
        .orderBy("event_type", "bucket_ts")
    )


def _q_dwt_denoise(spark, sf_dir):
    """Wavelet shrinkage denoising (operators/wavelet_ops.py
    denoise_windows — Donoho-Johnstone VisuShrink) over db4 pyramids of
    the transcript 1m activity tier: per dyadic window, noise scale from
    the finest detail band's MAD, soft-threshold every detail coefficient
    at sigma*sqrt(2 ln n), inverse DWT. Same bucketed Arrow execution as
    dwt_energy. Rows-only, SELF-VERIFYING via identities computed in the
    same kernel pass that the output cannot satisfy by accident:
    ``parseval_ok`` (orthonormal DWT conserves energy between the time
    and coefficient domains), ``roundtrip_ok`` (inverse(forward(x)) == x
    to 1e-9 on the UNSHRUNK coefficients — perfect reconstruction rides
    every row), ``energy_ok`` (shrinkage is pointwise |c'| <= |c| on an
    orthonormal basis, so denoised energy can only decrease), and
    ``zeroed_ok`` (0 <= n_zeroed <= n_detail)."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import (
        activity,
        gapfill,
        rollup,
    )
    from wavelet_decomposition_spark.operators.wavelet_ops import (
        denoise_windows,
    )

    tx = transcripts_df(spark, 100, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    filled = gapfill.gapfill_zero(
        tier, activity.ACTIVITY_COUNT_COLS, step="1 minute"
    )
    out = denoise_windows(
        filled, "turns", wavelet="db4", levels=4, window_len=64
    )
    return out.select(
        "conv_id",
        "window_id",
        "wavelet",
        "n",
        F.round("sigma", 6).alias("sigma"),
        F.round("threshold", 6).alias("threshold"),
        F.round("input_energy", 6).alias("input_energy"),
        F.round("den_energy", 6).alias("den_energy"),
        "n_zeroed",
        "n_detail",
        (
            F.abs(F.col("coef_energy") - F.col("input_energy"))
            <= 1e-6 * F.greatest(F.col("input_energy"), F.lit(1.0))
        ).alias("parseval_ok"),
        (F.col("roundtrip_rel_err") <= 1e-9).alias("roundtrip_ok"),
        (
            F.col("den_energy")
            <= F.col("input_energy")
            + 1e-6 * F.greatest(F.col("input_energy"), F.lit(1.0))
        ).alias("energy_ok"),
        (
            (F.col("n_zeroed") >= 0)
            & (F.col("n_zeroed") <= F.col("n_detail"))
        ).alias("zeroed_ok"),
    ).orderBy("conv_id", "window_id")


def _q_response_latency(spark, sf_dir):
    """Turn-taking latency over the transcript table (the payload axis):
    per conversation, the assistant's response delay on every user ->
    assistant transition (stable turn_idx ordering, exact integer
    microseconds) aggregated to count / mean / max. Rows-only (transcripts
    aren't a DuckDB view), SELF-VERIFYING by full computation-path
    redundancy: the same latencies are derived through one lag WINDOW and
    independently through a turn_idx self-JOIN (cur.turn_idx ==
    prev.turn_idx + 1), and ``dual_ok`` asserts (n, sum, max) agree
    integer-exactly per conversation — a mis-ordered window or a dropped
    join row cannot balance all three books. ``nonneg_ok`` pins the
    within-conversation timestamp monotonicity invariant."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io.transcripts import transcripts_df

    tx = transcripts_df(spark, 400, seed=42).select(
        "conv_id", "turn_idx", "role", F.unix_micros("ts").alias("_us")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    path_a = (
        tx.withColumn("_pus", F.lag("_us").over(w))
        .withColumn("_prole", F.lag("role").over(w))
        .where(
            (F.col("role") == "assistant") & (F.col("_prole") == "user")
        )
        .select("conv_id", (F.col("_us") - F.col("_pus")).alias("lat_us"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_responses"),
            F.sum("lat_us").alias("sum_lat_us"),
            F.max("lat_us").alias("max_lat_us"),
            F.min("lat_us").alias("_min_lat"),
        )
    )
    cur = tx.where(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", F.col("_us").alias("_cus")
    )
    prev = tx.where(F.col("role") == "user").select(
        "conv_id",
        (F.col("turn_idx") + 1).alias("turn_idx"),
        F.col("_us").alias("_pus"),
    )
    path_b = (
        cur.join(prev, ["conv_id", "turn_idx"])
        .select("conv_id", (F.col("_cus") - F.col("_pus")).alias("lat_us"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("_n_b"),
            F.sum("lat_us").alias("_sum_b"),
            F.max("lat_us").alias("_max_b"),
        )
    )
    return (
        path_a.join(path_b, "conv_id")
        .select(
            "conv_id",
            "n_responses",
            (
                F.col("sum_lat_us").cast("double")
                / F.col("n_responses")
                / 1e6
            ).alias("mean_lat_s"),
            "max_lat_us",
            (
                (F.col("n_responses") == F.col("_n_b"))
                & (F.col("sum_lat_us") == F.col("_sum_b"))
                & (F.col("max_lat_us") == F.col("_max_b"))
            ).alias("dual_ok"),
            (F.col("_min_lat") >= 0).alias("nonneg_ok"),
        )
        .orderBy("conv_id")
    )


def _q_dtw_pairs(spark, sf_dir):
    """Banded dynamic-time-warping distances between the per-type hourly
    activity series (operators/dtw.py) — phase-robust series similarity
    next to the Pearson corr_matrix (a burst an hour late is 'near' under
    DTW, 'far' under Euclid). Series are zero-filled onto one shared
    hourly grid (equal lengths by construction), packed to arrays in one
    hash aggregate, pairs enumerated JVM-side (transform/flatten/explode —
    no join, no nested-loop plan), scored by an anti-diagonal-vectorized
    Arrow kernel at Sakoe-Chiba radius 24 h and 72 h in one pass.
    Rows-only, SELF-VERIFYING with DTW's provable properties computed
    in-query: ``self_ok`` = dtw(x,x) == 0 on the identity pairs;
    ``bound_ok`` = dtw <= Euclid (the diagonal path is admissible inside
    any band); ``band_ok`` = the 72 h-band distance <= the 24 h-band
    distance (wider band = superset of warping paths). A kernel that
    mis-scores or mis-aligns cannot satisfy all three."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.dtw import dtw_allpairs

    counts = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded scalar collect: the global grid endpoints (2 timestamps)
    lo, hi = counts.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    grid = (
        counts.select("series_id")
        .distinct()
        .select(
            "series_id",
            F.explode(
                F.sequence(
                    F.lit(lo), F.lit(hi), F.expr("interval 1 hour")
                )
            ).alias("bucket_ts"),
        )
    )
    filled = grid.join(counts, ["series_id", "bucket_ts"], "left").select(
        "series_id",
        "bucket_ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("v"),
    )
    out = dtw_allpairs(
        filled, "series_id", "bucket_ts", "v",
        radius=24, wide_radius=72, include_self=True,
    )
    return out.select(
        "key_a",
        "key_b",
        "n_a",
        F.round("dtw", 6).alias("dtw"),
        F.round("dtw_wide", 6).alias("dtw_wide"),
        F.round("euclid", 6).alias("euclid"),
        F.when(F.col("key_a") == F.col("key_b"), F.col("dtw") == 0.0)
        .otherwise(F.lit(True))
        .alias("self_ok"),
        (F.col("dtw") <= F.col("euclid") + 1e-9).alias("bound_ok"),
        (F.col("dtw_wide") <= F.col("dtw") + 1e-9).alias("band_ok"),
    ).orderBy("key_a", "key_b")


def _q_topk_argmin(spark, sf_dir):
    """A11 pattern — per-group argmax bucket (orderBy + limit shape)."""
    _prep(spark)
    from pyspark.sql import Window

    per_min = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("bucket_ts"))
    return (
        per_min.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "bucket_ts", "n")
    )


def _q_pricing_summary(spark, sf_dir):
    """Pushdown + partial-agg showcase (TPC-H Q1 shape on lineitem).

    Sums quantize the inputs to integer units first (quantity/price at
    1e-2, discount at 1e-4) and sum LONGs: integer sums are order-free and
    bit-identical cross-engine at ANY scale, where a double sum + round is
    at the mercy of association order — the first sf1.0 oracle run caught
    exactly that (~1e-5 drift on 5e10 sums). The quantized sums stay far
    under 2^53, so the final double divisions are exact and identical in
    both engines."""
    _prep(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q_units = F.round(F.col("l_quantity") * 100).cast("long")
    p_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    d_units = F.round(F.col("l_discount") * 10000).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-06-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(q_units).cast("double") / F.lit(100.0)).alias("sum_qty"),
            (F.sum(p_cents).cast("double") / F.lit(100.0)).alias(
                "sum_base_price"
            ),
            (
                F.sum(d_units).cast("double")
                / F.lit(10000.0)
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_nation_revenue(spark, sf_dir):
    """J2 — dimension joins (orders -> customer -> nation). Broadcast
    discipline, learned from the 10x robustness run (BENCH.md): nation is
    FIXED-cardinality (25 rows forever) and is pinned broadcast; customer
    SCALES with the fact table (15k at sf0.1, 15M at sf100 — a pinned
    broadcast OOMs the driver at scale and its single-threaded build cost
    already dominated the sf1.0 wall), so that join is left to AQE, which
    broadcasts it at runtime exactly while the measured size stays under
    threshold and shuffle-joins beyond."""
    _prep(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / F.lit(100.0)
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def _q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): customer segment filter ->
    broadcast join into orders -> shuffle join into lineitem -> top 10
    unshipped orders by revenue. Revenue is quantized to exact 10^-4
    units before summing (price has 2 dp, discount 2 dp, so
    price*(1-disc) is a 4-dp decimal: integer sums are order-free and
    bit-identical cross-engine; a float sum + round would be at the
    mercy of association order). Deterministic (revenue desc, orderkey)
    top-k."""
    _prep(spark)
    cutoff = F.lit("1998-06-15").cast("timestamp_ntz")
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_shipdate") > cutoff)
        .select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
            ).cast("bigint").alias("_rev4"),
        )
    )
    return (
        # cust scales with sf (even segment-filtered) — broadcast is AQE's
        # runtime call from the measured size, not a pin (see nation_revenue)
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum("_rev4") / 10_000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def _q_returned_customers(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): lineitem returnflag +
    order-date-quarter filters -> shuffle join on orderkey -> broadcast
    joins into customer and nation -> top 20 customers by lost revenue.
    Same exact 1e-4-unit revenue quantization as shipping_priority, so
    the top-k boundary is deterministic cross-engine."""
    _prep(spark)
    lo = F.lit("1997-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-04-01").cast("timestamp_ntz")
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
            ).cast("bigint").alias("_rev4"),
        )
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # cust scales with sf — AQE's runtime call (see nation_revenue);
        # nation is fixed-cardinality and stays pinned
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (F.sum("_rev4") / 10_000.0).alias("revenue"),
            F.round(F.first("c_acctbal"), 6).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def _q_dedup_groups(spark, sf_dir):
    """Exact dedup groups over normalized-text fingerprints."""
    _prep(spark)
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_id"))
    )


def _q_dedup_keep_first(spark, sf_dir):
    """Exact dedup survivors (lowest doc_id per normalized-text group) —
    the operator form of dedup_groups."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).select("doc_id")


def _q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs >= 0.1."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.1)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _q_doc_stats(spark, sf_dir):
    """Token counting + fingerprinting (text-analysis column ops)."""
    _prep(spark)
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.split(_norm_text(F.col("text")), " ")).alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(_TOKEN_REGEX)).alias("n_tokens"),
        F.md5(_norm_text(F.col("text"))).alias("fingerprint"),
    )


def _q_lang_marker_hits(spark, sf_dir):
    """Language-ID marker counts (the lang_id heuristic's inputs)."""
    _prep(spark)
    docs = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), _norm_text(F.col("text")), F.lit(" "))
    def hits(words):
        e = F.lit(0)
        for w in words:
            e = e + F.regexp_count(padded, F.lit(rf" {w} "))
        return e
    return docs.select(
        "doc_id",
        hits(["the", "and", "of", "to", "is"]).alias("en_hits"),
        hits(["le", "la", "et", "les", "est"]).alias("fr_hits"),
        hits(["der", "die", "und", "das", "ist"]).alias("de_hits"),
        hits(["el", "la", "de", "que", "es"]).alias("es_hits"),
    )


def _q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 3 query vectors (ANN baseline)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), "rank"
    )


def _q_cosine_pairs(spark, sf_dir):
    """Exact embedding near-dup pairs (cosine >= 0.5) — the verification
    oracle for the LSH-bucketed variant."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.similarity import (
        cosine_allpairs_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = cosine_allpairs_exact(emb, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _q_stratified_split(spark, sf_dir):
    """Deterministic train/val/test assignment (80/10/10) by hash-bucket
    thresholds on doc_id — stable under reruns, repartitioning, and
    appends, unlike DataFrame.sample. The portable 31-bit LCG method runs
    bit-identically in the DuckDB oracle; the xxhash64 production path is
    property-tested in tests/test_sampling.py."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.sampling import assign_splits

    return assign_splits(
        _docs(spark, sf_dir).select("doc_id"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col="doc_id", seed=42, method="lcg",
    )


def _q_domain_mix(spark, sf_dir):
    """Per-source sampling rates hitting a 50k-token budget under a
    uniform target mix: rate = min(1, budget*w/tokens). The one aggregate
    is n_sources rows; applying the rates stays shuffle-free."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.sampling import domain_mix

    return domain_mix(_docs(spark, sf_dir), budget_tokens=50_000)


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing any word 3-gram with the
    held-out set (doc_id % 37 == 0) are flagged. Benchmark gram set is
    broadcast; the corpus is scanned once with no corpus-side shuffle
    before the per-doc hit aggregate."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.decontam import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    return decontaminate(corpus, bench, n=3)


def _q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER formation: connected components (large-star/
    small-star, O(log n) rounds) over the exact cosine>=0.5 pair list,
    then one canonical keeper per cluster. The step every pairwise dedup
    pipeline needs before it can actually drop rows; oracle is a DuckDB
    recursive CTE computing min-reachable-id per node."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.components import dedup_clusters

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = _q_cosine_pairs(spark, sf_dir).select("id_a", "id_b")
    return dedup_clusters(
        emb.select("vec_id"), pairs, id_col="vec_id"
    ).select(
        "vec_id", "component", "cluster_size", "is_canonical"
    )


def _q_gapfill_locf(spark, sf_dir):
    """Gap-fill to a 1-minute grid with last-observation-carried-forward."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.gapfill import gapfill_locf

    per_min = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.avg("value").alias("avg_value"))
    )
    filled = gapfill_locf(
        per_min, ["avg_value"], step="1 minute", group_col="event_type"
    )
    return filled.select(
        "event_type", "bucket_ts", F.round("avg_value", 6).alias("avg_value")
    )


def _q_gapfill_interp(spark, sf_dir):
    """Gap-fill to a 1-minute grid with linear interpolation between the
    surrounding observations (the continuous-gauge policy; LOCF's
    step-function twin is `gapfill_locf`). Grid edges are observed by
    construction (the grid spans each group's [min, max]), so every output
    value is defined.

    The gauge is min(value) — an exact selection, bit-reproducible across
    engines — and the output is deliberately UNROUNDED: the ratio-first
    interp formula then yields bit-identical doubles in Spark and DuckDB,
    whereas a round(6) of avg()-based midpoints systematically lands on
    .5e-6 ties where the two engines' round() tie-breaking differs."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.gapfill import gapfill_interp

    per_min = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.min("value").alias("min_value"))
    )
    filled = gapfill_interp(
        per_min, ["min_value"], step="1 minute", group_col="event_type"
    )
    return filled.select("event_type", "bucket_ts", "min_value")


def _q_asof_join(spark, sf_dir):
    """As-of join: attach to every click the user's most recent purchase at
    or before it (inclusive ties, deterministic max_by tie-break on the
    right, left-outer with -1 sentinels so the hash gate never sees NaN).
    Union-window form — ONE shuffle, no join explosion; oracle is DuckDB's
    native ASOF LEFT JOIN."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join(
        clicks, purchases, on="user_id", right_cols=["value"],
        tie_break="event_id", suffix="_p",
    )
    age_s = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("ts_p").cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("click_value"),
        F.round(F.coalesce("value_p", F.lit(-1.0)), 6).alias(
            "last_purchase_value"
        ),
        F.coalesce(F.round(age_s, 6), F.lit(-1.0)).alias("purchase_age_s"),
    )


def _q_interval_join(spark, sf_dir):
    """Point-in-interval join (operators/interval.py): attach each click to
    every 30-minute post-purchase window (same user) containing it, then
    aggregate per click — window count and earliest containing window id
    (-1 sentinel when none). Bucketized to a (user_id, 15-min bucket)
    equi-join; the oracle is DuckDB's native range join over the identical
    BETWEEN predicate."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.interval import interval_join

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("interval 30 minutes")).alias("end_ts"),
        F.col("event_id").alias("window_id"),
    )
    joined = interval_join(
        clicks,
        windows,
        on="user_id",
        granularity="15 minutes",
        how="left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("window_id").alias("n_windows"),
        F.coalesce(F.min("window_id"), F.lit(-1).cast("bigint")).alias(
            "first_window_id"
        ),
    )


def _q_time_weighted_avg(spark, sf_dir):
    """Time-weighted hourly mean of the LOCF step function over irregular
    event samples (operators/temporal.py time_weighted_avg): a plain avg()
    over-weights bursts of fast samples; this integrates value*dt, with
    segments split across the buckets they span.

    Cross-engine exactness by construction: values quantized to integer
    cents (the data's native granularity), weights are integer
    microseconds, and every per-bucket sum is bounded by max_cents *
    bucket_us = 1.8e14 < 2^53 — so both engines sum exactly-representable
    integers in any order and the final double divisions are
    bit-identical. Samples deduped to one per (series, ts) via MAX (LOCF
    over a timestamp tie is order-ambiguous in any engine) — max, not
    sum, so the per-sample magnitude bound above survives arbitrarily
    many colliding events."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.temporal import (
        time_weighted_avg,
    )

    samples = (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("series_id"), "ts")
        .agg(
            F.max(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            .alias("v")
        )
    )
    out = time_weighted_avg(samples, bucket="1 hour")
    return out.select(
        "series_id",
        "bucket_ts",
        (F.col("twa") / F.lit(100.0)).alias("twa"),
        "covered_us",
    )


def _q_counter_rate(spark, sf_dir):
    """PromQL-style increase/rate over a cumulative counter with restart
    detection (operators/temporal.py counter_rate): the counter is the
    exact integer running total of event cents modulo 1e6 — the modulus
    manufactures genuine resets (~every 55 samples), so the
    negative-delta branch (contribute v_t, not v_t - v_{t-1}) is
    exercised on real data. All arithmetic is integer-exact in both
    engines; only the final rate division is floating (one deterministic
    op)."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.temporal import counter_rate

    w = (
        Window.partitionBy("series_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counter = (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("series_id"), "ts")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("_c")
        )
        .withColumn("v", (F.sum("_c").over(w) % 1_000_000).cast("double"))
        .drop("_c")
    )
    out = counter_rate(counter, bucket="1 hour")
    return out.select(
        "series_id",
        "bucket_ts",
        F.col("increase").cast("bigint").alias("increase"),
        "n_deltas",
        "n_resets",
        F.round("rate_per_s", 6).alias("rate_per_s"),
    )


def _q_interval_union(spark, sf_dir):
    """Gaps-and-islands union of per-user 30-minute post-purchase windows
    (operators/temporal.py interval_union): overlapping/abutting windows
    merge into maximal spans — the uptime/coverage primitive. Pure
    integer/timestamp output, no float risk. Oracle: the standard
    running-max island construction in DuckDB SQL."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.temporal import interval_union

    windows = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("series_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("interval 30 minutes")).alias("end_ts"),
        )
    )
    out = interval_union(windows)
    return out.select(
        F.col("series_id").alias("user_id"),
        "island_start",
        "island_end",
        "n_intervals",
    )


def _q_ohlc_bars(spark, sf_dir):
    """Hourly OHLC candles per event type (operators/temporal.py
    ohlc_bars — the TimescaleDB candlestick_agg / kdb bar primitive):
    open/close picked by deterministic struct-ordered first/last
    tie-breaks (earliest ts then smallest value; latest ts then largest),
    ONE hash aggregate, no window sort. Cross-engine exactness: values
    are integer cents end to end (min/max/arg-extremes move exact
    integers; the volume sum is bounded far below 2^53), and the oracle
    replays the identical (ts, v) tie-break via row_number."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.temporal import ohlc_bars

    samples = _events(spark, sf_dir).select(
        F.col("event_type").alias("series_id"),
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    out = ohlc_bars(samples, bucket="1 hour", volume_col="v")
    return out.select(
        "series_id",
        "bucket_ts",
        F.col("open").alias("open_cents"),
        F.col("high").alias("high_cents"),
        F.col("low").alias("low_cents"),
        F.col("close").alias("close_cents"),
        "n_samples",
        F.col("volume").alias("volume_cents"),
    )


def _q_state_durations(spark, sf_dir):
    """Time-in-state per user (operators/temporal.py state_durations —
    the TimescaleDB state_agg primitive): each event's type is the user's
    state until their next event (LOCF; the trailing event's holding time
    is unknown and excluded, the time_weighted_avg convention). Durations
    are exact integer microseconds; ``frac`` is ONE division of the same
    two exact integers in both engines (the denominator telescopes to the
    user's last ts minus first ts). Equal-timestamp ties order by
    (ts, state) in both engines — binary-comparable ASCII states."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.temporal import (
        state_durations,
    )

    samples = _events(spark, sf_dir).select(
        F.col("user_id").alias("series_id"), "ts",
        F.col("event_type").alias("state"),
    )
    out = state_durations(samples)
    return out.select(
        F.col("series_id").alias("user_id"),
        "state",
        "total_us",
        "n_segments",
        "frac",
    )


def _q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators/sampling.py weighted_sample — Efraimidis-Spirakis A-ES)
    of 50 documents with weight = n_chars, plus planted weights that
    make the draw falsifiable.

    Planted: 20 docs at weight 1e9 (every one MUST be sampled — their
    worst ES key beats any realistic corpus key) and 20 docs at weight
    1e-6 (NONE may be sampled — their best key loses to every corpus
    doc by orders of magnitude); seed fixed, so both facts are
    deterministic, not statistical. Invariants: ``planted_ok`` /
    ``light_ok`` as above, ``k_ok`` (exactly 50 rows), and ``det_ok`` —
    a SECOND invocation over the same input repartitioned differently
    must select the identical id set (the partition-independence
    property DataFrame.sample does not have). Rows-only (ln is not
    cross-engine bit-stable; the SELECTED SET is the checked artifact).
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.sampling import (
        weighted_sample,
    )

    base = _docs(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("double").alias("w")
    )
    heavies = spark.range(1, 21).select(
        (-F.col("id")).alias("doc_id"), F.lit(1e9).alias("w")
    )
    lights = spark.range(100, 120).select(
        (-F.col("id")).alias("doc_id"), F.lit(1e-6).alias("w")
    )
    corpus = base.unionByName(heavies).unionByName(lights)
    k = 50
    samp = weighted_sample(
        corpus, k=k, weight_col="w", key_col="doc_id", seed=42
    ).cache()
    samp2 = weighted_sample(
        corpus.repartition(7), k=k, weight_col="w", key_col="doc_id",
        seed=42,
    )
    det = (
        samp.select("doc_id")
        .unionAll(samp2.select("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            (F.sum(F.when(F.col("_c") != 2, 1).otherwise(0)) == 0).alias(
                "det_ok"
            )
        )
    )
    checks = samp.agg(
        (
            F.sum(
                F.when(F.col("doc_id").between(-20, -1), 1).otherwise(0)
            )
            == 20
        ).alias("planted_ok"),
        (
            F.sum(F.when(F.col("doc_id") <= -100, 1).otherwise(0)) == 0
        ).alias("light_ok"),
        (F.count(F.lit(1)) == k).alias("k_ok"),
    ).crossJoin(F.broadcast(det))
    return (
        samp.crossJoin(F.broadcast(checks)).orderBy("doc_id")
    )


def _zx_zy(spark, sf_dir):
    """Shared (x, y) key pair for the z-order queries: epoch-hour of ts
    (~473k < 2^21) and exact integer cents (<= 56,021 < 2^21)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.floor(F.unix_timestamp("ts") / F.lit(3600))
        .cast("bigint")
        .alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )


def _q_zorder_values(spark, sf_dir):
    """Morton/Z-order key computation (operators/layout.py zvalue): the
    bit-interleave of (epoch-hour, integer cents) per event — pure
    64-bit shift/mask ops, so the DuckDB oracle replays the identical
    magic-mask spread and the result is hash-exact cross-engine. This
    is the curve `zorder_layout` clusters files on.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.layout import zvalue

    base = _zx_zy(spark, sf_dir)
    return base.select(
        "event_id", "x", "y",
        zvalue(F.col("x"), F.col("y")).alias("z"),
    ).orderBy("event_id")


def _q_zorder_layout(spark, sf_dir):
    """Z-order layout writer (operators/layout.py write_zorder): events
    written range-clustered on the Morton curve of (epoch-hour, cents).
    Rows-only but SELF-VERIFYING from the written files' OWN parquet
    metadata (pyarrow, metadata-only): per-file rows <= cap (`cap_ok`),
    and a point predicate on EITHER dimension opens at most half the
    files (`prune_x_ok` / `prune_y_ok` from the min/max envelopes).
    The contrast is the point: an arrival-order write measures ~1.0 on
    both, and `clustered_layout`'s 1-D lexicographic write prunes its
    leading key perfectly but measures ~1.0 on the OTHER key; the
    z-curve gives ~sqrt(1/n_files) on both at once — the layout for
    tables filtered by either key independently.
    """
    _prep(spark)
    import tempfile

    from wavelet_decomposition_spark.operators.layout import (
        layout_stats,
        pruning_factor,
        write_zorder,
    )

    path = f"{tempfile.gettempdir()}/wds_layout_zorder"
    cap = 5_000
    write_zorder(
        _zx_zy(spark, sf_dir), path, "x", "y",
        target_rows_per_file=cap,
    )
    pfs = {}
    stats = None
    for dim in ("x", "y"):
        stats = layout_stats(path, dim)
        if any(s["min"] is None or s["max"] is None for s in stats):
            raise RuntimeError("z-order write produced stat-less groups")
        gmin = min(s["min"] for s in stats)
        gmax = max(s["max"] for s in stats)
        probes = [gmin + (gmax - gmin) * i // 4 for i in range(5)]
        pfs[dim] = pruning_factor(stats, probes)
    files = sorted({s["file"] for s in stats})
    rows = [
        (
            files.index(s["file"]),
            s["row_group"],
            s["rows"],
            float(pfs["x"]),
            float(pfs["y"]),
            s["rows"] <= cap,
            pfs["x"] <= 0.5,
            pfs["y"] <= 0.5,
        )
        for s in stats
    ]
    return spark.createDataFrame(
        rows,
        "file_idx int, row_group int, rows bigint, pf_x double, "
        "pf_y double, cap_ok boolean, prune_x_ok boolean, "
        "prune_y_ok boolean",
    )


def _q_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval (operators/invindex.py bm25_topk —
    Robertson/Sparck Jones, Lucene's positive idf variant) over the
    documents corpus PLUS two planted docs that make the ranking
    falsifiable.

    The query asks for ["needlehaystackzz", "spark"]: the first term
    exists ONLY in the two planted docs (df=2 against ~N corpus docs →
    dominant idf), the second is a common corpus term. Planted doc -1
    carries the rare term 5x, doc -2 carries it 3x at the SAME doc
    length. Invariants riding every row: ``planted_top_ok`` — doc -1
    strictly outscores every other doc (rare-term idf dominance);
    ``mono_ok`` — doc -1 strictly outscores doc -2 (tf monotonicity at
    fixed dl and idf); ``pos_ok`` — all returned scores are positive
    (the +1-inside-log idf can never go negative). Rows-only (ln is
    not cross-engine bit-stable; the discrete RANKING is the checked
    artifact).
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.invindex import bm25_topk

    planted = spark.createDataFrame(
        [
            (-1, "needlehaystackzz " * 5 + "pad " * 10),
            (-2, "needlehaystackzz " * 3 + "pad " * 12),
        ],
        "doc_id long, text string",
    )
    corpus = (
        _docs(spark, sf_dir).select("doc_id", "text").unionByName(planted)
    )
    top = bm25_topk(
        corpus, ["needlehaystackzz", "spark"], k=10
    ).cache()
    checks = top.agg(
        (
            F.max(F.when(F.col("doc_id") == -1, F.col("score")))
            > F.max(F.when(F.col("doc_id") != -1, F.col("score")))
        ).alias("planted_top_ok"),
        (
            F.max(F.when(F.col("doc_id") == -1, F.col("score")))
            > F.max(F.when(F.col("doc_id") == -2, F.col("score")))
        ).alias("mono_ok"),
        (F.min("score") > 0.0).alias("pos_ok"),
    )
    return (
        top.crossJoin(F.broadcast(checks))
        .orderBy(F.desc("score"), "doc_id")
    )


def _q_forecast_backtest(spark, sf_dir):
    """Rolling-origin forecast backtest — the evaluation harness that
    makes a forecaster a product feature: hold out the last 24 hours of
    every hourly series, fit additive Holt-Winters on the train split
    (operators/tsfeatures.py holt_winters), forecast h=1..24, and score
    MAE/sMAPE against the held-out actuals NEXT TO the seasonal-naive
    baseline (actual from 24h earlier — the no-model control every
    forecast must beat to justify itself).

    A planted noiseless series (linear trend + daily sine) rides along:
    Holt-Winters tracks trend+season so its test MAE must be tiny,
    while seasonal-naive structurally misses the trend by a constant
    slope*24 = 12.0 per point — ``planted_ok`` asserts mae_hw < 2 and
    mae_naive > 5 there (observed: 0.69 vs 12.0 — the HW residue is
    the gamma-rate decay of trend contamination in the classical
    seasonal seeds s_i = x_i - l_0, which absorb the within-season
    ramp), and
    ``split_ok`` pins every series' test window to exactly 24 points.
    Rows-only (the HW recurrence is the Arrow kernel; its own dual_ok
    scalar-replay invariant is asserted upstream in the operator).
    """
    _prep(spark)
    import math

    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.tsfeatures import (
        holt_winters,
    )

    i = F.col("id")
    planted = spark.range(720).select(
        F.lit("planted").alias("series_id"),
        F.timestamp_seconds(F.lit(1767225600) + i * 3600).alias(
            "bucket_ts"
        ),
        (
            100.0
            + 0.5 * i.cast("double")
            + 20.0
            * F.sin(i.cast("double") * F.lit(2.0 * math.pi / 24.0))
        ).alias("v"),
    )
    base = _hourly_series(spark, sf_dir).unionByName(planted)
    pos = F.row_number().over(
        Window.partitionBy("series_id").orderBy("bucket_ts")
    ) - 1
    h_test = 24
    idx = base.select("series_id", "bucket_ts", "v", pos.alias("p"))
    n_by = idx.groupBy("series_id").agg(F.max("p").alias("_pmax"))
    # materialize the indexed split frame ONCE (r6): it feeds the train
    # split, the test split, AND the seasonal-naive side — Catalyst
    # otherwise clones the events-scan + window + broadcast-join subtree
    # per consumer (24 parquet scans in the before-plan); the frame is
    # the tiny hourly tier, so the checkpoint is bounded at any sf
    idx = (
        idx.join(F.broadcast(n_by), "series_id")
        .withColumn("_split", F.col("_pmax") - h_test)
        .localCheckpoint()
    )
    train = idx.where(F.col("p") <= F.col("_split"))
    test = idx.where(F.col("p") > F.col("_split")).select(
        "series_id",
        (F.col("p") - F.col("_split")).cast("int").alias("h"),
        F.col("v").alias("actual"),
    )
    fc = holt_winters(
        train.select("series_id", "bucket_ts", "v"),
        period=24,
        horizon=h_test,
        verify=False,
    ).select("series_id", "h", "forecast")
    joined = (
        test.join(fc, ["series_id", "h"])
        .join(
            train.select(
                "series_id",
                (F.col("p") - F.col("_split") + h_test).alias("h"),
                F.col("v").alias("naive_fc"),
            ).where(F.col("h") >= 1),
            ["series_id", "h"],
        )
    )
    per = joined.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.avg(F.abs(F.col("forecast") - F.col("actual"))).alias(
            "mae_hw"
        ),
        F.avg(F.abs(F.col("naive_fc") - F.col("actual"))).alias(
            "mae_naive"
        ),
        F.avg(
            2.0
            * F.abs(F.col("forecast") - F.col("actual"))
            / (F.abs("forecast") + F.abs("actual"))
        ).alias("smape_hw"),
    ).localCheckpoint()  # per-series scores feed the gate aggregate AND
    # the returned rows — one run of the HW kernel + join tree, not two
    checks = per.agg(
        F.min(F.col("n_test") == h_test).alias("split_ok"),
        F.max(
            F.when(
                F.col("series_id") == "planted",
                (F.col("mae_hw") < 2.0) & (F.col("mae_naive") > 5.0),
            )
        ).alias("planted_ok"),
    )
    return (
        per.crossJoin(F.broadcast(checks))
        .select(
            "series_id", "n_test",
            F.round("mae_hw", 6).alias("mae_hw"),
            F.round("mae_naive", 6).alias("mae_naive"),
            F.round("smape_hw", 6).alias("smape_hw"),
            "split_ok", "planted_ok",
        )
        .orderBy("series_id")
    )


def _q_feature_binning(spark, sf_dir):
    """Equal-frequency feature discretization (ML prep): per event
    type, decile-bin the exact integer cents values with ntile(10)
    over a TOTAL order (cents, event_id) — the tie-break makes bucket
    membership deterministic, so the bin boundaries, counts, and
    min/max per bin are hash-exact cross-engine (both engines implement
    SQL-standard ntile: bucket sizes n/k with the first n mod k buckets
    one larger). One exchange on the group key; the per-group sort is
    the inherent cost of rank-based binning — at 100 TB use the GK
    sketch quantiles (`sketch_quantiles`) for approximate boundaries
    without the sort.
    """
    _prep(spark)
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    return (
        ev.withColumn("bin", F.ntile(10).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("event_type", "bin")
    )


def _q_json_extract_stats(spark, sf_dir):
    """Semi-structured extraction surface: pull the integer ``$.k``
    field out of the events JSON props column and aggregate it per
    event type (count, sum, min, max, nulls) — the schema-on-read path
    every event pipeline runs before promoting a JSON field to a real
    column. Spark `get_json_object` vs DuckDB `json_extract`, both cast
    to BIGINT — exact integers, hash-identical cross-engine.
    """
    _prep(spark)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        _events(spark, sf_dir)
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias(
                "n_null"
            ),
        )
        .orderBy("event_type")
    )


def _q_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics (operators/merge.py merge_upsert): one full
    outer join classifies every row into keep / update / insert / drop.
    Deterministic planted CDC batch over the events table: target =
    90% of events (ids not divisible by 10); source carries updates
    (ids % 7 = 0, cents shifted +1000), deletes (ids % 13 = 0 not also
    % 7), and inserts (ids % 50 = 0, key shifted by 1e9). Updates of
    absent rows become inserts and deletes of absent rows are no-ops —
    both paths exercised by the % 10 holes. All exact integers;
    DuckDB-oracle-checked.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.merge import merge_upsert

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    target = ev.where(F.col("event_id") % 10 != 0)
    source = (
        ev.where(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            (F.col("cents") + 1000).alias("cents"),
            F.lit(False).alias("del"),
        )
        .unionByName(
            ev.where(
                (F.col("event_id") % 13 == 0)
                & (F.col("event_id") % 7 != 0)
            ).select(
                "event_id",
                F.lit(None).cast("bigint").alias("cents"),
                F.lit(True).alias("del"),
            )
        )
        .unionByName(
            ev.where(F.col("event_id") % 50 == 0).select(
                (F.col("event_id") + 1_000_000_000).alias("event_id"),
                "cents",
                F.lit(False).alias("del"),
            )
        )
    )
    return merge_upsert(
        target, source, keys=["event_id"], delete_col="del"
    ).orderBy("event_id")


def _q_boolean_retrieval(spark, sf_dir):
    """Conjunctive boolean retrieval (operators/invindex.py
    boolean_and): documents containing ALL of {spark, data, join} with
    per-doc term stats — the posting-intersection primitive. Map-side
    term filter, two hash aggregates, all exact integers;
    DuckDB-oracle-checked.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.invindex import boolean_and

    return boolean_and(
        _docs(spark, sf_dir), ["spark", "data", "join"]
    ).orderBy("doc_id")


def _q_referential_integrity(spark, sf_dir):
    """Cross-table referential-integrity gate
    (operators/expect.py check_foreign_keys): all seven TPC-H foreign
    keys checked in one query — child count, NULL-FK count, and orphan
    count per FK (NULL is unknown, not an orphan). Each check is a
    single-column anti-join against the parent's deduplicated key set
    (broadcast — dimension key sets stay small even at 100 TB fact
    scale). DuckDB-oracle-checked; all integers and booleans.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.expect import (
        check_foreign_keys,
    )

    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    return check_foreign_keys(
        [
            ("customer_nationkey", rd("customer"), "c_nationkey",
             rd("nation"), "n_nationkey"),
            ("lineitem_orderkey", rd("lineitem"), "l_orderkey",
             rd("orders"), "o_orderkey"),
            ("lineitem_partkey", rd("lineitem"), "l_partkey",
             rd("part"), "p_partkey"),
            ("lineitem_suppkey", rd("lineitem"), "l_suppkey",
             rd("supplier"), "s_suppkey"),
            ("nation_regionkey", rd("nation"), "n_regionkey",
             rd("region"), "r_regionkey"),
            ("orders_custkey", rd("orders"), "o_custkey",
             rd("customer"), "c_custkey"),
            ("supplier_nationkey", rd("supplier"), "s_nationkey",
             rd("nation"), "n_nationkey"),
        ]
    ).orderBy("fk")


def _q_pagerank(spark, sf_dir):
    """PageRank power iteration (operators/pagerank.py) over the
    customer->supplier order-flow graph (orders x lineitem), plus a
    planted star graph with a CLOSED-FORM fixed point that makes the
    result falsifiable to first principles.

    Rows-only, SELF-VERIFYING four ways:
    ``mass_ok`` — dangling-mass redistribution keeps total rank mass
    exactly 1 (|sum - 1| <= 1e-9) on the real graph;
    ``contract_ok`` — the power iteration is a contraction, so one MORE
    relational update step applied to the returned ranks must not
    increase the L1 delta beyond the reported final delta;
    ``planted_ok`` — on a planted 10-spoke star at damping 0.5 the
    exact fixed point is hub = 3/8, spoke = 1/16 (closed form h =
    b(1+dK)/(1 - d(dK+1)/N), b=(1-d)/N): every rank must match to
    1e-7 after 30 fixed iterations (contraction bound 0.5^30 ~ 1e-9);
    ``planted_sym_ok`` — the 10 spokes are exchangeable, so their
    ranks must agree to 1e-12.
    """
    _prep(spark)
    from concurrent.futures import ThreadPoolExecutor

    from wavelet_decomposition_spark.operators.pagerank import pagerank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    edges = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    # the planted-star fit (30 fixed tiny iterations, below) is
    # independent of the real-graph fit; both loops are scheduling-
    # latency-bound (one small Spark job per power iteration), so run
    # them as concurrent driver threads and the wall is max, not sum
    # (optimization-guide §2.6 overlapping of independent jobs)
    # SIZE-GATED iteration confs: when the edge list is small enough
    # that both fits take pagerank's broadcast path anyway (co-supply
    # graph: n is bounded by the supplier/customer dimensions), AQE's
    # per-stage re-planning and a 64-way aggregate exchange are pure
    # round-trip overhead on 11-to-16k-row frames — measured 5.5 s ->
    # 3.4 s for the two overlapped fits with AQE off / one aggregate
    # partition. Restored before the returned plan is built, and
    # skipped outright for large graphs (at sf100 this graph has ~6e8
    # edges and AQE is doing real work).
    _small = li.count() <= 20_000_000
    _old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if _small:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        with ThreadPoolExecutor(max_workers=1) as _pool:
            _star_fit = _pool.submit(
                lambda: pagerank(
                    spark.range(2, 12).select(
                        F.col("id").alias("src"), F.lit(1).alias("dst")
                    ),
                    damping=0.5,
                    max_iter=30,
                    tol=0.0,
                )
            )
            # no .cache(): pagerank's result is a trivial projection
            # over its internally checkpointed rank frame (recompute is
            # free), and the checkpoint-backed plan is unique per run so
            # a cache entry here leaks un-matchable storage every repeat
            pr = pagerank(edges, damping=0.85, max_iter=12, tol=1e-6)
            ps_fit = _star_fit.result()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", _old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)
    mass = pr.agg(
        (F.abs(F.sum("rank") - 1.0) <= 1e-9).alias("mass_ok"),
        F.sum(F.when(F.col("outdeg") == 0, F.col("rank"))).alias("_dm"),
        F.count(F.lit(1)).alias("_n"),
        F.max("delta_l1").alias("_dl"),
    )
    # one more relational update step on the returned ranks — walking
    # the ACTUAL edge list — must not increase the L1 delta beyond the
    # reported final delta (power iteration is a contraction)
    inflow = (
        edges.distinct()
        .join(
            pr.select(
                F.col("node").alias("src"),
                F.when(
                    F.col("outdeg") > 0, F.col("rank") / F.col("outdeg")
                )
                .otherwise(F.lit(0.0))
                .alias("_c"),
            ),
            "src",
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("_c").alias("_in"))
    )
    stepped = (
        pr.join(inflow, "node", "left")
        .crossJoin(F.broadcast(mass))
        .select(
            "mass_ok",
            F.abs(
                (
                    (1.0 - 0.85) / F.col("_n")
                    + 0.85
                    * (
                        F.coalesce("_in", F.lit(0.0))
                        + F.coalesce("_dm", F.lit(0.0)) / F.col("_n")
                    )
                )
                - F.col("rank")
            ).alias("_ch"),
            "_dl",
        )
        .agg(
            F.min("mass_ok").alias("mass_ok"),
            (
                F.sum("_ch") <= F.max("_dl") + F.lit(1e-12)
            ).alias("contract_ok"),
        )
    )
    # planted star: spokes 2..11 each -> hub 1; hub dangles
    # (fit ran concurrently with the real-graph fit above)
    k, d, n_nodes = 10.0, 0.5, 11.0
    b = (1.0 - d) / n_nodes
    hub_exp = b * (1.0 + d * k) / (1.0 - d * (d * k + 1.0) / n_nodes)
    spoke_exp = b + d * hub_exp / n_nodes
    ps = ps_fit
    planted = ps.agg(
        (
            F.max(
                F.abs(
                    F.col("rank")
                    - F.when(F.col("node") == 1, hub_exp).otherwise(
                        spoke_exp
                    )
                )
            )
            <= 1e-7
        ).alias("planted_ok"),
        (
            F.max(F.when(F.col("node") != 1, F.col("rank")))
            - F.min(F.when(F.col("node") != 1, F.col("rank")))
            <= 1e-12
        ).alias("planted_sym_ok"),
    )
    top = (
        pr.orderBy(F.desc("rank"), "node")
        .limit(20)
        .select("node", "rank", "outdeg", "n_iter", "delta_l1")
    )
    return (
        top.crossJoin(F.broadcast(stepped))
        .crossJoin(F.broadcast(planted))
        .orderBy(F.desc("rank"), "node")
    )


def _q_inverted_index(spark, sf_dir):
    """Blocked inverted-index build (operators/invindex.py): per term,
    document frequency, collection frequency, and the posting list as
    delta-encoded doc-id gaps (Lucene's d-gap layout), sharded into
    64-posting blocks so no output row is ever unbounded — the
    stopword-posting-list OOM guard that matters at 10^9 docs.

    Fully DuckDB-oracle-checked bit-for-bit: the index is all integers
    and strings (gap/tf lists ship comma-joined in ascending doc-id
    order; identical regex tokenization `[^a-z0-9]+` both engines).
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.invindex import (
        inverted_index,
    )

    return inverted_index(_docs(spark, sf_dir), block_size=64).orderBy(
        "term", "block_id"
    )


def _q_sax_words(spark, sf_dir):
    """PAA + SAX symbolic downsampling (operators/sax.py — Lin et al.
    2003): each per-type hourly series is cut into tumbling 64-bucket
    windows, PAA-reduced to 8 segment means, z-normalized against the
    whole series' moments, and discretized onto a 5-letter alphabet via
    equiprobable N(0,1) breakpoints — one 8-letter word per window, the
    discrete index key for motif counting / rare-word anomaly detection.

    Cross-engine exactness (fully DuckDB-oracle-checked): the series is
    quantized to exact integer MILLI-units first (sum of integer cents
    scaled by 10, floored — values <= 5.7e5, so sums-of-squares stay
    under 2^53 and are exact BIGINTs in both engines). Every downstream
    float op — mu = S/n, sd = sqrt(max(SS/n - mu^2, 0)), z =
    (paa - mu)/sd — is the identical IEEE sequence on exact integer
    inputs, so the z-scores and therefore the DISCRETE SYMBOLS are
    bit-identical cross-engine; the breakpoints are irrational N(0,1)
    quantiles a quotient of integers never lands on exactly.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.sax import sax_words

    hr = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "_cents"
            ),
            F.count(F.lit(1)).alias("_nev"),
        )
        .select(
            "series_id",
            "bucket_ts",
            F.floor(
                F.col("_cents").cast("double") * 10.0 / F.col("_nev")
            ).alias("vm"),
        )
    )
    return sax_words(
        hr, "vm", window_len=64, n_segments=8, alphabet=5
    ).orderBy("series_id", "window_id")


def _q_triangle_count(spark, sf_dir):
    """Exact triangle count + global clustering coefficient
    (operators/components.py triangle_stats) over the supplier
    co-supply graph (suppliers sharing a part, from distinct
    lineitem (part, supplier) pairs). The Spark side runs
    degree-ordered orientation (Suri-Vassilvitskii — out-degree
    bounded by ~sqrt(m) even on celebrity nodes); the DuckDB oracle
    counts via the naive u<v<w three-way enumeration — a DIFFERENT
    algorithm that must produce the identical exact integers, plus the
    clustering coefficient as one division of exact ints.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.components import (
        triangle_stats,
    )

    ps = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    b = ps.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s2")
    )
    pairs = (
        ps.join(b, ps.l_partkey == b.p)
        .where(F.col("l_suppkey") < F.col("s2"))
        .select(
            F.col("l_suppkey").alias("id_a"), F.col("s2").alias("id_b")
        )
    )
    return triangle_stats(pairs)


def _q_topn_others(spark, sf_dir):
    """Top-N with OTHERS rollup (the TimescaleDB `topn_agg` /
    dashboard-legend pattern): the 3 highest-revenue event types keep
    their identity, everything else collapses into one 'OTHER' bucket
    so the output cardinality is fixed no matter how many tail
    categories exist. Exact integer cents; deterministic
    (revenue desc, event_type) cut; DuckDB-oracle-checked. Two hash
    aggregates over a 5-row intermediate — the N-row re-aggregation is
    free at any scale because the first aggregate already reduced to
    one row per category.
    """
    _prep(spark)
    from pyspark.sql import Window

    per = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "cents"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    ranked = per.withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy(F.desc("cents"), F.asc("event_type"))
        ),
    )
    return (
        ranked.select(
            F.when(F.col("_rk") <= 3, F.col("event_type"))
            .otherwise(F.lit("OTHER"))
            .alias("bucket"),
            "cents",
            "n",
        )
        .groupBy("bucket")
        .agg(
            F.sum("cents").alias("cents"),
            F.sum("n").alias("n"),
            F.count(F.lit(1)).alias("n_categories"),
        )
        .orderBy(F.desc("cents"), "bucket")
    )


def _q_session_paths(spark, sf_dir):
    """Session path mining: the event-type BIGRAMS users actually walk
    (lead() over each user's time-ordered stream, transitions broken at
    30-minute session gaps), counted corpus-wide with distinct-user
    support — the navigation-pattern primitive behind funnel design.
    One exchange on user_id shared by the session window and the lead;
    exact integers; deterministic (event_id tie-break on equal
    timestamps); DuckDB-oracle-checked.
    """
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators._time import us as _tus

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("_next_ts"),
    ).select(
        "user_id",
        "event_type",
        "next_type",
        ((_tus("_next_ts") - _tus("ts")) <= gap_us).alias(
            "_same_session"
        ),
    )
    return (
        flagged.where(
            F.col("next_type").isNotNull() & F.col("_same_session")
        )
        .groupBy("event_type", "next_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_transitions"), "event_type", "next_type")
    )


def _q_hybrid_search_rrf(spark, sf_dir):
    """Hybrid search: Reciprocal Rank Fusion (operators/similarity.py
    rrf_fuse — Cormack et al. 2009) of a dense VECTOR ranking
    (brute-force cosine top-20 for query vec 0, the `ann_topk` scoring
    path) and a LEXICAL ranking (total tf of {spark, data, join},
    deterministic (tf desc, doc_id) tie-break, top-20) over the shared
    doc corpus (vec_id aligns 1:1 with doc_id). rrf = 1/(60+rank_v) +
    1/(60+rank_l), absent side contributes 0 — a single two-term float
    expression per row, so given identical ranks the fused ordering is
    bit-identical cross-engine and the WHOLE hybrid pipeline is
    DuckDB-oracle-checked (ranks, fusion scores, and final top-10).
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.invindex import tokenize
    from wavelet_decomposition_spark.operators.similarity import (
        brute_force_topk,
        rrf_fuse,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    vec_rank = brute_force_topk(emb, qv, k=20).select("vec_id", "rank")
    from pyspark.sql import Window

    # top-20 FIRST (TakeOrderedAndProject: per-partition top-k + k-row
    # merge), then rank the 20 survivors — the global-window-then-filter
    # form would funnel the whole corpus through one task
    lex_rank = (
        tokenize(_docs(spark, sf_dir))
        .where(F.col("term").isin(["spark", "data", "join"]))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .orderBy(F.desc("_tf"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("_tf"), F.asc("doc_id"))
            ),
        )
        .select(F.col("doc_id").alias("vec_id"), "rank")
    )
    # absent-from-ranking ships as rank 0, not NULL: a NULL float
    # column defeats order-insensitive value hashing (NaN hashes by
    # object identity in Python 3.10+), so the gate and driver compare
    # would false-mismatch on bit-identical outputs
    return rrf_fuse(vec_rank, lex_rank, k=10).select(
        F.col("vec_id").alias("doc_id"),
        F.coalesce("rank_a", F.lit(0)).alias("rank_vec"),
        F.coalesce("rank_b", F.lit(0)).alias("rank_lex"),
        "rrf",
    )


def _q_sax_anomaly(spark, sf_dir):
    """HOT-SAX-style anomaly candidates (operators/sax.py
    sax_rare_words): the 2 windows per series whose SAX word is rarest
    within that series — Keogh's discord heuristic as an exact
    deterministic rank ((freq, window_id) tie-break), so unlike classic
    HOT-SAX search this is fully DuckDB-oracle-checked, discrete
    symbols, frequencies, and ranks alike. Same exact integer
    milli-unit pipeline as `sax_words`.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.sax import sax_rare_words

    hr = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "_cents"
            ),
            F.count(F.lit(1)).alias("_nev"),
        )
        .select(
            "series_id",
            "bucket_ts",
            F.floor(
                F.col("_cents").cast("double") * 10.0 / F.col("_nev")
            ).alias("vm"),
        )
    )
    return sax_rare_words(
        hr, "vm", k=2, window_len=64, n_segments=8, alphabet=5
    ).orderBy("series_id", "window_id")


def _q_holt_winters(spark, sf_dir):
    """Additive Holt-Winters fit + 24-step forecast over the per-type
    hourly activity series (operators/tsfeatures.py holt_winters) — the
    trend+seasonality forecaster brown_les deliberately stops short of;
    here the coupled recurrences run vectorized ACROSS hash-bucketed
    series with the Python loop over time steps only. Rows-only,
    SELF-VERIFYING three ways: ``dual_ok`` = an independent scalar-loop
    reference (shifting seasonal list vs ring buffer) agrees with the
    matrix path on level/trend/sse/every forecast to 1e-9; ``planted_ok``
    = a PLANTED exactly-periodic trend-free series (v[i] = (i%24)*37 %
    101 on the same grid) must fit with sse <= 1e-6 and forecast its own
    next cycle to <= 1e-6 — the classical seeding makes that an exact
    identity up to float round-trip; ``planted_n_ok`` = all 24 planted
    forecast rows actually exist (a dropped planted series cannot pass
    vacuously). ``finite_ok`` pins NaN/inf out of every output."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.tsfeatures import (
        holt_winters,
    )

    counts = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded scalar collect: the global grid endpoints (2 timestamps)
    lo, hi = counts.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    grid = (
        counts.select("series_id")
        .distinct()
        .select(
            "series_id",
            F.explode(
                F.sequence(
                    F.lit(lo), F.lit(hi), F.expr("interval 1 hour")
                )
            ).alias("bucket_ts"),
        )
    )
    filled = grid.join(counts, ["series_id", "bucket_ts"], "left").select(
        "series_id",
        "bucket_ts",
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("v"),
    )
    planted = spark.range(1).select(
        F.posexplode(
            F.sequence(F.lit(lo), F.lit(hi), F.expr("interval 1 hour"))
        ).alias("i", "bucket_ts")
    ).select(
        F.lit("__planted_periodic__").alias("series_id"),
        "bucket_ts",
        ((F.col("i") % 24) * 37 % 101).cast("double").alias("v"),
    )
    out = holt_winters(
        filled.unionByName(planted),
        period=24,
        horizon=24,
        n_buckets=4,
    )
    is_planted = F.col("series_id") == "__planted_periodic__"
    expected = (
        ((F.col("n") + F.col("h") - 1) % 24) * 37 % 101
    ).cast("double")
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return out.select(
        "series_id",
        "h",
        "forecast",
        "level",
        "trend",
        "sse",
        "n",
        "dual_ok",
        (
            ~is_planted
            | (
                (F.abs(F.col("forecast") - expected) <= 1e-6)
                & (F.col("sse") <= 1e-6)
            )
        ).alias("planted_ok"),
        (
            F.sum(is_planted.cast("int")).over(wall) == 24
        ).alias("planted_n_ok"),
        (
            ~F.isnan("forecast") & ~F.isnan("level") & ~F.isnan("trend")
            & ~F.isnan("sse")
            & (F.abs("forecast") < F.lit(float("inf")))
            & (F.abs("trend") < F.lit(float("inf")))
        ).alias("finite_ok"),
    ).orderBy("series_id", "h")


def _q_cohort_retention(spark, sf_dir):
    """Weekly retention triangle (operators/funnel.py cohort_retention):
    users cohorted by the week of their first signup; active in period k
    = any event in [cohort_start + k weeks, +1 week). Integer modulo
    cohort arithmetic (no float floor), unrounded retention ratio — both
    engines divide the same two integers once, bit-identically."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.funnel import cohort_retention

    out = cohort_retention(
        _events(spark, sf_dir), cohort_event="signup", period="1 week"
    )
    return out.select(
        "cohort_ts", "period_k", "n_active", "n_cohort", "retention"
    )


def _q_funnel_steps(spark, sf_dir):
    """Ordered signup->click->purchase funnel with a 7-day whole-funnel
    window (operators/funnel.py funnel): a user completes step k at their
    earliest step-k event at/after their step-(k-1) completion and within
    the window of their step-1 time. One Spark job: per-user furthest
    stage, tiny histogram, cumulative >=k counts."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.funnel import funnel

    return funnel(
        _events(spark, sf_dir),
        steps=["signup", "click", "purchase"],
        window="7 days",
    )


def _hourly_series(spark, sf_dir):
    """Shared base for the ts-analytics queries: per-(event_type, hour)
    mean value, ROUNDED to 6 dp so Spark and the DuckDB oracle feed
    bit-identical inputs into the downstream window/recurrence math
    (partial-aggregation order would otherwise leave ~1e-12 seeds that
    argmax/threshold operators could amplify into discrete flips)."""
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )


def _q_ts_rolling(spark, sf_dir):
    """Trailing 24-bucket rolling mean/std/min/max over the hourly series
    (operators/tsfeatures.py rolling_stats): one exchange, one sort,
    whole-stage-codegen frame."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.tsfeatures import rolling_stats

    # The hourly means here are terminating decimals (2-dp cents / event
    # counts), so rounded stats land EXACTLY on decimal half-boundaries
    # where Spark's BigDecimal HALF_UP and DuckDB's scaled-double round()
    # legitimately disagree. Fix at the root: quantize the series to exact
    # integer micro-units, then every windowed statistic is derived from
    # exact integer window sums via the SAME double operations in both
    # engines — bit-identical outputs, no rounding anywhere.
    hr = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "_cents"
            ),
            F.count(F.lit(1)).alias("_nev"),
        )
        .select(
            "series_id",
            "bucket_ts",
            F.floor(
                F.col("_cents").cast("double") * 10000.0 / F.col("_nev")
            ).alias("vm"),
        )
    )
    out = rolling_stats(hr, value_col="vm", k=24)
    # sample std from exact integer window sums (the operator's Welford
    # stddev is association-order-dependent across engines); Catalyst
    # merges these into the operator's existing Window node
    w = (
        Window.partitionBy("series_id")
        .orderBy("bucket_ts")
        .rowsBetween(-23, 0)
    )
    s = F.sum("vm").over(w).cast("double")
    ssq = F.sum(F.col("vm") * F.col("vm")).over(w).cast("double")
    n = F.col("roll_n")
    var = F.greatest(
        (ssq - s * s / n) / (n - F.lit(1)), F.lit(0.0)
    )
    scale = F.lit(1_000_000.0)
    return out.withColumn("_std_exact", F.when(n > 1, F.sqrt(var))).select(
        "series_id",
        "bucket_ts",
        (F.col("vm") / scale).alias("v"),
        (F.col("roll_mean") / scale).alias("roll_mean"),
        F.coalesce(F.col("_std_exact") / scale, F.lit(-1.0)).alias(
            "roll_std"
        ),
        (F.col("roll_min") / scale).alias("roll_min"),
        (F.col("roll_max") / scale).alias("roll_max"),
        "roll_n",
    )


def _q_ts_ewma(spark, sf_dir):
    """EWMA smoothing, adjust=False recurrence, alpha=0.25 (dyadic, so
    alpha and 1-alpha are exact doubles in BOTH engines); Spark side is
    the vectorized pandas kernel, oracle side a DuckDB recursive CTE
    replaying the identical recurrence."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import ewma

    out = ewma(
        _hourly_series(spark, sf_dir), value_col="v", alpha=0.25,
        group_col="series_id", ts_col="bucket_ts",
    )
    return out.select(
        "series_id", "bucket_ts", "v", F.round("ewma", 6).alias("ewma")
    )


def _q_ts_acf(spark, sf_dir):
    """Sample autocorrelation at lags 1..12 per series: one explode of
    forward offsets + one equi-join (no per-lag window sorts), partial-
    aggregated corr."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import acf

    out = acf(_hourly_series(spark, sf_dir), value_col="v", max_lag=12)
    return out.select(
        "series_id",
        F.col("lag").cast("int").alias("lag"),
        F.round("acf", 6).alias("acf"),
        "n_pairs",
    )


def _q_m4_downsample(spark, sf_dir):
    """M4 visualization downsampling (first/last/min/max per bucket —
    Jugel et al. VLDB'14) of the per-(type, timestamp) event series into
    hourly pixels; ONE hash aggregate with map-side combine."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import m4_downsample

    # dedupe exact-timestamp collisions first so first/last are
    # well-defined (and the arg_min/arg_max oracle cannot go flaky)
    base = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.col("ts").alias("bucket_ts"),
        )
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    out = m4_downsample(base, value_col="v", bucket="1 hour")
    return out.select(
        "series_id", "bucket_start",
        "first_v", "last_v", "min_v", "max_v", "n_points",
    )


def _q_ts_anomaly(spark, sf_dir):
    """Median/MAD modified-z outlier flags (Iglewicz–Hoaglin 3.5 cut) on
    the hourly series; exact percentile aggregates, broadcast stats join."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import (
        robust_anomalies,
    )

    out = robust_anomalies(_hourly_series(spark, sf_dir), value_col="v")
    return out.select(
        "series_id", "bucket_ts", "v",
        F.round("robust_z", 6).alias("robust_z"),
        "is_anomaly",
    )


def _q_ts_cusum(spark, sf_dir):
    """CUSUM mean-shift change-point per series: argmax |cumsum(x-mean)|
    plus the normalized max statistic; per-group output is one scalar row
    so the final shuffle is one row per series."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import (
        cusum_changepoint,
    )

    out = cusum_changepoint(_hourly_series(spark, sf_dir), value_col="v")
    return out.select(
        "series_id", "cp_ts", F.round("cusum_stat", 6).alias("cusum_stat"),
        "n",
    )


def _q_ts_seasonal(spark, sf_dir):
    """Classical additive seasonal decomposition (period 24 h): centered
    moving-average trend (honest nulls at edges), zero-mean per-phase
    seasonal, residual."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import (
        seasonal_decompose,
    )

    # integer micro-unit inputs: the 2x24 MA divides frame sums by 48,
    # whose decimal expansion lands ~1/48 of 6-dp-rounded inputs exactly
    # on .5e-6 half-boundaries where Spark HALF_UP and DuckDB disagree —
    # so the sums are made EXACT (ints < 2^53) and every output ships
    # UNROUNDED: identical doubles in both engines, no rounding at all
    vi = _hourly_series(spark, sf_dir).select(
        "series_id",
        "bucket_ts",
        F.round(F.col("v") * 1_000_000).cast("bigint").cast("double")
        .alias("v"),
    )
    out = seasonal_decompose(vi, value_col="v", period=24)
    m = F.lit(1_000_000.0)
    # edge buckets (incomplete centered window) have null trend/residual;
    # sentinel them — NaN ties in the gate's row sort scramble row order
    # between engines even when every value agrees
    return out.select(
        "series_id", "bucket_ts",
        (F.col("v") / m).alias("v"),
        F.col("phase").cast("int").alias("phase"),
        F.coalesce(F.col("trend") / m, F.lit(-999999.0)).alias("trend"),
        (F.col("seasonal") / m).alias("seasonal"),
        F.coalesce(F.col("residual") / m, F.lit(-999999.0)).alias(
            "residual"
        ),
    )


def _q_pii_redact(spark, sf_dir):
    """PII redaction (email/IPv4/phone -> typed placeholders) with
    per-category counts. The synthetic corpus has no organic PII, so the
    query PLANTS deterministic doc_id-derived PII in both engines first —
    the redaction regexes (common Java-regex/RE2 subset) then have real
    spans to find. Pure JVM regexp chain, zero shuffles."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.textclean import redact_pii

    d = F.col("doc_id")
    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" u"), d.cast("string"), F.lit("@example.com 10."),
            (d % 200).cast("string"), F.lit(".0."),
            (d % 250).cast("string"), F.lit(" +1 (555) 010-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return redact_pii(planted)


def _q_strip_html(spark, sf_dir):
    """HTML boilerplate strip + entity unescape + whitespace collapse
    (tags planted deterministically — see _q_pii_redact)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.textclean import strip_html

    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("<p class=\"x\">"), F.col("text"),
            F.lit("</p> &amp; <a href=\"y\">link &lt;here&gt;</a>"),
        ).alias("text"),
    )
    return strip_html(planted)


def _q_doc_chunks(spark, sf_dir):
    """Fixed-length overlapping character chunking (textclean.py
    chunk_documents) — the context-window prep step of a training
    pipeline: chunk i covers [i*350, i*350+400), consecutive chunks
    overlap by 50 chars, empty docs produce no chunks. Pure JVM
    (sequence + posexplode + substring, no shuffle); the DuckDB oracle is
    the equivalent lateral generate_series, so every chunk boundary and
    chunk text is value-checked cross-engine."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.textclean import (
        chunk_documents,
    )

    return chunk_documents(
        _docs(spark, sf_dir), chunk_len=400, stride=350
    )


def _q_pack_sequences(spark, sf_dir):
    """Greedy sequence packing (sampling.py pack_sequences): every doc
    assigned to a 512-token training bin, metadata-only (16 bytes/doc
    rides the shuffle, text never moves), per-group first-fit-decreasing
    so the result is deterministic under any physical partitioning.
    Rows-only with the packing CONTRACT riding as invariants:
    ``budget_ok`` = every multi-doc bin's token sum <= 512 (oversize docs
    sit alone, never truncated), ``coverage_ok`` = every input doc
    packed exactly once with total tokens conserved, ``efficiency_ok`` =
    total_tokens / (n_bins * budget) >= 0.5 (FFD fills bins; a packer
    that opened a bin per doc would score ~0.11 on this corpus)."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.sampling import pack_sequences
    from wavelet_decomposition_spark.operators.textstats import token_count

    budget = 512
    docs = _docs(spark, sf_dir)
    packed = pack_sequences(docs, budget=budget, n_parts=8)
    w = Window.partitionBy("bin_id")
    w_all = Window.partitionBy(F.lit(1))
    expect = docs.agg(
        F.count(F.lit(1)).alias("n_docs_in"),
        F.sum(token_count(F.col("text"))).alias("tok_in"),
    )
    return (
        packed.withColumn("bin_tokens", F.sum("n_tokens").over(w))
        .withColumn("bin_docs", F.count(F.lit(1)).over(w))
        .crossJoin(F.broadcast(expect))
        .select(
            "doc_id",
            "n_tokens",
            "bin_id",
            "bin_tokens",
            (
                (F.col("bin_tokens") <= budget) | (F.col("bin_docs") == 1)
            ).alias("budget_ok"),
            (
                (F.count(F.lit(1)).over(w_all) == F.col("n_docs_in"))
                & (F.sum("n_tokens").over(w_all) == F.col("tok_in"))
            ).alias("coverage_ok"),
            (
                F.sum("n_tokens").over(w_all)
                >= 0.5
                * budget
                * F.size(F.collect_set("bin_id").over(w_all))
            ).alias("efficiency_ok"),
        )
        .orderBy("doc_id")
    )


def _q_repetition_ratio(spark, sf_dir):
    """Intra-doc 3-gram repetition quality signal: repeated-gram fraction
    and single-most-frequent-gram share; one explode + one count
    aggregate + one per-doc rollup."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.textclean import (
        repetition_ratio,
    )

    out = repetition_ratio(_docs(spark, sf_dir), n=3)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_distinct",
        F.round("dup_ratio", 6).alias("dup_ratio"),
        F.round("top_gram_frac", 6).alias("top_gram_frac"),
    )


def _q_ts_rolling_median(spark, sf_dir):
    """Trailing 24-bucket rolling MEDIAN over the hourly series
    (operators/tsfeatures.py rolling_median) — the robust twin of
    ts_rolling. Output deliberately UNROUNDED: both engines take the
    mean of the same two middle order statistics on identical inputs, so
    the doubles are bit-identical; a 6-dp round would land even-count
    midpoints of 6-dp inputs exactly on half-boundaries where the two
    engines' round() tie-breaking differs."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import (
        rolling_median,
    )

    out = rolling_median(_hourly_series(spark, sf_dir), k=24)
    return out.select(
        "series_id", "bucket_ts", "v", "roll_median", "roll_n"
    )


def _q_ts_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend per hourly series (operators/tsfeatures.py
    theil_sen): median of all pairwise slopes, value-units per hour.
    Hour indices are exact (bucket micros are exact multiples of the
    unit), every slope is one identical IEEE division in both engines,
    and the median is the same two-middle-order-statistics formula —
    unrounded output, bit-identical cross-engine."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import theil_sen

    out = theil_sen(_hourly_series(spark, sf_dir), unit="1 hour")
    return out.select("series_id", "slope_per_unit", "n_pairs")


def _q_ts_strengths(spark, sf_dir):
    """Wang–Hyndman decomposition-based feature scalars per series:
    trend strength = max(0, 1 - Var(R)/Var(v - seasonal)) and seasonal
    strength = max(0, 1 - Var(R)/Var(v - trend)), computed over the
    decomposition's interior (rows with a full centered-MA trend window).
    The canonical "is this series trendy / seasonal" classifier features
    (tsfeatures/feasts). Both engines aggregate the identical doubles;
    variance is the one op where their summation algebra can differ at
    ~1e-12 relative, far inside the 6-dp round."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import (
        seasonal_decompose,
    )

    dec = seasonal_decompose(_hourly_series(spark, sf_dir), period=24)
    v, t, s = F.col("v"), F.col("trend"), F.col("seasonal")
    out = (
        dec.where(t.isNotNull())
        .groupBy("series_id")
        .agg(
            F.var_samp(v - t - s).alias("_vr"),
            F.var_samp(v - s).alias("_vdeseas"),
            F.var_samp(v - t).alias("_vdetrend"),
            F.count(F.lit(1)).alias("n_interior"),
        )
    )
    return out.select(
        "series_id",
        F.round(
            F.greatest(F.lit(0.0), 1 - F.col("_vr") / F.col("_vdeseas")), 6
        ).alias("trend_strength"),
        F.round(
            F.greatest(F.lit(0.0), 1 - F.col("_vr") / F.col("_vdetrend")), 6
        ).alias("seasonal_strength"),
        "n_interior",
    )


def _q_ts_period(spark, sf_dir):
    """Dominant-period detection over the ACF (lags 2..48): a plain
    argmax is WRONG for periodic signals — a sine's ACF is a cosine with
    equal peaks at every multiple of the period, so noise freely tips
    lag 2p above p. The detector therefore takes the SMALLEST lag whose
    autocorrelation reaches 95% of the series' max (the fundamental
    beats its harmonics; pinned by a planted 17-bucket sine pytest where
    acf(34) actually measured above acf(17)). 6-dp-rounded acf so both
    engines compare identical values; negative-max series fall back to
    the exact max (a 0.95 factor on a negative max would exclude
    everything)."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.tsfeatures import acf

    a = acf(_hourly_series(spark, sf_dir), max_lag=48).where(
        F.col("lag") >= 2
    )
    a = a.select(
        "series_id",
        F.col("lag").cast("int").alias("lag"),
        F.round("acf", 6).alias("acf_r"),
    )
    ws = Window.partitionBy("series_id")
    mx = F.max("acf_r").over(ws)
    thr = F.when(mx > 0, mx * 0.95).otherwise(mx)
    cand = a.withColumn("_thr", thr).where(F.col("acf_r") >= F.col("_thr"))
    w = Window.partitionBy("series_id").orderBy(F.col("lag").asc())
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "series_id",
            F.col("lag").alias("period"),
            F.col("acf_r").alias("acf_at_period"),
        )
    )


def _q_value_histogram(spark, sf_dir):
    """Fixed-grid value histogram per event type (25-unit bins over
    [0, 500)): integer bucket arithmetic, exact counts, the standard
    distribution profile a quality dashboard reads. One hash aggregate
    with map-side partial combine."""
    _prep(spark)
    b = F.floor(F.col("value") / 25).cast("int")
    return (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.least(F.greatest(b, F.lit(0)), F.lit(19)).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("bin_min"),
            F.round(F.max("value"), 6).alias("bin_max"),
        )
    )


def _q_user_profile(spark, sf_dir):
    """Per-user lifetime profile: first/last seen, tenure, distinct
    active days, event counts by class, exact integer-cents spend — the
    LTV/engagement table every downstream model joins against. ONE hash
    aggregate over events (conditional aggregation for the per-class
    counts — no per-class scans), integer-exact money."""
    _prep(spark)
    ev = _events(spark, sf_dir)
    tenure_s = (
        F.unix_micros(F.max("ts").cast("timestamp"))
        - F.unix_micros(F.min("ts").cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.round(tenure_s, 6).alias("tenure_s"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("n_purchases"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("bigint").alias("n_errors"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("spend_cents"),
    )


def _q_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot reconciliation: diff two versions of the events
    table (the second with deterministic planted mutations — deletions
    where event_id%101==0, value updates where %97==0, and appended
    synthetic rows) into per-key change classes via ONE full-outer join
    on the key, then aggregate class counts plus an exact integer-cents
    checksum of the value drift. The primitive behind tier-rebuild
    verification and backfill audits; at scale the join is the only
    shuffle and pre-bucketed snapshots would co-locate it."""
    _prep(spark)
    ev = _events(spark, sf_dir).select("event_id", "user_id", "value")
    new = (
        ev.where(F.col("event_id") % 101 != 0)
        .withColumn(
            "value",
            F.when(
                F.col("event_id") % 97 == 0, F.col("value") + 1.5
            ).otherwise(F.col("value")),
        )
        .unionByName(
            ev.select(
                (F.col("event_id") + 10_000_000).alias("event_id"),
                "user_id",
                "value",
            ).where(F.col("event_id") % 500 == 0)
        )
    )
    a = ev.select(
        "event_id",
        F.col("value").alias("_va"),
        F.round(F.col("value") * 100).cast("bigint").alias("_ca"),
    )
    b = new.select(
        "event_id",
        F.col("value").alias("_vb"),
        F.round(F.col("value") * 100).cast("bigint").alias("_cb"),
    )
    j = a.join(b, "event_id", "full_outer")
    cls = (
        F.when(F.col("_va").isNull(), F.lit("added"))
        .when(F.col("_vb").isNull(), F.lit("removed"))
        .when(F.col("_ca") != F.col("_cb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("change", cls)
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.coalesce("_cb", F.lit(0)) - F.coalesce("_ca", F.lit(0))
            ).alias("cents_drift"),
        )
    )


def _q_data_expectations(spark, sf_dir):
    """Declarative ingest-gate expectations over events
    (operators/expect.py check_expectations): six rules — nullability,
    value bounds, timestamp range, enum membership, id positivity,
    props-JSON well-formedness — evaluated in ONE scan (each rule is a
    conditional sum inside a single global aggregate; an unevaluable
    rule counts as a violation). Long-format output so the violation
    table can be stored, trended, and alerted on like any tier."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.expect import (
        check_expectations,
    )

    ev = _events(spark, sf_dir)
    rules = {
        "value_nonnegative": F.col("value") >= 0,
        "value_below_10k": F.col("value") < 10_000,
        "ts_in_2024": (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2025-01-01").cast("timestamp")),
        "event_type_known": F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"
        ),
        "user_id_positive": F.col("user_id") >= 0,
        "props_is_json": F.get_json_object(
            F.col("props"), "$"
        ).isNotNull(),
    }
    return check_expectations(ev, rules)


def _q_spectral_features(spark, sf_dir):
    """Frequency-domain scalar features per hourly series
    (operators/spectrum.py spectral_features): normalized spectral
    entropy, dominant frequency + its power share. Rows-only (FFT is not
    SQL-expressible) but SELF-VERIFYING: ``invariant_ok`` asserts the
    Parseval identity |energy_time - energy_spec| <= 1e-6·energy_time,
    entropy in [0,1], and peak_share in (0,1] — a kernel emitting
    garbage spectra cannot satisfy time-vs-frequency energy equality."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.spectrum import (
        spectral_features,
    )

    out = spectral_features(
        _hourly_series(spark, sf_dir), value_col="v",
        group_cols=("series_id",), ts_col="bucket_ts",
    )
    rel = F.abs(F.col("energy_time") - F.col("energy_spec")) / F.greatest(
        F.col("energy_time"), F.lit(1e-30)
    )
    # peak_share >= 0 (not > 0): the operator's degenerate branch
    # (constant series / n < 4) legitimately emits share 0.0 — the
    # Parseval equality is the load-bearing check
    inv = (
        (rel <= 1e-6)
        & (F.col("spectral_entropy") >= 0)
        & (F.col("spectral_entropy") <= 1)
        & (F.col("peak_share") >= 0)
        & (F.col("peak_share") <= 1)
    )
    return out.select(
        "series_id",
        "n",
        F.round("spectral_entropy", 6).alias("spectral_entropy"),
        "peak_freq_idx",
        F.round("peak_share", 6).alias("peak_share"),
        inv.alias("invariant_ok"),
    )


def _q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next = b | current = a) with exact pair counts — the
    behavioral-flow profile (what users do after an error, what precedes
    a purchase). One lag window per user's time-ordered events
    (deterministic (ts, event_id) sort — timestamp ties exist in real
    data), one hash aggregate; the probability is one division of two
    exact integers. Row counts are the exact transition counts; an
    unreachable pair simply has no row."""
    _prep(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        _events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("_next", F.lead("event_type").over(w))
        .where(F.col("_next").isNotNull())
    )
    cur = pairs.groupBy(F.col("event_type").alias("cur")).agg(
        F.count(F.lit(1)).alias("_n_cur")
    )
    return (
        pairs.groupBy(
            F.col("event_type").alias("cur"), F.col("_next").alias("nxt")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(cur), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            (F.col("n").cast("double") / F.col("_n_cur")).alias("p"),
        )
    )


def _q_freq_items(spark, sf_dir):
    """Karp–Shenker–Papadimitriou frequent items over user_id
    (`DataFrame.freqItems`) — the third sketch family after GK quantiles
    and HLL distinct: single pass, bounded memory, returns a SUPERSET of
    every sufficiently-frequent item. Rows-only, SELF-VERIFYING on the
    algorithm's ACTUAL guarantee: with ``k = floor(1/support)`` counters
    KSP only promises survival for items with count STRICTLY ABOVE
    ``total/k`` — ``support*total`` is a weaker threshold a correct
    implementation may legitimately miss, and asserting it would
    red-gate correct code. If no item clears the guarantee threshold at
    this scale, one sentinel row documents that honestly instead of
    failing the gate on an empty result.

    PRODUCTION CONTRACT: the exact pre-aggregate below exists ONLY to
    parameterize the gate's invariant (it computes the true counts the
    sketch is checked against — computing the exact answer to pick the
    support would defeat the sketch in production). The scale path picks
    the support A PRIORI from the question being asked ("items above
    0.1% of traffic" => support=0.001, k=1000 counters) and runs the
    single ``df.freqItems(cols, support)`` sketch pass alone — one scan,
    k counters per partition, no exact pre-pass."""
    _prep(spark)
    ev = _events(spark, sf_dir).select("user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    top_n, total = (
        exact.agg(F.max("n_exact"), F.sum("n_exact")).collect()[0]
    )
    # adaptive support: half the top user's true frequency — the top
    # user then clears total/k by construction whenever the floor
    # doesn't bind (a fixed 2% was empty on the 150-uniform-user
    # sf0.01 corpus). FLOOR = 1e-3, not the 1e-4 API minimum: freqItems
    # keeps 1/support counters per partition, so an unfloored adaptive
    # support scales the sketch's memory with the key space — the 10x
    # robustness run (BENCH.md) measured 21x the wall for 10x the data
    # before the floor bounded it at 1000 counters. When the floor binds
    # (top user's share < 0.2%), no user is frequent at the floor and
    # the sentinel-row path reports that honestly.
    support = max(1e-3, 0.5 * top_n / total)
    k = int(1.0 / support)
    items = ev.freqItems(["user_id"], support=support).collect()[0][0]
    heavy = exact.where(F.col("n_exact") > total / k)
    items_df = F.array(*[F.lit(int(i)) for i in items])
    out = heavy.select(
        "user_id",
        "n_exact",
        (F.col("n_exact") / F.lit(float(total))).alias("freq"),
        F.array_contains(items_df, F.col("user_id")).alias("sketch_ok"),
    )
    if out.limit(1).count() == 0:
        return spark.createDataFrame(
            [(-1, 0, 0.0, True)],
            "user_id bigint, n_exact bigint, freq double, "
            "sketch_ok boolean",
        )
    return out


def _q_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters (operators/cms.py) — the a-priori-
    support production path the `freq_items` contract points to: one
    Arrow pass folds each partition into a d x w CMS + exact local top-k,
    the only shuffle moves sketch cells (bounded by partitions x d*w,
    independent of input rows), and estimation is a relational min-join.
    Run over the planted ~20%-hot-key skew (`_skewed_events`, support
    5%). Rows-only but SELF-VERIFYING via the operator's two provable
    guarantees, each gate-asserted per row: ``no_undercount_ok``
    (estimate >= exact: CMS counters only add collision mass) and
    ``band_ok`` (overcount within 5x the expected n/width collision
    mass); plus ``superset_ok`` = every truly-hot key (exact count >=
    support*n, computed by an exact group-by that exists ONLY to check
    the sketch) appears in the output — the pigeonhole local-top-k
    guarantee. The exact aggregates here are gate instrumentation; the
    production path is the sketch alone."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.cms import cms_heavy_hitters

    support, width = 0.05, 8192
    ev = _skewed_events(spark, sf_dir)
    # materialize the heavy-hitter table ONCE (r6): it feeds the exact-
    # count candidate filter, the n_total gate, and the returned join —
    # Catalyst otherwise re-runs the whole CMS Arrow fold per consumer
    # (9 Python stages in the before-plan); the table is bounded at
    # <= 1/support keys, so the checkpoint is tiny at any sf
    hh = (
        cms_heavy_hitters(
            ev, "user_id", support=support, depth=4, width=width
        )
        .withColumn("user_id", F.col("key").cast("bigint"))
        .localCheckpoint()
    )
    # exact counts for the FOUND keys only — filter-before-shuffle
    exact_cand = (
        ev.join(F.broadcast(hh.select("user_id")), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    # true hot-set size (full exact group-by: gate-scale check only)
    n_tot = hh.agg(F.max("n_total").alias("_n"))
    n_hot_exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("_c") >= F.lit(support) * F.col("_n"))
        .agg(F.count(F.lit(1)).alias("n_hot_exact"))
    )
    w_all = Window.partitionBy(F.lit(1))
    return (
        hh.join(exact_cand, "user_id")
        .crossJoin(F.broadcast(n_hot_exact))
        .select(
            "user_id",
            "estimate",
            "exact_cnt",
            "n_total",
            (F.col("estimate") >= F.col("exact_cnt")).alias(
                "no_undercount_ok"
            ),
            (
                F.col("estimate")
                <= F.col("exact_cnt") + 5.0 * F.col("n_total") / width
            ).alias("band_ok"),
            (
                F.sum(
                    (
                        F.col("exact_cnt")
                        >= F.lit(support) * F.col("n_total")
                    ).cast("int")
                ).over(w_all)
                == F.col("n_hot_exact")
            ).alias("superset_ok"),
        )
        .orderBy("user_id")
    )


def _q_hourly_pivot(spark, sf_dir):
    """Wide-format hourly matrix via the pivot surface
    (`groupBy().pivot(values=...)`): one count column per event type —
    the BI-export shape. Explicit pivot values so Catalyst skips the
    distinct-scan planning pass (at 100 TB an unlisted pivot first runs
    a full distinct over the pivot column); exact integer counts;
    oracle is the standard conditional-aggregation expansion."""
    _prep(spark)
    out = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket_ts"))
        .pivot(
            "event_type", ["click", "view", "purchase", "signup", "error"]
        )
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "bucket_ts",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(f"n_{c}")
            for c in ("click", "view", "purchase", "signup", "error")
        ],
    )


def _q_hourly_percentiles(spark, sf_dir):
    """Exact per-(type, hour) latency-style percentile bands (p50/p95/p99
    + min/max) — the monitoring query behind every SLO dashboard. Exact
    `percentile` (sort-based; the GK-sketch path is `sketch_quantiles`),
    unrounded: both engines interpolate the same two order statistics on
    identical inputs, bit-identically (the `ts_rolling_median` parity
    argument)."""
    _prep(spark)
    p = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    return (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            p.getItem(0).alias("p50"),
            p.getItem(1).alias("p95"),
            p.getItem(2).alias("p99"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def _q_cube_profile(spark, sf_dir):
    """OLAP CUBE over (event_type, day-of-week): all four grouping sets —
    cell, per-type subtotal, per-dow subtotal, grand total — in ONE
    aggregate pass (Spark expands the sets map-side; a UNION of four
    groupBys would scan four times). Subtotal keys surface as the 'ALL' /
    -1 sentinels (both grouping columns are non-null, so coalesce is
    unambiguous). Exact integer-cent sums; oracle is DuckDB's native
    GROUP BY CUBE."""
    _prep(spark)
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.round(F.col("value") * 100).cast("bigint").alias("_cents"),
    )
    return (
        ev.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_cents").alias("sum_cents"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type_g"),
            F.coalesce("dow", F.lit(-1)).cast("int").alias("dow_g"),
            "n",
            "sum_cents",
        )
    )


def _q_hopping_window(spark, sf_dir):
    """Hopping (sliding) window aggregate: per event_type, count and exact
    integer-cent sum over 1-hour windows sliding every 15 minutes — the
    overlapping-window primitive tumbling tiers can't express (each event
    lands in exactly windowDuration/slide = 4 windows). Spark's native
    ``window(ts, '1 hour', '15 minutes')`` expands the assignment
    map-side; the DuckDB oracle replays the same epoch-aligned grid with
    an explicit 4-hop fan-out."""
    _prep(spark)
    ev = _events(spark, sf_dir).select(
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("_cents"),
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_cents").alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


def _q_rank_functions(spark, sf_dir):
    """The SQL ranking-function surface in one query: rank, dense_rank,
    percent_rank, cume_dist, ntile(4) over the per-type hourly count
    series, ordered by (n DESC, bucket_ts ASC) — a total order (bucket_ts
    is unique per type), so every function is deterministic and the
    doubles (percent_rank's (rank-1)/(n-1), cume_dist's peers/n) are the
    same two-integer division in both engines — bit-identical,
    unrounded."""
    _prep(spark)
    from pyspark.sql import Window

    per = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("bucket_ts")
    )
    return per.select(
        "event_type",
        "bucket_ts",
        "n",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


def _q_sliding_distinct(spark, sf_dir):
    """EXACT trailing-24h distinct users per (event_type, hourly slide) —
    the 'active users in the last day, refreshed hourly' dashboard query.
    Spark's native sliding window(ts, '24 hours', '1 hour') assigns each
    event to its 24 covering windows map-side, then one countDistinct.
    Honest scale note in-code: this fans every event out 24x; the
    production path is sliding_distinct_sketch (zero fan-out, HLL tier +
    range-frame union — the rows-only twin query). Oracle: DuckDB replays
    the same epoch-aligned 24-hop fan-out."""
    _prep(spark)
    ev = _events(spark, sf_dir).select("ts", "event_type", "user_id")
    return (
        ev.groupBy(
            F.window("ts", "24 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_users",
            "n_events",
        )
    )


def _q_sliding_distinct_sketch(spark, sf_dir):
    """The 100-TB path for trailing-window cardinality
    (operators/sketch_tiers.py sliding_distinct_sketch): hourly HLL
    sketches built once, trailing-24h estimate = one RANGE-frame
    hll_union_agg over 24 tier rows — ZERO event fan-out where the exact
    form replicates every event 24x before a distinct shuffle (HLL union
    is register-wise max, so the window union of hourly sketches IS the
    sketch of the hour union; gap hours need no fill — the range frame is
    value-defined). Rows-only, SELF-VERIFYING: ``sketch_ok`` joins each
    estimate to the exact trailing distinct (computed in-query via the
    fan-out form) and asserts |est - exact| <= 5*rsd*exact with absolute
    floor 2."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.sketch_tiers import (
        HLL_LG_K,
        hll_rsd,
        sliding_distinct_sketch,
    )

    ev = _events(spark, sf_dir).select("ts", "event_type", "user_id")
    est = sliding_distinct_sketch(
        ev, ["event_type"], "ts", "user_id", window_hours=24
    )
    exact = (
        ev.groupBy(
            F.window("ts", "24 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .select(
            F.col("w.end").alias("_we"), "event_type", "n_exact"
        )
    )
    # sketch row at hour h covers (h+1h-24h, h+1h] == exact window ending h+1h
    return (
        est.withColumn(
            "_we", F.col("bucket_ts") + F.expr("interval 1 hour")
        )
        .join(exact, ["event_type", "_we"])
        .select(
            "event_type",
            "bucket_ts",
            "distinct_est",
            "n_exact",
            (
                F.abs(F.col("distinct_est") - F.col("n_exact"))
                <= F.greatest(
                    F.lit(5 * hll_rsd(HLL_LG_K)) * F.col("n_exact"),
                    F.lit(2.0),
                )
            ).alias("sketch_ok"),
        )
        .orderBy("event_type", "bucket_ts")
    )


def _q_series_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix of the five hourly series
    (upper triangle, positional row alignment like ts_xcorr's lag 0):
    which metrics move together. One row_number window + one self
    equi-join on the index + a partial-aggregated corr per pair."""
    _prep(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("series_id").orderBy("bucket_ts")
    idx = _hourly_series(spark, sf_dir).select(
        "series_id",
        F.col("v").alias("_x"),
        (F.row_number().over(w) - 1).alias("_i"),
    )
    a = idx.select(
        F.col("series_id").alias("series_a"), F.col("_x").alias("_xa"), "_i"
    )
    b = idx.select(
        F.col("series_id").alias("series_b"), F.col("_x").alias("_xb"), "_i"
    )
    return (
        a.join(b, "_i")
        .where(F.col("series_a") < F.col("series_b"))
        .groupBy("series_a", "series_b")
        .agg(
            F.round(F.corr("_xa", "_xb"), 6).alias("corr"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


def _q_weekly_profile(spark, sf_dir):
    """Weekly seasonal profile: per (event_type, day-of-week, hour-of-day)
    cell — event count, exact-integer mean value (cents), and share of
    the type's weekly total. The dashboard heatmap behind every 'when do
    users do X' question; one hash aggregate plus a broadcast of 5 type
    totals. Integer cents make the mean exact; the share is one division
    of two exact integers, bit-identical cross-engine."""
    _prep(spark)
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * 100).cast("bigint").alias("_cents"),
    )
    cells = ev.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_cents").alias("_sum_cents"),
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n").alias("_total")
    )
    return cells.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "dow",
        "hod",
        "n",
        (F.col("_sum_cents").cast("double") / F.col("n") / 100.0).alias(
            "mean_value"
        ),
        (F.col("n").cast("double") / F.col("_total")).alias("share"),
    )


def _q_top_users_per_hour(spark, sf_dir):
    """Windowed top-k: the 3 most active users per hour (rank over a
    per-hour count, deterministic user_id tie-break). The heavy-hitters
    primitive every abuse/ops dashboard runs; one aggregate + one
    window over the aggregated (small) per-hour user counts — the rank
    never touches raw events."""
    _prep(spark)
    from pyspark.sql import Window

    per = (
        _events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("bucket_ts").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        per.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("bucket_ts", F.col("rank").cast("int").alias("rank"),
                "user_id", "n_events")
    )


def _q_ts_brown_les(spark, sf_dir):
    """Brown's linear exponential smoothing over the hourly series
    (operators/tsfeatures.py brown_les): trend-aware forecasting one
    notch up from EWMA, computed as two chained adjust=False EWMA passes
    in pandas' C kernel. Dyadic alpha=0.25 so the recurrence constants
    are exact; the oracle replays both recurrences as stacked recursive
    CTEs with identical IEEE op order, making the 6-dp rounds
    tie-free."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import brown_les

    out = brown_les(_hourly_series(spark, sf_dir), alpha=0.25)
    return out.select(
        "series_id",
        "bucket_ts",
        "v",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast", 6).alias("forecast"),
    )


def _q_ts_xcorr(spark, sf_dir):
    """Cross-correlation between the click and view hourly series at lags
    -6..6 (operators/tsfeatures.py cross_corr): positional alignment by
    row index within each series' time order, one equi-join on the
    shifted index, partial-aggregated corr per lag — the two-series
    extension of ts_acf."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.tsfeatures import cross_corr

    out = cross_corr(
        _hourly_series(spark, sf_dir), id_a="click", id_b="view", max_lag=6
    )
    return out.select(
        F.col("lag").cast("int").alias("lag"),
        F.round("xcorr", 6).alias("xcorr"),
        "n_pairs",
    )


def _q_clustered_layout(spark, sf_dir):
    """Scan-optimized layout writer (operators/layout.py): events
    range-clustered on user_id, sorted within partitions, file sizes
    capped. Rows-only but SELF-VERIFYING from the written files' OWN
    parquet metadata (pyarrow, no scan): per-file rows <= cap
    (`cap_ok`), and a point predicate's candidate file set is a small
    fraction of all files (`prune_ok` from the min/max envelopes — the
    exact statistic a distributed planner prunes with; an arrival-order
    write measures ~1.0 here, i.e. zero pruning)."""
    _prep(spark)
    import tempfile

    from wavelet_decomposition_spark.operators.layout import (
        layout_stats,
        pruning_factor,
        write_clustered,
    )

    path = f"{tempfile.gettempdir()}/wds_layout_events"
    cap = 5_000
    write_clustered(
        _events(spark, sf_dir).select("user_id", "ts", "value"),
        path,
        cluster_cols=["user_id"],
        target_rows_per_file=cap,
    )
    stats = layout_stats(path, "user_id")
    files = sorted({s["file"] for s in stats})
    # probes span the ACTUAL key domain read back from the files — fixed
    # probe values would fall outside small-sf domains and prune
    # vacuously. The writer always produces int64 min/max stats; a
    # stat-less row group here means the write itself is broken, so fail
    # loudly rather than probing a half-known domain.
    if any(s["min"] is None or s["max"] is None for s in stats):
        raise RuntimeError("clustered write produced stat-less row groups")
    gmin = min(s["min"] for s in stats)
    gmax = max(s["max"] for s in stats)
    probes = [gmin + (gmax - gmin) * i // 4 for i in range(5)]
    pf = pruning_factor(stats, probes)
    rows = [
        (
            files.index(s["file"]),
            s["row_group"],
            s["rows"],
            int(s["min"]),
            int(s["max"]),
            s["rows"] <= cap,
            pf <= 2.0 / len(files) + 0.05,
        )
        for s in stats
    ]
    return spark.createDataFrame(
        rows,
        "file_idx int, row_group int, rows bigint, key_min bigint, "
        "key_max bigint, cap_ok boolean, prune_ok boolean",
    )


def _q_lttb_downsample(spark, sf_dir):
    """LTTB line-chart downsampling to 100 points per hourly series
    (operators/tsfeatures.py lttb_downsample) — rows-only (the greedy is
    not SQL-expressible) but SELF-VERIFYING in the single-lineage window
    form: every output row is left-joined back to the input series and
    per-series window aggregates assert (a) each point is a REAL input
    point with its exact value, (b) the point count is exactly
    min(100, n_series), (c) both endpoints are preserved. A kernel
    returning invented, mis-valued, miscounted, or endpoint-dropping rows
    fails the gate's invariant assertion. The greedy's per-step argmax
    optimality is pinned in pytest (tests/test_tsfeatures.py)."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.tsfeatures import (
        lttb_downsample,
    )

    base = _hourly_series(spark, sf_dir)
    out = lttb_downsample(base, n_out=100)
    binfo = base.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("_n_in"),
        F.min("bucket_ts").alias("_ts_min"),
        F.max("bucket_ts").alias("_ts_max"),
    )
    joined = (
        out.join(
            base.withColumnRenamed("v", "_v_in"),
            ["series_id", "bucket_ts"],
            "left",
        )
        .join(F.broadcast(binfo), "series_id")
    )
    w = Window.partitionBy("series_id")
    bad = F.when(
        F.col("_v_in").isNull() | (F.col("_v_in") != F.col("v")), 1
    ).otherwise(0)
    inv = (
        (F.sum(bad).over(w) == 0)
        & (F.count(F.lit(1)).over(w) == F.least(F.lit(100), F.col("_n_in")))
        & (F.min("bucket_ts").over(w) == F.col("_ts_min"))
        & (F.max("bucket_ts").over(w) == F.col("_ts_max"))
    )
    return joined.select(
        "series_id", "bucket_ts", F.round("v", 6).alias("v"),
        inv.alias("invariant_ok"),
    )


def _q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the event stream (30-minute gap): the
    relational window+agg form; its streaming applyInPandasWithState twin is
    equivalence-tested in tests/test_sessions.py."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.sessions import sessionize

    return sessionize(
        _events(spark, sf_dir), gap="30 minutes", group_col="user_id",
        ts_col="ts", order_col="event_id", value_col="value",
    )


def _q_quality_score(spark, sf_dir):
    """Text-quality scoring + language ID via the textstats operator (every
    column oracle-checked, including the composite quality score and the
    greatest-struct language tie-breaking)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.textstats import doc_stats

    out = doc_stats(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_chars", "n_words", "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
        "lang_guess", "fingerprint",
    )


def _q_resample_linear(spark, sf_dir):
    """P4 relational form — 1->4 linear upsample of the per-minute click
    series (positional grid via row_number; np.interp-equivalence pinned in
    tests/test_activity_rollup.py)."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.resample import (
        resample_linear_relational,
    )

    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    per_min = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(F.avg("value").alias("v"))
        .select(
            "event_type", (F.row_number().over(w) - 1).alias("idx"), "v"
        )
    )
    out = resample_linear_relational(per_min, "event_type", "idx", "v", 1, 4)
    return out.select(
        "event_type", "idx", F.round("v", 6).alias("v")
    )


def _q_conversation_stats_skew(spark, sf_dir):
    """Salted two-phase aggregation (skew handling for long conversations),
    proven exact against a plain GROUP BY oracle. Events stand in as
    transcripts: conv_id=event_type (few huge groups = worst-case skew)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.activity import conversation_stats

    tx = _events(spark, sf_dir).select(
        F.col("event_type").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("value") > 0.5, F.lit("t")).alias("tool"),
        "ts",
    )
    return conversation_stats(tx, n_salts=16)


def _skewed_events(spark, sf_dir):
    """Events with a PLANTED power-law key: every user with user_id%5==0
    is remapped to one hot key (-1), concentrating ~20% of all events on a
    single grouping/window key — the skew shape a 100x scale-up produces
    (one mega-customer, one runaway agent conversation). Deterministic and
    expressed identically in the DuckDB oracles."""
    return _events(spark, sf_dir).withColumn(
        "user_id",
        F.when(F.col("user_id") % 5 == 0, F.lit(-1).cast("bigint"))
        .otherwise(F.col("user_id")),
    )


def _q_sessionize_skewed(spark, sf_dir):
    """Gap-based sessionization under planted ~20%-hot-key skew
    (`_skewed_events`): the hot key's merged timeline stresses the per-key
    window sort, and the result must stay oracle-exact. Values are
    quantized to integer cents BEFORE the session aggregate so the hot
    sessions' big sums stay order-free and bit-identical cross-engine.
    tests/test_plans.py pins the skew-robustness plan properties (AQE
    skew-split on the shuffle, map-side partial agg)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.sessions import sessionize

    ev = _skewed_events(spark, sf_dir).withColumn(
        "value", F.round(F.col("value") * 100).cast("bigint")
    )
    out = sessionize(
        ev, gap="30 minutes", group_col="user_id",
        ts_col="ts", order_col="event_id", value_col="value",
    )
    return out.withColumnRenamed("total_value", "total_cents")


def _q_user_profile_skewed(spark, sf_dir):
    """Per-user lifetime profile under planted ~20%-hot-key skew: same
    aggregate as `user_profile` over `_skewed_events`. Exactness under
    skew comes from map-side partial aggregation — the hot key is
    pre-combined inside every input partition before the ONE exchange, so
    the reducer receives at most n_partitions rows for it (asserted on
    the plan in tests/test_plans.py)."""
    _prep(spark)
    ev = _skewed_events(spark, sf_dir)
    tenure_s = (
        F.unix_micros(F.max("ts").cast("timestamp"))
        - F.unix_micros(F.min("ts").cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.round(tenure_s, 6).alias("tenure_s"),
        F.countDistinct(F.to_date("ts")).alias("active_days"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("n_purchases"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("bigint").alias("n_errors"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("spend_cents"),
    )


def _q_lang_id(spark, sf_dir):
    """Real n-gram language ID (operators/langid.py — naive-Bayes byte
    trigrams, Cavnar-Trenkle 1994 profile method, one Arrow kernel, no
    shuffle): classifies every sf document, with a labeled HELD-OUT
    fixture (50 sentences x 10 languages, disjoint from the training
    seeds) riding along — ``lang_acc_ok`` asserts fixture accuracy >= 0.9
    on every output row, so the rows-only gate cannot pass on a broken
    classifier. Replaces the round-4 six-marker-word `lang_marker_hits`
    toy as the production lang-ID path."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.langid import (
        held_out_fixture,
        lang_id_ngram,
    )

    docs = lang_id_ngram(_docs(spark, sf_dir))
    fix = spark.createDataFrame(
        held_out_fixture(), "row_id int, true_lang string, text string"
    )
    acc = (
        lang_id_ngram(fix, id_col="row_id")
        .join(fix.select("row_id", "true_lang"), "row_id")
        .agg(
            F.avg(
                (F.col("lang") == F.col("true_lang")).cast("double")
            ).alias("acc")
        )
    )
    # 1-row broadcast invariant join (allowlisted tiny-BNL pattern)
    return docs.crossJoin(F.broadcast(acc)).select(
        "doc_id",
        "lang",
        "margin",
        F.round("acc", 4).alias("fixture_acc"),
        (F.col("acc") >= 0.9).alias("lang_acc_ok"),
    )


def _q_hurst_rs(spark, sf_dir):
    """Rescaled-range ladder (operators/hurst.py rs_ladder) over the
    per-type hourly activity series — the long-memory sufficient
    statistics under the Hurst exponent: per (series, dyadic window
    size n), the number of full chunks and the exact BIGINT sum of
    floor(R/S * 1e6) over them. The series is quantized to integer
    whole cents (R/S is scale-invariant, so granularity only perturbs
    the hourly-mean rounding; cents — unlike the micro-units ts_rolling
    uses — keep every chunk moment inside the 2^53 exact-double
    envelope) so chunk sums, means (power-of-two divisors), cumulative
    deviations, and variances are all exact; R/S is one IEEE sqrt + one
    division — bit-identical
    cross-engine, floored to micro-units BEFORE the order-sensitive
    summation. The float log-log slope on top (hurst_exponent) is
    pytest-verified against numpy (tests/test_hurst.py). One exchange
    on the (series, n, chunk) ladder, window ops + two hash
    aggregates, no Python stage.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.hurst import rs_ladder

    hourly = (
        _events(spark, sf_dir)
        .select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "bucket_ts")
        .agg(
            # whole cents (NOT micro-units): R/S is scale-invariant, and
            # cents keep every chunk moment (s1^2 <= ~4e11, s2 <= ~6e9)
            # exactly representable — micro-units would overflow BIGINT
            # and leave the 2^53 exactness envelope
            F.floor(
                F.sum("cents").cast("double") / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("vm")
        )
    )
    return (
        rs_ladder(
            hourly, value_col="vm", group_col="event_type",
            ts_col="bucket_ts", sizes=(8, 16, 32, 64),
        )
        .select(
            F.col("event_type").alias("series_id"),
            F.col("n").cast("bigint").alias("n"),
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.col("sum_rs_micro").cast("bigint").alias("sum_rs_micro"),
        )
        .orderBy("series_id", "n")
    )


def _q_trigram_quality(spark, sf_dir):
    """Character-trigram corpus-familiarity statistics
    (operators/charlm.py trigram_quality) — the integer-exact core of
    the CCNet/KenLM quality-filter family: per document, total trigram
    occurrences, corpus-rare occurrences (profile frequency <= 2), and
    the exact sum of corpus frequencies over its occurrences. The
    profile is self-built from the scored corpus (first-pass mode) and
    is charset-bounded (<= |alphabet|^3 rows — broadcast side forever),
    so the plan is one broadcast-hash join + two hash aggregates. A
    planted 2-char document exercises the empty-trigram path in both
    engines (it must appear with all-zero statistics). The float
    log-prob layer (trigram_logprob) is pytest-verified against numpy.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.charlm import (
        trigram_quality,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    planted = spark.createDataFrame(
        [(20_000_000, "ab")], "doc_id bigint, text string"
    )
    return trigram_quality(
        docs.unionByName(planted), rare_max=2
    ).orderBy("doc_id")


def _q_edit_distance_pairs(spark, sf_dir):
    """Prefix-blocked exact Levenshtein near-dup pairs
    (operators/dedup.py edit_distance_pairs) — the ORDERED-corruption
    detector next to the set-based family (Jaccard/MinHash/SimHash see
    bags; edit distance sees character order — OCR noise, truncated
    tails, template field edits). Ten planted tail-perturbed copies
    (doc_id + 20,000,000, normalized text + ' zq' => distance exactly
    3 from their originals) must surface through the block join, the
    length lower-bound prune, and the DP itself; natural exact-dup
    groups surface at distance 0. Blocking is a hash equi-join on the
    24-char normalized prefix (never all-pairs; per-block fan-out is
    quadratic in near-dup family size only). Both engines run the
    identical blocking + levenshtein — integer-exact. (Spark counts
    characters, DuckDB bytes; the gate corpus is verified ASCII-only.)
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.dedup import (
        edit_distance_pairs,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    planted = (
        docs.orderBy("doc_id").limit(10)
        .select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq")).alias("text"),
        )
    )
    return (
        edit_distance_pairs(
            docs.unionByName(planted), max_dist=16, block_prefix=24
        )
        .select(
            "id_a",
            "id_b",
            F.col("dist").cast("bigint").alias("dist"),
            F.col("len_a").cast("bigint").alias("len_a"),
            F.col("len_b").cast("bigint").alias("len_b"),
        )
        .orderBy("id_a", "id_b")
    )


def _q_winsorize_values(spark, sf_dir):
    """Per-type winsorization of event values (operators/featureprep.py
    winsorize) — robust feature scaling that clamps the integer-cent
    values at the exact per-group order statistics of ranks
    ceil(0.05*n) and ceil(0.95*n) over the (cents, event_id) total
    order. Order statistics (not interpolated percentiles — engines
    disagree on interpolation conventions) with pure-integer rank
    arithmetic make the whole result hash-exact cross-engine. One
    exchange for the rank window; bounds reduce to one row per group
    and come back via a broadcast join, so the clamp is map-side.
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.featureprep import (
        winsorize,
    )

    ev = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return winsorize(
        ev, value_col="cents", group_col="event_type",
        id_col="event_id", lo_pct=5, hi_pct=95,
    ).orderBy("event_type", "event_id")


# ---------------------------------------------------------------------------
# rows-only (non-SQL-expressible) queries
# ---------------------------------------------------------------------------

def _q_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd's k-means over the embeddings corpus
    (operators/kmeans.py) — semantic clustering for curation (domain
    discovery, cluster-balanced sampling). Iterative float algorithm —
    no SQL oracle; instead the run is made BIT-DETERMINISTIC (integer
    micro-unit quantization => exact order-free BIGINT partial sums,
    hash-seeded init, lowest-index argmin tie-break) and the gate
    asserts, riding every output row:

    ``refit_identical_ok``    a SECOND full fit reproduces every
                              centroid coordinate bit-for-bit and the
                              exact inertia ladder (the determinism
                              contract under AQE/repartition);
    ``inertia_monotone_ok``   the per-iteration inertia ladder never
                              increases (Lloyd's descent property —
                              a broken update or assignment cannot
                              keep the books balanced);
    ``final_step_ok``         relabeling against the FINAL centroids
                              costs no more than the last fit
                              iteration (one more Lloyd half-step can
                              only descend; floor-rounding slack =
                              corpus size);
    ``sizes_ok``              cluster sizes sum to the corpus count.

    Per iteration: one Arrow GEMM pass emitting k partial rows per
    batch, one k*dim hash aggregate, one bounded k*dim collect. The
    corpus never shuffles and never reaches the driver.
    """
    _prep(spark)
    import numpy as np

    from wavelet_decomposition_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_fit,
        quantized,
    )

    emb = quantized(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    ).cache()
    # the two fits are independent by construction (the refit-identical
    # invariant compares them) — run them as concurrent driver threads
    # (guide §2.6): each fit's Lloyd rounds are scheduling-latency-bound
    # small jobs, so the wall is max, not sum
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as _pool:
        _f2 = _pool.submit(
            lambda: kmeans_fit(emb, k=8, max_iter=4, seed=42)
        )
        fit1 = kmeans_fit(emb, k=8, max_iter=4, seed=42)
        fit2 = _f2.result()
    refit_ok = bool(
        np.array_equal(fit1["centroids"], fit2["centroids"])
        and fit1["inertia_micro"] == fit2["inertia_micro"]
    )
    ladder = fit1["inertia_micro"]
    monotone_ok = all(b <= a for a, b in zip(ladder, ladder[1:]))
    per_cell = (
        kmeans_assign(emb, fit1["centroids"])
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("sqdist_micro").alias("inertia_contrib_micro"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    total_n = F.sum("n_points").over(w)
    total_inertia = F.sum("inertia_contrib_micro").over(w)
    return per_cell.select(
        "cell",
        "n_points",
        "inertia_contrib_micro",
        F.lit(refit_ok).alias("refit_identical_ok"),
        F.lit(monotone_ok).alias("inertia_monotone_ok"),
        (total_inertia <= F.lit(int(ladder[-1])) + total_n).alias(
            "final_step_ok"
        ),
        (total_n == F.lit(int(fit1["n"]))).alias("sizes_ok"),
    ).orderBy("cell")


def _q_drift_psi(spark, sf_dir):
    """Population Stability Index drift detection per event_type: the
    value distribution of the FIRST time-half of the stream against the
    SECOND (banking's standard score for "did this feature's
    distribution move"; PSI < 0.1 stable, > 0.25 shifted). The
    monitoring primitive a training-data pipeline runs between corpus
    snapshots before trusting a refresh.

    ORACLE-CHECKED end-to-end by the integer-sufficient-statistics
    discipline: the split point is exact integer epoch-micros midpoint
    (floor division), bin counts are exact ints, each bin's
    (p - q) * ln(p / q) term — add-1 smoothed so one-sided bins are
    finite — is quantized ONCE to micro-units from an identical
    left-to-right expression in both engines, and the per-type PSI is
    then an exact order-free BIGINT sum. One scan, one (type, bin)
    hash aggregate, window totals over the tiny bin table."""
    _prep(spark)
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") / 10).cast("int").alias("bin"),
        # parquet ts is TIMESTAMP_NTZ; session is pinned UTC so the
        # cast is a type relabel, not a wall-clock shift
        F.unix_micros(F.col("ts").cast("timestamp")).alias("e"),
    )
    lo, hi = ev.agg(F.min("e"), F.max("e")).first()
    mid = (int(lo) + int(hi)) // 2  # exact; DuckDB twin uses // too
    cnt = ev.groupBy("event_type", "bin").agg(
        F.sum((F.col("e") <= mid).cast("long")).alias("nb"),
        F.sum((F.col("e") > mid).cast("long")).alias("na"),
    )
    w = Window.partitionBy("event_type")
    t = cnt.select(
        "event_type",
        "nb",
        "na",
        F.sum("nb").over(w).alias("tnb"),
        F.sum("na").over(w).alias("tna"),
        F.count(F.lit(1)).over(w).alias("b"),
    )
    p = (F.col("nb") + 1) / (F.col("tnb") + F.col("b"))
    q = (F.col("na") + 1) / (F.col("tna") + F.col("b"))
    term = F.round((p - q) * F.log(p / q) * 1e6).cast("bigint")
    return (
        t.select("event_type", "nb", "na", term.alias("term"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("nb").alias("n_before"),
            F.sum("na").alias("n_after"),
            F.sum("term").alias("psi_micro"),
        )
    )


def _q_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023 — public
    method): score every document by how much its unigram distribution
    looks like a TARGET domain (sources src0-src3) versus the raw
    corpus — the weights that importance-resample a web crawl toward a
    high-quality domain. weight(doc) = sum over tokens of
    ln(p_target(w) / p_raw(w)), add-1 smoothed over the joint vocab.

    ORACLE-CHECKED end-to-end by the integer-sufficient-statistics
    discipline (the trigram_quality/winsorize pattern): the per-word
    log-ratio is quantized ONCE to micro-units (the ln argument is an
    identical left-to-right integer-division expression in both
    engines, so it is bit-identical; a 1-ulp libm ln divergence would
    have to land within ~1e-10 of a half-micro boundary to matter),
    and every per-doc weight is then an EXACT order-free BIGINT dot
    product — no float aggregation anywhere.

    Scale shape: token counts are two hash aggregates over one corpus
    scan; the log-ratio table is vocabulary-sized (Zipf-bounded) and
    broadcast back onto the per-doc counts — the corpus itself never
    joins or shuffles by anything but (doc_id, word). In production
    the vocab is hashed into a fixed bucket table (same plan shape).
    """
    _prep(spark)
    targets = ("src0", "src1", "src2", "src3")
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.regexp_extract_all(
                F.col("text"), F.lit(_TOKEN_REGEX), F.lit(0)
            )
        ).alias("w"),
    )
    raw = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n_r"))
    tgt = (
        tok.filter(F.col("source").isin(*targets))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    consts = tok.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("source").isin(*targets).cast("long")).alias("n_tgt"),
        F.countDistinct("w").alias("v"),
    ).first()  # three bounded scalars
    n_raw, n_tgt, v = int(consts["n_raw"]), int(consts["n_tgt"]), int(
        consts["v"]
    )
    # identical left-to-right arithmetic in the DuckDB oracle
    arg = (
        (F.coalesce(F.col("n_t"), F.lit(0)) + 1)
        / F.lit(n_tgt + v)
        * F.lit(n_raw + v)
        / (F.col("n_r") + 1)
    )
    lr = raw.join(tgt, "w", "left").select(
        "w",
        F.round(F.log(arg) * 1e6).cast("bigint").alias("lr_micro"),
    )
    dw = tok.groupBy("doc_id", "source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        dw.join(F.broadcast(lr), "w")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_terms"),
            F.sum(F.col("c") * F.col("lr_micro")).alias("weight_micro"),
        )
        .select(
            "doc_id",
            "n_terms",
            "weight_micro",
            F.col("source").isin(*targets).alias("is_target"),
        )
    )


def _q_bpe_vocab(spark, sf_dir):
    """Distributed BPE tokenizer training over the documents corpus
    (operators/bpe.py — Sennrich et al. 2016): ONE corpus scan builds
    the Zipf-bounded word-frequency table; each merge round is one
    Arrow pass + hash aggregate over that compact table and one
    collected argmax row under the engine-independent total order
    (count desc, pair lexicographic). Rows-only; invariants riding
    every row:

    ``dual_path_ok``     the distributed trainer's full merge list
                         (pairs AND counts, in rank order) equals a
                         pure-Python BPE run on the collected word-
                         count dict — collected ONLY for this gate
                         check (the table is corpus-vocabulary-sized;
                         at 10^7+ words production trusts the exact
                         bookkeeping instead);
    ``bookkeeping_ok``   per round, applying merge (a,b) with pair
                         count f shrank the total weighted symbol
                         count by EXACTLY f (leftmost-greedy counts =
                         replacements performed — a miscounted pair
                         table cannot balance these books);
    ``encode_ok``        re-tokenizing the corpus with the learned
                         merges never exceeds the character count and
                         strictly compresses the corpus total.

    Output: the learned merge table (rank, pair, merged symbol, count).
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        bpe_train_reference,
        word_counts,
    )

    docs = _docs(spark, sf_dir)
    # size-gated iteration confs (same rationale as _q_pagerank): the
    # 24 merge rounds are one tiny job each over the Zipf-bounded word
    # table — AQE re-planning per round is pure round-trip overhead at
    # gate scale, and real corpora (gate: 10M docs) keep AQE on
    _small = docs.count() <= 10_000_000
    _old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if _small:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        fit = bpe_train(docs, n_merges=24, min_freq=2, verify=True)
        # dual-path gate reads the trainer's own checkpointed word table
        # (same rows word_counts(docs) would produce — it IS that
        # aggregate, materialized once) instead of a second corpus scan
        wc = {
            r["word"]: r["count"]
            for r in fit["word_counts_df"].collect()
        }
        ref = bpe_train_reference(wc, 24, 2)
        dual_ok = fit["merges"] == ref
        enc = bpe_encode(docs, fit["merges"]).agg(
            F.sum(
                (F.col("n_tokens") > F.col("n_chars")).cast("long")
            ).alias("_n_over"),
            F.sum("n_tokens").alias("_tok"),
            F.sum("n_chars").alias("_chr"),
        ).first()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", _old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)
    encode_ok = enc["_n_over"] == 0 and enc["_tok"] < enc["_chr"]
    rows = [
        (i + 1, a, b, a + b, f)
        for i, (a, b, f) in enumerate(fit["merges"])
    ]
    return spark.createDataFrame(
        rows,
        "rank int, left string, right string, merged string, "
        "pair_count long",
    ).select(
        "rank",
        "left",
        "right",
        "merged",
        "pair_count",
        F.lit(bool(dual_ok)).alias("dual_path_ok"),
        F.lit(bool(fit["bookkeeping_ok"])).alias("bookkeeping_ok"),
        F.lit(bool(encode_ok)).alias("encode_ok"),
    ).orderBy("rank")


def _q_pelt_changepoints(spark, sf_dir):
    """PELT exact multi-changepoint segmentation per hourly series
    (operators/changepoint.py — Killick et al. 2012), completing the
    single-shift CUSUM: minimizes segment-cost + beta * k EXACTLY.
    Rows-only (penalized segmentation is not SQL-expressible);
    invariants riding every row:

    ``dp_equal_ok``       per group, PELT's pruned answer equals the
                          UNPRUNED O(n^2) dynamic program run side by
                          side in the same kernel — the PELT theorem
                          as an executable check;
    ``planted_exact_ok``  a noiseless 4-level step series (levels
                          0/1000/-500/300 at 60/50/70/60 points)
                          unioned into the input must segment at
                          EXACTLY [60, 110, 180] — recovered
                          boundaries, not just counts.

    beta = 1e4 sized to the hourly series' noise floor (var ~1e3 per
    point: beta 10 chased noise into ~600 segments per series; 1e4
    yields 2-11 real shifts). Groups are bounded (hourly retention
    tier); the only exchange is the groupBy itself."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.changepoint import (
        pelt_changepoints,
    )

    i = F.col("id")
    lens = [60, 50, 70, 60]
    levels = [0.0, 1000.0, -500.0, 300.0]
    bounds = [60, 110, 180]
    level = (
        F.when(i < lens[0], levels[0])
        .when(i < lens[0] + lens[1], levels[1])
        .when(i < lens[0] + lens[1] + lens[2], levels[2])
        .otherwise(levels[3])
    )
    planted = spark.range(sum(lens)).select(
        F.lit("planted").alias("series_id"),
        F.timestamp_seconds(F.lit(1767225600) + i * 3600).alias(
            "bucket_ts"
        ),
        level.alias("v"),
    )
    base = _hourly_series(spark, sf_dir).unionByName(planted)
    segs = pelt_changepoints(
        base, ["series_id"], "bucket_ts", "v", beta=1e4, verify=True
    ).cache()
    got = sorted(
        r["start_pos"]
        for r in segs.filter(F.col("series_id") == "planted").collect()
    )
    planted_ok = got == [0] + bounds
    return segs.select(
        "series_id",
        "seg_idx",
        "start_pos",
        "end_pos",
        "n_points",
        F.round("seg_mean", 6).alias("seg_mean"),
        "dp_equal_ok",
        F.lit(planted_ok).alias("planted_exact_ok"),
    ).orderBy("series_id", "seg_idx")


def _q_event_prefix_groups(spark, sf_dir):
    """Shared-prefix detection over per-user event-type sequences
    (operators/prefixes.py): md5 prefix fingerprints at depths 1/2/4/8
    under the stable event_id order, grouped to find users whose
    journeys START identically — the sequence-dedup primitive behind
    retried-run / branched-conversation detection, exercised here on
    the events table so the ENTIRE path (window head-trim, ordered
    fingerprint, group formation, the md5 bytes themselves) is
    DuckDB-oracle-checked. One exchange for the fingerprints (the
    row-number window and the per-user aggregate share the user_id
    partitioning; the ``rn <= 8`` head filter bounds every group's
    aggregation state at 8 rows no matter the sequence length) plus
    one hash aggregate on (depth, prefix_hash)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.prefixes import (
        prefix_fingerprints,
        shared_prefix_groups,
    )

    fp = prefix_fingerprints(
        _events(spark, sf_dir), "user_id", "event_id", "event_type",
        depths=(1, 2, 4, 8),
    )
    return shared_prefix_groups(fp, "user_id").withColumnRenamed(
        "n_members", "n_users"
    )


def _q_conversation_forks(spark, sf_dir):
    """Planted-fork recovery over transcripts: ``forked_transcripts``
    plants 30 forks among 120 conversations — each fork's first
    ``fork_depth`` = min(2 + hash%5, own len, parent len) turns are
    byte-identical to its parent's (the retried-run / branched-agent /
    shared-system-preamble duplication shape) — and the prefix
    fingerprint pass must hand back EXACTLY the planted families.
    Rows-only; invariant riding every row:

    ``families_exact_ok``  the full set of (depth, member-set) groups
                           equals the closed-form fork plan
                           (``fork_metadata`` — pure integer-hash
                           arithmetic, no data access) at every depth
                           in {1,2,3,4,6}: one extra, missing, or
                           merged family anywhere flips it. Since a
                           fork group exists ONLY through byte-equal
                           prefix texts, this simultaneously proves
                           the generator planted the texts and the
                           fingerprint recovered them.

    The group collect is bounded by the planted-fork count (group
    membership lists are fork families, not the corpus)."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import (
        fork_metadata,
        forked_transcripts,
    )
    from wavelet_decomposition_spark.operators.prefixes import (
        prefix_fingerprints,
        shared_prefix_groups,
    )

    n, nf = 120, 30
    depths = (1, 2, 3, 4, 6)
    tx = forked_transcripts(spark, n, nf, seed=42)
    fp = prefix_fingerprints(tx, "conv_id", "turn_idx", "text", depths)
    groups = shared_prefix_groups(fp, "conv_id", with_members=True).cache()
    got = {
        (r["depth"], frozenset(r["members"])) for r in groups.collect()
    }
    meta = fork_metadata(n, nf, seed=42)
    want = set()
    for d in depths:
        for p, g in meta[meta.fork_depth >= d].groupby("parent_id"):
            want.add((
                d,
                frozenset(
                    [f"conv-{p:08d}"]
                    + [f"conv-{f:08d}" for f in g.fork_id]
                ),
            ))
    return groups.select(
        "depth",
        "prefix_hash",
        "n_members",
        F.lit(got == want).alias("families_exact_ok"),
    ).orderBy("depth", "prefix_hash")


def _q_pca_embeddings(spark, sf_dir):
    """Distributed PCA over the embeddings corpus (operators/pca.py) —
    one exact integer-statistics pass (packed-triangle Gram partials,
    DECIMAL(38,0) cross-batch sums), a driver eigh of the 64x64
    covariance, one Arrow projection pass. Iterative-free but float-
    spectral — no SQL oracle; the gate asserts, riding every row:

    ``refit_identical_ok``  a second fit under a DIFFERENT partitioning
                            reproduces every eigenvalue, component
                            coordinate, and mean bit-for-bit (the exact
                            integer-statistics contract);
    ``orthonormal_ok``      max |C C^T - I| < 1e-9;
    ``desc_ok``             eigenvalues non-increasing;
    ``resid_tail_ok``       the DISTRIBUTED mean squared projection
                            residual equals the sum of the trailing
                            48 eigenvalues to 1e-9 relative — the
                            identity that ties the Arrow projection
                            kernel to the driver eigensolve (a wrong
                            mean, transposed components, or a scaling
                            slip cannot balance it).

    Output: the top 16 components' spectrum (eigenvalue + explained
    variance ratio per component).
    """
    _prep(spark)
    import numpy as np

    from wavelet_decomposition_spark.operators.kmeans import quantized
    from wavelet_decomposition_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    emb = quantized(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    ).cache()
    # independent fits (the refit invariant compares them) — overlap
    # them on driver threads, guide §2.6
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as _pool:
        _rf = _pool.submit(
            lambda: pca_fit(emb.repartition(13), n_components=16)
        )
        fit = pca_fit(emb, n_components=16)
        refit = _rf.result()
    refit_ok = bool(
        np.array_equal(fit["eigenvalues"], refit["eigenvalues"])
        and np.array_equal(fit["components"], refit["components"])
        and np.array_equal(fit["mean"], refit["mean"])
    )
    C = fit["components"]
    ortho_ok = bool(np.abs(C @ C.T - np.eye(len(C))).max() < 1e-9)
    ev = fit["eigenvalues"]
    desc_ok = bool(np.all(np.diff(ev) <= 1e-18))
    # project the SAME (quantized, descaled) data the fit saw so the
    # residual identity is float-exact, not quantization-smeared
    descaled = emb.withColumn(
        "embedding", F.transform("embedding", lambda v: v / F.lit(1e6))
    )
    tail = float(ev[len(C):].sum())
    resid_check = pca_project(descaled, fit["mean"], C).agg(
        (
            F.abs(F.avg("resid_sq") - F.lit(tail))
            <= 1e-9 * F.lit(max(tail, 1e-30))
        ).alias("_resid_ok")
    )
    total_var = float(ev.sum())
    spec = spark.createDataFrame(
        [
            (
                i,
                round(float(ev[i]), 9),
                round(float(ev[i] / total_var), 9),
            )
            for i in range(len(C))
        ],
        "component int, eigenvalue double, explained_ratio double",
    )
    return spec.crossJoin(F.broadcast(resid_check)).select(
        "component",
        "eigenvalue",
        "explained_ratio",
        F.lit(refit_ok).alias("refit_identical_ok"),
        F.lit(ortho_ok).alias("orthonormal_ok"),
        F.lit(desc_ok).alias("desc_ok"),
        F.col("_resid_ok").alias("resid_tail_ok"),
    ).orderBy("component")


def _q_fft_spectrum(spark, sf_dir):
    """A7 — one-sided demeaned FFT magnitude spectrum per (series, year),
    self-verifying: ``parseval_ok`` = one-sided coefficient energy (window
    aggregate over the FULL spectrum, computed before the display filter)
    equals the demeaned input energy to 1e-4 relative (the omitted Nyquist
    bin contributes ~1e-7 on this signal) — the rows-only gate cannot pass
    on garbage magnitudes."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io.electricity import electricity_df
    from wavelet_decomposition_spark.operators import series as ser
    from wavelet_decomposition_spark.operators.resample import resample_per_year
    from wavelet_decomposition_spark.operators.spectrum import fft_spectrum

    df = electricity_df(spark, signals=["Consumption"], years=[2013])
    df = ser.leap_trim(df, 48 * 365)
    df = ser.normalize_yearly_mean(df)
    df = resample_per_year(df, 48, 64, 365)
    in_e = df.groupBy("series_id", "year").agg(
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count(F.lit(1)) * F.pow(F.avg("value"), 2)
        ).alias("_in_e")
    )
    spec = fft_spectrum(df).join(F.broadcast(in_e), ["series_id", "year"])
    w = Window.partitionBy("series_id", "year")
    n = 2 * F.count(F.lit(1)).over(w)  # full length N = 2 * one-sided bins
    coef_e = 2.0 * F.sum(
        F.pow(F.col("magnitude") * n / 2.0, 2)
    ).over(w)
    return spec.select(
        "series_id", "year", "freq_idx", "magnitude",
        (
            F.abs(coef_e - n * F.col("_in_e")) <= 1e-4 * n * F.col("_in_e")
        ).alias("parseval_ok"),
    ).filter(F.col("freq_idx") < 2048)


def _q_reconstruction_roundtrip(spark, sf_dir):
    """A8 — decompose then inverse-transform through the broadcast-matvec
    UDF path (the twin of ``reconstruction_relational``'s join+agg form),
    SELF-VERIFYING: every row carries ``invariant_ok`` = per-(series, year)
    relative reconstruction error vs the input signal < 1e-2 (the
    damped-LSQR fit bound) — a garbage solve, dictionary, or matvec cannot
    satisfy it. Band-pass masking (P7) is pinned separately by
    tests/test_decompose_spark.py and the per-scale ``heatmap_scales``
    query."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io import reference_data as rd
    from wavelet_decomposition_spark.io.electricity import electricity_df
    from wavelet_decomposition_spark.operators import decompose as dec
    from wavelet_decomposition_spark.operators import series as ser
    from wavelet_decomposition_spark.operators.resample import resample_per_year

    df = electricity_df(spark, signals=["Consumption"], years=[2013])
    df = ser.leap_trim(df, 48 * 365)
    df = ser.normalize_yearly_mean(df)
    df = resample_per_year(df, 48, 64, 365)
    trans = rd.load_translations("square")
    bc = dec.broadcast_dictionaries(spark, "square", {2013: trans[1]})
    betas = dec.decompose(df, bc)
    recon = dec.reconstruct(betas, bc)
    joined = recon.join(
        df.withColumnRenamed("value", "signal"), ["series_id", "year", "idx"]
    )
    w = Window.partitionBy("series_id", "year")
    rel_err = F.sum(F.pow(F.col("value") - F.col("signal"), 2)).over(w) / F.sum(
        F.pow("signal", 2)
    ).over(w)
    return joined.select(
        "series_id", "year", "idx", "value",
        (rel_err < 1e-2).alias("invariant_ok"),
    )


def _q_translation_search(spark, sf_dir):
    """A11 — the reference's dominant cost at FULL width: all 23,360
    circular shifts for (Consumption, 2012, year family), distributed
    (reference: ~hours single-core per year, calc_translations.py:29-43
    "grab a coffee"). SELF-VERIFYING: ``invariant_ok`` = (argmin shift ==
    the golden pickle's transyear, modulo the square year wavelet's
    N/2 sign-flip tie symmetry), as a window aggregate over the one sweep
    lineage. All three families run in ``translation_full``; shift-level
    parity is asserted in tests/test_translation_spectrum.py."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io.reference_data import (
        load_prepared_signal,
        load_translations,
    )
    from wavelet_decomposition_spark.operators.translation import (
        residues_for_shifts,
    )

    sig = load_prepared_signal("Consumption", 2012)
    golden_year = int(load_translations("square")[0][2])
    res = residues_for_shifts(spark, sig, "year", "square", dpy=365, dpd=64)
    w = Window.partitionBy()
    best_shift = F.min(F.struct(F.col("residue"), F.col("shift"))).over(w)[
        "shift"
    ]
    return res.select(
        "shift",
        "residue",
        (
            F.pmod(best_shift - golden_year, F.lit(int(sig.size) // 2)) == 0
        ).alias("invariant_ok"),
    )


def _q_translation_full(spark, sf_dir):
    """The reference's COMPLETE E3 offline job for one year, distributed
    and self-verifying: all three mother-wavelet families (day, week, year)
    swept over every one of the 23,360 circular shifts — ~3 x 23,360 LSQR
    fits, the load the reference calls "grab a coffee ... hours single-core"
    (calc_translations.py:45-118,128). ``invariant_ok`` on every row:
    the per-family argmin (min-residue shift, window aggregate over the one
    union lineage) must equal the golden pickle trans_square_12_18.p[0] ==
    [87, 5974, 19225] MODULO the family's proven exact-arithmetic tie
    symmetry — day mothers are invariant under 64-point shifts (argmin
    defined mod 64), the square year wavelet sign-flips at N/2 (mod
    11,680), week has no symmetry (exact; modulus N). The same parity is
    asserted shift-for-shift in tests/test_translation_spectrum.py."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io.reference_data import (
        load_prepared_signal,
        load_translations,
    )
    from wavelet_decomposition_spark.operators.translation import (
        residues_for_shifts,
    )

    sig = load_prepared_signal("Consumption", 2012)
    n = int(sig.size)
    g_day, g_week, g_year = load_translations("square")[0]
    golden = spark.createDataFrame(
        [
            ("day", int(g_day), 64),
            ("week", int(g_week), n),
            ("year", int(g_year), n // 2),
        ],
        "family string, golden_shift long, modulus long",
    )
    res = None
    for fam in ("day", "week", "year"):
        part = residues_for_shifts(
            spark, sig, fam, "square", dpy=365, dpd=64
        ).withColumn("family", F.lit(fam))
        res = part if res is None else res.unionByName(part)
    w = Window.partitionBy("family")
    best_shift = F.min(F.struct(F.col("residue"), F.col("shift"))).over(w)[
        "shift"
    ]
    return res.join(F.broadcast(golden), "family").select(
        "family",
        "shift",
        "residue",
        (
            F.pmod(best_shift - F.col("golden_shift"), F.col("modulus")) == 0
        ).alias("invariant_ok"),
    )


def _q_heatmap_scales(spark, sf_dir):
    """A9 — heatmap pre-pivot: each scale reconstructed separately, pivoted
    wide (reference wavelet_decomposition.py:325-358, notebook cells
    21->23 — which densify the 4.38 GB matrix; here one sparse matvec per
    scale per group). Now SELF-VERIFYING via the linearity identity: with
    the offset included as the 16th column, the scale columns must SUM to
    the full reconstruction, so ``invariant_ok`` = per-(series, year)
    relative error of (sum of all 16 scale columns) vs the input signal
    < 1e-2 (the damped-LSQR fit bound) — shift a single scale's matvec and
    the sum breaks. The per-scale-vs-full linearity is also asserted
    exactly in tests/test_translation_spectrum.py."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io import reference_data as rd
    from wavelet_decomposition_spark.io.electricity import electricity_df
    from wavelet_decomposition_spark.operators import decompose as dec
    from wavelet_decomposition_spark.operators import series as ser
    from wavelet_decomposition_spark.operators.resample import resample_per_year
    from wavelet_decomposition_spark.operators.spectrum import (
        heatmap_pivot,
        per_scale_reconstruction,
    )

    df = electricity_df(spark, signals=["Consumption"], years=[2013])
    df = ser.leap_trim(df, 48 * 365)
    df = ser.normalize_yearly_mean(df)
    df = resample_per_year(df, 48, 64, 365)
    trans = rd.load_translations("square")
    bc = dec.broadcast_dictionaries(spark, "square", {2013: trans[1]})
    betas = dec.decompose(df, bc)
    pivot = heatmap_pivot(
        per_scale_reconstruction(betas, bc, n_scales=16), scales=range(16)
    )
    joined = pivot.join(
        df.select(
            "series_id", "year", "idx", F.col("value").alias("_signal")
        ),
        ["series_id", "year", "idx"],
    )
    scale_sum = sum(
        [F.col("1")] + [F.col(str(s)) for s in range(2, 16)], F.col("0")
    )
    w = Window.partitionBy("series_id", "year")
    rel_err = F.sum(F.pow(scale_sum - F.col("_signal"), 2)).over(w) / F.sum(
        F.pow("_signal", 2)
    ).over(w)
    return joined.select(
        "series_id", "year", "idx",
        *[F.col(str(s)) for s in range(16)],
        (rel_err < 1e-2).alias("invariant_ok"),
    )


def _q_reconstruction_relational(spark, sf_dir):
    """J3 — reconstruction as broadcast join + hash aggregation over the
    dictionary-as-a-table (the pure-relational alternative to the
    broadcast-matvec UDF; equivalence pinned in tests/test_decompose_spark).
    Self-verifying: ``invariant_ok`` carries the relative reconstruction
    error vs the input signal (< 1e-2 for the damped-LSQR fit) — a garbage
    join/agg cannot satisfy it."""
    _prep(spark)
    from wavelet_decomposition_spark.io import reference_data as rd
    from wavelet_decomposition_spark.io.electricity import electricity_df
    from wavelet_decomposition_spark.operators import decompose as dec
    from wavelet_decomposition_spark.operators import series as ser
    from wavelet_decomposition_spark.operators.resample import resample_per_year

    df = electricity_df(spark, signals=["Consumption"], years=[2013])
    df = ser.leap_trim(df, 48 * 365)
    df = ser.normalize_yearly_mean(df)
    df = resample_per_year(df, 48, 64, 365)
    trans = rd.load_translations("square")
    bc = dec.broadcast_dictionaries(spark, "square", {2013: trans[1]})
    betas = dec.decompose(df, bc)
    support = dec.support_table(spark, bc)
    recon = dec.reconstruct_relational(betas, support, add_offset=True)
    joined = recon.join(
        df.withColumnRenamed("value", "signal"), ["series_id", "year", "idx"]
    )
    # single lineage: the relative-error invariant is a window aggregate
    # over the one joined result (referencing `joined` from two branches
    # would recompute the whole decompose+reconstruct lineage twice)
    from pyspark.sql import Window

    w = Window.partitionBy("series_id", "year")
    rel_err = F.sum(F.pow(F.col("value") - F.col("signal"), 2)).over(w) / F.sum(
        F.pow("signal", 2)
    ).over(w)
    return joined.select(
        "series_id", "year", "idx", "value",
        (rel_err < 1e-2).alias("invariant_ok"),
    )


def _q_multimodal_plan(spark, sf_dir):
    """Multimodal plumbing: synthetic binary assets -> resize plan +
    video frame-sampling plan + fake-feature extraction (decode stubbed).

    Now SELF-VERIFYING (round-3 verdict) — every row carries
    ``invariant_ok`` checking, against the asset's own metadata:
    - resize: dims unchanged when max(w,h) <= max_side, else the long side
      lands exactly on max_side and the aspect ratio is preserved to the
      rounding bound |tw*h - th*w| <= 0.5*(w+h);
    - frame plan: n_frames == floor(max(duration_ms-1,0)/every_ms) + 1 for
      video, 0 otherwise;
    - features: dimension == FEATURE_DIM and two independent extraction
      runs produce identical vectors (determinism — a nondeterministic or
      shape-broken UDF cannot pass)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators import multimodal as mm

    every_ms, max_side = 60_000, 512
    assets = mm.synthetic_assets(spark, 500, seed=42)
    meta = assets.select("asset_id", "width", "height", "duration_ms")
    resize = mm.resize_plan(assets, max_side=max_side)
    frames = (
        mm.frame_sample_plan(assets, every_ms=every_ms)
        .groupBy("asset_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    f1 = mm.extract_features(assets, fake=True).select(
        "asset_id", F.col("feature").alias("_f1")
    )
    f2 = mm.extract_features(assets, fake=True).select(
        "asset_id", F.col("feature").alias("_f2")
    )
    j = (
        resize.join(meta, "asset_id")
        .join(f1, "asset_id")
        .join(f2, "asset_id")
        .join(frames, "asset_id", "left")
        .fillna(0, subset=["n_frames"])
    )
    mx = F.greatest("width", "height")
    tw, th = F.col("target_width"), F.col("target_height")
    resize_ok = F.when(
        mx <= max_side, (tw == F.col("width")) & (th == F.col("height"))
    ).otherwise(
        (F.greatest(tw, th) == max_side)
        & (
            F.abs(tw * F.col("height") - th * F.col("width"))
            <= 0.5 * (F.col("width") + F.col("height"))
        )
    )
    frames_ok = F.when(
        F.col("kind") == "video",
        F.col("n_frames")
        == F.floor(
            F.greatest(F.col("duration_ms") - 1, F.lit(0)) / every_ms
        ) + 1,
    ).otherwise(F.col("n_frames") == 0)
    feat_ok = (F.size("_f1") == mm.FEATURE_DIM) & (F.col("_f1") == F.col("_f2"))
    return j.select(
        "asset_id",
        "kind",
        "target_width",
        "target_height",
        F.size("_f1").alias("feat_dim"),
        "n_frames",
        (resize_ok & frames_ok & feat_ok).alias("invariant_ok"),
    )


def _ann_with_recall_invariant(out, exact, recall_bound):
    """Attach an in-query correctness invariant to an approximate-ANN
    result (round-3 verdict): ``invariant_ok`` = (global recall vs the
    brute-force exact top-k >= recall_bound) AND (every query finds its OWN
    vector at rank 1 with cosine ~ 1 — the queries are corpus members).
    Computed via a full-outer join against the exact top-k plus window
    aggregates over the joined result, then filtered back to the
    approximate rows — a garbage bucketing, scoring, or ranking path
    cannot satisfy both. (The exact twin is a second scan of the small
    embeddings table — the brute-force baseline is itself an
    oracle-checked query, ``ann_topk``.)"""
    from pyspark.sql import Window

    hits = exact.select("query_id", "vec_id", F.lit(1).alias("_hit"))
    j = out.join(hits, ["query_id", "vec_id"], "full_outer")
    wg = Window.partitionBy()
    wq = Window.partitionBy("query_id")
    found = F.sum(
        F.when(F.col("rank").isNotNull() & (F.col("_hit") == 1), 1).otherwise(0)
    ).over(wg)
    recall = found / F.sum(F.coalesce("_hit", F.lit(0))).over(wg)
    self_hit = F.max(
        (
            (F.col("vec_id") == F.col("query_id"))
            & (F.col("rank") == 1)
            & (F.col("score") > 0.999)
        ).cast("int")
    ).over(wq)
    return j.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        "rank",
        ((recall >= recall_bound) & (self_hit == 1)).alias("invariant_ok"),
    ).filter(F.col("rank").isNotNull())


def _q_lsh_ann_topk(spark, sf_dir):
    """LSH-bucketed ANN (the scale path; brute-force ann_topk is its
    oracle-checked baseline). Self-verifying: recall >= 0.2 vs brute force
    — intentionally modest because the fixture's uniform-random embeddings
    are hyperplane LSH's worst case (neighbors barely correlate with sign
    buckets; measured recall 0.27-0.67 across sf) — plus the rank-1
    self-hit check, which garbage cannot pass at any recall."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(emb, queries, k=5)
    exact = brute_force_topk(emb, queries, k=5)
    return _ann_with_recall_invariant(out, exact, recall_bound=0.2)


def _q_ivf_ann_topk(spark, sf_dir):
    """IVF-bucketed ANN (data-adaptive scale path: spherical-kmeans coarse
    quantizer trained on a bounded sample, corpus cell assignment in one JVM
    scan, queries probe their n_probe nearest cells). With n_probe == n_cells
    it provably equals brute force (tests/test_dedup_similarity.py).
    Self-verifying: recall >= 0.6 vs brute force at n_probe/n_cells = 1/2
    (measured 0.73-1.0 across sf) plus the rank-1 self-hit check."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4)
    exact = brute_force_topk(emb, queries, k=5)
    return _ann_with_recall_invariant(out, exact, recall_bound=0.6)


def _q_pq_ann_topk(spark, sf_dir):
    """Product-quantization ANN (operators/pq.py — Jégou et al. 2011):
    the compressed-domain leg of the retrieval family. Each 64-dim
    float32 vector becomes 16 codes (16:1 payload compression — at
    10^12 vectors the difference between scanning 100 TB and 6 TB);
    search is two-stage: ADC table-lookup shortlist (m gathers per
    candidate, no dot products) then exact L2 re-rank of the 100-row
    shortlist through one broadcast join. Rows-only; invariants riding
    every row:

    ``recall_ok``     recall@5 vs the exact L2 brute-force twin >= 0.7
                      (measured 1.0 at sf0.01/sf0.1; the fixture's
                      uniform-random embeddings are quantization's
                      WORST case — no cluster structure to spend the
                      codebook on, same caveat as lsh_ann_topk);
    ``self_hit_ok``   every query (a corpus member) re-ranks ITSELF to
                      rank 1 at exact distance 0;
    ``decode_ok``     a decode-and-rescore pass (gather codewords,
                      recompute ||x - recon||^2 from scratch) agrees
                      with the encoder's carried quantization error to
                      1 floor-micro ulp on EVERY corpus row — a
                      code/codebook mixup or subspace offset bug
                      cannot balance those books;
    ``reencode_ok``   re-encoding under a different partitioning yields
                      bit-identical codes (the determinism contract:
                      hash-pinned training sample, lowest-index argmin).
    """
    _prep(spark)
    from wavelet_decomposition_spark.operators.pq import (
        l2_brute_topk,
        pq_decode_errors,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=16, k=64, train_sample=2048, seed=42)
    # localCheckpoint, NOT cache: the codebooks differ per run (collected
    # training output), so a .cache() here can never be re-matched by a
    # later run's plan — each bench repeat stacked another orphaned cache
    # entry (measured: +1 persistent RDD and +1-2 s wall per repeat until
    # the session died); checkpointed RDDs are reclaimed by the
    # ContextCleaner when the query's references drop
    codes = pq_encode(emb, books).localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_topk(codes, books, queries, k=5, shortlist=100, corpus=emb)
    exact = l2_brute_topk(emb, queries, k=5)

    decode_ok = pq_decode_errors(emb, codes, books).agg(
        F.max(
            F.abs(F.col("qerr_micro") - F.col("qerr_decode_micro"))
        ).alias("_max_dev"),
        F.count(F.lit(1)).alias("_n"),
    )
    n_rows = emb.count()
    reencoded = pq_encode(emb.repartition(13), books)
    n_same = (
        codes.join(reencoded.withColumnRenamed("codes", "_c2"), "vec_id")
        .filter(F.col("codes") == F.col("_c2"))
        .count()
    )

    from pyspark.sql import Window

    hits = exact.select("query_id", "vec_id", F.lit(1).alias("_hit"))
    j = approx.join(hits, ["query_id", "vec_id"], "full_outer")
    wg = Window.partitionBy()
    wq = Window.partitionBy("query_id")
    found = F.sum(
        F.when(F.col("rank").isNotNull() & (F.col("_hit") == 1), 1)
        .otherwise(0)
    ).over(wg)
    recall = found / F.sum(F.coalesce("_hit", F.lit(0))).over(wg)
    self_hit = F.min(
        F.when(
            F.col("rank") == 1,
            (
                (F.col("vec_id") == F.col("query_id"))
                & (F.col("adist") < 1e-9)
            ).cast("int"),
        )
    ).over(wq)
    return (
        j.select(
            "query_id",
            "vec_id",
            F.round("adist", 6).alias("adist"),
            "rank",
            (recall >= 0.7).alias("recall_ok"),
            (self_hit == 1).alias("self_hit_ok"),
        )
        .filter(F.col("rank").isNotNull())
        .crossJoin(F.broadcast(decode_ok))  # 1-row invariant frame
        .select(
            "query_id",
            "vec_id",
            "adist",
            "rank",
            "recall_ok",
            "self_hit_ok",
            (
                (F.col("_max_dev") <= 1) & (F.col("_n") == F.lit(n_rows))
            ).alias("decode_ok"),
            F.lit(n_same == n_rows).alias("reencode_ok"),
        )
    )


def _q_text_invariant(spark, sf_dir):
    """Per-turn text-equality invariant (BASELINE.json input_hint): raw
    snapshot vs derived lineage under stable (conv_id, turn_idx) ordering;
    must return n_mismatch=0 over all turns."""
    _prep(spark)
    import tempfile

    from wavelet_decomposition_spark.io.transcripts import transcripts_df

    tx = transcripts_df(spark, 200, seed=42)
    path = f"{tempfile.gettempdir()}/wds_invariant_snapshot"
    tx.write.mode("overwrite").parquet(path)
    derived = spark.read.parquet(path)
    joined = tx.alias("a").join(
        derived.alias("b"), ["conv_id", "turn_idx"], "full_outer"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            F.when(
                F.sha2(F.col("a.text"), 256) != F.sha2(F.col("b.text"), 256), 1
            )
            .when(F.col("a.text").isNull() | F.col("b.text").isNull(), 1)
            .otherwise(0)
        ).alias("n_mismatch"),
    ).select(
        "n_turns",
        "n_mismatch",
        ((F.col("n_turns") > 0) & (F.col("n_mismatch") == 0)).alias(
            "invariant_ok"
        ),
    )

def _q_transcript_rollup_1m(spark, sf_dir):
    """Self-verifying rows-only check: every row carries ``invariant_ok`` =
    (sum of tier turns == raw turn count) — the rollup cannot pass the
    driver's rows-only gate on garbage values."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import activity, rollup

    from pyspark.sql import Window

    tx = transcripts_df(spark, 200, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    # tier total via a global window keeps the tier lineage single-pass;
    # the raw count is a separate (cheap, deterministic-generator) lineage
    raw_n = tx.agg(F.count(F.lit(1)).alias("_raw_turns"))
    w = Window.partitionBy()
    return tier.crossJoin(F.broadcast(raw_n)).select(
        "conv_id", "bucket_ts", "turns", "chars", "tool_calls",
        (F.sum("turns").over(w) == F.col("_raw_turns")).alias("invariant_ok"),
    )


def _q_dwt_energy(spark, sf_dir):
    """Haar DWT per-scale energy spectra over dyadic windows of the
    transcript 1m tier, with a single-lineage Parseval invariant column
    (sum of band energies equals window energy) riding every row."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import (
        activity,
        gapfill,
        rollup,
        wavelet_ops,
    )

    tx = transcripts_df(spark, 100, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    filled = gapfill.gapfill_zero(
        tier, activity.ACTIVITY_COUNT_COLS, step="1 minute"
    ).cache()
    from pyspark.sql import Window

    coefs = wavelet_ops.dwt_windows(filled, "turns", "db4", levels=4, window_len=64)
    spectrum = wavelet_ops.energy_spectrum(coefs)
    # Parseval self-check: db4 is orthonormal, so total coefficient energy
    # == input energy (zero-padding adds none) — rows-only gate can't pass
    # on garbage coefficients. Global-window sum keeps the spectrum lineage
    # single-pass (a two-branch agg+crossJoin re-ran the pyramid UDF);
    # the input-energy side reads the cached `filled` tier.
    in_e = filled.agg(F.sum(F.col("turns") * F.col("turns")).alias("_in_e"))
    w = Window.partitionBy()
    return spectrum.crossJoin(F.broadcast(in_e)).select(
        "conv_id", "window_id", "wavelet", "level", "coef_type", "energy",
        (
            F.abs(F.sum("energy").over(w) - F.col("_in_e"))
            <= 1e-6 * F.greatest(F.col("_in_e"), F.lit(1.0))
        ).alias("parseval_ok"),
    )


def _q_wpt_energy(spark, sf_dir):
    """Wavelet PACKET energy spectra (kernel/dwt.py wpt_batch — Coifman
    & Wickerhauser 1992) over dyadic windows of the transcript 1m tier:
    the FULL binary tree decomposes detail bands too, giving 2^4 = 16
    uniform-width frequency bands per window where the DWT pyramid's
    detail bands are octave-wide — the right basis when conversation
    rhythm lives mid-band. Rows-only; invariants riding every row:

    ``parseval_ok``    the orthonormal tree preserves energy: the sum
                       of ALL leaf-band energies equals the gap-filled
                       input tier's total signal energy (zero padding
                       adds none) to 1e-6 relative — garbage packets
                       cannot balance it;
    ``n_bands_ok``     every window emits exactly 16 band rows
                       (band00..band15, natural order).

    tests/test_dwt.py pins the kernel identities (roundtrip, leaf
    Parseval, all-low path == DWT approximation, Haar closed form).
    """
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import (
        activity,
        gapfill,
        rollup,
        wavelet_ops,
    )

    tx = transcripts_df(spark, 100, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    filled = gapfill.gapfill_zero(
        tier, activity.ACTIVITY_COUNT_COLS, step="1 minute"
    ).cache()
    spectrum = wavelet_ops.energy_windows(
        filled, "turns", wavelet="db4", levels=4, window_len=64,
        transform="wpt",
    )
    in_e = filled.agg(F.sum(F.col("turns") * F.col("turns")).alias("_in_e"))
    w = Window.partitionBy()
    wwin = Window.partitionBy("conv_id", "window_id")
    return spectrum.crossJoin(F.broadcast(in_e)).select(
        "conv_id", "window_id", "wavelet", "level", "coef_type", "energy",
        (
            F.abs(F.sum("energy").over(w) - F.col("_in_e"))
            <= 1e-6 * F.greatest(F.col("_in_e"), F.lit(1.0))
        ).alias("parseval_ok"),
        (F.count(F.lit(1)).over(wwin) == 16).alias("n_bands_ok"),
    )


def _q_tier_wavelet_parity(spark, sf_dir):
    """Wavelet coefficient + point parity at EVERY retention tier — the
    north metric's "coefficient/point parity vs reference at every
    retention tier" clause, driver-exposed in one query.

    The rollup cascade raw -> 1m -> 1h -> 1d (operators/rollup.py) is
    built, each tier is zero-gap-filled at its own grid step, and the
    Haar pyramid runs over each tier's dyadic windows TWICE through
    disjoint computation paths: the production Arrow numpy kernel
    (wavelet_ops.dwt_windows, kernel/dwt.py) and a pure-JVM closed-form
    relational pyramid (wavelet_ops.haar_dwt_relational — one explode +
    one hash aggregate, no Python stage). Every coefficient of every
    tier must agree to 1e-9 relative.

    Invariants riding each output row (one per tier x level x band):
    ``parity_ok``  — max |kernel - closed form| <= 1e-9 * max |coef|;
    ``coverage_ok`` — no closed-form coefficient falls outside the
    kernel's coefficient grid (windowing drift detector);
    ``cascade_ok`` — POINT parity: the 1h and 1d tiers built from the
    cascade equal the same tiers aggregated straight from raw, exactly
    (integer counts; full-outer null-safe comparison finds any drift).
    """
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import (
        activity,
        gapfill,
        rollup,
        wavelet_ops,
    )

    # small-data conf window (same rationale as _q_pagerank/_q_bpe_vocab):
    # this query's input is the FIXED 100-conversation parity fixture —
    # a ~25-stage verification DAG over <=6k-row tiers where AQE's
    # stage-by-stage materialization is pure driver round trips
    # (measured 3.9-4.3 s -> 3.0 s back-to-back). The plan executes
    # eagerly inside the window via localCheckpoint and the confs are
    # restored before return; nothing leaves the timed region — query
    # construction IS timed by the bench harness.
    _old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = _tier_wavelet_parity_plan(
            spark, transcripts_df, activity, gapfill, rollup, wavelet_ops
        ).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", _old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)
    return out.orderBy("tier", "level", "coef_type")


def _tier_wavelet_parity_plan(
    spark, transcripts_df, activity, gapfill, rollup, wavelet_ops
):
    tx = transcripts_df(spark, 100, seed=42)
    raw = activity.activity_raw(tx).cache()
    tiers = rollup.build_tiers(raw)
    for t in ("1m", "1h", "1d"):
        tiers[t] = tiers[t].cache()
    cfg = {"1m": ("1 minute", 64, 4), "1h": ("1 hour", 32, 4),
           "1d": ("1 day", 8, 3)}
    keys = ["conv_id", "window_id", "level", "k", "coef_type"]
    cols = activity.ACTIVITY_COUNT_COLS
    parts = []
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    for tier, (step, wlen, levels) in cfg.items():
        filled = gapfill.gapfill_zero(tiers[tier], cols, step=step).cache()
        kern = wavelet_ops.dwt_windows(
            filled, "turns", "haar", levels=levels, window_len=wlen
        )
        rel = wavelet_ops.haar_dwt_relational(
            filled, "turns", levels=levels, window_len=wlen
        ).withColumnRenamed("coef", "rel_coef")
        # ONE full-outer join replaces the old left-join + left-anti pair,
        # which referenced both pyramid paths twice and recomputed every
        # Arrow kernel pass and the explode/aggregate twin per reference
        # (the plan carried 187 exchanges / 41 Python stages across the
        # three tiers). Rows with a NULL kernel side are exactly the
        # left-anti rows the coverage check counted; when coverage holds
        # (it must — coverage_ok gates every row) the joined row set is
        # identical to the old left join's.
        j = kern.join(rel, keys, "full_outer")
        parts.append(
            j.groupBy("level", "coef_type")
            .agg(
                F.count("coef").alias("n_coefs"),
                F.max(
                    F.when(
                        F.col("coef").isNotNull(),
                        F.abs(
                            F.col("coef")
                            - F.coalesce("rel_coef", F.lit(0.0))
                        ),
                    )
                ).alias("max_abs_err"),
                F.max(F.abs("coef")).alias("_max_c"),
                F.sum(
                    F.col("coef").isNull().cast("long")
                ).alias("_uncov_g"),
            )
            .select(
                F.lit(tier).alias("tier"),
                "level",
                "coef_type",
                "n_coefs",
                "max_abs_err",
                (
                    F.col("max_abs_err")
                    <= 1e-9 * F.greatest(F.lit(1.0), F.col("_max_c"))
                ).alias("parity_ok"),
                (F.sum("_uncov_g").over(w_all) == 0).alias("coverage_ok"),
            )
        )
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    # point parity: cascade tier == direct-from-raw tier, exactly
    bads = []
    for tier in ("1h", "1d"):
        d = rollup.rollup_direct(raw, tier).select(
            "conv_id", "bucket_ts",
            *[F.col(c).alias(f"d_{c}") for c in cols],
        )
        diff = " OR ".join(f"{c} IS DISTINCT FROM d_{c}" for c in cols)
        bads.append(
            tiers[tier]
            .join(d, ["conv_id", "bucket_ts"], "full_outer")
            .where(F.expr(diff))
            .agg(F.count(F.lit(1)).alias(f"_bad_{tier}"))
        )
    casc = bads[0].crossJoin(bads[1]).select(
        ((F.col("_bad_1h") == 0) & (F.col("_bad_1d") == 0)).alias(
            "cascade_ok"
        )
    )
    # ordering applied by the caller after the checkpoint
    return out.crossJoin(F.broadcast(casc))


def _q_matrix_profile(spark, sf_dir):
    """Matrix-profile motif + discord discovery (operators/motif.py —
    Yeh et al. ICDM'16) over the hourly series, PLUS a planted series
    that makes the result falsifiable three ways.

    The planted series (480 hourly points) is a daily sine pattern with
    a deterministic jitter, an IDENTICAL uncommon 24-point segment
    planted at positions 72 and 336 (so the true top motif pair is
    exactly (72, 336) at z-distance 0), and a unique linear ramp at
    240..263 (so the true top discord must overlap it). Invariants on
    every row: ``planted_motif_ok`` (reported motif pair == {72, 336},
    dist <= 1e-6), ``planted_discord_ok`` (reported discord start within
    the ramp's overlap range), and ``recompute_ok`` — the reported motif
    AND discord distances are RECOMPUTED through a pure relational path
    (explode the window offsets, equi-join back to the points, one
    aggregate computing the z-normalized correlation distance) and must
    match the GEMM kernel to 1e-6, with a count gate so the planted rows
    cannot vanish vacuously."""
    _prep(spark)
    import math

    from wavelet_decomposition_spark.operators import motif

    m = 24
    # --- planted series ------------------------------------------------
    i = F.col("id")
    day = 10.0 + 3.0 * F.sin(
        (i % 24).cast("double") * F.lit(2.0 * math.pi / 24)
    )
    # non-affine deterministic jitter: an affine-in-i jitter (e.g. a
    # modular ramp) makes lag-24 day windows exact affine translates of
    # each other, which z-normalization maps to distance EXACTLY 0 —
    # stealing the motif from the plant. An incommensurate sine breaks
    # every translate: phase drifts 24*0.7919 mod 2pi ~ 0.156 rad per day
    jitter = 0.1 * F.sin(i.cast("double") * 0.7919)
    seg = lambda k: 30.0 + ((k * k * 7) % 17).cast("double") * 1.5  # noqa: E731
    ramp = lambda k: k.cast("double") * (80.0 / 23.0)  # noqa: E731
    planted = spark.range(480).select(
        F.lit("planted").alias("series_id"),
        i.cast("int").alias("pos"),
        F.timestamp_seconds(F.lit(1767225600) + i * 3600).alias(
            "bucket_ts"
        ),
        F.when(i.between(72, 95), seg(i - 72))
        .when(i.between(336, 359), seg(i - 336))
        .when(i.between(240, 263), ramp(i - 240))
        .otherwise(day + jitter)
        .alias("v"),
    )
    top_p = motif.top_motif_discord(
        motif.matrix_profile(planted, m=m)
    ).cache()
    # --- relational recompute of both reported distances ---------------
    pairs = top_p.select(
        "kind", "idx", "nn_idx", "mp_dist",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("off"),
    )
    pts = planted.select("pos", "v")
    j = (
        pairs.join(pts, pairs.idx + F.col("off") == pts.pos)
        .withColumnRenamed("v", "va")
        .drop("pos")
        .join(
            pts.withColumnRenamed("v", "vb").withColumnRenamed(
                "pos", "pb"
            ),
            F.col("nn_idx") + F.col("off") == F.col("pb"),
        )
    )
    zdot = (
        F.sum(F.col("va") * F.col("vb"))
        - F.count(F.lit(1)) * F.avg("va") * F.avg("vb")
    ) / (F.stddev_pop("va") * F.stddev_pop("vb"))
    rel = j.groupBy("kind", "mp_dist").agg(
        F.sqrt(
            F.greatest(F.lit(0.0), 2.0 * (F.lit(float(m)) - zdot))
        ).alias("rel_dist")
    )
    inv = rel.agg(
        (
            (F.count(F.lit(1)) == 2)
            & (
                F.max(F.abs(F.col("rel_dist") - F.col("mp_dist")))
                <= 1e-6
            )
        ).alias("recompute_ok")
    )
    checks = (
        top_p.groupBy()
        .agg(
            F.max(
                F.when(
                    F.col("kind") == "motif",
                    (
                        (
                            (F.col("idx") == 72)
                            & (F.col("nn_idx") == 336)
                        )
                        | (
                            (F.col("idx") == 336)
                            & (F.col("nn_idx") == 72)
                        )
                    )
                    & (F.col("mp_dist") <= 1e-6),
                )
            ).alias("planted_motif_ok"),
            F.max(
                F.when(
                    F.col("kind") == "discord",
                    F.col("idx").between(240 - (m - 1), 263),
                )
            ).alias("planted_discord_ok"),
        )
        .crossJoin(F.broadcast(inv))
    )
    # --- real series alongside the plant -------------------------------
    top_r = motif.top_motif_discord(
        motif.matrix_profile(_hourly_series(spark, sf_dir), m=m)
    )
    return (
        top_r.unionByName(top_p)
        .crossJoin(F.broadcast(checks))
        .select(
            "series_id", "kind", "idx", "nn_idx", "mp_dist", "start_ts",
            "planted_motif_ok", "planted_discord_ok", "recompute_ok",
        )
        .orderBy("series_id", "kind")
    )


def _q_modwt_energy(spark, sf_dir):
    """MODWT (shift-equivariant, undecimated) energy spectrum with the same
    Parseval self-check as dwt_energy — MODWT's scaled filters conserve
    energy too (Percival & Walden ch. 5)."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import (
        activity,
        gapfill,
        rollup,
        wavelet_ops,
    )

    tx = transcripts_df(spark, 100, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    filled = gapfill.gapfill_zero(
        tier, activity.ACTIVITY_COUNT_COLS, step="1 minute"
    ).cache()
    from pyspark.sql import Window

    spectrum = wavelet_ops.energy_windows(
        filled, "turns", wavelet="db4", levels=4, window_len=64,
        transform="modwt",
    )
    # same single-lineage window form as dwt_energy (see comment there)
    in_e = filled.agg(F.sum(F.col("turns") * F.col("turns")).alias("_in_e"))
    w = Window.partitionBy()
    return spectrum.crossJoin(F.broadcast(in_e)).select(
        "conv_id", "window_id", "wavelet", "level", "coef_type", "energy",
        (
            F.abs(F.sum("energy").over(w) - F.col("_in_e"))
            <= 1e-6 * F.greatest(F.col("_in_e"), F.lit(1.0))
        ).alias("parseval_ok"),
    )


def _q_gorilla_blocks(spark, sf_dir):
    """Gorilla + delta-of-delta block encode of the 1m tier, with the
    compression report. SELF-VERIFYING: ``invariant_ok`` = every block
    non-empty with a positive blob AND the tier-wide compression ratio
    (sum raw / sum compressed) >= 2 — regular 1-minute timestamps
    delta-of-delta to near-zero bits and small counts Gorilla-pack far
    below 8 bytes/point, so a codec emitting bloated or truncated blobs
    fails; exact value round-trip is the separate ``codec_roundtrip``
    gate."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import activity, compress, rollup

    tx = transcripts_df(spark, 150, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    blocks = compress.encode_blocks(tier, activity.ACTIVITY_COUNT_COLS)
    report = compress.compression_report(blocks, activity.ACTIVITY_COUNT_COLS)
    w = Window.partitionBy()
    ratio = F.sum("raw_bytes").over(w) / F.sum("compressed_bytes").over(w)
    return report.select(
        "conv_id",
        "day",
        "n_points",
        "compressed_bytes",
        "raw_bytes",
        (
            (F.col("n_points") > 0)
            & (F.col("compressed_bytes") > 0)
            & (ratio >= 2.0)
        ).alias("invariant_ok"),
    )


def _q_codec_roundtrip(spark, sf_dir):
    """Self-verifying codec invariant for the driver's rows-only gate:
    encode the 1m tier into Gorilla + delta-of-delta blocks, decode, and
    full-outer-join back against the original tier. The single output row
    cannot pass on garbage: n_unmatched must be 0 and max_abs_err must be
    exactly 0.0 (the codecs are bit-exact)."""
    _prep(spark)
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import activity, compress, rollup

    cols = activity.ACTIVITY_COUNT_COLS
    tx = transcripts_df(spark, 150, seed=42)
    tier = rollup.rollup_once(activity.activity_raw(tx), "1m")
    blocks = compress.encode_blocks(tier, cols)
    back = compress.decode_blocks(blocks, cols)
    a = tier.select(
        "conv_id", "bucket_ts",
        *[F.col(c).cast("double").alias(f"a_{c}") for c in cols],
    )
    b = back.select(
        "conv_id", "bucket_ts",
        *[F.col(c).alias(f"b_{c}") for c in cols],
    )
    j = a.join(b, ["conv_id", "bucket_ts"], "full_outer")
    err = F.greatest(
        *[F.abs(F.col(f"a_{c}") - F.col(f"b_{c}")) for c in cols]
    )
    unmatched = (
        F.col(f"a_{cols[0]}").isNull() | F.col(f"b_{cols[0]}").isNull()
    ).cast("long")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(unmatched).alias("n_unmatched"),
        F.max(err).alias("max_abs_err"),
    ).select(
        "n_rows",
        "n_unmatched",
        "max_abs_err",
        (
            (F.col("n_rows") > 0)
            & (F.col("n_unmatched") == 0)
            & (F.col("max_abs_err") == 0.0)
        ).alias("roundtrip_ok"),
    )


def _q_ngram_jaccard_bounded(spark, sf_dir):
    """The 100-TB Jaccard path: exact similarity computed ONLY on
    MinHash-LSH candidates (no shingle self-join). The unbounded exact
    self-join (``ngram_jaccard``, oracle-checked above) is its pytest
    oracle; this variant is what a real pipeline runs. Threshold 0.7 is a
    realistic dedup operating point where the auto-derived banding (16x4,
    recall ~0.99) keeps candidates sparse; asking for j>=0.1 pairs forces
    1-row bands and a near-all-pairs candidate set — inherent to the
    request, not this operator (round-2 advisory)."""
    _prep(spark)
    from wavelet_decomposition_spark.operators.dedup import (
        ngram_jaccard_pairs_bounded,
    )

    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # planted sentinels (self-verification): 10 exact copies at
    # doc_id+10,000,000 — LSH banding, the candidate join, and the exact
    # hashed-set verification must all agree these are jaccard-1.0 pairs;
    # a dropped band, broken bucket join, or wrong set arithmetic loses
    # them. (Bounded == exact equality at the operating threshold is
    # additionally pinned in tests/test_dedup_similarity.py.)
    planted = (
        docs.orderBy("doc_id").limit(10)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    pairs = ngram_jaccard_pairs_bounded(
        docs.unionByName(planted), threshold=0.7
    )
    w = Window.partitionBy()
    planted_hits = F.sum(
        (
            (F.col("id_b") - F.col("id_a") == 10_000_000)
            & (F.col("id_a") < 10_000_000)
            & (F.col("jaccard") > 0.999)
        ).cast("long")
    ).over(w)
    return pairs.select(
        "id_a",
        "id_b",
        F.round("jaccard", 6).alias("jaccard"),
        (planted_hits == 10).alias("invariant_ok"),
    )


def _q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs, now SELF-VERIFYING (round-3 verdict):
    every reported pair carries the exact hashed-shingle Jaccard computed
    through an INDEPENDENT path (raw xxhash64 shingle sets +
    ``array_intersect``, no permutations) next to the 64-permutation
    estimate, and ``estimate_ok`` = |est - exact| <= 0.25. The estimator is
    Binomial(64, j)/64 (sigma <= 1/16), so 0.25 is a 4-sigma bound — garbage
    signatures or a broken band join cannot satisfy it, while a correct
    implementation fails with probability < 1e-4 per pair."""
    _prep(spark)
    from wavelet_decomposition_spark.operators import dedup

    docs = _docs(spark, sf_dir)
    # signature table materialized once (the production shape — see
    # ngram_jaccard_pairs_bounded): it feeds the band join AND both
    # sides of the estimate join, which otherwise re-ran the shingle
    # explode + 64-min aggregate (the operator's dominant stage) per
    # reference
    sigs = dedup.minhash_signatures(docs).localCheckpoint()
    pairs = dedup.minhash_lsh_pairs(sigs)
    est = dedup.minhash_jaccard_estimate(sigs, pairs).filter(
        F.col("jaccard_est") >= 0.5
    )
    sets = dedup.shingled(docs).select(
        "id", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    ).localCheckpoint()  # both exact-verification sides
    a = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    exact = inter / (F.size("hs_a") + F.size("hs_b") - inter)
    return (
        est.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard_est",
            F.round(exact, 6).alias("jaccard_exact"),
            (F.abs(F.col("jaccard_est") - exact) <= 0.25).alias("estimate_ok"),
        )
    )


def _q_simhash_near(spark, sf_dir):
    """SimHash near-dup pairs, now SELF-VERIFYING via planted sentinels
    (round-3 verdict): the corpus is augmented with (a) 10 EXACT copies of
    the 10 lowest-id docs at doc_id+10,000,000 — a correct simhash must
    report every (orig, copy) pair at hamming 0 — and (b) 10 synthetic docs
    at doc_id>=20,000,000 with pairwise-disjoint vocabularies — a correct
    64-bit simhash leaves them ~32 bits apart, so ANY pair among them at
    hamming<=8 is a broken kernel (a constant/garbage hash collapses all
    distances to 0 and fails exactly here). ``invariant_ok`` = (all 10
    planted dup pairs found at hamming 0) AND (no planted-random pair
    reported), window-aggregated over the single result lineage."""
    _prep(spark)
    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators import dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dup = (
        docs.orderBy("doc_id").limit(10)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    rand = spark.range(10).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.concat(
                    F.lit("zq"),
                    F.col("id").cast("string"),
                    F.lit("w"),
                    j.cast("string"),
                ),
            ),
        ).alias("text"),
    )
    sh = dedup.simhash(docs.unionByName(dup).unionByName(rand))
    pairs = dedup.simhash_near_pairs(sh, max_hamming=8)
    w = Window.partitionBy()
    planted_hits = F.sum(
        (
            (F.col("id_b") - F.col("id_a") == 10_000_000)
            & (F.col("id_a") < 10_000_000)
            & (F.col("hamming") == 0)
        ).cast("long")
    ).over(w)
    rand_bad = F.sum((F.col("id_a") >= 20_000_000).cast("long")).over(w)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        ((planted_hits == 10) & (rand_bad == 0)).alias("invariant_ok"),
    )


def _q_wavelet_betas_golden(spark, sf_dir):
    """Reference flagship: one (signal, year) LSQR decomposition, with the
    golden-parity invariant (<= 1e-9 vs the exported 2013 Consumption
    sheet) riding on every row — same self-verification as
    full_decomposition, single-year scope."""
    _prep(spark)
    return _betas_with_golden_parity(spark, "square", ["Consumption"], [2013])


# per-session memo for the reference dictionaries and the parsed golden
# workbooks: the reference itself memoizes both (the import_matrix flag,
# wavelet_decomposition.py:30-35, and the betas xlsx cache), so the warm
# path prices only the distributed solves, not re-parsing static artifacts
_GOLDEN_CACHE: dict = {}


def _betas_with_golden_parity(spark, shape, signals, years):
    """Ingest -> P1 leap trim -> P2 normalize -> P4 resample -> A1 LSQR
    decompose for ``signals`` x ``years`` with dictionary ``shape``, plus a
    per-(series, year) golden-parity check: every output row carries
    ``max_abs_err`` (vs the reference's exported coefficient sheet) and
    ``invariant_ok`` = (all 23,423 coefficients joined AND max_abs_err <=
    1e-9) — the rows-only driver gate cannot pass on garbage betas."""
    from wavelet_decomposition_spark.io import reference_data as rd
    from wavelet_decomposition_spark.io.electricity import electricity_df
    from wavelet_decomposition_spark.operators import decompose as dec
    from wavelet_decomposition_spark.operators import series as ser
    from wavelet_decomposition_spark.operators.resample import resample_per_year

    df = electricity_df(spark, signals=signals, years=years)
    df = ser.leap_trim(df, 48 * 365)
    df = ser.normalize_yearly_mean(df)
    df = resample_per_year(df, 48, 64, 365)

    # keyed by applicationId, not id(spark): id() can be recycled after a
    # stopped session is GC'd, which would hand back a broadcast bound to a
    # dead SparkContext (round-3 advisory)
    key = ("bc", shape, tuple(years), spark.sparkContext.applicationId)
    bc = _GOLDEN_CACHE.get(key)
    if bc is None:
        trans = rd.load_translations(shape)
        bc = dec.broadcast_dictionaries(
            spark, shape, {y: trans[y - 2012] for y in years}
        )
        _GOLDEN_CACHE[key] = bc
    betas = dec.decompose(df, bc)

    # cache the golden side as a SPARK DataFrame (keyed per session):
    # re-running createDataFrame on the ~328k-row pandas frame cost ~2 s
    # of every warm repeat; a LocalRelation is immutable and reusable
    gkey = (
        "golden", tuple(signals), tuple(years),
        spark.sparkContext.applicationId,
    )
    golden = _GOLDEN_CACHE.get(gkey)
    if golden is None:
        gpdf = rd.load_golden_betas_long(
            [(s, y) for s in signals for y in years]
        )
        golden = spark.createDataFrame(gpdf)
        _GOLDEN_CACHE[gkey] = golden

    # single lineage: joining betas to golden once and deriving the
    # per-(series, year) parity via window aggregates avoids referencing
    # the betas DataFrame twice — two branches would recompute every LSQR
    # solve (measured: 2x the solve wall). The inner join + count==23,423
    # guard still catches missing or duplicated coefficients.
    from pyspark.sql import Window

    w = Window.partitionBy("series_id", "year")
    return betas.join(golden, ["series_id", "year", "scale_idx", "pos"]).select(
        "series_id",
        "year",
        "scale_idx",
        "pos",
        "beta",
        (
            (F.count(F.lit(1)).over(w) == 23423)
            & (F.max(F.abs(F.col("beta") - F.col("golden"))).over(w) <= 1e-9)
        ).alias("invariant_ok"),
    )


def _q_full_decomposition(spark, sf_dir):
    """The reference's FULL E1 flagship, distributed: all 21 series-year
    LSQR solves (7 years x {Consumption, PV} square + 7 years x Wind sine —
    tutorial.ipynb cells 9->16, wavelet_decomposition.py:203-250 +
    :103-192), each (series, year) group one Spark task. Golden parity
    (<= 1e-9 vs every exported coefficient sheet) rides on every row as
    ``invariant_ok``. Reference-equivalent single-core baseline: 73.2 s for
    the 14 square solves alone (BASELINE.md); benched distributed in
    bench.py as ``full_decomposition``."""
    _prep(spark)
    years = list(range(2012, 2019))
    square = _betas_with_golden_parity(
        spark, "square", ["Consumption", "PV"], years
    )
    sine = _betas_with_golden_parity(spark, "sine", ["Wind"], years)
    return (
        square.withColumn("shape", F.lit("square"))
        .unionByName(sine.withColumn("shape", F.lit("sine")))
    )


def _q_wavelet_betas_sine(spark, sf_dir):
    """Sine-dictionary decomposition (Wind 2012) — the reference's second
    wavelet family (wavelet_decomposition.py:103-192: unnormalized Phi0,
    sine levels, Dt<=4 square fallback), driver-exposed with golden parity
    vs betas_Wind.xlsx riding on every row."""
    _prep(spark)
    return _betas_with_golden_parity(spark, "sine", ["Wind"], [2012])


def _q_stream_sessionize_drain(spark, sf_dir):
    """Streaming surface, driver-exposed: drain the event table through the
    applyInPandasWithState sessionizer (availableNow) and compare the closed
    sessions against the batch relational form — ``invariant_ok`` on the
    single summary row = (every closed streaming session equals a batch
    session) AND (the only batch sessions missing are each user's open
    tail). Restart-safety of the same operator is pinned in
    tests/test_sessions.py."""
    _prep(spark)
    import shutil
    import tempfile

    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.sessions import sessionize
    from wavelet_decomposition_spark.streaming.stateful import (
        stream_sessionize,
    )

    ev = _events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    base = f"{tempfile.gettempdir()}/wds_stream_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_path, out_path, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    ev.write.mode("overwrite").parquet(in_path)
    q = stream_sessionize(
        spark, in_path, out_path, ckpt,
        "event_id long, ts timestamp, user_id long, value double",
        gap="30 minutes",
    )
    q.awaitTermination(300)

    streamed = spark.read.parquet(out_path).select(
        "user_id", "session_start", "session_end", "n_events",
        F.round("total_value", 6).alias("total_value"),
    )
    batch = sessionize(
        ev, gap="30 minutes", group_col="user_id", ts_col="ts",
        order_col="event_id", value_col="value",
    )
    w = Window.partitionBy("user_id")
    closed_batch = batch.withColumn(
        "_last", F.max("session_idx").over(w)
    ).filter(F.col("session_idx") != F.col("_last")).select(
        "user_id", "session_start", "session_end", "n_events",
        F.round("total_value", 6).alias("total_value"),
    )
    j = streamed.alias("s").join(
        closed_batch.alias("b"),
        ["user_id", "session_start", "session_end", "n_events",
         "total_value"],
        "full_outer",
    )
    summary = j.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            (F.col("s.user_id").isNull() | F.col("b.user_id").isNull())
            .cast("long")
        ).alias("n_mismatch"),
    )
    return summary.select(
        "n_sessions",
        "n_mismatch",
        ((F.col("n_mismatch") == 0) & (F.col("n_sessions") > 0)).alias(
            "invariant_ok"
        ),
    )


def _q_stream_ewma_drain(spark, sf_dir):
    """Streaming EWMA, driver-exposed: the hourly series is split into two
    time halves, drained through the stateful recurrence in TWO sequential
    availableNow runs sharing one checkpoint (so the second run really
    exercises cross-restart state continuation), then compared bit-exactly
    against the batch ewma operator over the full series — ``invariant_ok``
    on the summary row = every bucket emitted exactly once with an ewma
    equal to the batch kernel's."""
    _prep(spark)
    import shutil
    import tempfile

    from wavelet_decomposition_spark.operators.tsfeatures import ewma
    from wavelet_decomposition_spark.streaming.stateful import stream_ewma

    hr = _hourly_series(spark, sf_dir).select(
        "series_id", "bucket_ts", F.col("v").cast("double").alias("v")
    )
    mid = hr.agg(
        F.expr("percentile(unix_micros(bucket_ts), 0.5)")
    ).collect()[0][0]
    base = f"{tempfile.gettempdir()}/wds_stream_ewma_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_p, out_p, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    schema = "series_id string, bucket_ts timestamp, v double"
    t = F.unix_micros(F.col("bucket_ts"))
    hr.filter(t <= mid).write.mode("append").parquet(in_p)
    stream_ewma(spark, in_p, out_p, ck, schema, alpha=0.25).awaitTermination(
        300
    )
    hr.filter(t > mid).write.mode("append").parquet(in_p)
    stream_ewma(spark, in_p, out_p, ck, schema, alpha=0.25).awaitTermination(
        300
    )

    streamed = spark.read.parquet(out_p).select(
        "series_id", "bucket_ts", "ewma"
    )
    batch = ewma(
        hr, value_col="v", alpha=0.25, group_col="series_id",
        ts_col="bucket_ts",
    ).select("series_id", "bucket_ts", F.col("ewma").alias("ewma_b"))
    j = streamed.join(batch, ["series_id", "bucket_ts"], "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            (
                F.col("ewma").isNull()
                | F.col("ewma_b").isNull()
                | (F.col("ewma") != F.col("ewma_b"))
            ).cast("long")
        ).alias("n_mismatch"),
    ).select(
        "n_buckets",
        "n_mismatch",
        ((F.col("n_mismatch") == 0) & (F.col("n_buckets") > 0)).alias(
            "invariant_ok"
        ),
    )


def _q_stream_counter_rate_drain(spark, sf_dir):
    """Streaming counter-rate, driver-exposed: the integer-exact modulo
    counter from `counter_rate` is split into two time halves and drained
    through the stateful delta operator in TWO sequential availableNow
    runs over one checkpoint (cross-restart state continuation), the
    emitted per-sample deltas are re-aggregated per hour, and every
    (series, bucket) row must match the batch operator over the union
    input EXACTLY (integer arithmetic end to end) — n_mismatch == 0 and
    full coverage is ``invariant_ok``."""
    _prep(spark)
    import shutil
    import tempfile

    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.temporal import counter_rate
    from wavelet_decomposition_spark.streaming.stateful import (
        stream_counter_rate,
    )

    w = (
        Window.partitionBy("series_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counter = (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("series_id"), "ts")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("_c")
        )
        .withColumn("v", (F.sum("_c").over(w) % 1_000_000).cast("double"))
        .select("series_id", F.col("ts").cast("timestamp").alias("ts"), "v")
    )
    mid = counter.agg(
        F.expr("percentile(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    base = f"{tempfile.gettempdir()}/wds_stream_rate_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_p, out_p, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    schema = "series_id string, ts timestamp, v double"
    t = F.unix_micros(F.col("ts"))
    counter.filter(t <= mid).write.mode("append").parquet(in_p)
    stream_counter_rate(spark, in_p, out_p, ck, schema).awaitTermination(300)
    counter.filter(t > mid).write.mode("append").parquet(in_p)
    stream_counter_rate(spark, in_p, out_p, ck, schema).awaitTermination(300)

    streamed = (
        spark.read.parquet(out_p)
        .groupBy(
            "series_id",
            F.timestamp_micros(
                (F.unix_micros(F.col("ts")) / 3_600_000_000).cast("long")
                * 3_600_000_000
            ).alias("bucket_ts"),
        )
        .agg(
            F.sum("inc").alias("increase_s"),
            F.count(F.lit(1)).alias("n_deltas_s"),
            F.sum("is_reset").cast("bigint").alias("n_resets_s"),
        )
    )
    batch = counter_rate(counter, bucket="1 hour").select(
        "series_id", "bucket_ts", "increase", "n_deltas", "n_resets"
    )
    j = streamed.join(batch, ["series_id", "bucket_ts"], "full_outer")
    bad = (
        F.col("increase_s").isNull()
        | F.col("increase").isNull()
        | (F.col("increase_s") != F.col("increase"))
        | (F.col("n_deltas_s") != F.col("n_deltas"))
        | (F.col("n_resets_s") != F.col("n_resets"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(bad.cast("long")).alias("n_mismatch"),
    ).select(
        "n_buckets",
        "n_mismatch",
        ((F.col("n_mismatch") == 0) & (F.col("n_buckets") > 0)).alias(
            "invariant_ok"
        ),
    )


def _q_stream_dedup_drain(spark, sf_dir):
    """Streaming exact dedup, driver-exposed: the event stream is
    planted with duplicates (a deterministic 1-in-3 sample re-appended,
    some in the same drain, some only in a SECOND availableNow run over
    the same checkpoint — so cross-restart dedup state is exercised),
    deduped on event_id within a 90-day watermark, and compared against
    batch DISTINCT over the union: ``invariant_ok`` = every distinct
    event emitted exactly once, nothing twice, nothing missing."""
    _prep(spark)
    import shutil
    import tempfile

    from wavelet_decomposition_spark.streaming.facade import stream_dedup

    ev = _events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    dups = ev.where(F.col("event_id") % 3 == 0)
    base = f"{tempfile.gettempdir()}/wds_stream_dedup_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_p, out_p, ck = f"{base}/in", f"{base}/out", f"{base}/ck"
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"
    # run 1: all originals + duplicates of even sample rows
    ev.unionByName(dups.where(F.col("event_id") % 2 == 0)).write.mode(
        "append"
    ).parquet(in_p)
    stream_dedup(
        spark, in_p, out_p, ck, schema, keys=["event_id"]
    ).awaitTermination(300)
    # run 2 (same checkpoint): odd-sample duplicates — only state carried
    # from run 1 can identify them as duplicates
    dups.where(F.col("event_id") % 2 == 1).write.mode("append").parquet(
        in_p
    )
    stream_dedup(
        spark, in_p, out_p, ck, schema, keys=["event_id"]
    ).awaitTermination(300)

    emitted = spark.read.parquet(out_p)
    per_key = emitted.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("_k")
    )
    return (
        per_key.agg(
            F.count(F.lit(1)).alias("n_distinct_emitted"),
            F.max("_k").alias("max_emits_per_key"),
        )
        .crossJoin(
            F.broadcast(ev.agg(F.countDistinct("event_id").alias("n_expected")))
        )
        .select(
            "n_distinct_emitted",
            "n_expected",
            "max_emits_per_key",
            (
                (F.col("n_distinct_emitted") == F.col("n_expected"))
                & (F.col("max_emits_per_key") == 1)
            ).alias("invariant_ok"),
        )
    )


def _q_stream_distinct_drain(spark, sf_dir):
    """Streaming windowed cardinality (streaming/facade.py
    stream_distinct_1m): per 1-minute window, HLL++ approx distinct
    conversations under a watermark — fixed-size register state per
    window where an exact streaming countDistinct would hold per-key
    state unbounded in the conversation count. Invariants ride per
    emitted window: ``sketch_exact_ok`` = the streamed HLL value equals
    the BATCH approx_count_distinct over the same rows bit-for-bit (HLL
    merge is per-register max — order-insensitive, so streaming
    incremental merge and batch one-shot must agree exactly), and
    ``band_ok`` = the sketch lands within 5*rsd of the exact distinct
    count. Append-mode emission subset semantics as in the other drains
    (emitted ⊆ batch; >0 windows)."""
    _prep(spark)
    import shutil
    import tempfile

    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.streaming.facade import stream_distinct_1m

    base = f"{tempfile.gettempdir()}/wds_stream_distinct_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_path, out_path, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    tx = transcripts_df(spark, 200, seed=42)
    tx.write.mode("overwrite").parquet(in_path)
    stream_distinct_1m(spark, in_path, out_path, ckpt).awaitTermination(300)

    streamed = spark.read.parquet(out_path)
    batch = (
        spark.read.parquet(in_path)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.approx_count_distinct("conv_id", 0.02).alias("b_approx"),
            F.countDistinct("conv_id").alias("b_exact"),
        )
        .select(F.col("w.start").alias("bucket_ts"), "b_approx", "b_exact")
    )
    j = streamed.join(batch, "bucket_ts", "left")
    return j.select(
        "bucket_ts",
        "approx_convs",
        "b_approx",
        "b_exact",
        (F.col("approx_convs") == F.col("b_approx")).alias(
            "sketch_exact_ok"
        ),
        (
            # 5*rsd relative band with an absolute floor of 2: the rsd
            # guarantee is asymptotic — a 3-conversation window can read 2
            # (one register collision) while being exactly what the batch
            # sketch says (sketch_exact_ok pins that equality separately)
            F.abs(F.col("approx_convs") - F.col("b_exact"))
            <= F.greatest(5 * 0.02 * F.col("b_exact"), F.lit(2.0))
        ).alias("band_ok"),
    )


def _q_stream_ohlc_drain(spark, sf_dir):
    """Streaming OHLC candles (streaming/facade.py stream_ohlc_1h),
    driver-exposed: availableNow drain of the event table through the
    watermarked hourly candle aggregate, then an EXACT comparison of
    every emitted candle against batch ohlc_bars over the same parquet.
    min_by/max_by partials merge in the state store exactly like batch
    map-side partials and every value is integer cents, so equality is
    bit-for-bit, not approximate: ``exact_ok`` = all six candle fields
    equal the batch candle; ``emitted_n_ok`` = a real fraction of the
    month's candles actually emitted (append-mode withholds only windows
    still inside the 2 h watermark horizon, so a vacuous 0-row pass is
    impossible)."""
    _prep(spark)
    import shutil
    import tempfile

    from pyspark.sql import Window

    from wavelet_decomposition_spark.operators.temporal import ohlc_bars
    from wavelet_decomposition_spark.streaming.facade import stream_ohlc_1h

    base = f"{tempfile.gettempdir()}/wds_stream_ohlc_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_path, out_path, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    schema = "series_id string, ts timestamp, v long"
    samples = _events(spark, sf_dir).select(
        F.col("event_type").alias("series_id"),
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    samples.write.mode("overwrite").parquet(in_path)
    stream_ohlc_1h(
        spark, in_path, out_path, ckpt, schema
    ).awaitTermination(300)

    streamed = spark.read.parquet(out_path)
    batch = ohlc_bars(
        spark.read.parquet(in_path), bucket="1 hour", volume_col="v"
    ).select(
        "series_id",
        "bucket_ts",
        F.col("open").alias("b_open"),
        F.col("high").alias("b_high"),
        F.col("low").alias("b_low"),
        F.col("close").alias("b_close"),
        F.col("n_samples").alias("b_n"),
        F.col("volume").alias("b_volume"),
    )
    n_batch = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = streamed.join(batch, ["series_id", "bucket_ts"], "left")
    return j.select(
        "series_id",
        "bucket_ts",
        "open",
        "high",
        "low",
        "close",
        "n_samples",
        "volume",
        (
            (F.col("open") == F.col("b_open"))
            & (F.col("high") == F.col("b_high"))
            & (F.col("low") == F.col("b_low"))
            & (F.col("close") == F.col("b_close"))
            & (F.col("n_samples") == F.col("b_n"))
            & (F.col("volume") == F.col("b_volume"))
        ).alias("exact_ok"),
        (
            F.count(F.lit(1)).over(n_batch) >= 100
        ).alias("emitted_n_ok"),
    ).orderBy("series_id", "bucket_ts")


def _q_stream_rollup_drain(spark, sf_dir):
    """Streaming 1m-tier facade, driver-exposed: availableNow drain of a
    transcript snapshot through stream_rollup_1m, then an exact comparison
    of every EMITTED window against the batch 1m tier. Append mode +
    watermark means windows still inside the watermark horizon at
    end-of-input are withheld (they stay in state for the next drain), so
    the invariant is: emitted ⊆ batch with exact equality on every emitted
    key, nothing emitted twice, and >0 windows emitted."""
    _prep(spark)
    import shutil
    import tempfile

    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import activity, rollup
    from wavelet_decomposition_spark.streaming.facade import stream_rollup_1m

    base = f"{tempfile.gettempdir()}/wds_stream_rollup_drain"
    shutil.rmtree(base, ignore_errors=True)
    in_path, out_path, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    tx = transcripts_df(spark, 200, seed=42)
    tx.write.mode("overwrite").parquet(in_path)
    q = stream_rollup_1m(spark, in_path, out_path, ckpt)
    q.awaitTermination(300)

    streamed = spark.read.parquet(out_path)
    batch = rollup.rollup_once(
        activity.activity_raw(spark.read.parquet(in_path)), "1m"
    ).select("conv_id", "bucket_ts", "turns", "chars", "tool_calls")
    j = streamed.alias("s").join(
        batch.alias("b"), ["conv_id", "bucket_ts"], "left"
    )
    summary = j.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(
            (
                F.col("b.turns").isNull()
                | (F.col("s.turns") != F.col("b.turns"))
                | (F.col("s.chars") != F.col("b.chars"))
                | (F.col("s.tool_calls") != F.col("b.tool_calls"))
            ).cast("long")
        ).alias("n_mismatch"),
    )
    return summary.select(
        "n_windows",
        "n_mismatch",
        ((F.col("n_mismatch") == 0) & (F.col("n_windows") > 0)).alias(
            "invariant_ok"
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: one entry per implemented operator/query.

    ORDERING IS A ROTATION, not taxonomy. The driver verifies the FIRST
    50 entries each round, so the dict is ordered by driver-visibility
    debt (r5 VERDICT #1): (1) the 33 queries with no driver CORRECTNESS
    row in ANY of r01-r05 — all rows-only, all locally gate-green —
    come first so CORRECTNESS_r06 closes full 157-query driver
    coverage; (2) the remaining 17 window slots go to the
    longest-ago-verified oracle queries (driver-green in r01, unseen
    since) for a fresh hash-exact external signal; then, outside the
    window: (3) the rows-only and oracle queries with recent driver
    rows (r04/r05 green rows are already on record; they rotate back
    in subsequent rounds). Every query keeps its local gate
    (tools/check_correctness.py) regardless of window position.
    """
    return {
        # -- (1) the 33 queries with no driver row through r05 (all
        #        rows-only; closing these rows completes driver coverage
        #        of the whole 157-query contract) -------------------------
        "matrix_profile": _q_matrix_profile,
        "bm25_topk": _q_bm25_topk,
        "pelt_changepoints": _q_pelt_changepoints,
        "wpt_energy": _q_wpt_energy,
        "pca_embeddings": _q_pca_embeddings,
        "kmeans_clusters": _q_kmeans_clusters,
        "holt_winters": _q_holt_winters,
        "stream_ohlc_drain": _q_stream_ohlc_drain,
        "zorder_layout": _q_zorder_layout,
        "forecast_backtest": _q_forecast_backtest,
        "weighted_sample": _q_weighted_sample,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "lang_id": _q_lang_id,
        "pack_sequences": _q_pack_sequences,
        "sketch_tier_merge": _q_sketch_tier_merge,
        "dtw_pairs": _q_dtw_pairs,
        "dwt_denoise": _q_dwt_denoise,
        "sliding_distinct_sketch": _q_sliding_distinct_sketch,
        "response_latency": _q_response_latency,
        "compact_tier": _q_compact_tier,
        "tier_refresh_resume": _q_tier_refresh_resume,
        "tier_retention_expiry": _q_tier_retention_expiry,
        "epn_approx": _q_epn_approx,
        "sketch_quantiles": _q_sketch_quantiles,
        "sketch_distinct": _q_sketch_distinct,
        "lttb_downsample": _q_lttb_downsample,
        "clustered_layout": _q_clustered_layout,
        "spectral_features": _q_spectral_features,
        "freq_items": _q_freq_items,
        "stream_ewma_drain": _q_stream_ewma_drain,
        "stream_counter_rate_drain": _q_stream_counter_rate_drain,
        "stream_dedup_drain": _q_stream_dedup_drain,
        "stream_distinct_drain": _q_stream_distinct_drain,
        # -- (2) 17 oracle queries last driver-verified in r01 — the
        #        oldest external hash-exact signal, refreshed -----------
        "quality_score": _q_quality_score,
        "conversation_stats_skew": _q_conversation_stats_skew,
        "activity_1m": _q_activity_1m,
        "rollup_1h": _q_rollup_1h,
        "normalize_by_group": _q_normalize_by_group,
        "per_group_limit": _q_per_group_limit,
        "circular_shift": _q_circular_shift,
        "series_diff": _q_series_diff,
        "mask_case": _q_mask_case,
        "epn_thresholds": _q_epn_thresholds,
        "topk_argmin": _q_topk_argmin,
        "pricing_summary": _q_pricing_summary,
        "nation_revenue": _q_nation_revenue,
        "dedup_groups": _q_dedup_groups,
        "ngram_jaccard": _q_ngram_jaccard,
        "doc_stats": _q_doc_stats,
        "lang_marker_hits": _q_lang_marker_hits,
        # ---- window boundary: driver checks the 50 entries above ------
        # -- (3) driver-green in r02-r05 (rows on record; rotate back
        #        in later rounds) ---------------------------------------
        "ohlc_bars": _q_ohlc_bars,
        "state_durations": _q_state_durations,
        "sax_words": _q_sax_words,
        "inverted_index": _q_inverted_index,
        "referential_integrity": _q_referential_integrity,
        "zorder_values": _q_zorder_values,
        "boolean_retrieval": _q_boolean_retrieval,
        "merge_upsert": _q_merge_upsert,
        "json_extract_stats": _q_json_extract_stats,
        "feature_binning": _q_feature_binning,
        "sax_anomaly": _q_sax_anomaly,
        "hybrid_search_rrf": _q_hybrid_search_rrf,
        "topn_others": _q_topn_others,
        "session_paths": _q_session_paths,
        "triangle_count": _q_triangle_count,
        "sessionize_skewed": _q_sessionize_skewed,
        "user_profile_skewed": _q_user_profile_skewed,
        "doc_chunks": _q_doc_chunks,
        "cube_profile": _q_cube_profile,
        "hopping_window": _q_hopping_window,
        "rank_functions": _q_rank_functions,
        "sliding_distinct": _q_sliding_distinct,
        "tier_routed_read": _q_tier_routed_read,
        "scd2_build": _q_scd2_build,
        "table_profile": _q_table_profile,
        "scd2_asof_probe": _q_scd2_asof_probe,
        "weekly_profile": _q_weekly_profile,
        "top_users_per_hour": _q_top_users_per_hour,
        "data_expectations": _q_data_expectations,
        "snapshot_diff": _q_snapshot_diff,
        "user_profile": _q_user_profile,
        "hourly_percentiles": _q_hourly_percentiles,
        "hourly_pivot": _q_hourly_pivot,
        "event_transitions": _q_event_transitions,
        "series_corr_matrix": _q_series_corr_matrix,
        "hurst_rs": _q_hurst_rs,
        "trigram_quality": _q_trigram_quality,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "winsorize_values": _q_winsorize_values,
        "event_prefix_groups": _q_event_prefix_groups,
        "dsir_weights": _q_dsir_weights,
        "drift_psi": _q_drift_psi,
        "full_decomposition": _q_full_decomposition,
        "translation_full": _q_translation_full,
        "wavelet_betas_golden": _q_wavelet_betas_golden,
        "tier_wavelet_parity": _q_tier_wavelet_parity,
        "pagerank": _q_pagerank,
        "pq_ann_topk": _q_pq_ann_topk,
        "conversation_forks": _q_conversation_forks,
        "bpe_vocab": _q_bpe_vocab,
        "wavelet_betas_sine": _q_wavelet_betas_sine,
        "translation_search": _q_translation_search,
        "dwt_energy": _q_dwt_energy,
        "modwt_energy": _q_modwt_energy,
        "gorilla_blocks": _q_gorilla_blocks,
        "codec_roundtrip": _q_codec_roundtrip,
        "ngram_jaccard_bounded": _q_ngram_jaccard_bounded,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_near": _q_simhash_near,
        "lsh_ann_topk": _q_lsh_ann_topk,
        "ivf_ann_topk": _q_ivf_ann_topk,
        "fft_spectrum": _q_fft_spectrum,
        "reconstruction_roundtrip": _q_reconstruction_roundtrip,
        "reconstruction_relational": _q_reconstruction_relational,
        "heatmap_scales": _q_heatmap_scales,
        "multimodal_plan": _q_multimodal_plan,
        "text_invariant": _q_text_invariant,
        "transcript_rollup_1m": _q_transcript_rollup_1m,
        "stream_sessionize_drain": _q_stream_sessionize_drain,
        "stream_rollup_drain": _q_stream_rollup_drain,
        "sessionize": _q_sessionize,
        "resample_linear": _q_resample_linear,
        "shipping_priority": _q_shipping_priority,
        "returned_customers": _q_returned_customers,
        "dedup_keep_first": _q_dedup_keep_first,
        "ann_topk": _q_ann_topk,
        "cosine_pairs": _q_cosine_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "decontaminate": _q_decontaminate,
        "stratified_split": _q_stratified_split,
        "domain_mix": _q_domain_mix,
        "gapfill_locf": _q_gapfill_locf,
        "gapfill_interp": _q_gapfill_interp,
        "asof_join": _q_asof_join,
        "interval_join": _q_interval_join,
        "time_weighted_avg": _q_time_weighted_avg,
        "counter_rate": _q_counter_rate,
        "interval_union": _q_interval_union,
        "cohort_retention": _q_cohort_retention,
        "funnel_steps": _q_funnel_steps,
        "pii_redact": _q_pii_redact,
        "strip_html": _q_strip_html,
        "repetition_ratio": _q_repetition_ratio,
        "ts_rolling": _q_ts_rolling,
        "ts_ewma": _q_ts_ewma,
        "ts_acf": _q_ts_acf,
        "m4_downsample": _q_m4_downsample,
        "ts_anomaly": _q_ts_anomaly,
        "ts_cusum": _q_ts_cusum,
        "ts_seasonal": _q_ts_seasonal,
        "ts_brown_les": _q_ts_brown_les,
        "ts_xcorr": _q_ts_xcorr,
        "ts_rolling_median": _q_ts_rolling_median,
        "ts_theil_sen": _q_ts_theil_sen,
        "ts_strengths": _q_ts_strengths,
        "ts_period": _q_ts_period,
        "value_histogram": _q_value_histogram,
    }


def oracle_sql() -> dict[str, str]:
    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return {
        "activity_1m": """
            SELECT event_type,
                   date_trunc('minute', ts) AS bucket_ts,
                   count(*) AS turns,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "drift_psi": """
            WITH ev AS (
                SELECT event_type,
                       CAST(floor(value / 10) AS INT) AS bin,
                       epoch_us(ts) AS e
                FROM events
            ), m AS (
                SELECT (min(e) + max(e)) // 2 AS mid FROM ev
            ), cnt AS (
                SELECT event_type, bin,
                       sum(CASE WHEN e <= m.mid THEN 1 ELSE 0 END) AS nb,
                       sum(CASE WHEN e > m.mid THEN 1 ELSE 0 END) AS na
                FROM ev CROSS JOIN m
                GROUP BY event_type, bin
            ), t AS (
                SELECT event_type, nb, na,
                       sum(nb) OVER (PARTITION BY event_type) AS tnb,
                       sum(na) OVER (PARTITION BY event_type) AS tna,
                       count(*) OVER (PARTITION BY event_type) AS b
                FROM cnt
            ), terms AS (
                SELECT event_type, nb, na,
                       CAST(round(
                           ((nb + 1) / (tnb + b) - (na + 1) / (tna + b))
                           * ln(((nb + 1) / (tnb + b))
                                / ((na + 1) / (tna + b)))
                           * 1000000.0
                       ) AS BIGINT) AS term
                FROM t
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_bins,
                   CAST(sum(nb) AS BIGINT) AS n_before,
                   CAST(sum(na) AS BIGINT) AS n_after,
                   CAST(sum(term) AS BIGINT) AS psi_micro
            FROM terms GROUP BY event_type
        """,
        "dsir_weights": """
            WITH tok AS (
                SELECT doc_id, source,
                       unnest(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS w
                FROM documents
            ), raw AS (
                SELECT w, count(*) AS n_r FROM tok GROUP BY w
            ), tgt AS (
                SELECT w, count(*) AS n_t FROM tok
                WHERE source IN ('src0', 'src1', 'src2', 'src3')
                GROUP BY w
            ), consts AS (
                SELECT (SELECT count(*) FROM tok) AS n_raw,
                       (SELECT count(*) FROM tok
                        WHERE source IN ('src0','src1','src2','src3'))
                           AS n_tgt,
                       (SELECT count(*) FROM raw) AS v
            ), lr AS (
                SELECT r.w,
                       CAST(round(ln(
                           (COALESCE(t.n_t, 0) + 1)
                           / (c.n_tgt + c.v)
                           * (c.n_raw + c.v)
                           / (r.n_r + 1)
                       ) * 1000000.0) AS BIGINT) AS lr_micro
                FROM raw r LEFT JOIN tgt t USING (w)
                CROSS JOIN consts c
            ), dw AS (
                SELECT doc_id, source, w, count(*) AS c
                FROM tok GROUP BY 1, 2, 3
            )
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_terms,
                   CAST(sum(c * lr_micro) AS BIGINT) AS weight_micro,
                   source IN ('src0', 'src1', 'src2', 'src3') AS is_target
            FROM dw JOIN lr USING (w)
            GROUP BY doc_id, source
        """,
        "event_prefix_groups": """
            WITH r AS (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY event_id
                       ) AS rn
                FROM events
            ), p AS (
                SELECT d.depth, r.user_id,
                       md5(string_agg(r.event_type, chr(31)
                                      ORDER BY r.rn)) AS prefix_hash
                FROM r JOIN (VALUES (1), (2), (4), (8)) AS d(depth)
                  ON r.rn <= d.depth
                GROUP BY d.depth, r.user_id
                HAVING count(*) = d.depth
            )
            SELECT depth, prefix_hash, count(*) AS n_users
            FROM p GROUP BY depth, prefix_hash
            HAVING count(*) >= 2
        """,
        "rollup_1h": """
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_ts,
                   count(*) AS turns,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "feature_binning": """
            WITH ev AS (SELECT event_type, event_id,
                               CAST(round(value * 100) AS BIGINT)
                                   AS cents
                        FROM events),
            b AS (SELECT event_type, cents,
                         ntile(10) OVER (PARTITION BY event_type
                                         ORDER BY cents, event_id)
                             AS bin
                  FROM ev)
            SELECT event_type, bin,
                   count(*) AS n,
                   min(cents) AS lo_cents,
                   max(cents) AS hi_cents,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM b GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "json_extract_stats": """
            WITH k AS (SELECT event_type,
                              CAST(json_extract(props, '$.k')
                                   AS BIGINT) AS k
                       FROM events)
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   min(k) AS min_k,
                   max(k) AS max_k,
                   CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null
            FROM k GROUP BY 1 ORDER BY 1
        """,
        "merge_upsert": """
            WITH ev AS (SELECT event_id,
                               CAST(round(value * 100) AS BIGINT)
                                   AS cents
                        FROM events),
            t AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
            s AS (SELECT event_id, cents + 1000 AS cents,
                         false AS del
                  FROM ev WHERE event_id % 7 = 0
                  UNION ALL
                  SELECT event_id, NULL, true
                  FROM ev WHERE event_id % 13 = 0 AND event_id % 7 <> 0
                  UNION ALL
                  SELECT event_id + 1000000000, cents, false
                  FROM ev WHERE event_id % 50 = 0),
            j AS (SELECT coalesce(t.event_id, s.event_id) AS event_id,
                         t.cents AS tc, s.cents AS sc, s.del,
                         t.event_id IS NOT NULL AS in_t,
                         s.event_id IS NOT NULL AS in_s
                  FROM t FULL OUTER JOIN s ON t.event_id = s.event_id),
            c AS (SELECT event_id, tc, sc,
                         CASE WHEN in_t AND in_s AND del THEN NULL
                              WHEN in_t AND in_s THEN 'update'
                              WHEN in_s AND NOT del THEN 'insert'
                              WHEN in_s THEN NULL
                              ELSE 'keep' END AS action
                  FROM j)
            SELECT event_id,
                   CASE WHEN action = 'keep' THEN tc ELSE sc END
                       AS cents,
                   action
            FROM c WHERE action IS NOT NULL
            ORDER BY event_id
        """,
        "boolean_retrieval": """
            WITH toks AS (SELECT doc_id,
                                 unnest(string_split_regex(
                                     lower(text), '[^a-z0-9]+')) AS term
                          FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks
                   WHERE term IN ('spark', 'data', 'join')
                   GROUP BY 1, 2)
            SELECT doc_id,
                   count(*) AS n_terms,
                   CAST(sum(tf) AS BIGINT) AS total_tf,
                   CAST(min(tf) AS BIGINT) AS min_tf
            FROM tf GROUP BY 1 HAVING count(*) = 3
            ORDER BY doc_id
        """,
        "zorder_values": """
            WITH base AS (
                SELECT event_id,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS x,
                       CAST(round(value * 100) AS BIGINT) AS y
                FROM events),
            m AS (SELECT event_id, x, y,
                         x & 2097151 AS sx, y & 2097151 AS sy
                  FROM base),
            s1 AS (SELECT event_id, x, y,
                          (sx | (sx << 16)) & 281470681808895 AS sx,
                          (sy | (sy << 16)) & 281470681808895 AS sy
                   FROM m),
            s2 AS (SELECT event_id, x, y,
                          (sx | (sx << 8)) & 71777214294589695 AS sx,
                          (sy | (sy << 8)) & 71777214294589695 AS sy
                   FROM s1),
            s3 AS (SELECT event_id, x, y,
                          (sx | (sx << 4)) & 1085102592571150095 AS sx,
                          (sy | (sy << 4)) & 1085102592571150095 AS sy
                   FROM s2),
            s4 AS (SELECT event_id, x, y,
                          (sx | (sx << 2)) & 3689348814741910323 AS sx,
                          (sy | (sy << 2)) & 3689348814741910323 AS sy
                   FROM s3),
            s5 AS (SELECT event_id, x, y,
                          (sx | (sx << 1)) & 6148914691236517205 AS sx,
                          (sy | (sy << 1)) & 6148914691236517205 AS sy
                   FROM s4)
            SELECT event_id, x, y, sx | (sy << 1) AS z
            FROM s5 ORDER BY event_id
        """,
        "referential_integrity": """
            SELECT 'customer_nationkey' AS fk,
                   count(*) AS n_child,
                   CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT) AS n_null_fk,
                   CAST(sum(CASE WHEN c_nationkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM nation p
                                WHERE p.n_nationkey = c.c_nationkey)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
                   sum(CASE WHEN c_nationkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM nation p
                           WHERE p.n_nationkey = c.c_nationkey)
                       THEN 1 ELSE 0 END) = 0 AS ok
            FROM customer c
            UNION ALL
            SELECT 'lineitem_orderkey', count(*),
                   CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l_orderkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM orders p
                                WHERE p.o_orderkey = c.l_orderkey)
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN l_orderkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM orders p
                           WHERE p.o_orderkey = c.l_orderkey)
                       THEN 1 ELSE 0 END) = 0
            FROM lineitem c
            UNION ALL
            SELECT 'lineitem_partkey', count(*),
                   CAST(sum(CASE WHEN l_partkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l_partkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = c.l_partkey)
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN l_partkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM part p
                           WHERE p.p_partkey = c.l_partkey)
                       THEN 1 ELSE 0 END) = 0
            FROM lineitem c
            UNION ALL
            SELECT 'lineitem_suppkey', count(*),
                   CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN l_suppkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM supplier p
                                WHERE p.s_suppkey = c.l_suppkey)
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN l_suppkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM supplier p
                           WHERE p.s_suppkey = c.l_suppkey)
                       THEN 1 ELSE 0 END) = 0
            FROM lineitem c
            UNION ALL
            SELECT 'nation_regionkey', count(*),
                   CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN n_regionkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM region p
                                WHERE p.r_regionkey = c.n_regionkey)
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN n_regionkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM region p
                           WHERE p.r_regionkey = c.n_regionkey)
                       THEN 1 ELSE 0 END) = 0
            FROM nation c
            UNION ALL
            SELECT 'orders_custkey', count(*),
                   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN o_custkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM customer p
                                WHERE p.c_custkey = c.o_custkey)
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN o_custkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM customer p
                           WHERE p.c_custkey = c.o_custkey)
                       THEN 1 ELSE 0 END) = 0
            FROM orders c
            UNION ALL
            SELECT 'supplier_nationkey', count(*),
                   CAST(sum(CASE WHEN s_nationkey IS NULL THEN 1
                            ELSE 0 END) AS BIGINT),
                   CAST(sum(CASE WHEN s_nationkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM nation p
                                WHERE p.n_nationkey = c.s_nationkey)
                            THEN 1 ELSE 0 END) AS BIGINT),
                   sum(CASE WHEN s_nationkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM nation p
                           WHERE p.n_nationkey = c.s_nationkey)
                       THEN 1 ELSE 0 END) = 0
            FROM supplier c
            ORDER BY fk
        """,
        "inverted_index": """
            WITH toks AS (SELECT doc_id,
                                 unnest(string_split_regex(
                                     lower(text), '[^a-z0-9]+')) AS term
                          FROM documents),
            tf AS (SELECT term, doc_id, count(*) AS tf
                   FROM toks WHERE term <> '' GROUP BY 1, 2),
            g AS (SELECT term, doc_id, tf,
                         doc_id - lag(doc_id, 1, 0) OVER w AS gap,
                         CAST(floor((row_number() OVER w - 1) / 64.0)
                              AS INT) AS block_id,
                         count(*) OVER (PARTITION BY term) AS df,
                         CAST(sum(tf) OVER (PARTITION BY term)
                              AS BIGINT) AS cf
                  FROM tf
                  WINDOW w AS (PARTITION BY term ORDER BY doc_id))
            SELECT term, block_id,
                   min(df) AS df, min(cf) AS cf,
                   min(doc_id) AS first_doc,
                   count(*) AS n_postings,
                   string_agg(CAST(gap AS VARCHAR), ','
                              ORDER BY doc_id) AS gaps,
                   string_agg(CAST(tf AS VARCHAR), ','
                              ORDER BY doc_id) AS tfs
            FROM g GROUP BY 1, 2
            ORDER BY term, block_id
        """,
        "triangle_count": """
            WITH ps AS (SELECT DISTINCT l_partkey AS p,
                                        l_suppkey AS s
                        FROM lineitem),
            e AS (SELECT DISTINCT a.s AS u, b.s AS v
                  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
            deg AS (SELECT node, count(*) AS deg FROM (
                        SELECT u AS node FROM e
                        UNION ALL
                        SELECT v AS node FROM e)
                    GROUP BY 1),
            tri AS (SELECT count(*) AS n_triangles
                    FROM e ab
                    JOIN e bc ON ab.v = bc.u
                    JOIN e ac ON ab.u = ac.u AND bc.v = ac.v),
            agg AS (SELECT count(*) AS n_nodes,
                           CAST(sum(deg * (deg - 1) / 2) AS BIGINT)
                               AS n_wedges
                    FROM deg),
            ne AS (SELECT count(*) AS n_edges FROM e)
            SELECT agg.n_nodes, ne.n_edges, agg.n_wedges,
                   tri.n_triangles,
                   CASE WHEN agg.n_wedges = 0 THEN 0.0
                        ELSE 3.0 * tri.n_triangles / agg.n_wedges
                   END AS global_clustering
            FROM agg, ne, tri
        """,
        "topn_others": """
            WITH per AS (SELECT event_type,
                                CAST(sum(CAST(round(value * 100)
                                         AS BIGINT)) AS BIGINT) AS cents,
                                count(*) AS n
                         FROM events GROUP BY 1),
            ranked AS (SELECT *,
                              row_number() OVER (
                                  ORDER BY cents DESC, event_type)
                                  AS rk
                       FROM per)
            SELECT CASE WHEN rk <= 3 THEN event_type
                        ELSE 'OTHER' END AS bucket,
                   CAST(sum(cents) AS BIGINT) AS cents,
                   CAST(sum(n) AS BIGINT) AS n,
                   count(*) AS n_categories
            FROM ranked GROUP BY 1 ORDER BY cents DESC, bucket
        """,
        "session_paths": """
            WITH seq AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER w AS next_type,
                       epoch_us(lead(ts) OVER w) - epoch_us(ts)
                           <= 30 * 60 * 1000000 AS same_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT event_type, next_type,
                   count(*) AS n_transitions,
                   count(DISTINCT user_id) AS n_users
            FROM seq
            WHERE next_type IS NOT NULL AND same_session
            GROUP BY 1, 2
            ORDER BY n_transitions DESC, event_type, next_type
        """,
        "hybrid_search_rrf": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id = 0),
            v AS (SELECT vec_id, rank FROM (
                      SELECT e.vec_id,
                             row_number() OVER (
                                 ORDER BY list_cosine_similarity(
                                     e.embedding::DOUBLE[], q.qv) DESC,
                                 e.vec_id) AS rank
                      FROM embeddings e, q)
                  WHERE rank <= 20),
            toks AS (SELECT doc_id,
                            unnest(string_split_regex(
                                lower(text), '[^a-z0-9]+')) AS term
                     FROM documents),
            l AS (SELECT doc_id AS vec_id, rank FROM (
                      SELECT doc_id, count(*) AS tf,
                             row_number() OVER (
                                 ORDER BY count(*) DESC, doc_id) AS rank
                      FROM toks
                      WHERE term IN ('spark', 'data', 'join')
                      GROUP BY doc_id)
                  WHERE rank <= 20)
            SELECT coalesce(v.vec_id, l.vec_id) AS doc_id,
                   coalesce(v.rank, 0) AS rank_vec,
                   coalesce(l.rank, 0) AS rank_lex,
                   coalesce(1.0 / (60.0 + v.rank), 0.0)
                 + coalesce(1.0 / (60.0 + l.rank), 0.0) AS rrf
            FROM v FULL OUTER JOIN l ON v.vec_id = l.vec_id
            ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        "sax_anomaly": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               CAST(floor(
                                   CAST(sum(CAST(round(value * 100)
                                            AS BIGINT)) AS DOUBLE)
                                   * 10.0 / count(*)) AS BIGINT) AS vm
                        FROM events GROUP BY 1, 2),
            stats AS (SELECT series_id,
                             CAST(sum(vm) AS DOUBLE) AS gs,
                             CAST(sum(vm * vm) AS DOUBLE) AS gss,
                             count(*) AS gn
                      FROM hr GROUP BY 1),
            pos AS (SELECT series_id, bucket_ts, vm,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS p
                    FROM hr),
            seg AS (SELECT series_id,
                           CAST(floor(p / 64.0) AS INT) AS window_id,
                           CAST(floor((p % 64) / 8.0) AS INT) AS seg_id,
                           CAST(sum(vm) AS DOUBLE) AS s,
                           count(*) AS n,
                           min(bucket_ts) AS t0
                    FROM pos GROUP BY 1, 2, 3),
            z AS (SELECT g.series_id, g.window_id, g.seg_id, g.t0, g.n,
                         CASE WHEN sqrt(greatest(
                                  st.gss / st.gn
                                  - (st.gs / st.gn) * (st.gs / st.gn),
                                  0.0)) = 0.0 THEN 0.0
                              ELSE (g.s / g.n - st.gs / st.gn)
                                   / sqrt(greatest(
                                         st.gss / st.gn
                                         - (st.gs / st.gn)
                                           * (st.gs / st.gn),
                                         0.0))
                         END AS z
                  FROM seg g JOIN stats st USING (series_id)),
            sym AS (SELECT series_id, window_id, seg_id, t0, n,
                           CASE WHEN z < -0.8416212335729142 THEN 'a'
                                WHEN z < -0.2533471031357997 THEN 'b'
                                WHEN z <  0.2533471031357997 THEN 'c'
                                WHEN z <  0.8416212335729142 THEN 'd'
                                ELSE 'e' END AS sy
                    FROM z),
            w AS (SELECT series_id, window_id,
                         min(t0) AS window_start,
                         string_agg(sy, '' ORDER BY seg_id) AS word
                  FROM sym GROUP BY 1, 2 HAVING sum(n) = 64),
            f AS (SELECT series_id, word, count(*) AS word_freq
                  FROM w GROUP BY 1, 2),
            r AS (SELECT w.series_id, w.window_id, w.window_start,
                         w.word, f.word_freq,
                         row_number() OVER (
                             PARTITION BY w.series_id
                             ORDER BY f.word_freq, w.window_id) AS rk
                  FROM w JOIN f USING (series_id, word))
            SELECT series_id, window_id, window_start, word, word_freq
            FROM r WHERE rk <= 2 ORDER BY series_id, window_id
        """,
        "sax_words": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               CAST(floor(
                                   CAST(sum(CAST(round(value * 100)
                                            AS BIGINT)) AS DOUBLE)
                                   * 10.0 / count(*)) AS BIGINT) AS vm
                        FROM events GROUP BY 1, 2),
            stats AS (SELECT series_id,
                             CAST(sum(vm) AS DOUBLE) AS gs,
                             CAST(sum(vm * vm) AS DOUBLE) AS gss,
                             count(*) AS gn
                      FROM hr GROUP BY 1),
            pos AS (SELECT series_id, bucket_ts, vm,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS p
                    FROM hr),
            seg AS (SELECT series_id,
                           CAST(floor(p / 64.0) AS INT) AS window_id,
                           CAST(floor((p % 64) / 8.0) AS INT) AS seg_id,
                           CAST(sum(vm) AS DOUBLE) AS s,
                           count(*) AS n,
                           min(bucket_ts) AS t0
                    FROM pos GROUP BY 1, 2, 3),
            z AS (SELECT g.series_id, g.window_id, g.seg_id, g.t0, g.n,
                         CASE WHEN sqrt(greatest(
                                  st.gss / st.gn
                                  - (st.gs / st.gn) * (st.gs / st.gn),
                                  0.0)) = 0.0 THEN 0.0
                              ELSE (g.s / g.n - st.gs / st.gn)
                                   / sqrt(greatest(
                                         st.gss / st.gn
                                         - (st.gs / st.gn)
                                           * (st.gs / st.gn),
                                         0.0))
                         END AS z
                  FROM seg g JOIN stats st USING (series_id)),
            sym AS (SELECT series_id, window_id, seg_id, t0, n,
                           CASE WHEN z < -0.8416212335729142 THEN 'a'
                                WHEN z < -0.2533471031357997 THEN 'b'
                                WHEN z <  0.2533471031357997 THEN 'c'
                                WHEN z <  0.8416212335729142 THEN 'd'
                                ELSE 'e' END AS sy
                    FROM z)
            SELECT series_id, window_id,
                   min(t0) AS window_start,
                   string_agg(sy, '' ORDER BY seg_id) AS word,
                   CAST(sum(n) AS BIGINT) AS n_pts
            FROM sym GROUP BY 1, 2 HAVING sum(n) = 64
            ORDER BY series_id, window_id
        """,
        "scd2_asof_probe": """
            WITH flagged AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN row_number() OVER w = 1
                              OR event_type IS DISTINCT FROM
                                 lag(event_type) OVER w
                            THEN 1 ELSE 0 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), runs AS (
                SELECT user_id, event_type, ts,
                       CAST(sum(chg) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
                FROM flagged
            ), grouped AS (
                SELECT user_id, version, event_type,
                       min(ts) AS valid_from
                FROM runs GROUP BY 1, 2, 3
            ), hist AS (
                SELECT user_id, version, event_type, valid_from,
                       lead(valid_from) OVER w2 AS valid_to,
                       (lead(valid_from) OVER w2 IS NULL) AS is_current
                FROM grouped
                WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
            )
            SELECT user_id, version, event_type, valid_from, is_current
            FROM hist
            WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
              AND (valid_to IS NULL
                   OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
        """,
        "table_profile": """
            WITH src AS (
                SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
                       props, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
                FROM events
            ), long AS (
                SELECT 'event_type' AS col_name, event_type AS val FROM src
                UNION ALL SELECT 'user_id', user_id FROM src
                UNION ALL SELECT 'props', props FROM src
                UNION ALL SELECT 'day', day FROM src
            )
            SELECT col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
                   min(val) AS min_val,
                   max(val) AS max_val
            FROM long GROUP BY col_name
        """,
        "tier_routed_read": """
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_ts,
                   count(*) AS turns,
                   round(sum(value), 6) AS total_value,
                   '1h' AS tier
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <  TIMESTAMP '2024-01-12 00:00:00'
            GROUP BY 1, 2
        """,
        "scd2_build": """
            WITH flagged AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN row_number() OVER w = 1
                              OR event_type IS DISTINCT FROM
                                 lag(event_type) OVER w
                            THEN 1 ELSE 0 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), runs AS (
                SELECT user_id, event_type, ts,
                       CAST(sum(chg) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
                FROM flagged
            ), grouped AS (
                SELECT user_id, version, event_type,
                       min(ts) AS valid_from,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM runs GROUP BY 1, 2, 3
            )
            SELECT user_id, version, event_type, valid_from,
                   lead(valid_from) OVER w2 AS valid_to,
                   n_events,
                   (lead(valid_from) OVER w2 IS NULL) AS is_current
            FROM grouped
            WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
        """,
        "normalize_by_group": """
            SELECT event_id,
                   round(value / avg(value) OVER (PARTITION BY event_type), 6)
                       AS norm_value
            FROM events
        """,
        "per_group_limit": """
            SELECT event_type, event_id, rn FROM (
                SELECT event_type, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts, event_id) AS rn
                FROM events)
            WHERE rn <= 10
        """,
        "circular_shift": """
            SELECT event_type, event_id,
                   (row_number() OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id) - 1 + 7)
                   % (count(*) OVER (PARTITION BY event_type)) AS shifted_idx
            FROM events
        """,
        "series_diff": """
            WITH c AS (SELECT date_trunc('minute', ts) AS bucket_ts, count(*) AS n
                       FROM events WHERE event_type = 'click' GROUP BY 1),
                 v AS (SELECT date_trunc('minute', ts) AS bucket_ts, count(*) AS n
                       FROM events WHERE event_type = 'view' GROUP BY 1)
            SELECT c.bucket_ts, c.n - v.n AS diff
            FROM c JOIN v USING (bucket_ts)
        """,
        "mask_case": """
            SELECT event_type,
                   round(sum(CASE WHEN event_type IN ('click','view')
                                  THEN value ELSE 0.0 END), 6) AS masked_sum
            FROM events GROUP BY 1
        """,
        "epn_thresholds": """
            WITH scales(scale_idx, scale_hours) AS (VALUES
                (0, 0.75), (1, 1.5), (2, 3.0), (3, 6.0), (4, 12.0),
                (5, 24.0), (6, 42.0)),
            c AS (SELECT l_linenumber - 1 AS scale_idx,
                         abs(l_extendedprice) AS ab
                  FROM lineitem WHERE l_linenumber - 1 < 15),
            ranked AS (SELECT scale_idx, ab,
                              row_number() OVER (PARTITION BY scale_idx
                                                 ORDER BY ab) AS rnk
                       FROM c),
            sizes AS (SELECT scale_idx, count(*) AS n FROM c GROUP BY 1),
            thr AS (SELECT r.scale_idx, 90.0 AS satisfaction, r.ab AS thr
                    FROM ranked r JOIN sizes s USING (scale_idx)
                    WHERE r.rnk = CAST(ceil(90.0 * s.n / 100.0) AS BIGINT)),
            agg AS (SELECT c.scale_idx, t.satisfaction, t.thr,
                           sum(least(c.ab, t.thr)) / t.thr / 1.0 AS n_cycles
                    FROM c JOIN thr t USING (scale_idx)
                    GROUP BY 1, 2, 3)
            SELECT a.scale_idx, a.satisfaction,
                   round(a.thr * 1.0, 6) AS pmax,
                   round(a.thr * s.scale_hours / 2.0, 6) AS emax,
                   round(a.n_cycles, 6) AS n_cycles,
                   round(100.0 * a.n_cycles * s.scale_hours / 8760.0, 6) AS uf,
                   round(a.thr * s.scale_hours / 2.0 * a.n_cycles
                         / 1000000.0, 6) AS serv_m
            FROM agg a JOIN scales s USING (scale_idx)
        """,
        "topk_argmin": """
            SELECT event_type, bucket_ts, n FROM (
                SELECT event_type, bucket_ts, n,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY n DESC, bucket_ts) AS rn
                FROM (SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
                             count(*) AS n
                      FROM events GROUP BY 1, 2))
            WHERE rn = 1
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS sum_base_price,
                   CAST(sum(CAST(round(l_discount * 10000) AS BIGINT))
                        AS DOUBLE) / 10000.0 / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
            GROUP BY 1, 2
        """,
        "nation_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "dedup_groups": f"""
            SELECT md5({norm}) AS fp,
                   count(*) AS n_dups,
                   min(doc_id) AS keeper_id
            FROM documents GROUP BY 1
        """,
        "dedup_keep_first": f"""
            SELECT doc_id FROM (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY md5({norm})
                                          ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn = 1
        """,
        "ngram_jaccard": f"""
            WITH docs AS (SELECT doc_id, string_split({norm}, ' ') AS w
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                          concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
                   FROM docs,
                        unnest(generate_series(1, greatest(len(w) - 2, 1)))
                            AS t(i)
                   WHERE length(concat_ws(' ', w[i], w[i+1], w[i+2])) > 0),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              count(*) AS c
                       FROM sh a JOIN sh b
                         ON a.g = b.g AND a.doc_id < b.doc_id
                       GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.1
        """,
        "doc_stats": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(string_split({norm}, ' ')) AS n_words,
                   len(regexp_extract_all(text,
                       '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens,
                   md5({norm}) AS fingerprint
            FROM documents
        """,
        "lang_marker_hits": f"""
            WITH d AS (SELECT doc_id, ' ' || {norm} || ' ' AS p FROM documents)
            SELECT doc_id,
                   len(regexp_extract_all(p, ' the '))
                 + len(regexp_extract_all(p, ' and '))
                 + len(regexp_extract_all(p, ' of '))
                 + len(regexp_extract_all(p, ' to '))
                 + len(regexp_extract_all(p, ' is ')) AS en_hits,
                   len(regexp_extract_all(p, ' le '))
                 + len(regexp_extract_all(p, ' la '))
                 + len(regexp_extract_all(p, ' et '))
                 + len(regexp_extract_all(p, ' les '))
                 + len(regexp_extract_all(p, ' est ')) AS fr_hits,
                   len(regexp_extract_all(p, ' der '))
                 + len(regexp_extract_all(p, ' die '))
                 + len(regexp_extract_all(p, ' und '))
                 + len(regexp_extract_all(p, ' das '))
                 + len(regexp_extract_all(p, ' ist ')) AS de_hits,
                   len(regexp_extract_all(p, ' el '))
                 + len(regexp_extract_all(p, ' la '))
                 + len(regexp_extract_all(p, ' de '))
                 + len(regexp_extract_all(p, ' que '))
                 + len(regexp_extract_all(p, ' es ')) AS es_hits
            FROM d
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3),
            scored AS (SELECT q.query_id, e.vec_id,
                              list_cosine_similarity(e.embedding::DOUBLE[],
                                                     q.qv) AS score
                       FROM embeddings e, q)
            SELECT query_id, vec_id, round(score, 6) AS score, rank FROM (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id) AS rank
                FROM scored)
            WHERE rank <= 5
        """,
        "cosine_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.5
        """,
        "quality_score": f"""
            WITH base AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       len(string_split({norm}, ' ')) AS n_words,
                       len(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens,
                       len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
                       ' ' || {norm} || ' ' AS p,
                       md5({norm}) AS fingerprint
                FROM documents),
            feats AS (
                SELECT *,
                       len(regexp_extract_all(p, ' the '))
                     + len(regexp_extract_all(p, ' a '))
                     + len(regexp_extract_all(p, ' and '))
                     + len(regexp_extract_all(p, ' of '))
                     + len(regexp_extract_all(p, ' to '))
                     + len(regexp_extract_all(p, ' in '))
                     + len(regexp_extract_all(p, ' is '))
                     + len(regexp_extract_all(p, ' it '))
                     + len(regexp_extract_all(p, ' for '))
                     + len(regexp_extract_all(p, ' on ')) AS stop_hits,
                       len(regexp_extract_all(p, ' the '))
                     + len(regexp_extract_all(p, ' and '))
                     + len(regexp_extract_all(p, ' of '))
                     + len(regexp_extract_all(p, ' to '))
                     + len(regexp_extract_all(p, ' is ')) AS en_h,
                       len(regexp_extract_all(p, ' le '))
                     + len(regexp_extract_all(p, ' la '))
                     + len(regexp_extract_all(p, ' et '))
                     + len(regexp_extract_all(p, ' les '))
                     + len(regexp_extract_all(p, ' est ')) AS fr_h,
                       len(regexp_extract_all(p, ' der '))
                     + len(regexp_extract_all(p, ' die '))
                     + len(regexp_extract_all(p, ' und '))
                     + len(regexp_extract_all(p, ' das '))
                     + len(regexp_extract_all(p, ' ist ')) AS de_h,
                       len(regexp_extract_all(p, ' el '))
                     + len(regexp_extract_all(p, ' la '))
                     + len(regexp_extract_all(p, ' de '))
                     + len(regexp_extract_all(p, ' que '))
                     + len(regexp_extract_all(p, ' es ')) AS es_h
                FROM base),
            ratios AS (
                SELECT *,
                       punct * 1.0 / greatest(n_chars, 1) AS punct_ratio,
                       stop_hits * 1.0 / greatest(n_words, 1) AS stop_ratio,
                       n_chars * 1.0 / greatest(n_words, 1) AS mean_word_len,
                       greatest(en_h, fr_h, de_h, es_h) AS mx
                FROM feats)
            SELECT doc_id, n_chars, n_words, n_tokens,
                   round(punct_ratio, 6) AS punct_ratio,
                   round(stop_ratio, 6) AS stopword_ratio,
                   round(0.4 * least(n_words / 20.0, 1.0)
                       + 0.2 * least(stop_ratio * 4.0, 1.0)
                       + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0))
                       + 0.2 * (CASE WHEN mean_word_len >= 3.0
                                      AND mean_word_len <= 12.0
                                     THEN 1.0 ELSE 0.0 END), 6)
                       AS quality_score,
                   CASE WHEN mx = 0 THEN 'und'
                        WHEN fr_h = mx THEN 'fr'
                        WHEN es_h = mx THEN 'es'
                        WHEN en_h = mx THEN 'en'
                        ELSE 'de' END AS lang_guess,
                   fingerprint
            FROM ratios
        """,
        "resample_linear": """
            WITH per_min AS (
                SELECT event_type,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY date_trunc('minute', ts))
                           - 1 AS idx,
                       avg(value) AS v
                FROM events GROUP BY event_type, date_trunc('minute', ts)),
            sizes AS (SELECT event_type, count(*) AS n FROM per_min GROUP BY 1),
            grid AS (SELECT event_type, n,
                            unnest(generate_series(0, n * 4 - 1)) AS j
                     FROM sizes),
            pts AS (SELECT event_type, j,
                           least(CAST(floor(j * 1 / 4.0) AS BIGINT), n - 1)
                               AS lo,
                           least(least(CAST(floor(j * 1 / 4.0) AS BIGINT),
                                       n - 1) + 1, n - 1) AS hi,
                           j * 1 / 4.0 - floor(j * 1 / 4.0) AS frac
                    FROM grid)
            SELECT p.event_type, p.j AS idx,
                   round(a.v + p.frac * (b.v - a.v), 6) AS v
            FROM pts p
            JOIN per_min a ON a.event_type = p.event_type AND a.idx = p.lo
            JOIN per_min b ON b.event_type = p.event_type AND b.idx = p.hi
        """,
        "conversation_stats_skew": """
            -- DuckDB sum(BIGINT) returns HUGEINT (-> pandas float64); the
            -- Spark side returns int64. Cast so the dtypes agree too.
            SELECT event_type AS conv_id,
                   count(*) AS n_turns,
                   CAST(sum(length(props)) AS BIGINT) AS n_chars,
                   CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool_calls,
                   min(ts) AS first_ts,
                   max(ts) AS last_ts
            FROM events GROUP BY 1
        """,
        "stratified_split": """
            WITH b AS (
                SELECT doc_id,
                       ((((doc_id + 42) % 2147483648) * 1103515245
                          + 12345) % 2147483648) / 2147483648.0 AS bucket
                FROM documents)
            SELECT doc_id,
                   CASE WHEN bucket < 0.8 THEN 'train'
                        WHEN bucket < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "domain_mix": """
            WITH per AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(len(regexp_extract_all(text,
                           '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY 1),
            t AS (SELECT *, count(*) OVER () AS ns,
                         1.0 / (count(*) OVER ()) AS w
                  FROM per)
            SELECT source, n_docs, n_tokens,
                   round(w, 6) AS target_weight,
                   round(least(1.0, 50000.0 * w / n_tokens), 6)
                       AS sample_rate,
                   round(least(1.0, 50000.0 * w / n_tokens) * n_tokens, 2)
                       AS expected_tokens
            FROM t
        """,
        "decontaminate": f"""
            WITH docs AS (SELECT doc_id, string_split({norm}, ' ') AS w
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                          concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
                   FROM docs,
                        unnest(generate_series(1, greatest(len(w) - 2, 1)))
                            AS t(i)
                   WHERE length(concat_ws(' ', w[i], w[i+1], w[i+2])) > 0),
            bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 37 = 0),
            hits AS (SELECT s.doc_id, count(DISTINCT s.g) AS n_overlap
                     FROM sh s JOIN bg USING (g)
                     WHERE s.doc_id % 37 <> 0 GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(h.n_overlap, 0) AS n_overlap,
                   coalesce(h.n_overlap, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.doc_id % 37 <> 0
        """,
        "dedup_clusters": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]) >= 0.5),
            und AS (SELECT u, v FROM pairs
                    UNION SELECT v AS u, u AS v FROM pairs),
            reach(n, c) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.v, r.c FROM reach r JOIN und e ON e.u = r.n),
            comp AS (SELECT n AS vec_id, min(c) AS component
                     FROM reach GROUP BY n)
            SELECT vec_id, component,
                   count(*) OVER (PARTITION BY component) AS cluster_size,
                   vec_id = component AS is_canonical
            FROM comp
        """,
        "gapfill_locf": """
            WITH per_min AS (
                SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
                       avg(value) AS avg_value
                FROM events GROUP BY 1, 2),
            bounds AS (SELECT event_type, min(bucket_ts) AS t0,
                              max(bucket_ts) AS t1
                       FROM per_min GROUP BY 1),
            grid AS (SELECT event_type,
                            unnest(generate_series(t0, t1,
                                                   INTERVAL 1 MINUTE))
                                AS bucket_ts
                     FROM bounds)
            SELECT g.event_type, g.bucket_ts,
                   round(last_value(p.avg_value IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.bucket_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                       AS avg_value
            FROM grid g LEFT JOIN per_min p
              ON g.event_type = p.event_type AND g.bucket_ts = p.bucket_ts
        """,
        "gapfill_interp": """
            WITH per_min AS (
                SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
                       min(value) AS min_value
                FROM events GROUP BY 1, 2),
            bounds AS (SELECT event_type, min(bucket_ts) AS t0,
                              max(bucket_ts) AS t1
                       FROM per_min GROUP BY 1),
            grid AS (SELECT event_type,
                            unnest(generate_series(t0, t1,
                                                   INTERVAL 1 MINUTE))
                                AS bucket_ts
                     FROM bounds),
            j AS (SELECT g.event_type, g.bucket_ts,
                         epoch(g.bucket_ts) AS t, p.min_value
                  FROM grid g LEFT JOIN per_min p
                    ON g.event_type = p.event_type
                   AND g.bucket_ts = p.bucket_ts),
            c AS (SELECT event_type, bucket_ts, t,
                         last_value(min_value IGNORE NULLS) OVER wb AS pv,
                         last_value(CASE WHEN min_value IS NOT NULL THEN t
                                    END IGNORE NULLS) OVER wb AS pt,
                         first_value(min_value IGNORE NULLS) OVER wf AS nv,
                         first_value(CASE WHEN min_value IS NOT NULL THEN t
                                     END IGNORE NULLS) OVER wf AS nt
                  FROM j
                  WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW),
                         wf AS (PARTITION BY event_type ORDER BY bucket_ts
                                ROWS BETWEEN CURRENT ROW
                                         AND UNBOUNDED FOLLOWING))
            SELECT event_type, bucket_ts,
                   CASE WHEN pt = nt THEN pv
                        ELSE pv + (nv - pv) * ((t - pt) / (nt - pt))
                   END AS min_value
            FROM c
        """,
        "asof_join": """
            WITH c AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'click'),
            p AS (SELECT user_id, ts, max_by(value, event_id) AS pval
                  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT c.event_id, c.user_id,
                   round(c.value, 6) AS click_value,
                   round(coalesce(p.pval, -1.0), 6)
                       AS last_purchase_value,
                   coalesce(round(
                       date_diff('microsecond', p.ts, c.ts) / 1000000.0,
                       6), -1.0) AS purchase_age_s
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "returned_customers": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice
                        * (1 - l.l_discount) * 10000) AS BIGINT))
                        AS BIGINT) / 10000.0 AS revenue,
                   round(c.c_acctbal, 6) AS acctbal
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-04-01'
            GROUP BY 1, 2, 3, c.c_acctbal
            ORDER BY revenue DESC, c.c_custkey ASC
            LIMIT 20
        """,
        "shipping_priority": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(sum(CAST(round(l.l_extendedprice
                        * (1 - l.l_discount) * 10000) AS BIGINT))
                        AS BIGINT) / 10000.0 AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-15'
              AND l.l_shipdate > TIMESTAMP '1998-06-15'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o.o_orderkey ASC
            LIMIT 10
        """,
        "interval_join": """
            WITH c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
            w AS (SELECT user_id, ts AS start_ts,
                         ts + INTERVAL 30 MINUTE AS end_ts,
                         event_id AS window_id
                  FROM events WHERE event_type = 'purchase')
            SELECT c.event_id, c.user_id,
                   count(w.window_id) AS n_windows,
                   coalesce(min(w.window_id), CAST(-1 AS BIGINT))
                       AS first_window_id
            FROM c LEFT JOIN w
              ON c.user_id = w.user_id
             AND c.ts BETWEEN w.start_ts AND w.end_ts
            GROUP BY 1, 2
        """,
        "cohort_retention": """
            WITH c AS (SELECT user_id, min(epoch_us(ts)) AS c0
                       FROM events WHERE event_type = 'signup'
                       GROUP BY 1),
            co AS (SELECT user_id, c0 - c0 % 604800000000 AS cstart
                   FROM c),
            sizes AS (SELECT cstart, count(*) AS n_cohort
                      FROM co GROUP BY 1),
            act AS (SELECT e.user_id, co.cstart,
                           (epoch_us(e.ts) - co.cstart)
                               // 604800000000 AS period_k
                    FROM events e JOIN co ON e.user_id = co.user_id
                    WHERE epoch_us(e.ts) >= co.cstart),
            a AS (SELECT cstart, period_k,
                         count(DISTINCT user_id) AS n_active
                  FROM act GROUP BY 1, 2)
            SELECT make_timestamp(a.cstart) AS cohort_ts,
                   CAST(a.period_k AS INT) AS period_k,
                   a.n_active, s.n_cohort,
                   a.n_active / CAST(s.n_cohort AS DOUBLE) AS retention
            FROM a JOIN sizes s ON a.cstart = s.cstart
        """,
        "funnel_steps": """
            WITH b AS (SELECT user_id, event_type AS ty, epoch_us(ts) AS t
                       FROM events),
            s1 AS (SELECT user_id, min(t) AS t1 FROM b
                   WHERE ty = 'signup' GROUP BY 1),
            s2 AS (SELECT b.user_id, min(b.t) AS t2,
                          any_value(s1.t1) AS t1
                   FROM b JOIN s1 USING (user_id)
                   WHERE b.ty = 'click' AND b.t >= s1.t1
                     AND b.t <= s1.t1 + 604800000000
                   GROUP BY 1),
            s3 AS (SELECT b.user_id, min(b.t) AS t3
                   FROM b JOIN s2 USING (user_id)
                   WHERE b.ty = 'purchase' AND b.t >= s2.t2
                     AND b.t <= s2.t1 + 604800000000
                   GROUP BY 1),
            counts AS (
                SELECT 1 AS step_idx, 'signup' AS step,
                       count(*) AS n_users FROM s1
                UNION ALL
                SELECT 2, 'click', count(*) FROM s2
                UNION ALL
                SELECT 3, 'purchase', count(*) FROM s3)
            SELECT step_idx, step, n_users,
                   n_users / CAST(first_value(n_users)
                       OVER (ORDER BY step_idx) AS DOUBLE)
                       AS conversion_from_first,
                   coalesce(n_users / CAST(lag(n_users)
                       OVER (ORDER BY step_idx) AS DOUBLE), 1.0)
                       AS conversion_from_prev
            FROM counts
        """,
        "ohlc_bars": """
            WITH s AS (
                SELECT event_type AS series_id, epoch_us(ts) AS t,
                       CAST(round(value * 100) AS BIGINT) AS v
                FROM events),
            r AS (
                SELECT series_id, t // 3600000000 AS bkt, t, v,
                       row_number() OVER (
                           PARTITION BY series_id, t // 3600000000
                           ORDER BY t, v) AS rn_o,
                       row_number() OVER (
                           PARTITION BY series_id, t // 3600000000
                           ORDER BY t DESC, v DESC) AS rn_c
                FROM s)
            SELECT series_id,
                   make_timestamp(bkt * 3600000000) AS bucket_ts,
                   max(CASE WHEN rn_o = 1 THEN v END) AS open_cents,
                   max(v) AS high_cents,
                   min(v) AS low_cents,
                   max(CASE WHEN rn_c = 1 THEN v END) AS close_cents,
                   count(*) AS n_samples,
                   CAST(sum(v) AS BIGINT) AS volume_cents
            FROM r GROUP BY 1, 2
        """,
        "state_durations": """
            WITH s AS (
                SELECT user_id, epoch_us(ts) AS t, event_type AS state
                FROM events),
            seg AS (
                SELECT user_id, state, t,
                       lead(t) OVER (
                           PARTITION BY user_id ORDER BY t, state) AS e
                FROM s),
            d AS (
                SELECT user_id, state, e - t AS dur
                FROM seg WHERE e IS NOT NULL),
            k AS (
                SELECT user_id, state, dur,
                       CAST(sum(dur) OVER (PARTITION BY user_id)
                            AS BIGINT) AS kt
                FROM d)
            SELECT user_id, state,
                   CAST(sum(dur) AS BIGINT) AS total_us,
                   count(*) AS n_segments,
                   CAST(CAST(sum(dur) AS BIGINT) AS DOUBLE) / max(kt)
                       AS frac
            FROM k GROUP BY 1, 2
        """,
        "time_weighted_avg": """
            WITH s AS (
                SELECT event_type AS series_id, ts,
                       CAST(max(CAST(round(value * 100) AS BIGINT))
                            AS DOUBLE) AS v
                FROM events GROUP BY 1, 2),
            seg AS (
                SELECT series_id, epoch_us(ts) AS s,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY series_id ORDER BY epoch_us(ts)
                       ) AS e,
                       v
                FROM s),
            ex AS (
                SELECT series_id, s, e, v,
                       unnest(generate_series(
                           s // 3600000000, (e - 1) // 3600000000)) AS b
                FROM seg WHERE e IS NOT NULL AND e > s),
            ov AS (
                SELECT series_id, b,
                       least(e, (b + 1) * 3600000000)
                           - greatest(s, b * 3600000000) AS w,
                       v * (least(e, (b + 1) * 3600000000)
                           - greatest(s, b * 3600000000)) AS vw
                FROM ex)
            SELECT series_id,
                   make_timestamp(b * 3600000000) AS bucket_ts,
                   sum(vw) / sum(w) / 100.0 AS twa,
                   CAST(sum(w) AS BIGINT) AS covered_us
            FROM ov GROUP BY 1, 2
        """,
        "counter_rate": """
            WITH s AS (
                SELECT event_type AS series_id, ts,
                       sum(CAST(round(value * 100) AS BIGINT)) AS c
                FROM events GROUP BY 1, 2),
            cum AS (
                SELECT series_id, ts,
                       CAST(sum(c) OVER (
                           PARTITION BY series_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) % 1000000
                           AS DOUBLE) AS v
                FROM s),
            d AS (
                SELECT series_id, epoch_us(ts) AS tus, v,
                       lag(v) OVER (PARTITION BY series_id ORDER BY ts)
                           AS pv
                FROM cum),
            e AS (
                SELECT series_id, tus,
                       CASE WHEN v >= pv THEN v - pv ELSE v END AS inc,
                       CASE WHEN v < pv THEN 1 ELSE 0 END AS reset
                FROM d WHERE pv IS NOT NULL)
            SELECT series_id,
                   make_timestamp((tus // 3600000000) * 3600000000)
                       AS bucket_ts,
                   CAST(sum(inc) AS BIGINT) AS increase,
                   count(*) AS n_deltas,
                   CAST(sum(reset) AS BIGINT) AS n_resets,
                   round(sum(inc) / 3600.0, 6) AS rate_per_s
            FROM e GROUP BY 1, 2
        """,
        "interval_union": """
            WITH w AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + 1800000000 AS e
                FROM events WHERE event_type = 'purchase'),
            f AS (
                SELECT user_id, s, e,
                       CASE WHEN max(e) OVER (
                               PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) IS NULL
                            OR s > max(e) OVER (
                               PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
                       THEN 1 ELSE 0 END AS ni
                FROM w),
            g AS (
                SELECT user_id, s, e,
                       sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
                FROM f)
            SELECT user_id, make_timestamp(min(s)) AS island_start,
                   make_timestamp(max(e)) AS island_end,
                   count(*) AS n_intervals
            FROM g GROUP BY user_id, island
        """,
        "pii_redact": """
            WITH planted AS (
                SELECT doc_id,
                       text || ' u' || CAST(doc_id AS VARCHAR)
                            || '@example.com 10.'
                            || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                            || CAST(doc_id % 250 AS VARCHAR)
                            || ' +1 (555) 010-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           AS text
                FROM documents),
            s1 AS (SELECT doc_id,
                          len(regexp_extract_all(text,
                              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                              AS n_emails,
                          regexp_replace(text,
                              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g') AS t
                   FROM planted),
            s2 AS (SELECT doc_id, n_emails,
                          len(regexp_extract_all(t,
                              '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS n_ips,
                          regexp_replace(t,
                              '([0-9]{1,3}\\.){3}[0-9]{1,3}',
                              '<IP>', 'g') AS t
                   FROM s1)
            SELECT doc_id,
                   regexp_replace(t,
                       '\\+?[0-9][0-9()\\s.-]{6,}[0-9]',
                       '<PHONE>', 'g') AS redacted,
                   CAST(n_emails AS INT) AS n_emails,
                   CAST(n_ips AS INT) AS n_ips,
                   CAST(len(regexp_extract_all(t,
                       '\\+?[0-9][0-9()\\s.-]{6,}[0-9]')) AS INT)
                       AS n_phones
            FROM s2
        """,
        "doc_chunks": """
            SELECT doc_id,
                   CAST(start / 350 AS INT) AS chunk_idx,
                   CAST(start AS INT) AS chunk_start,
                   substr(text, CAST(start AS INT) + 1, 400) AS chunk_text
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(
                           0,
                           CAST(floor((length(text) - 1) / 350) * 350
                                AS BIGINT),
                           350)) AS start
                FROM documents
                WHERE length(text) > 0
            )
        """,
        "strip_html": """
            WITH planted AS (
                SELECT doc_id,
                       '<p class="x">' || text
                           || '</p> &amp; <a href="y">link &lt;here&gt;</a>'
                           AS text
                FROM documents)
            SELECT doc_id,
                   trim(regexp_replace(
                       replace(replace(replace(replace(replace(
                           regexp_replace(text, '<[^>]*>', ' ', 'g'),
                           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                           '&apos;', ''''), '&amp;', '&'),
                       '\\s+', ' ', 'g')) AS clean
            FROM planted
        """,
        "repetition_ratio": """
            WITH docs AS (SELECT doc_id,
                                 string_split(trim(regexp_replace(
                                     lower(text), '\\s+', ' ', 'g')), ' ')
                                     AS w
                          FROM documents),
            g AS (SELECT doc_id,
                         concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
                  FROM docs,
                       unnest(generate_series(1, greatest(len(w) - 2, 1)))
                           AS t(i)),
            pg AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_grams,
                   count(*) AS n_distinct,
                   round(1.0 - count(*) * 1.0 / sum(c), 6) AS dup_ratio,
                   round(max(c) * 1.0 / sum(c), 6) AS top_gram_frac
            FROM pg GROUP BY 1
        """,
        "ts_rolling": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               CAST(floor(
                                   CAST(sum(CAST(round(value * 100)
                                            AS BIGINT)) AS DOUBLE)
                                   * 10000.0 / count(*)) AS BIGINT) AS vm
                        FROM events GROUP BY 1, 2),
            win AS (SELECT series_id, bucket_ts, vm,
                           CAST(sum(vm) OVER w AS DOUBLE) AS s,
                           CAST(sum(vm * vm) OVER w AS DOUBLE) AS ssq,
                           CAST(min(vm) OVER w AS BIGINT) AS mn,
                           CAST(max(vm) OVER w AS BIGINT) AS mx,
                           count(vm) OVER w AS n
                    FROM hr
                    WINDOW w AS (PARTITION BY series_id ORDER BY bucket_ts
                                 ROWS BETWEEN 23 PRECEDING
                                          AND CURRENT ROW))
            SELECT series_id, bucket_ts,
                   vm / 1000000.0 AS v,
                   (s / n) / 1000000.0 AS roll_mean,
                   coalesce(CASE WHEN n > 1 THEN sqrt(greatest(
                                (ssq - s * s / n) / (n - 1), 0.0))
                            END / 1000000.0, -1.0) AS roll_std,
                   mn / 1000000.0 AS roll_min,
                   mx / 1000000.0 AS roll_max,
                   n AS roll_n
            FROM win
        """,
        "ts_ewma": """
            WITH RECURSIVE
            hr AS (SELECT event_type AS series_id,
                          date_trunc('hour', ts) AS bucket_ts,
                          round(avg(value), 6) AS v
                   FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, bucket_ts, v,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) AS rn
                    FROM hr),
            rec AS (
                SELECT series_id, bucket_ts, v, rn, v AS s
                FROM idx WHERE rn = 1
                UNION ALL
                SELECT i.series_id, i.bucket_ts, i.v, i.rn,
                       r.s * 0.75 + i.v * 0.25
                FROM idx i JOIN rec r
                  ON i.series_id = r.series_id AND i.rn = r.rn + 1)
            SELECT series_id, bucket_ts, v, round(s, 6) AS ewma FROM rec
        """,
        "ts_rolling_median": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2)
            SELECT series_id, bucket_ts, v,
                   quantile_cont(v, 0.5) OVER (
                       PARTITION BY series_id ORDER BY bucket_ts
                       ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
                   ) AS roll_median,
                   count(*) OVER (
                       PARTITION BY series_id ORDER BY bucket_ts
                       ROWS BETWEEN 23 PRECEDING AND CURRENT ROW
                   ) AS roll_n
            FROM hr
        """,
        "ts_theil_sen": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id,
                           epoch_us(bucket_ts) / 3600000000.0 AS t, v
                    FROM hr),
            pairs AS (SELECT a.series_id,
                             (b.v - a.v) / (b.t - a.t) AS s
                      FROM idx a JOIN idx b
                        ON a.series_id = b.series_id AND a.t < b.t)
            SELECT series_id,
                   quantile_cont(s, 0.5) AS slope_per_unit,
                   count(*) AS n_pairs
            FROM pairs GROUP BY 1
        """,
        "ts_brown_les": """
            WITH RECURSIVE
            hr AS (SELECT event_type AS series_id,
                          date_trunc('hour', ts) AS bucket_ts,
                          round(avg(value), 6) AS v
                   FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, bucket_ts, v,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) AS rn
                    FROM hr),
            rec AS (
                -- ONE recursion carrying BOTH smoothing states: a second
                -- recursive CTE stacked on the first re-runs the whole
                -- inner recursion per outer step (quadratic; measured
                -- minutes at 3,600 rows). s1_t is written out twice so
                -- the s2 update uses the identical IEEE op sequence the
                -- pandas kernel does (s2 = 0.75*s2_prev + 0.25*s1_t).
                SELECT series_id, bucket_ts, v, rn, v AS s1, v AS s2
                FROM idx WHERE rn = 1
                UNION ALL
                SELECT i.series_id, i.bucket_ts, i.v, i.rn,
                       r.s1 * 0.75 + i.v * 0.25,
                       r.s2 * 0.75 + (r.s1 * 0.75 + i.v * 0.25) * 0.25
                FROM idx i JOIN rec r
                  ON i.series_id = r.series_id AND i.rn = r.rn + 1)
            SELECT series_id, bucket_ts, v,
                   round(2.0 * s1 - s2, 6) AS level,
                   round(0.3333333333333333 * (s1 - s2), 6) AS trend,
                   round((2.0 * s1 - s2)
                         + 0.3333333333333333 * (s1 - s2), 6) AS forecast
            FROM rec
        """,
        "ts_xcorr": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, v,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS i
                    FROM hr),
            a AS (SELECT v AS x, i FROM idx WHERE series_id = 'click'),
            b AS (SELECT v AS y, i FROM idx WHERE series_id = 'view'),
            lags AS (SELECT unnest(generate_series(-6, 6)) AS lag)
            SELECT CAST(l.lag AS INT) AS lag,
                   round(corr(a.x, b.y), 6) AS xcorr,
                   count(*) AS n_pairs
            FROM a CROSS JOIN lags l
            JOIN b ON a.i = b.i + l.lag
            GROUP BY 1
        """,
        "ts_acf": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, v,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS i
                    FROM hr),
            lags AS (SELECT unnest(generate_series(1, 12)) AS lag)
            SELECT a.series_id, CAST(l.lag AS INT) AS lag,
                   round(corr(a.v, b.v), 6) AS acf,
                   count(*) AS n_pairs
            FROM idx a
            CROSS JOIN lags l
            JOIN idx b ON a.series_id = b.series_id
                      AND b.i = a.i - l.lag
            GROUP BY 1, 2
        """,
        "m4_downsample": """
            WITH base AS (SELECT event_type AS series_id, ts AS bucket_ts,
                                 round(avg(value), 6) AS v
                          FROM events GROUP BY 1, 2)
            SELECT series_id,
                   date_trunc('hour', bucket_ts) AS bucket_start,
                   arg_min(v, bucket_ts) AS first_v,
                   arg_max(v, bucket_ts) AS last_v,
                   min(v) AS min_v,
                   max(v) AS max_v,
                   count(*) AS n_points
            FROM base GROUP BY 1, 2
        """,
        "ts_anomaly": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            med AS (SELECT series_id, quantile_cont(v, 0.5) AS m
                    FROM hr GROUP BY 1),
            mad AS (SELECT h.series_id,
                           quantile_cont(abs(h.v - m.m), 0.5) AS d
                    FROM hr h JOIN med m USING (series_id) GROUP BY 1)
            SELECT h.series_id, h.bucket_ts, h.v,
                   round(0.6745 * (h.v - m.m) / d.d, 6) AS robust_z,
                   abs(0.6745 * (h.v - m.m) / d.d) > 3.5 AS is_anomaly
            FROM hr h
            JOIN med m USING (series_id)
            JOIN mad d USING (series_id)
        """,
        "ts_cusum": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            st AS (SELECT series_id, avg(v) AS mu,
                          stddev_samp(v) AS sd, count(*) AS n
                   FROM hr GROUP BY 1),
            cum AS (SELECT h.series_id, h.bucket_ts,
                           sum(h.v) OVER (PARTITION BY h.series_id
                                          ORDER BY h.bucket_ts
                                          ROWS UNBOUNDED PRECEDING)
                           - row_number() OVER (PARTITION BY h.series_id
                                                ORDER BY h.bucket_ts)
                             * s.mu AS s_t,
                           s.sd, s.n
                    FROM hr h JOIN st s USING (series_id)),
            ranked AS (SELECT *,
                              max(abs(s_t)) OVER (PARTITION BY series_id)
                                  AS max_abs,
                              row_number() OVER (PARTITION BY series_id
                                                 ORDER BY abs(s_t) DESC,
                                                          bucket_ts)
                                  AS rk
                       FROM cum)
            SELECT series_id, bucket_ts AS cp_ts,
                   round(max_abs / (sd * sqrt(n)), 6) AS cusum_stat, n
            FROM ranked WHERE rk = 1
        """,
        "ts_seasonal": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               CAST(CAST(round(round(avg(value), 6)
                                    * 1000000) AS BIGINT) AS DOUBLE) AS v
                        FROM events GROUP BY 1, 2),
            base AS (SELECT series_id, bucket_ts, v,
                            CAST((row_number() OVER wobs - 1) % 24 AS INT)
                                AS phase,
                            CASE WHEN count(v) OVER wa = 24
                                  AND count(v) OVER wb = 24
                                 THEN (sum(v) OVER wa + sum(v) OVER wb)
                                      / 48.0 END AS trend
                     FROM hr
                     WINDOW wobs AS (PARTITION BY series_id
                                     ORDER BY bucket_ts),
                            wa AS (PARTITION BY series_id
                                   ORDER BY bucket_ts
                                   ROWS BETWEEN 12 PRECEDING
                                            AND 11 FOLLOWING),
                            wb AS (PARTITION BY series_id
                                   ORDER BY bucket_ts
                                   ROWS BETWEEN 11 PRECEDING
                                            AND 12 FOLLOWING)),
            ph0 AS (SELECT series_id, phase, avg(v - trend) AS raw_s
                    FROM base GROUP BY 1, 2),
            ph AS (SELECT series_id, phase,
                          raw_s - avg(raw_s) OVER (PARTITION BY series_id)
                              AS seasonal
                   FROM ph0)
            SELECT b.series_id, b.bucket_ts, b.v / 1000000.0 AS v, b.phase,
                   coalesce(b.trend / 1000000.0, -999999.0) AS trend,
                   p.seasonal / 1000000.0 AS seasonal,
                   coalesce((b.v - b.trend - p.seasonal) / 1000000.0,
                            -999999.0) AS residual
            FROM base b JOIN ph p USING (series_id, phase)
        """,
        "event_transitions": """
            WITH p AS (SELECT user_id, event_type AS cur,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
                       FROM events),
            q AS (SELECT cur, nxt FROM p WHERE nxt IS NOT NULL),
            c AS (SELECT cur, count(*) AS n_cur FROM q GROUP BY 1)
            SELECT q.cur, q.nxt, count(*) AS n,
                   CAST(count(*) AS DOUBLE) / c.n_cur AS p
            FROM q JOIN c USING (cur)
            GROUP BY q.cur, q.nxt, c.n_cur
        """,
        "hourly_pivot": """
            SELECT date_trunc('hour', ts) AS bucket_ts,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_view,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_error
            FROM events GROUP BY 1
        """,
        "hourly_percentiles": """
            SELECT event_type,
                   date_trunc('hour', ts) AS bucket_ts,
                   count(*) AS n,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.95) AS p95,
                   quantile_cont(value, 0.99) AS p99,
                   min(value) AS vmin,
                   max(value) AS vmax
            FROM events GROUP BY 1, 2
        """,
        "series_corr_matrix": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, v,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS i
                    FROM hr)
            SELECT a.series_id AS series_a, b.series_id AS series_b,
                   round(corr(a.v, b.v), 6) AS corr,
                   count(*) AS n_pairs
            FROM idx a JOIN idx b
              ON a.i = b.i AND a.series_id < b.series_id
            GROUP BY 1, 2
        """,
        "user_profile": """
            SELECT user_id,
                   min(ts) AS first_seen,
                   max(ts) AS last_seen,
                   round(date_diff('microsecond', min(ts), max(ts))
                         / 1000000.0, 6) AS tenure_s,
                   count(DISTINCT CAST(ts AS DATE)) AS active_days,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_purchases,
                   CAST(sum(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(round(value * 100) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS spend_cents
            FROM events GROUP BY 1
        """,
        "user_profile_skewed": """
            WITH ev AS (
                SELECT CASE WHEN user_id % 5 = 0 THEN CAST(-1 AS BIGINT)
                            ELSE user_id END AS user_id,
                       ts, event_type, value
                FROM events)
            SELECT user_id,
                   min(ts) AS first_seen,
                   max(ts) AS last_seen,
                   round(date_diff('microsecond', min(ts), max(ts))
                         / 1000000.0, 6) AS tenure_s,
                   count(DISTINCT CAST(ts AS DATE)) AS active_days,
                   count(*) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_purchases,
                   CAST(sum(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(round(value * 100) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS spend_cents
            FROM ev GROUP BY 1
        """,
        "sessionize_skewed": """
            WITH ev AS (
                SELECT CASE WHEN user_id % 5 = 0 THEN CAST(-1 AS BIGINT)
                            ELSE user_id END AS user_id,
                       ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
            ordered AS (
                SELECT user_id, ts, event_id, cents,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            marked AS (
                SELECT user_id, ts, cents,
                       sum(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS s_idx
                FROM ordered)
            SELECT user_id,
                   CAST(s_idx AS INT) AS session_idx,
                   min(ts) AS session_start,
                   max(ts) AS session_end,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS total_cents
            FROM marked
            GROUP BY user_id, s_idx
        """,
        "snapshot_diff": """
            WITH ev AS (SELECT event_id, user_id, value FROM events),
            nw AS (
                SELECT event_id, user_id,
                       CASE WHEN event_id % 97 = 0 THEN value + 1.5
                            ELSE value END AS value
                FROM ev WHERE event_id % 101 != 0
                UNION ALL
                SELECT event_id + 10000000, user_id, value
                FROM ev WHERE event_id % 500 = 0),
            a AS (SELECT event_id, value AS va,
                         CAST(round(value * 100) AS BIGINT) AS ca
                  FROM ev),
            b AS (SELECT event_id, value AS vb,
                         CAST(round(value * 100) AS BIGINT) AS cb
                  FROM nw),
            j AS (SELECT va, ca, vb, cb
                  FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
            SELECT CASE WHEN va IS NULL THEN 'added'
                        WHEN vb IS NULL THEN 'removed'
                        WHEN ca != cb THEN 'changed'
                        ELSE 'unchanged' END AS change,
                   count(*) AS n,
                   CAST(sum(coalesce(cb, 0) - coalesce(ca, 0)) AS BIGINT)
                       AS cents_drift
            FROM j GROUP BY 1
        """,
        "data_expectations": """
            WITH a AS (SELECT count(*) AS n,
                sum(CASE WHEN (value >= 0) IS NOT TRUE
                         THEN 1 ELSE 0 END) AS v_value_nonnegative,
                sum(CASE WHEN (value < 10000) IS NOT TRUE
                         THEN 1 ELSE 0 END) AS v_value_below_10k,
                sum(CASE WHEN (ts >= TIMESTAMP '2024-01-01'
                           AND ts < TIMESTAMP '2025-01-01') IS NOT TRUE
                         THEN 1 ELSE 0 END) AS v_ts_in_2024,
                sum(CASE WHEN (event_type IN ('click','view','purchase',
                           'signup','error')) IS NOT TRUE
                         THEN 1 ELSE 0 END) AS v_event_type_known,
                sum(CASE WHEN (user_id >= 0) IS NOT TRUE
                         THEN 1 ELSE 0 END) AS v_user_id_positive,
                sum(CASE WHEN (props IS NOT NULL AND json_valid(props))
                           IS NOT TRUE
                         THEN 1 ELSE 0 END) AS v_props_is_json
                FROM events),
            s AS (
                SELECT 'event_type_known' AS rule, n,
                       v_event_type_known AS n_violations FROM a
                UNION ALL SELECT 'props_is_json', n, v_props_is_json FROM a
                UNION ALL SELECT 'ts_in_2024', n, v_ts_in_2024 FROM a
                UNION ALL SELECT 'user_id_positive', n,
                       v_user_id_positive FROM a
                UNION ALL SELECT 'value_below_10k', n,
                       v_value_below_10k FROM a
                UNION ALL SELECT 'value_nonnegative', n,
                       v_value_nonnegative FROM a)
            SELECT rule, CAST(n AS BIGINT) AS n_rows,
                   CAST(n_violations AS BIGINT) AS n_violations,
                   CAST(n - n_violations AS DOUBLE) / n AS pass_rate
            FROM s
        """,
        "cube_profile": """
            SELECT coalesce(event_type, 'ALL') AS event_type_g,
                   CAST(coalesce(dow, -1) AS INT) AS dow_g,
                   count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM (SELECT event_type,
                         dayofweek(ts) + 1 AS dow,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY CUBE(event_type, dow)
        """,
        "hopping_window": """
            WITH hops AS (
                SELECT time_bucket(INTERVAL '15 minutes', ts)
                           - t.k * INTERVAL '15 minutes' AS window_start,
                       event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
                CROSS JOIN (VALUES (0), (1), (2), (3)) t(k))
            SELECT window_start, event_type, count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM hops GROUP BY 1, 2
        """,
        "rank_functions": """
            WITH per AS (
                SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
                       count(*) AS n
                FROM events GROUP BY 1, 2)
            SELECT event_type, bucket_ts, n,
                   CAST(rank() OVER w AS INT) AS rnk,
                   CAST(dense_rank() OVER w AS INT) AS drnk,
                   percent_rank() OVER w AS prnk,
                   cume_dist() OVER w AS cdist,
                   CAST(ntile(4) OVER w AS INT) AS quartile
            FROM per
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY n DESC, bucket_ts ASC)
        """,
        "sliding_distinct": """
            WITH hops AS (
                SELECT time_bucket(INTERVAL '1 hour', ts)
                           + (t.k + 1) * INTERVAL '1 hour' AS window_end,
                       event_type, user_id
                FROM events
                CROSS JOIN (SELECT unnest(range(24)) AS k) t)
            SELECT window_end, event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM hops GROUP BY 1, 2
        """,
        "weekly_profile": """
            WITH cells AS (
                SELECT event_type,
                       dayofweek(ts) + 1 AS dow,
                       CAST(hour(ts) AS INT) AS hod,
                       count(*) AS n,
                       sum(CAST(round(value * 100) AS BIGINT))
                           AS sum_cents
                FROM events GROUP BY 1, 2, 3),
            totals AS (SELECT event_type, sum(n) AS total
                       FROM cells GROUP BY 1)
            SELECT c.event_type, CAST(c.dow AS INT) AS dow, c.hod, c.n,
                   CAST(c.sum_cents AS DOUBLE) / c.n / 100.0
                       AS mean_value,
                   CAST(c.n AS DOUBLE) / CAST(t.total AS BIGINT) AS share
            FROM cells c JOIN totals t USING (event_type)
        """,
        "top_users_per_hour": """
            WITH per AS (
                SELECT date_trunc('hour', ts) AS bucket_ts, user_id,
                       count(*) AS n_events
                FROM events GROUP BY 1, 2),
            rk AS (
                SELECT bucket_ts, user_id, n_events,
                       row_number() OVER (PARTITION BY bucket_ts
                           ORDER BY n_events DESC, user_id ASC) AS rank
                FROM per)
            SELECT bucket_ts, CAST(rank AS INT) AS rank, user_id,
                   n_events
            FROM rk WHERE rank <= 3
        """,
        "ts_period": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, v,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS i
                    FROM hr),
            lags AS (SELECT unnest(generate_series(2, 48)) AS lag),
            ac AS (SELECT a.series_id, CAST(l.lag AS INT) AS lag,
                          round(corr(a.v, b.v), 6) AS acf_r
                   FROM idx a
                   CROSS JOIN lags l
                   JOIN idx b ON a.series_id = b.series_id
                             AND b.i = a.i - l.lag
                   GROUP BY 1, 2),
            thr AS (SELECT series_id, lag, acf_r,
                           CASE WHEN max(acf_r) OVER w > 0
                                THEN max(acf_r) OVER w * 0.95
                                ELSE max(acf_r) OVER w END AS t
                    FROM ac
                    WINDOW w AS (PARTITION BY series_id)),
            rk AS (SELECT series_id, lag, acf_r,
                          row_number() OVER (PARTITION BY series_id
                              ORDER BY lag ASC) AS rn
                   FROM thr WHERE acf_r >= t)
            SELECT series_id, lag AS period, acf_r AS acf_at_period
            FROM rk WHERE rn = 1
        """,
        "value_histogram": """
            SELECT event_type,
                   CAST(least(greatest(
                       CAST(floor(value / 25) AS BIGINT), 0), 19)
                       AS INT) AS bucket,
                   count(*) AS n,
                   round(min(value), 6) AS bin_min,
                   round(max(value), 6) AS bin_max
            FROM events GROUP BY 1, 2
        """,
        "ts_strengths": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               round(avg(value), 6) AS v
                        FROM events GROUP BY 1, 2),
            base AS (SELECT series_id, bucket_ts, v,
                            CAST((row_number() OVER wobs - 1) % 24 AS INT)
                                AS phase,
                            CASE WHEN count(v) OVER wa = 24
                                  AND count(v) OVER wb = 24
                                 THEN (sum(v) OVER wa + sum(v) OVER wb)
                                      / 48.0 END AS trend
                     FROM hr
                     WINDOW wobs AS (PARTITION BY series_id
                                     ORDER BY bucket_ts),
                            wa AS (PARTITION BY series_id
                                   ORDER BY bucket_ts
                                   ROWS BETWEEN 12 PRECEDING
                                            AND 11 FOLLOWING),
                            wb AS (PARTITION BY series_id
                                   ORDER BY bucket_ts
                                   ROWS BETWEEN 11 PRECEDING
                                            AND 12 FOLLOWING)),
            ph0 AS (SELECT series_id, phase, avg(v - trend) AS raw_s
                    FROM base GROUP BY 1, 2),
            ph AS (SELECT series_id, phase,
                          raw_s - avg(raw_s) OVER (PARTITION BY series_id)
                              AS seasonal
                   FROM ph0),
            j AS (SELECT b.series_id, b.v, b.trend, p.seasonal
                  FROM base b JOIN ph p USING (series_id, phase)
                  WHERE b.trend IS NOT NULL),
            agg AS (SELECT series_id,
                           var_samp(v - trend - seasonal) AS vr,
                           var_samp(v - seasonal) AS vdeseas,
                           var_samp(v - trend) AS vdetrend,
                           count(*) AS n_interior
                    FROM j GROUP BY 1)
            SELECT series_id,
                   round(greatest(0.0, 1 - vr / vdeseas), 6)
                       AS trend_strength,
                   round(greatest(0.0, 1 - vr / vdetrend), 6)
                       AS seasonal_strength,
                   n_interior
            FROM agg
        """,
        "sessionize": """
            WITH ordered AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            marked AS (
                SELECT user_id, ts, value,
                       sum(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS s_idx
                FROM ordered)
            SELECT user_id,
                   CAST(s_idx AS INT) AS session_idx,
                   min(ts) AS session_start,
                   max(ts) AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 6) AS total_value
            FROM marked
            GROUP BY user_id, s_idx
        """,
        "hurst_rs": """
            WITH hr AS (SELECT event_type AS series_id,
                               date_trunc('hour', ts) AS bucket_ts,
                               CAST(floor(
                                   CAST(sum(CAST(round(value * 100)
                                            AS BIGINT)) AS DOUBLE)
                                   / count(*)) AS BIGINT) AS vm
                        FROM events GROUP BY 1, 2),
            idx AS (SELECT series_id, vm,
                           row_number() OVER (PARTITION BY series_id
                                              ORDER BY bucket_ts) - 1 AS rn
                    FROM hr),
            ladder AS (SELECT series_id, vm, rn,
                              unnest([8, 16, 32, 64]) AS n
                       FROM idx),
            chunked AS (SELECT series_id, n, vm, rn,
                               CAST(floor(rn / n) AS BIGINT) AS chunk
                        FROM ladder),
            winstats AS (
                SELECT series_id, n, chunk, vm,
                       count(*) OVER c AS cnt,
                       sum(vm) OVER c AS s1,
                       sum(vm * vm) OVER c AS s2,
                       sum(vm) OVER r AS cum,
                       row_number() OVER r AS t
                FROM chunked
                WINDOW c AS (PARTITION BY series_id, n, chunk),
                       r AS (PARTITION BY series_id, n, chunk ORDER BY rn
                             ROWS UNBOUNDED PRECEDING)),
            z AS (SELECT series_id, n, chunk, s1, s2,
                         CAST(cum AS DOUBLE)
                         - CAST(t * s1 AS DOUBLE) / n AS zt
                  FROM winstats WHERE cnt = n),
            chunks AS (
                SELECT series_id, n, chunk,
                       max(zt) - min(zt) AS r,
                       (CAST(any_value(s2) AS DOUBLE)
                        - CAST(any_value(s1) * any_value(s1) AS DOUBLE)
                          / n) / n AS var
                FROM z GROUP BY series_id, n, chunk),
            rs AS (SELECT series_id, n, r / sqrt(var) AS rs
                   FROM chunks WHERE var > 0)
            SELECT series_id,
                   CAST(n AS BIGINT) AS n,
                   count(*) AS n_chunks,
                   CAST(sum(CAST(floor(rs * 1000000.0) AS BIGINT))
                        AS BIGINT) AS sum_rs_micro
            FROM rs GROUP BY series_id, n
        """,
        "trigram_quality": """
            WITH base AS (SELECT doc_id, text FROM documents
                          UNION ALL SELECT 20000000, 'ab'),
            d AS (SELECT doc_id,
                         trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                             AS t
                  FROM base),
            pos AS (SELECT doc_id, t,
                           unnest(generate_series(
                               1, greatest(length(t) - 2, 0))) AS i
                    FROM d),
            occ AS (SELECT doc_id,
                           substr(t, CAST(i AS INT), 3) AS tri
                    FROM pos),
            prof AS (SELECT tri, count(*) AS df FROM occ GROUP BY tri),
            sc AS (SELECT o.doc_id,
                          count(*) AS n_tri,
                          sum(CASE WHEN p.df <= 2 THEN 1 ELSE 0 END)
                              AS n_rare,
                          sum(p.df) AS df_mass
                   FROM occ o JOIN prof p USING (tri)
                   GROUP BY o.doc_id)
            SELECT b.doc_id,
                   CAST(coalesce(sc.n_tri, 0) AS BIGINT) AS n_tri,
                   CAST(coalesce(sc.n_rare, 0) AS BIGINT) AS n_rare,
                   CAST(coalesce(sc.df_mass, 0) AS BIGINT) AS df_mass
            FROM base b LEFT JOIN sc ON b.doc_id = sc.doc_id
        """,
        "edit_distance_pairs": """
            WITH planted AS (SELECT doc_id + 20000000 AS doc_id,
                                    text || ' zq' AS text
                             FROM (SELECT doc_id, text FROM documents
                                   ORDER BY doc_id LIMIT 10)),
            base AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM planted),
            d AS (SELECT doc_id AS id,
                         trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                             AS t
                  FROM base),
            s AS (SELECT id, t, substr(t, 1, 24) AS blk,
                         length(t) AS len
                  FROM d WHERE length(t) >= 24)
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist,
                   CAST(a.len AS BIGINT) AS len_a,
                   CAST(b.len AS BIGINT) AS len_b
            FROM s a JOIN s b
              ON a.blk = b.blk AND a.id < b.id
             AND abs(a.len - b.len) <= 16
            WHERE levenshtein(a.t, b.t) <= 16
        """,
        "winsorize_values": """
            WITH e AS (SELECT event_type, event_id,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events),
            r AS (SELECT *,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY cents, event_id) AS rn,
                         count(*) OVER (PARTITION BY event_type) AS n
                  FROM e),
            b AS (SELECT event_type,
                         min(CASE WHEN rn = CAST(floor(
                                 (5 * n + 99) / 100.0) AS BIGINT)
                             THEN cents END) AS lo_bound,
                         min(CASE WHEN rn = CAST(floor(
                                 (95 * n + 99) / 100.0) AS BIGINT)
                             THEN cents END) AS hi_bound
                  FROM r GROUP BY event_type)
            SELECT e.event_type, e.event_id, e.cents,
                   b.lo_bound, b.hi_bound,
                   greatest(least(e.cents, b.hi_bound), b.lo_bound)
                       AS cents_w,
                   CAST(CASE WHEN e.cents < b.lo_bound THEN -1
                             WHEN e.cents > b.hi_bound THEN 1
                             ELSE 0 END AS INT) AS clamped
            FROM e JOIN b USING (event_type)
        """,
    }
