"""Per-query measurement harness for optimization round 6 (bench.py is
FROZEN for the driver; this file carries the extra instrumentation the
optimization guide asks for: noop-sink isolation per query, explain
capture, and cold+warm wall records for before/after evidence).

Usage:
    python bench_extra.py q1 q2 ...            # time named queries
    python bench_extra.py --flagship           # time the flagship pipeline
    python bench_extra.py --explain OUT q1 ... # write explain("formatted")
                                               # to plans/r06/<q>_<OUT>.txt
    SPARK_GRAFT_WARM_REPEATS=N controls warm repeats (default 3).

Prints one JSON line: {"queries": {...min-of-warm...}, "cold": {...},
"raw": {...}} so results can be diffed against bench_full.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = sys.argv[1:]
    explain_tag = None
    if args and args[0] == "--explain":
        explain_tag = args[1]
        args = args[2:]
    do_flagship = "--flagship" in args
    args = [a for a in args if a != "--flagship"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    warm_repeats = int(os.environ.get("SPARK_GRAFT_WARM_REPEATS", "3"))

    from wavelet_decomposition_spark.plans.session import build_session

    spark = build_session(app_name="wds-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings, cold, raw = {}, {}, {}

    if explain_tag:
        os.makedirs("plans/r06", exist_ok=True)
        for name in args:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r06/{name}_{explain_tag}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)
        spark.stop()
        return

    def run_timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        cold[name] = round(time.time() - t0, 3)
        walls = []
        for _ in range(warm_repeats):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        raw[name] = walls
        timings[name] = min(walls)
        print(
            f"{name}: min-warm={timings[name]} cold={cold[name]} raw={walls}",
            file=sys.stderr,
        )

    if do_flagship:
        import bench as benchmod

        n_convs = max(200, int(200_000 * sf))
        tx_path = benchmod.materialize_transcripts(spark, n_convs)
        # same untimed worker warm-up as bench.py
        from pyspark.sql import functions as F

        from wavelet_decomposition_spark.operators import wavelet_ops as _w

        _noop(_w.energy_windows(
            spark.read.parquet(tx_path).limit(2000)
            .selectExpr("conv_id", "date_trunc('minute', ts) as bucket_ts")
            .groupBy("conv_id", "bucket_ts")
            .agg(F.count(F.lit(1)).cast("double").alias("turns")),
            "turns", wavelet="haar", levels=2, window_len=16,
            sparse_fill_step="1 minute",
        ))
        run_timed(
            "flagship_rollup_wavelet",
            lambda: benchmod.flagship_pipeline(spark, tx_path),
        )

    for name in args:
        run_timed(name, lambda name=name: _noop(qs[name](spark, sf_dir)))

    print(json.dumps({"queries": timings, "cold": cold, "raw": raw}))
    spark.stop()


if __name__ == "__main__":
    main()
