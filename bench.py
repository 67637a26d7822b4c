#!/usr/bin/env python
"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is one compact JSON object (headline total +
per-query steady-state minima only) sized to fit the driver's tail
capture — round 3's line with inlined extras outgrew it and the round
lost its machine-readable timings. Everything else (per-query run
arrays, cold times, row counts, the measurement protocol) is written to
BENCH_EXTRAS.json next to this script.

Protocol (also recorded in the sidecar): every query runs >=2 times
(>=3 when min > 5s) with spark.catalog.clearCache() + query-cache
release between runs, so each run recomputes the full plan; reported
timing = min across runs (robust to this VM's hypervisor-steal stalls,
which vary identical runs 3-6x). Run 1 pays JVM codegen; cold times are
kept per-query in the sidecar's run arrays.

Covers the flagship entity-resolution pipeline (over the deterministic
transcript fixture, sized by SPARK_GRAFT_BENCH_CONVS) plus every
queries() operator over the driver-generated sf tables. Scaling evidence
(N vs 4N cores) is produced separately by scripts/scaling_bench.py
and recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "4000"))


def main() -> None:
    from dedupe_spark.session import build_session

    spark = build_session(
        app_name="dedupe_bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    # keep Spark WARN chatter (WindowExec notes from the bounded-input
    # windows, streaming AQE notices) out of the driver's ~2000-char tail
    # capture so the final JSON line always survives intact
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from dedupe_spark import fixtures, pipeline

    # warm JIT + python worker pool once so per-query timings measure the
    # queries, not process startup
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s * 1.0, "double")
    spark.range(1_000_000, numPartitions=CPUS).select(
        F.sum(_warm(F.col("id").cast("double")))
    ).collect()

    timings: dict[str, float] = {}
    extras: dict = {}
    run_arrays: dict[str, list[float]] = {}

    # --- flagship: full record-linkage pipeline over transcripts ---
    # runs converge as the JVM JIT-compiles the generated code (measured:
    # ~6x between run0 and run2 on this VM); every run releases its own
    # caches, so the steady-state number is honest recompute throughput,
    # not a cache replay. cold + intermediate runs are reported in extras.
    t0 = time.time()
    tr = fixtures.transcripts(spark, n_conv=BENCH_CONVS).persist()
    n_turns = tr.count()
    fixture_sec = time.time() - t0

    run_secs = []
    n_clusters = 0
    for _ in range(3):
        t0 = time.time()
        res = pipeline.run(tr)
        n_clusters = res.clusters.count()
        run_secs.append(round(time.time() - t0, 2))
        res.release()
    # min across runs: robust to this VM's hypervisor-steal stalls
    # (measured: identical runs vary 3-6x under background steal)
    pipe_sec = min(run_secs)
    timings["pipeline_entity_resolution"] = round(pipe_sec, 2)
    extras["pipeline_cold_sec"] = run_secs[0]
    run_arrays["pipeline_entity_resolution"] = run_secs
    extras["pipeline_turns"] = n_turns
    extras["pipeline_turns_per_sec"] = round(n_turns / pipe_sec, 1)
    extras["pipeline_clusters"] = n_clusters
    extras["fixture_gen_sec"] = round(fixture_sec, 2)
    tr.unpersist()

    # --- every queries() entry over the sf tables (VERDICT r2 task 6:
    # no unbenched operators — regressions anywhere are visible) ---
    qs = entrymod.queries()
    # Each query runs twice with a cache clear in between, so BOTH runs
    # compute the full plan; the first pays JVM codegen/JIT (tens of
    # seconds for the lambda-heavy operators on this CPU), the second is
    # steady state. Reported timing = min (robust to hypervisor-steal
    # stalls); cold time is kept in extras. Streaming queries (q44/q45)
    # are timed end-to-end including stream start + drain.
    for name in sorted(qs):
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        cold = time.time() - t0
        runs = [cold]
        # warm rerun; heavy queries (>5s best) get a third run — this VM's
        # hypervisor-steal lottery makes single long runs vary 2-4x, and
        # the longer a run the likelier it straddles a steal burst
        while len(runs) < 2 or (len(runs) < 3 and min(runs) > 5.0):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            runs.append(time.time() - t0)
        spark.catalog.clearCache()
        entrymod.release_query_caches()
        timings[name] = round(min(runs), 2)
        run_arrays[name] = [round(r, 2) for r in runs]
        extras[f"{name}_cold_sec"] = round(cold, 2)
        extras[f"{name}_rows"] = n

    total = round(sum(timings.values()), 2)
    # headline keys are compacted to the qNN[suffix] prefix ("q22",
    # "q21_fast", "pipeline") so the final line stays well inside the
    # driver's ~2000-char tail capture even as queries are added; the
    # full-name -> timing map lives in the sidecar's run_arrays
    def _short(name: str) -> str:
        parts = name.split("_")
        if parts[0] == "pipeline":
            return "pipeline"
        return "_".join(parts[:2]) if parts[1:2] == ["fast"] else parts[0]

    def _median(runs: list[float]) -> float:
        s = sorted(runs)
        mid = len(s) // 2
        return round(s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2, 2)

    # each query reports [min, median] so a single steal-stalled run is
    # visible from the parsed artifact alone (the min is the honest
    # steady-state; min << median flags a noisy measurement)
    short_timings = {
        _short(k): [v, _median(run_arrays[k])] for k, v in timings.items()
    }
    assert len(short_timings) == len(timings), "short-name collision"
    sidecar = {
        "protocol": (
            "each query: >=2 full recomputes (3rd when min>5s), "
            "clearCache + release_query_caches between runs; reported = min; "
            "run_arrays[q][0] is the cold (codegen-paying) run"
        ),
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "headline_total_sec": total,
        "run_arrays": run_arrays,
        "extras": extras,
    }
    # the versioned BENCH_EXTRAS.json is the driver-scale (sf0.1) artifact;
    # smaller verify/dev runs get an sf-suffixed sidecar so they can never
    # clobber the round's record
    sf_tag = SF_DIR.rstrip("/").split("sf")[-1]
    extras_name = "BENCH_EXTRAS.json" if sf_tag == "0.1" else f"BENCH_EXTRAS_sf{sf_tag}.json"
    sidecar_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), extras_name)
    with open(sidecar_path, "w") as f:
        json.dump(sidecar, f, indent=1)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "qfmt": "[min,median] sec of >=2 full recomputes; hypervisor steal varies identical runs 3-6x on this box",
        "queries": short_timings,
        "sf": sf_tag,
        "cpus": CPUS,
        "extras_file": extras_name,
    }
    spark.stop()
    # the compact line is printed LAST, after spark.stop(), so no late
    # JVM output can land below it in the driver's tail capture;
    # compact separators keep it inside the capture window
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
