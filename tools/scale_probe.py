"""One affinity-pinned measurement of the clips QC pipeline.

The scaling-efficiency criterion compares cluster sizes N and 4N. In
this sandbox the honest stand-in is "N cores vs 4N cores": pin the
WHOLE process tree (driver, JVM, Python workers — all spawned after
the pin, so they inherit the mask) to exactly N logical CPUs and run
local[N]. Without pinning, local[N] consumes up to ~2N cores (N JVM
task threads + N Python workers), which inflates the small-N
baseline and understates true scaling (the r1 artifact's 0.537).

Run as a SUBPROCESS of bench.py — a fresh process per measurement is
what makes the pin airtight: a reused py4j JVM keeps the affinity of
the thread that spawned it, so in-process re-pinning would leak.

``--cpu-ids`` pins to an EXPLICIT core set instead of the default
highest-N: bench.py runs the 2-core and 8-core probes SIMULTANEOUSLY
on disjoint sets, so every draw pair shares identical host
conditions — this box's co-tenant load swings per-core speed ±30%
on a minutes timescale (measured: the same 8-core stage-A job drew
54s and 74s an hour apart), which makes sequentially-sampled levels
incomparable but cancels out of a simultaneous ratio.

Prints one JSON line: {"cpus": N, "draws": [{wall_sec, t_start,
t_end, steal_frac, host_speed, stages}, ...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_ticks(cpus: list[int]) -> tuple[int, int]:
    """(steal_ticks, total_ticks) summed over the given cpu ids."""
    steal = total = 0
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu") and not line.startswith("cpu "):
                parts = line.split()
                if int(parts[0][3:]) in cpus:
                    vals = [int(x) for x in parts[1:]]
                    total += sum(vals)
                    steal += vals[7] if len(vals) > 7 else 0
    return steal, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--clips-cache", required=True)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument(
        "--cpu-ids",
        default=None,
        help="comma-separated explicit core ids to pin (len must equal "
        "--cpus); lets bench.py run both levels simultaneously on "
        "DISJOINT sets. Default: the highest --cpus ids.",
    )
    ap.add_argument(
        "--warm-buckets",
        type=int,
        default=32,
        help="buckets of the measured corpus used by the full-row-width "
        "warmup pass (JIT + worker-pool steady state). The 2-core probe "
        "uses fewer: the warmup exists to reach steady state, not to "
        "measure, and at 2 cores 32 buckets costs ~95s of probe budget.",
    )
    args = ap.parse_args()

    allowed = sorted(os.sched_getaffinity(0))
    if args.cpu_ids:
        pin = sorted(int(x) for x in args.cpu_ids.split(","))
        if len(pin) != args.cpus or not set(pin) <= set(allowed):
            raise SystemExit(f"bad --cpu-ids {args.cpu_ids} for --cpus {args.cpus}")
        os.sched_setaffinity(0, set(pin))
    else:
        if len(allowed) < args.cpus:
            raise SystemExit(f"only {len(allowed)} cpus available, need {args.cpus}")
        # Pin to the HIGHEST cpu ids: cpu0 and its neighbours absorb IRQ
        # and kernel housekeeping, so low-id pins see extra jitter the
        # workload didn't cause.
        os.sched_setaffinity(0, set(allowed[-args.cpus :]))

    from bdqc_spark.plans.pipeline import run_pipeline
    from bdqc_spark.session import build_session
    from bdqc_spark.sources.iceberg import IcebergishTable

    tbl = IcebergishTable(args.clips_cache, num_buckets=64)
    if not tbl.exists():
        raise SystemExit(f"no clips table at {args.clips_cache}; run bench.py first")

    spark = build_session(app_name=f"scale-probe-{args.cpus}", master=f"local[{args.cpus}]")
    # Warmup: run the FULL pipeline once over a tiny corpus — warms the
    # JVM JIT for every stage (profile UDF, fit codegen, decide,
    # parquet writers) and the Python worker pool, so the measurement
    # is steady-state throughput, not first-query planning latency
    # (which a 10^12-clip job amortizes to nothing).
    warm_tbl = IcebergishTable("/tmp/bdqc_scale_warm_512", num_buckets=4)
    if not warm_tbl.exists():
        # bench.py pre-creates this table; standalone probes build a
        # private copy (pid-suffixed) so two concurrent probes can't
        # race on the same append.
        from bdqc_spark.synth.clips import generate_clips_df

        warm_tbl = IcebergishTable(f"/tmp/bdqc_scale_warm_512_{os.getpid()}", num_buckets=4)
        if not warm_tbl.exists():
            warm_tbl.append(generate_clips_df(spark, 512, seed=7))
    warm_out = f"/tmp/bdqc_scale_warmout_{os.getpid()}"
    shutil.rmtree(warm_out, ignore_errors=True)
    run_pipeline(spark, warm_tbl.read(spark), warm_out, all_buckets=warm_tbl.bucket_ids())
    shutil.rmtree(warm_out, ignore_errors=True)
    # …then at full row-width over HALF the measured corpus (manifest-
    # pruned bucket subset): the 512-clip pass alone leaves the C2 JIT
    # mid-compile on the hot decode loops and the Python worker pool
    # under-spawned, which showed up as a reproducibly slow FIRST
    # measured draw (~+15-25%) in every probe process.
    half = [b for b in tbl.bucket_ids() if b < args.warm_buckets]
    warm_out2 = f"/tmp/bdqc_scale_warmout2_{os.getpid()}"
    shutil.rmtree(warm_out2, ignore_errors=True)
    run_pipeline(spark, tbl.read(spark, buckets=half), warm_out2, all_buckets=half)
    shutil.rmtree(warm_out2, ignore_errors=True)

    pinned = sorted(os.sched_getaffinity(0))
    draws = []

    def _host_speed() -> int:
        """Iterations of a fixed decode-shaped numpy kernel in 1s on
        one pinned core — a host-health reading taken right before
        each draw. Co-tenant load on the PHYSICAL host shows up as
        frequency/bandwidth loss that /proc/stat steal does not see
        (measured: the same draw ranges 75s on a 22.3k-iter host to
        500+s on a 17k-iter host); recording it makes a degraded draw
        self-documenting in the artifact."""
        import numpy as np

        x = (np.random.default_rng(0).integers(-32768, 32767, 400_000)).astype(np.int16)
        t0 = time.time()
        it = 0
        while time.time() - t0 < 1.0:
            f = x.astype(np.float32) / np.float32(32767.0)
            float(np.dot(f, f))
            it += 1
        return it

    for _ in range(args.runs):
        out = f"/tmp/bdqc_scale_out_{os.getpid()}_{int(time.time() * 1000)}"
        shutil.rmtree(out, ignore_errors=True)
        speed = _host_speed()
        s0, tt0 = _cpu_ticks(pinned)
        t0 = time.time()
        res = run_pipeline(spark, tbl.read(spark), out, all_buckets=tbl.bucket_ids())
        dt = time.time() - t0
        s1, tt1 = _cpu_ticks(pinned)
        # hypervisor steal on OUR cores during the run — co-tenant
        # bursts show up here, annotating noisy draws in the artifact
        steal = round((s1 - s0) / max(tt1 - tt0, 1), 4)
        draws.append(
            {
                "cpus": args.cpus,
                "wall_sec": round(dt, 3),
                # wall-clock window of the draw, so bench.py can pair
                # each 2-core draw with the 8-core draws that ran
                # SIMULTANEOUSLY (same host conditions)
                "t_start": round(t0, 1),
                "t_end": round(t0 + dt, 1),
                "steal_frac": steal,
                "host_speed": speed,
                # per-stage split so the artifact shows WHICH stage
                # caps the N-vs-4N ratio, not just the total
                "stages": dict(res.stage_seconds),
            }
        )
        shutil.rmtree(out, ignore_errors=True)
        # Inter-draw heap reset: draw 1 leaves a full tenured gen
        # behind, and at 2 cores ParallelGC has only 2 GC threads —
        # the collection debt lands inside draw 2's wall clock
        # (measured: t2 draw 2 ran a reproducible ~1.45× slower than
        # draw 1 on a quiet box — 300s vs 207-213s, trial-4 artifact —
        # while 8-core probes stayed flat across 6 draws). A forced
        # full GC between draws restores the protocol's invariant
        # that every draw starts from the same steady state.
        spark._jvm.System.gc()
        import gc as _pygc

        _pygc.collect()
        time.sleep(1.0)
    spark.stop()
    print(json.dumps({"cpus": args.cpus, "draws": draws}))


if __name__ == "__main__":
    main()
