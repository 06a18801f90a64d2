#!/usr/bin/env python
"""TPU session 20: final round-3 numbers on the shipped code.

Since session19: the slog liveness scan fused to ONE cummax (run-start
and latest-entry trackers combined into a single marker scan).  This
session re-measures the three driver-relevant workloads on the final
code (also pre-warming the persistent compile cache for the driver's
bench.py run) and re-checks counts.

1. e2e dynamic 8Mbp (sorted-log rounds + fused scan).
2. e2e static 32Mbp (driver headline shape).
3. e2e genome 32Mbp.

Timing: scalar sync only (see CLAUDE.md).
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session20_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    import jax

    import bench

    t_start = time.time()
    log(f"=== session20 start; devices: {jax.devices()} ===")

    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                               dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    log(f"1 baseline.cpp dynamic: {based}")
    try:
        ours = bench.run_tpu_dynamic(codes8, 3)
        assert ours["distinct"] == based["distinct"]
        assert ours["positive"] == based["positive"]
        ops_s = ours["ops"] / ours["total_s"]
        log(f"1 e2e dynamic (fused scan): {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"1 e2e dynamic FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes8
    gc.collect()

    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000,
                                                dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    try:
        ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        log(f"2 e2e static 32Mbp: combined "
            f"{ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s "
            f"vs_local {comb/base_comb:.2f}x")
    except Exception as e:
        log(f"2 e2e static FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes32
    gc.collect()

    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    gbase = bench.run_baseline_records(ci, oi, cq, oq)
    gnk = gbase["n_kmers_insert"] + gbase["n_kmers_query"]
    gbase_comb = gnk / (gbase["insert_s"] + gbase["query_s"])
    try:
        ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == gbase["distinct"]
        assert ours["positive"] == gbase["positive"]
        comb = gnk / (ours["insert_s"] + ours["query_s"])
        log(f"3 e2e genome: combined {ours['insert_s']+ours['query_s']:.3f}s "
            f"{comb/1e6:.1f}M/s vs_local {comb/gbase_comb:.2f}x")
    except Exception as e:
        log(f"3 e2e genome FAILED: {type(e).__name__}: {str(e)[:300]}")

    log(f"=== session20 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
