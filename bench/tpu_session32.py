#!/usr/bin/env python
"""TPU session 32: last driver-exact confirmation on the final tree
(static + dynamic; warms any shapes the L=1 sentinel fix re-keyed —
L>=2 programs are unchanged, so this should be pure cache hits)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session32_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax, bench
    log(f"=== session32 start (final tree); devices: {jax.devices()} ===")
    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000, dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    bc = 2 * nk / (base["insert_s"] + base["query_s"])
    ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
    assert ours["distinct"] == base["distinct"]
    comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
    log(f"static 32Mbp FINAL: {ours['insert_s']+ours['query_s']:.3f}s "
        f"{comb/1e6:.1f}M/s vs_local {comb/bc:.2f}x")
    del codes32
    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000, dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    ours = bench.run_tpu_dynamic(codes8, 3)
    assert ours["distinct"] == based["distinct"]
    assert ours["positive"] == based["positive"]
    ops_s = ours["ops"] / ours["total_s"]
    log(f"dynamic FINAL: {ours['total_s']:.3f}s {ops_s/1e6:.1f}M ops/s "
        f"vs_local {ops_s/based['ops_per_s']:.2f}x")
    log("=== session32 done ===")
if __name__ == "__main__":
    main()
