#!/usr/bin/env python
"""TPU session 30: dynamic + sharded-dynamic re-run (session29's tunnel
died mid-compile before the dynamic rows; the blank kernel's 2^20/2^19
shapes need an on-chip confirmation)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session30_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax, bench
    log(f"=== session30 start; devices: {jax.devices()} ===")
    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000, dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    for name, fn in (("dynamic", bench.run_tpu_dynamic),
                     ("sharded-dynamic D=1", bench.run_tpu_sharded_dynamic)):
        try:
            ours = fn(codes8, 3)
            assert ours["distinct"] == based["distinct"]
            assert ours["positive"] == based["positive"]
            ops_s = ours["ops"] / ours["total_s"]
            log(f"{name} (blank kernel): {ours['total_s']:.3f}s "
                f"{ops_s/1e6:.1f}M ops/s vs_local {ops_s/based['ops_per_s']:.2f}x")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("=== session30 done ===")
if __name__ == "__main__":
    main()
