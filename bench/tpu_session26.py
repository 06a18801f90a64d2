#!/usr/bin/env python
"""TPU session 26: columnar sharded slog A/B vs session25 (which stored
the log interleaved [D,S,ncol] and could not donate) + single-chip
dynamic same-session reference for the ratio."""
import gc, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session26_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax, bench
    log(f"=== session26 start; devices: {jax.devices()} ===")
    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000, dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    log(f"0 baseline: {based['ops_per_s']/1e6:.2f}M ops/s")
    for name, fn in (("dynamic", bench.run_tpu_dynamic),
                     ("sharded-dynamic D=1 (columnar slog)", bench.run_tpu_sharded_dynamic)):
        try:
            ours = fn(codes8, 3)
            assert ours["distinct"] == based["distinct"]
            assert ours["positive"] == based["positive"]
            ops_s = ours["ops"] / ours["total_s"]
            log(f"1 {name}: {ours['total_s']:.3f}s {ops_s/1e6:.1f}M ops/s "
                f"vs_local {ops_s/based['ops_per_s']:.2f}x")
        except Exception as e:
            log(f"1 {name} FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("=== session26 done ===")
if __name__ == "__main__":
    main()
