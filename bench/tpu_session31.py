#!/usr/bin/env python
"""TPU session 31: dynamic A/B — blank kernel on (default) vs off
(CBL_TPU_SLOG_SCAN=xla) in ONE session, to separate a kernel regression
from the box's session-to-session variance (0.169-0.525s for identical
code across sessions 22-30)."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session31_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax, bench
    import cbl_tpu.cbl as cmod
    log(f"=== session31 start; devices: {jax.devices()} ===")
    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000, dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    log(f"baseline {based['ops_per_s']/1e6:.2f}M ops/s")
    for mode in ("pallas", "xla", "pallas"):
        os.environ["CBL_TPU_SLOG_SCAN"] = mode
        cmod._fused_words_sorted_fn.cache_clear()
        cmod._fused_words_fn.cache_clear()
        cmod._fused_round_slog_fn.cache_clear()
        try:
            ours = bench.run_tpu_dynamic(codes8, 3)
            assert ours["distinct"] == based["distinct"]
            assert ours["positive"] == based["positive"]
            ops_s = ours["ops"] / ours["total_s"]
            log(f"dynamic [scan+blank={mode}]: {ours['total_s']:.3f}s "
                f"{ops_s/1e6:.1f}M ops/s vs_local {ops_s/based['ops_per_s']:.2f}x")
        except Exception as e:
            log(f"dynamic [{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("=== session31 done ===")
if __name__ == "__main__":
    main()
