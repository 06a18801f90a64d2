#!/usr/bin/env python
"""TPU session 27: final-tree confirmation sweep (all driver-comparable
modes on the shipped defaults) — also leaves the XLA compile cache fully
warm for the driver's BENCH_r04 run."""
import gc, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session27_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax, bench
    t0_all = time.time()
    log(f"=== session27 start (final tree); devices: {jax.devices()} ===")
    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000, dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    bc = 2 * nk / (base["insert_s"] + base["query_s"])
    try:
        ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        log(f"static 32Mbp: {ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s vs_local {comb/bc:.2f}x")
    except Exception as e:
        log(f"static FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes32; gc.collect()
    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000, dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    for name, fn in (("dynamic", bench.run_tpu_dynamic),
                     ("sharded-dynamic D=1", bench.run_tpu_sharded_dynamic)):
        try:
            ours = fn(codes8, 3)
            assert ours["distinct"] == based["distinct"]
            assert ours["positive"] == based["positive"]
            ops_s = ours["ops"] / ours["total_s"]
            log(f"{name}: {ours['total_s']:.3f}s {ops_s/1e6:.1f}M ops/s vs_local {ops_s/based['ops_per_s']:.2f}x")
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes8; gc.collect()
    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    gbase = bench.run_baseline_records(ci, oi, cq, oq)
    gnk = gbase["n_kmers_insert"] + gbase["n_kmers_query"]
    gc2 = gnk / (gbase["insert_s"] + gbase["query_s"])
    try:
        ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == gbase["distinct"]
        assert ours["positive"] == gbase["positive"]
        comb = gnk / (ours["insert_s"] + ours["query_s"])
        log(f"genome 32Mbp: {ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s vs_local {comb/gc2:.2f}x")
    except Exception as e:
        log(f"genome FAILED: {type(e).__name__}: {str(e)[:300]}")
    log(f"=== session27 done in {(time.time()-t0_all)/60:.1f} min ===")
if __name__ == "__main__":
    main()
