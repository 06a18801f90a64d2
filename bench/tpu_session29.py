#!/usr/bin/env python
"""TPU session 29: the single-pass blanking kernel (session28 found the
word pipeline costs ~47ms/2^25 slab, with the record-blanking cumsum the
prime suspect).  Probes the pipeline A/B (CBL_TPU_SLOG_SCAN pallas/xla
controls the blank kernel too), then e2e static/dynamic/genome."""
import gc, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session29_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax
    import bench
    from cbl_tpu import CBL
    import cbl_tpu.cbl as cmod
    log(f"=== session29 start; devices: {jax.devices()} ===")
    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    idx = CBL(k=25, chunk_size=1 << 19, pending_cap=1 << 21)
    psi = idx.pack_stream(ci, oi)
    jax.block_until_ready([s[1] for s in psi.slabs])
    nk_i, st_i, s_i, e_i, _ = psi.slabs[0]

    def probe(name, fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time(); out = fn(); jax.device_get(out)
            ts.append(time.time() - t0)
        log(f"{name}: {min(ts)*1e3:.1f}ms (incl ~28ms RPC)")

    for mode in ("xla", "pallas"):
        os.environ["CBL_TPU_SLOG_SCAN"] = mode
        cmod._fused_words_fn.cache_clear()
        fw = cmod._fused_words_fn(idx.cfg, False, nk_i)
        probe(f"A pipeline 2^25 (blank={mode})",
              lambda: fw(st_i, s_i, e_i)[1])
    os.environ["CBL_TPU_SLOG_SCAN"] = "pallas"
    cmod._fused_words_fn.cache_clear()
    del psi, idx
    gc.collect()

    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000, dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    bc = 2 * nk / (base["insert_s"] + base["query_s"])
    try:
        ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        log(f"static 32Mbp (blank kernel): {ours['insert_s']+ours['query_s']:.3f}s "
            f"{comb/1e6:.1f}M/s vs_local {comb/bc:.2f}x")
    except Exception as e:
        log(f"static FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes32; gc.collect()

    try:
        gbase = bench.run_baseline_records(ci, oi, cq, oq)
        gnk = gbase["n_kmers_insert"] + gbase["n_kmers_query"]
        gc2 = gnk / (gbase["insert_s"] + gbase["query_s"])
        ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == gbase["distinct"]
        assert ours["positive"] == gbase["positive"]
        comb = gnk / (ours["insert_s"] + ours["query_s"])
        log(f"genome 32Mbp (blank kernel): {ours['insert_s']+ours['query_s']:.3f}s "
            f"{comb/1e6:.1f}M/s vs_local {comb/gc2:.2f}x")
    except Exception as e:
        log(f"genome FAILED: {type(e).__name__}: {str(e)[:300]}")
    del ci, cq; gc.collect()

    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000, dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    try:
        ours = bench.run_tpu_dynamic(codes8, 3)
        assert ours["distinct"] == based["distinct"]
        assert ours["positive"] == based["positive"]
        ops_s = ours["ops"] / ours["total_s"]
        log(f"dynamic (blank kernel): {ours['total_s']:.3f}s {ops_s/1e6:.1f}M ops/s "
            f"vs_local {ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"dynamic FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("=== session29 done ===")
if __name__ == "__main__":
    main()
