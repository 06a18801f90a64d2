#!/usr/bin/env python
"""TPU session 22: the round-4 FINAL dynamic design on chip.

Since session21 (which measured the two-merge 'ballast-free' round at
0.443s — a REGRESSION vs round-3's 0.335s, because the query-join merge
pass costs more than the ballast it evicts): the round is now ONE big
merge again, with the tag PACKED into the word limbs (L columns instead
of L+1 at K=25 — a third less traffic), pre-sorted per-stream words from
the PackedStream memo (a re-queried stream never re-sorts), 1/8-step
quantized capacities, the Pallas scan, and the flip merge frame.

1. e2e dynamic 8Mbp (target: >=10x local).
2. sharded-dynamic D=1 (target: within 2x of single-chip).
3. e2e static 32Mbp + genome 32Mbp (driver-comparable, default envs).
4. bench.py --mode algebra equivalent + largek, new merge floors.
5. MERGE L=2 packed-slog shapes sanity (2^24+2^21-ish round shapes).

Timing: scalar sync only; a probe includes ~28ms RPC.
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session22_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    import jax

    import bench

    t_start = time.time()
    log(f"=== session22 start; devices: {jax.devices()} ===")

    # ---- 1+2: dynamic ----
    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                               dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    log(f"1 baseline.cpp dynamic: {based}")
    try:
        ours = bench.run_tpu_dynamic(codes8, 3)
        assert ours["distinct"] == based["distinct"], (ours, based)
        assert ours["positive"] == based["positive"], (ours, based)
        ops_s = ours["ops"] / ours["total_s"]
        log(f"1 e2e dynamic (packed slog, 1-merge): {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"1 e2e dynamic FAILED: {type(e).__name__}: {str(e)[:400]}")
    try:
        ours = bench.run_tpu_sharded_dynamic(codes8, 2)
        assert ours["distinct"] == based["distinct"], (ours, based)
        assert ours["positive"] == based["positive"], (ours, based)
        ops_s = ours["ops"] / ours["total_s"]
        log(f"2 sharded-dynamic D=1: {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"2 sharded-dynamic FAILED: {type(e).__name__}: {str(e)[:400]}")
    del codes8
    gc.collect()

    # ---- 3: static + genome (exact driver shapes, default envs) ----
    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000,
                                                dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    try:
        ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        log(f"3 e2e static 32Mbp: combined "
            f"{ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s "
            f"vs_local {comb/base_comb:.2f}x")
    except Exception as e:
        log(f"3 static FAILED: {type(e).__name__}: {str(e)[:400]}")
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
        log(f"3 e2e genome: combined "
            f"{ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s "
            f"vs_local {comb/gbase_comb:.2f}x")
    except Exception as e:
        log(f"3 genome FAILED: {type(e).__name__}: {str(e)[:400]}")
    del ci, cq
    gc.collect()

    # ---- 4: algebra (exact bench-mode protocol) + largek ----
    try:
        from cbl_tpu import CBL

        codes16 = np.random.default_rng(0).integers(0, 4, size=16_000_000,
                                                    dtype=np.uint8)
        half = len(codes16) // 2
        a = CBL(k=25)
        a.insert_codes_stream(codes16[:half],
                              np.array([0, half], dtype=np.int64))
        b2 = CBL(k=25)
        b2.insert_codes_stream(codes16[half:],
                               np.array([0, half], dtype=np.int64))
        na, nb = a.count(), b2.count()
        for name, op in (("union", lambda: a | b2),
                         ("inter", lambda: a & b2),
                         ("diff", lambda: a - b2),
                         ("symdiff", lambda: a ^ b2)):
            ts = []
            for _ in range(3):
                t0 = time.time()
                c = op()
                c.count()
                ts.append(time.time() - t0)
            log(f"4 algebra {name} (2x{na/1e6:.1f}M): {min(ts)*1e3:.0f}ms")
        del a, b2, codes16
        gc.collect()
        codes4 = np.random.default_rng(2).integers(0, 4, size=4_000_000,
                                                   dtype=np.uint8)
        off4 = np.array([0, len(codes4)], dtype=np.int64)
        best = None
        for rep in range(3):
            idx = CBL(k=59, prefix_bits=28)
            t0 = time.time()
            idx.insert_codes_stream(codes4, off4)
            n59 = int(jax.device_get(idx.count_device()))
            t1 = time.time()
            tt, pp = idx.query_codes_stream(codes4, off4)
            t2 = time.time()
            assert pp == tt
            if best is None or (t2 - t0) < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
        log(f"4 K=59 4Mbp: combined {best[0]:.3f}s "
            f"(build {best[1]:.3f} query {best[2]:.3f}) n={n59}")
    except Exception as e:
        log(f"4 FAILED: {type(e).__name__}: {str(e)[:400]}")

    log(f"=== session22 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
