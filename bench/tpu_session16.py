#!/usr/bin/env python
"""TPU session 16: final round-3 configuration end-to-end.

Session15 measured: merge-path MERGE pass 4.7-5.5x faster than
lax.sort(concat); merge-path SORT slower than lax.sort.  Defaults are now
CBL_TPU_SORT=xla + CBL_TPU_MERGE_KERNEL=mergepath (t_log 15).  This
session validates that exact configuration end-to-end:

1. L=4 (K=59) merge correctness at t=15 on chip (widest limb config).
2. e2e static 32Mbp + 64Mbp: xla/xla vs xla/mergepath.
3. e2e dynamic 8Mbp (fused dynamic_round): xla/xla vs xla/mergepath.
4. e2e genome 32Mbp: xla/mergepath.
5. largek (K=59 4Mbp) build+query under the new default.

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

LOG = open(os.path.join(REPO, "bench", "session16_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def set_mode(sort_mode, merge_mode):
    import jax

    os.environ["CBL_TPU_SORT"] = sort_mode
    os.environ["CBL_TPU_MERGE_KERNEL"] = merge_mode
    jax.clear_caches()
    gc.collect()


def correctness_l4():
    import jax

    from cbl_tpu.ops import merge_pallas

    rng = np.random.default_rng(5)

    def sorted_cols(n, seed, L):
        r = np.random.default_rng(seed)
        cols = [r.integers(0, 1 << 32, size=n, dtype=np.uint64)
                .astype(np.uint32) for _ in range(L)]
        order = np.lexsort(tuple(cols[::-1]))
        return tuple(c[order] for c in cols)

    ok = True
    for L, t_log in ((4, 15), (5, 13), (5, 14)):
        ca = sorted_cols(1 << 17, 1 + L, L)
        cb = sorted_cols(1 << 15, 2 + L, L)
        try:
            got = merge_pallas.merge_sorted_cols(
                tuple(jax.device_put(c) for c in ca),
                tuple(jax.device_put(c) for c in cb),
                t_log=t_log,
            )
            want = jax.lax.sort(
                tuple(np.concatenate([x, y]) for x, y in zip(ca, cb)),
                num_keys=L,
            )
            for g, w in zip(got, want):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
            log(f"1 merge correctness L={L} t={t_log}: OK")
        except Exception as e:
            ok = False
            log(f"1 merge L={L} t={t_log} FAILED: {type(e).__name__}: "
                f"{str(e)[:300]}")
    return ok


def e2e_static():
    import bench

    for bases in (32_000_000, 64_000_000):
        codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                                  dtype=np.uint8)
        base = bench.run_baseline(codes)
        nk = bases - 24
        base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
        log(f"2 baseline.cpp {bases//10**6}Mbp: ins {base['insert_s']:.3f}s "
            f"qry {base['query_s']:.3f}s")
        for merge_mode in ("xla", "mergepath"):
            set_mode("xla", merge_mode)
            try:
                ours = bench.run_tpu(codes, 1 << 19, 1 << 21, 2)
                assert ours["distinct"] == base["distinct"]
                comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
                log(f"2 e2e static {bases//10**6}Mbp merge={merge_mode}: "
                    f"ins {ours['insert_s']:.3f}s qry {ours['query_s']:.3f}s"
                    f" combined {comb/1e6:.1f}M/s vs_local "
                    f"{comb/base_comb:.2f}x")
            except Exception as e:
                log(f"2 e2e static {bases//10**6}Mbp merge={merge_mode} "
                    f"FAILED: {type(e).__name__}: {str(e)[:300]}")
        del codes
        gc.collect()


def e2e_dynamic():
    import bench

    codes = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                              dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes)
    log(f"3 baseline.cpp dynamic: {based}")
    for merge_mode in ("xla", "mergepath"):
        set_mode("xla", merge_mode)
        try:
            ours = bench.run_tpu_dynamic(codes, 3)
            assert ours["distinct"] == based["distinct"]
            assert ours["positive"] == based["positive"]
            ops_s = ours["ops"] / ours["total_s"]
            log(f"3 e2e dynamic merge={merge_mode}: {ours['total_s']:.3f}s "
                f"{ops_s/1e6:.1f}M ops/s vs_local "
                f"{ops_s/based['ops_per_s']:.2f}x")
        except Exception as e:
            log(f"3 e2e dynamic merge={merge_mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")


def e2e_genome():
    import bench

    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    base = bench.run_baseline_records(ci, oi, cq, oq)
    log(f"4 baseline.cpp genome: {base}")
    nk = base["n_kmers_insert"] + base["n_kmers_query"]
    base_comb = nk / (base["insert_s"] + base["query_s"])
    for merge_mode in ("xla", "mergepath"):
        set_mode("xla", merge_mode)
        try:
            ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 2)
            assert ours["distinct"] == base["distinct"]
            assert ours["positive"] == base["positive"]
            comb = nk / (ours["insert_s"] + ours["query_s"])
            log(f"4 e2e genome merge={merge_mode}: ins "
                f"{ours['insert_s']:.3f}s qry {ours['query_s']:.3f}s "
                f"combined {comb/1e6:.1f}M/s vs_local "
                f"{comb/base_comb:.2f}x")
        except Exception as e:
            log(f"4 e2e genome merge={merge_mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")


def e2e_largek():
    import time as _t

    from cbl_tpu import CBL

    set_mode("xla", "mergepath")
    bases = 4_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 58
    try:
        for rep in range(2):
            idx = CBL(k=59, prefix_bits=28)
            t0 = _t.time()
            idx.insert_codes_stream(codes, offsets)
            n = idx.count()
            t1 = _t.time()
            total, pos = idx.query_codes_stream(codes, offsets)
            t2 = _t.time()
            assert pos == total == nk
            log(f"5 K=59 rep{rep}: build {t1-t0:.3f}s ({nk/(t1-t0)/1e6:.1f}"
                f"M/s) query {t2-t1:.3f}s ({nk/(t2-t1)/1e6:.1f}M/s) n={n}")
    except Exception as e:
        log(f"5 K=59 FAILED: {type(e).__name__}: {str(e)[:300]}")


def main():
    import jax

    t_start = time.time()
    log(f"=== session16 start; devices: {jax.devices()} ===")
    correctness_l4()  # informational: wide-L compile coverage
    e2e_static()
    e2e_dynamic()
    e2e_genome()
    e2e_largek()
    log(f"=== session16 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
