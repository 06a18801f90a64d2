#!/usr/bin/env python
"""TPU session 24: merge-kernel micro A/Bs + 64Mbp scale re-check.

1. MERGE 2^25+2^25 L=2 under CBL_TPU_SEL=mask vs =where (the bitmask
   select exists for a round-1 Mosaic i1-truncation bug; if current
   Mosaic takes the native predicated select, every cmpex stage drops
   ~9 elementwise ops) and under CBL_TPU_MERGE_TLOG=16 (untried for the
   merge kernel; 15 was the round-3 winner among 13/14/15).
2. Whatever wins: correctness vs lax oracle on chip, then re-measure
   static 32Mbp + dynamic 8Mbp with the winning settings.
3. static 64Mbp (2 fused slabs) — BASELINE scale row refresh.
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session24_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def clear_kernel_caches():
    from cbl_tpu.ops import merge_pallas as mp
    from cbl_tpu.ops import sort_pallas as sp

    mp._merge_call.cache_clear()
    sp._tilesort_call.cache_clear()
    sp._cross_call.cache_clear()
    sp._intile_call.cache_clear()


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from cbl_tpu.ops.merge_pallas import merge_sorted_cols

    t_start = time.time()
    log(f"=== session24 start; devices: {jax.devices()} ===")

    def rand_sorted_cols(n, L, seed):
        r = np.random.default_rng(seed)
        cols = tuple(
            jax.device_put(r.integers(0, 1 << 32, size=n, dtype=np.uint32))
            for _ in range(L)
        )
        out = jax.lax.sort(cols, num_keys=L)
        jax.device_get(out[0][0])
        return out

    def timed(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            s = fn()
            jax.device_get(s)
            ts.append(time.time() - t0)
        return min(ts)

    a = rand_sorted_cols(1 << 25, 2, 1)
    b = rand_sorted_cols(1 << 25, 2, 2)
    results = {}
    for sel in ("mask", "where"):
        for tlog in (15, 16):
            key = f"sel={sel},t={tlog}"
            try:
                os.environ["CBL_TPU_SEL"] = sel
                os.environ["CBL_TPU_MERGE_TLOG"] = str(tlog)
                clear_kernel_caches()

                @jax.jit
                def chk(a, b):
                    m = merge_sorted_cols(a, b)
                    cat = tuple(jnp.concatenate([x, y])
                                for x, y in zip(a, b))
                    o = jax.lax.sort(cat, num_keys=2)
                    bad = jnp.int32(0)
                    s = jnp.uint32(0)
                    for x, y in zip(m, o):
                        bad = bad + jnp.sum((x != y).astype(jnp.int32))
                        s = s + jnp.sum(x)
                    return bad, s

                bad = int(jax.device_get(chk(a, b)[0]))
                fn = jax.jit(
                    lambda a, b: sum(jnp.sum(c) for c in
                                     merge_sorted_cols(a, b))
                )
                fn(a, b)
                jax.device_get(fn(a, b))
                dt = timed(lambda: fn(a, b))
                results[key] = (dt, bad)
                log(f"1 MERGE 2^25+2^25 L=2 [{key}]: {dt*1e3:.1f}ms "
                    f"mismatch={bad}")
            except Exception as e:
                results[key] = (9e9, -1)
                log(f"1 [{key}] FAILED: {type(e).__name__}: {str(e)[:200]}")
    del a, b
    gc.collect()
    good = {k: v for k, v in results.items() if v[1] == 0}
    best = min(good, key=lambda k: good[k][0]) if good else "sel=mask,t=15"
    sel_best, t_best = best.replace("sel=", "").replace("t=", "").split(",")
    log(f"1 -> best merge config: {best}")
    os.environ["CBL_TPU_SEL"] = sel_best
    os.environ["CBL_TPU_MERGE_TLOG"] = t_best
    clear_kernel_caches()

    # ---- 2: re-measure static + dynamic with the winner ----
    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000,
                                                dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    try:
        ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        log(f"2 static 32Mbp [{best}]: {ours['insert_s']+ours['query_s']:.3f}s "
            f"{comb/1e6:.1f}M/s vs_local {comb/base_comb:.2f}x")
    except Exception as e:
        log(f"2 static FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes32
    gc.collect()

    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                               dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    try:
        ours = bench.run_tpu_dynamic(codes8, 3)
        assert ours["distinct"] == based["distinct"]
        assert ours["positive"] == based["positive"]
        ops_s = ours["ops"] / ours["total_s"]
        log(f"2 dynamic 8Mbp [{best}]: {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"2 dynamic FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes8
    gc.collect()

    # ---- 3: 64Mbp static scale row ----
    try:
        codes64 = np.random.default_rng(1).integers(0, 4, size=64_000_000,
                                                    dtype=np.uint8)
        base64 = bench.run_baseline(codes64)
        nk64 = 64_000_000 - 24
        b64 = 2 * nk64 / (base64["insert_s"] + base64["query_s"])
        ours = bench.run_tpu(codes64, 1 << 19, 1 << 21, 2)
        assert ours["distinct"] == base64["distinct"]
        comb = 2 * nk64 / (ours["insert_s"] + ours["query_s"])
        log(f"3 static 64Mbp: {ours['insert_s']+ours['query_s']:.3f}s "
            f"{comb/1e6:.1f}M/s vs_local {comb/b64:.2f}x")
    except Exception as e:
        log(f"3 64Mbp FAILED: {type(e).__name__}: {str(e)[:300]}")

    log(f"=== session24 done in {(time.time()-t_start)/60:.1f} min; "
        f"best={best} ===")


if __name__ == "__main__":
    main()
