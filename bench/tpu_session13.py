#!/usr/bin/env python
"""TPU session 13: Pallas bitonic sort on-chip.

1. Correctness on the real chip (vs lax.sort, small + medium sizes).
2. Sort microbench: lax.sort vs pallas at 2^22/2^25, L=2/3, tile sweep.
3. Pass-level timings (tilesort / cross / intile) to localize cost.
4. e2e bench: static 32Mbp with CBL_TPU_SORT=xla then =pallas (cache-cleared
   between), cross-checked against baseline.cpp counts.

Timing: scalar sync (int of one element) — block_until_ready does NOT
reliably block on axon for large outputs (see CLAUDE.md).
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session13_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def sync(out):
    """Scalar sync barrier: force one element to host."""
    import jax

    x = out[0] if isinstance(out, (tuple, list)) else out
    return int(jax.device_get(x.reshape(-1)[0]))


def solo(label, fn, reps=3):
    times = []
    for r in range(reps):
        t0 = time.time()
        out = fn()
        sync(out)
        dt = time.time() - t0
        times.append(dt)
        log(f"  {label} rep{r}: {dt*1e3:.1f}ms")
    return min(times)


def rand_cols(n_log, L, seed=0):
    import jax

    rng = np.random.default_rng(seed)
    cols = tuple(
        jax.device_put(
            rng.integers(0, 1 << 32, size=1 << n_log, dtype=np.uint64)
            .astype(np.uint32)
        )
        for _ in range(L)
    )
    jax.block_until_ready(cols)
    return cols


def correctness():
    import jax
    import jax.numpy as jnp

    from cbl_tpu.ops import sort_pallas

    for n_log, L, t_log in ((13, 2, 10), (20, 2, 17), (20, 3, 16)):
        cols = rand_cols(n_log, L, seed=n_log + L)
        want = jax.lax.sort(cols, num_keys=L)
        got = sort_pallas.sort_cols_pallas(cols, t_log=t_log)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        log(f"1 correctness n=2^{n_log} L={L} t={t_log}: OK")


def micro():
    import jax

    from cbl_tpu.ops import sort_pallas

    for n_log, L in ((22, 2), (25, 2), (25, 3)):
        cols = rand_cols(n_log, L, seed=L)
        lax_fn = jax.jit(lambda c: jax.lax.sort(c, num_keys=len(c)))
        best_lax = solo(f"lax.sort 2^{n_log} L={L}", lambda: lax_fn(cols))
        for t_log in (16, 17, 18):
            if t_log > n_log:
                continue
            try:
                pal_fn = jax.jit(
                    lambda c, t=t_log: sort_pallas.sort_cols_pallas(c, t_log=t)
                )
                best = solo(
                    f"pallas 2^{n_log} L={L} t={t_log}",
                    lambda: pal_fn(cols),
                )
                log(f"2 RESULT 2^{n_log} L={L} t={t_log}: pallas {best*1e3:.1f}ms"
                    f" vs lax {best_lax*1e3:.1f}ms ({best_lax/best:.2f}x)")
            except Exception as e:
                log(f"2 pallas 2^{n_log} L={L} t={t_log} FAILED: "
                    f"{type(e).__name__}: {str(e)[:200]}")
        del cols
        gc.collect()


def passes():
    import jax

    from cbl_tpu.ops import sort_pallas as sp

    n_log, L, t_log = 25, 2, 18
    cols = rand_cols(n_log, L, seed=9)
    cols2d = tuple(c.reshape(-1, 128) for c in cols)
    dts = tuple(c.dtype for c in cols)
    try:
        tile = jax.jit(lambda c: sp._tilesort_call(dts, t_log, False)(c))
        solo("pass tilesort t=18", lambda: tile(cols2d))
        cross = jax.jit(
            lambda c: sp._cross_call(dts, t_log, False)(c, 8, 7)
        )
        solo("pass cross jt=8 (stride 2^21)", lambda: cross(cols2d))
        intile = jax.jit(lambda c: sp._intile_call(dts, t_log, False)(c, 7))
        solo("pass intile d=7", lambda: intile(cols2d))
    except Exception as e:
        log(f"3 passes FAILED: {type(e).__name__}: {str(e)[:200]}")
    del cols, cols2d
    gc.collect()


def e2e():
    import jax

    import bench

    bases = 32_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases, dtype=np.uint8)
    base = bench.run_baseline(codes)
    log(f"4 baseline.cpp: ins {base['insert_s']:.3f}s qry "
        f"{base['query_s']:.3f}s distinct={base['distinct']}")
    nk = bases - 24
    for mode in ("xla", "pallas"):
        os.environ["CBL_TPU_SORT"] = mode
        jax.clear_caches()
        gc.collect()
        ours = bench.run_tpu(codes, 1 << 19, 1 << 21, 2)
        assert ours["distinct"] == base["distinct"], (mode, ours["distinct"])
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
        log(f"4 e2e 32Mbp mode={mode}: ins {ours['insert_s']:.3f}s qry "
            f"{ours['query_s']:.3f}s combined {comb/1e6:.1f}M/s "
            f"vs_local {comb/base_comb:.2f}x")


def main():
    import jax

    log(f"=== session13 start; devices: {jax.devices()} ===")
    for name, fn in (
        ("1 correctness", correctness),
        ("2 micro", micro),
        ("3 passes", passes),
        ("4 e2e", e2e),
    ):
        t0 = time.time()
        try:
            fn()
        except Exception as e:
            import traceback

            log(f"{name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
        gc.collect()
        log(f"-- {name} done in {time.time()-t0:.1f}s --")
    log("=== session13 done ===")


if __name__ == "__main__":
    main()
