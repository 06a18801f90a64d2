#!/usr/bin/env python
"""TPU session 14: merge-path (co-rank) Pallas kernels on-chip + dynamic
profile.

1. Correctness on the real chip: merge_sorted_cols + sort_cols_mergepath
   vs lax.sort (small/medium, L=1/2/3, skewed sides, heavy duplicates).
   Falls back to CBL_TPU_DYNROLL=matmul if the dynamic pltpu.roll fails.
2. Sort microbench: lax.sort vs sort_cols_mergepath, t_log sweep, at
   2^22/2^25/2^26 L=2 and 2^25 L=3.
3. Merge microbench (the insert/query-join shapes): lax.sort(concat) vs
   bitonic merge_cols_pallas vs merge-path merge_sorted_cols at
   (2^25+2^25) and (2^25+2^19), L=2.
4. Dynamic-mode profile (VERDICT r2 weak #1): per-op scalar-sync timings
   of one warm interleaved round to attribute the 1.2s.
5. e2e: bench.py static 32Mbp + dynamic 8Mbp under CBL_TPU_SORT/
   CBL_TPU_MERGE_KERNEL = xla then mergepath, counts cross-checked
   against baseline.cpp.

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

LOG = open(os.path.join(REPO, "bench", "session14_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def sync(out):
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


def rand_cols(n_log, L, seed=0, hi=1 << 32):
    import jax

    rng = np.random.default_rng(seed)
    cols = tuple(
        jax.device_put(
            rng.integers(0, hi, size=1 << n_log, dtype=np.uint64)
            .astype(np.uint32)
        )
        for _ in range(L)
    )
    jax.block_until_ready(cols)
    return cols


def sorted_cols_np(n, seed, L=2, hi=1 << 32):
    rng = np.random.default_rng(seed)
    cols = [rng.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)
            for _ in range(L)]
    order = np.lexsort(tuple(cols[::-1]))
    return tuple(c[order] for c in cols)


def correctness():
    import jax

    from cbl_tpu.ops import merge_pallas

    ok = True
    # merge: small, skewed, duplicate-heavy
    for na_log, nb_log, L, hi, t_log in (
        (16, 16, 2, 1 << 32, 13),
        (20, 14, 2, 1 << 32, 13),
        (18, 18, 3, 64, 13),
        (16, 16, 1, 1 << 32, 13),
    ):
        ca = sorted_cols_np(1 << na_log, na_log + L, L=L, hi=hi)
        cb = sorted_cols_np(1 << nb_log, nb_log + 7 * L, L=L, hi=hi)
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
            if not isinstance(want, tuple):
                want = (want,)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
            log(f"1 merge correctness 2^{na_log}+2^{nb_log} L={L} "
                f"hi={hi}: OK")
        except Exception as e:
            ok = False
            log(f"1 merge 2^{na_log}+2^{nb_log} L={L} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    # sort
    for n_log, L, t_log in ((16, 2, 12), (20, 2, 13), (18, 3, 12)):
        cols = rand_cols(n_log, L, seed=n_log * L)
        try:
            got = merge_pallas.sort_cols_mergepath(cols, t_log=t_log)
            want = jax.lax.sort(cols, num_keys=L)
            if not isinstance(want, tuple):
                want = (want,)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
            log(f"1 sort correctness 2^{n_log} L={L} t={t_log}: OK")
        except Exception as e:
            ok = False
            log(f"1 sort 2^{n_log} L={L} t={t_log} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    return ok


def micro_sort():
    import jax

    from cbl_tpu.ops import merge_pallas

    results = {}
    for n_log, L in ((22, 2), (25, 2), (25, 3), (26, 2)):
        cols = rand_cols(n_log, L, seed=L)
        lax_fn = jax.jit(lambda c: jax.lax.sort(c, num_keys=len(c)))
        best_lax = solo(f"lax.sort 2^{n_log} L={L}", lambda: lax_fn(cols))
        for t_log in (12, 13, 14, 15):
            try:
                fn = jax.jit(
                    lambda c, t=t_log: merge_pallas.sort_cols_mergepath(
                        c, t_log=t
                    )
                )
                best = solo(
                    f"mergepath-sort 2^{n_log} L={L} t={t_log}",
                    lambda: fn(cols),
                )
                results[(n_log, L, t_log)] = best
                log(f"2 RESULT sort 2^{n_log} L={L} t={t_log}: "
                    f"{best*1e3:.1f}ms vs lax {best_lax*1e3:.1f}ms "
                    f"({best_lax/best:.2f}x)")
            except Exception as e:
                log(f"2 sort 2^{n_log} L={L} t={t_log} FAILED: "
                    f"{type(e).__name__}: {str(e)[:200]}")
        del cols
        gc.collect()
    return results


def micro_merge():
    import jax
    import jax.numpy as jnp

    from cbl_tpu.ops import merge_pallas, sort_pallas

    for na_log, nb_log, L in ((25, 25, 2), (25, 19, 2), (25, 25, 3)):
        ca = sorted_cols_np(1 << na_log, 1, L=L)
        cb = sorted_cols_np(1 << nb_log, 2, L=L)
        da = tuple(jax.device_put(c) for c in ca)
        db = tuple(jax.device_put(c) for c in cb)
        jax.block_until_ready(da + db)
        cat_fn = jax.jit(
            lambda a, b: jax.lax.sort(
                tuple(jnp.concatenate([x, y]) for x, y in zip(a, b)),
                num_keys=L,
            )
        )
        t_cat = solo(f"lax.sort(concat) 2^{na_log}+2^{nb_log} L={L}",
                     lambda: cat_fn(da, db))
        for t_log in (13, 14, 15):
            try:
                mp_fn = jax.jit(
                    lambda a, b, t=t_log: merge_pallas.merge_sorted_cols(
                        a, b, t_log=t
                    )
                )
                t_mp = solo(
                    f"mergepath-merge 2^{na_log}+2^{nb_log} L={L} t={t_log}",
                    lambda: mp_fn(da, db),
                )
                log(f"3 RESULT merge 2^{na_log}+2^{nb_log} L={L} t={t_log}: "
                    f"mergepath {t_mp*1e3:.1f}ms vs concat-sort "
                    f"{t_cat*1e3:.1f}ms ({t_cat/t_mp:.2f}x)")
            except Exception as e:
                log(f"3 mergepath 2^{na_log}+2^{nb_log} t={t_log} FAILED: "
                    f"{type(e).__name__}: {str(e)[:200]}")
        try:
            bi_fn = jax.jit(
                lambda a, b: sort_pallas.merge_cols_pallas(a, b, t_log=15)
            )
            t_bi = solo(
                f"bitonic-merge 2^{na_log}+2^{nb_log} L={L}",
                lambda: bi_fn(da, db),
            )
            log(f"3 RESULT bitonic 2^{na_log}+2^{nb_log} L={L}: "
                f"{t_bi*1e3:.1f}ms vs concat-sort {t_cat*1e3:.1f}ms "
                f"({t_cat/t_bi:.2f}x)")
        except Exception as e:
            log(f"3 bitonic 2^{na_log}+2^{nb_log} FAILED: "
                f"{type(e).__name__}: {str(e)[:200]}")
        del da, db
        gc.collect()


def dynamic_profile():
    """One warm interleaved round with a scalar sync after every op, to
    attribute bench.py --mode dynamic's warm 1.2s (8 rounds)."""
    import jax

    from cbl_tpu import CBL

    k = 25
    bases = 8_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    SEGS = 8
    sb = bases // SEGS
    off1 = np.array([0, sb], dtype=np.int64)
    off_h = np.array([0, sb // 2], dtype=np.int64)

    for rep in range(2):  # rep0 = compile, rep1 = warm attribution
        idx = CBL(k=k)
        segs = [idx.pack_stream(codes[i * sb:(i + 1) * sb], off1)
                for i in range(SEGS)]
        halves = [idx.pack_stream(codes[i * sb:i * sb + sb // 2], off_h)
                  for i in range(SEGS)]
        jax.block_until_ready([s[1] for ps in segs for s in ps.slabs])
        t_round = time.time()
        tI = tQ = tR = 0.0
        for i in range(SEGS):
            t0 = time.time()
            idx.insert_codes_stream(segs[i])
            _ = idx.count()  # sync
            tI += time.time() - t0
            t0 = time.time()
            t, p = idx.query_codes_stream(segs[i - 1 if i else 0], lazy=True)
            sync(p)
            tQ += time.time() - t0
            t0 = time.time()
            idx.remove_codes_stream(halves[i])
            _ = idx.count()  # sync
            tR += time.time() - t0
        total = time.time() - t_round
        log(f"4 dynamic rep{rep}: insert {tI:.3f}s query {tQ:.3f}s "
            f"remove {tR:.3f}s total(synced) {total:.3f}s")
    # and one un-instrumented warm pass (bench.py shape: lazy query scalars
    # summed on device, one final count) for the true wall clock
    idx = CBL(k=k)
    segs = [idx.pack_stream(codes[i * sb:(i + 1) * sb], off1)
            for i in range(SEGS)]
    halves = [idx.pack_stream(codes[i * sb:i * sb + sb // 2], off_h)
              for i in range(SEGS)]
    jax.block_until_ready([s[1] for ps in segs for s in ps.slabs])
    t0 = time.time()
    pos = None
    for i in range(SEGS):
        idx.insert_codes_stream(segs[i])
        t, p = idx.query_codes_stream(segs[i - 1 if i else 0], lazy=True)
        pos = p if pos is None else pos + p
        idx.remove_codes_stream(halves[i])
    n = idx.count()
    positive = int(pos)
    log(f"4 dynamic warm uninstrumented: {time.time()-t0:.3f}s "
        f"(distinct={n} positive={positive})")


def e2e():
    import jax

    import bench

    bases = 32_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    base = bench.run_baseline(codes)
    log(f"5 baseline.cpp static: ins {base['insert_s']:.3f}s qry "
        f"{base['query_s']:.3f}s distinct={base['distinct']}")
    nk = bases - 24
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    for mode in ("xla", "mergepath"):
        os.environ["CBL_TPU_SORT"] = mode
        os.environ["CBL_TPU_MERGE_KERNEL"] = mode
        jax.clear_caches()
        gc.collect()
        try:
            ours = bench.run_tpu(codes, 1 << 19, 1 << 21, 2)
            assert ours["distinct"] == base["distinct"], (
                mode, ours["distinct"], base["distinct"])
            comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
            log(f"5 e2e static 32Mbp mode={mode}: ins {ours['insert_s']:.3f}s"
                f" qry {ours['query_s']:.3f}s combined {comb/1e6:.1f}M/s "
                f"vs_local {comb/base_comb:.2f}x")
        except Exception as e:
            log(f"5 e2e static mode={mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    # dynamic
    codes8 = codes[:8_000_000]
    based = bench.run_baseline_dynamic(codes8)
    log(f"5 baseline.cpp dynamic: {based}")
    for mode in ("xla", "mergepath"):
        os.environ["CBL_TPU_SORT"] = mode
        os.environ["CBL_TPU_MERGE_KERNEL"] = mode
        jax.clear_caches()
        gc.collect()
        try:
            ours = bench.run_tpu_dynamic(codes8, 2)
            assert ours["distinct"] == based["distinct"]
            assert ours["positive"] == based["positive"]
            ops_s = ours["ops"] / ours["total_s"]
            log(f"5 e2e dynamic 8Mbp mode={mode}: {ours['total_s']:.3f}s "
                f"{ops_s/1e6:.1f}M ops/s vs_local "
                f"{ops_s/based['ops_per_s']:.2f}x")
        except Exception as e:
            log(f"5 e2e dynamic mode={mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    os.environ.pop("CBL_TPU_SORT", None)
    os.environ.pop("CBL_TPU_MERGE_KERNEL", None)


def main():
    import jax

    t_start = time.time()
    log(f"=== session14 start; devices: {jax.devices()} ===")
    ok = correctness()
    if not ok and os.environ.get("CBL_TPU_DYNROLL", "roll") == "roll":
        log("=== retrying correctness with CBL_TPU_DYNROLL=matmul ===")
        os.environ["CBL_TPU_DYNROLL"] = "matmul"
        jax.clear_caches()
        ok = correctness()
    if ok:
        micro_sort()
        micro_merge()
    else:
        log("=== kernels incorrect on-chip; skipping micro benches ===")
    dynamic_profile()
    e2e()
    log(f"=== session14 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
