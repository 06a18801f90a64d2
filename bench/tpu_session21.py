#!/usr/bin/env python
"""TPU session 21: round-4 kernels — flipped-B merge frame, Pallas slog
scan, ballast-free dynamic rounds — measured on the real chip.

Sections (each guarded; envs pinned per section):
 1. flipb merge CORRECTNESS on-chip (mismatch count vs lax.sort oracle).
 2. merge pass A/B: inkernel-reversal vs flipb, L=2/3/4 shapes.
 3. full mergepath SORT A/B vs lax.sort (the round-3 0.81x loser).
 4. Pallas slog scan vs XLA cummax scan (hits+live, 2^24).
 5. e2e dynamic 8Mbp (new slog design; round-3 was 59.2M ops/s, 7.7x).
 6. e2e static 32Mbp + genome 32Mbp with best merge setting (and sort
    setting if 3 wins) — also pre-warms the driver's compile cache.
 7. sharded-dynamic D=1 + algebra + largek quick checks.

Timing: scalar sync only (CLAUDE.md); a probe includes ~28ms RPC.
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session21_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    import jax
    import jax.numpy as jnp

    t_start = time.time()
    log(f"=== session21 start; devices: {jax.devices()} ===")

    from cbl_tpu.ops.merge_pallas import merge_sorted_cols, sort_cols_mergepath

    rng = np.random.default_rng(0)

    def rand_sorted_cols(n, L, seed=0):
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

    # ---- 1. flipb merge correctness on chip ----
    flip_ok = True
    try:
        a = rand_sorted_cols(1 << 20, 3, 1)
        b = rand_sorted_cols(1 << 16, 3, 2)
        os.environ["CBL_TPU_MERGE_REV"] = "flip"

        @jax.jit
        def chk(a, b):
            m = merge_sorted_cols(a, b)
            cat = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))
            o = jax.lax.sort(cat, num_keys=3)
            bad = jnp.int32(0)
            for x, y in zip(m, o):
                bad = bad + jnp.sum((x != y).astype(jnp.int32))
            return bad

        bad = int(jax.device_get(chk(a, b)))
        log(f"1 flipb merge mismatches vs lax.sort (2^20+2^16 L=3): {bad}")
        flip_ok = bad == 0
    except Exception as e:
        flip_ok = False
        log(f"1 flipb merge FAILED: {type(e).__name__}: {str(e)[:300]}")
    if not flip_ok:
        os.environ["CBL_TPU_MERGE_REV"] = "inkernel"
        log("1 -> falling back to CBL_TPU_MERGE_REV=inkernel for session")

    # ---- 2. merge pass A/B ----
    for (na, nb, L) in ((1 << 25, 1 << 25, 2), (1 << 25, 1 << 21, 3),
                        (1 << 23, 1 << 23, 4)):
        try:
            a = rand_sorted_cols(na, L, 3)
            b = rand_sorted_cols(nb, L, 4)
            row = []
            for mode in ("inkernel", "flip") if flip_ok else ("inkernel",):
                os.environ["CBL_TPU_MERGE_REV"] = mode
                fn = jax.jit(
                    lambda a, b: sum(
                        jnp.sum(c.astype(jnp.uint32)) for c in
                        merge_sorted_cols(a, b)
                    )
                )
                fn(a, b)  # compile
                jax.device_get(fn(a, b))
                dt = timed(lambda: fn(a, b))
                row.append(f"{mode} {dt*1e3:.1f}ms")
            # lax oracle
            fo = jax.jit(
                lambda a, b: sum(
                    jnp.sum(c.astype(jnp.uint32)) for c in jax.lax.sort(
                        tuple(jnp.concatenate([x, y])
                              for x, y in zip(a, b)), num_keys=L)
                )
            )
            fo(a, b)
            dto = timed(lambda: fo(a, b))
            log(f"2 MERGE 2^{na.bit_length()-1}+2^{nb.bit_length()-1} "
                f"L={L}: {' | '.join(row)} | lax {dto*1e3:.1f}ms")
            del a, b
            gc.collect()
        except Exception as e:
            log(f"2 MERGE L={L} FAILED: {type(e).__name__}: {str(e)[:300]}")
    os.environ["CBL_TPU_MERGE_REV"] = "flip" if flip_ok else "inkernel"

    # ---- 3. full mergepath SORT A/B ----
    best_sort = "xla"
    try:
        for (n, L) in ((1 << 25, 2), (1 << 25, 3)):
            cols = tuple(
                jax.device_put(
                    np.random.default_rng(9).integers(
                        0, 1 << 32, size=n, dtype=np.uint32))
                for _ in range(L)
            )
            jax.device_get(cols[0][0])
            times = {}
            for mode in ("inkernel", "flip") if flip_ok else ("inkernel",):
                os.environ["CBL_TPU_MERGE_REV"] = mode
                fn = jax.jit(
                    lambda c: sum(
                        jnp.sum(x.astype(jnp.uint32))
                        for x in sort_cols_mergepath(c)
                    )
                )
                fn(cols)
                jax.device_get(fn(cols))
                times[mode] = timed(lambda: fn(cols))
            fo = jax.jit(
                lambda c: sum(
                    jnp.sum(x.astype(jnp.uint32))
                    for x in jax.lax.sort(c, num_keys=L)
                )
            )
            fo(cols)
            times["lax"] = timed(lambda: fo(cols))
            # correctness of the flip sort
            if flip_ok:
                os.environ["CBL_TPU_MERGE_REV"] = "flip"

                @jax.jit
                def chk2(c):
                    m = sort_cols_mergepath(c)
                    o = jax.lax.sort(c, num_keys=len(c))
                    bad = jnp.int32(0)
                    for x, y in zip(m, o):
                        bad = bad + jnp.sum((x != y).astype(jnp.int32))
                    return bad

                bad = int(jax.device_get(chk2(cols)))
            else:
                bad = -1
            log(f"3 SORT 2^{n.bit_length()-1} L={L}: "
                + " | ".join(f"{k} {v*1e3:.1f}ms" for k, v in times.items())
                + f" | flip-mismatch {bad}")
            if L == 2 and flip_ok and times.get("flip", 9) < times["lax"] \
                    and bad == 0:
                best_sort = "mergepath"
            del cols
            gc.collect()
    except Exception as e:
        log(f"3 SORT FAILED: {type(e).__name__}: {str(e)[:300]}")
    os.environ["CBL_TPU_MERGE_REV"] = "flip" if flip_ok else "inkernel"
    log(f"3 -> best sort for static: {best_sort}")

    # ---- 4. Pallas slog scan vs XLA ----
    scan_ok = True
    try:
        from cbl_tpu.ops.scan_pallas import slog_scan_counts_pallas
        from cbl_tpu.wordset import _slog_scan

        n = 1 << 24
        r = np.random.default_rng(5)
        w = np.sort(r.integers(0, 1 << 40, size=n).astype(np.uint64))
        c0 = (w >> 32).astype(np.uint32)
        c1 = (w & 0xFFFFFFFF).astype(np.uint32)
        tags = ((r.integers(0, 8, size=n).astype(np.uint32)) << 2) | \
            r.integers(1, 4, size=n).astype(np.uint32)
        order = np.lexsort((tags, c1, c0))
        cols = tuple(jax.device_put(x[order].copy())
                     for x in (c0, c1, tags))
        jax.device_get(cols[0][0])
        qt = np.uint32((3 << 2) | 2)

        fpal = jax.jit(
            lambda c: slog_scan_counts_pallas(c, jnp.uint32(qt))
        )

        @jax.jit
        def fxla(c):
            neq, sent, live = _slog_scan(c, 2)
            hit = (c[2] == qt) & ~sent & live
            run_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
            return (jnp.sum(hit.astype(jnp.int32)),
                    jnp.sum((run_end & ~sent & live).astype(jnp.int32)))

        hp = jax.device_get(fpal(cols))
        hx = jax.device_get(fxla(cols))
        ok = tuple(int(x) for x in hp) == tuple(int(x) for x in hx)
        tp = timed(lambda: fpal(cols)[0])
        tx = timed(lambda: fxla(cols)[0])
        log(f"4 SCAN 2^24 L=2: pallas {tp*1e3:.1f}ms | xla {tx*1e3:.1f}ms "
            f"| equal {ok} ({tuple(int(x) for x in hp)})")
        scan_ok = ok
        del cols
        gc.collect()
    except Exception as e:
        scan_ok = False
        log(f"4 SCAN FAILED: {type(e).__name__}: {str(e)[:300]}")
    if not scan_ok:
        os.environ["CBL_TPU_SLOG_SCAN"] = "xla"
        log("4 -> falling back to CBL_TPU_SLOG_SCAN=xla")

    # ---- 5. e2e dynamic 8Mbp ----
    import bench

    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                               dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    log(f"5 baseline.cpp dynamic: {based}")
    try:
        ours = bench.run_tpu_dynamic(codes8, 3)
        assert ours["distinct"] == based["distinct"], (ours, based)
        assert ours["positive"] == based["positive"], (ours, based)
        ops_s = ours["ops"] / ours["total_s"]
        log(f"5 e2e dynamic (ballast-free slog): {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"5 e2e dynamic FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- 7a. sharded-dynamic D=1 (same codes) ----
    try:
        ours = bench.run_tpu_sharded_dynamic(codes8, 2)
        assert ours["distinct"] == based["distinct"], (ours, based)
        assert ours["positive"] == based["positive"], (ours, based)
        ops_s = ours["ops"] / ours["total_s"]
        log(f"7a sharded-dynamic D=1: {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"7a sharded-dynamic FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes8
    gc.collect()

    # ---- 6. static + genome with best settings ----
    codes32 = np.random.default_rng(0).integers(0, 4, size=32_000_000,
                                                dtype=np.uint8)
    base = bench.run_baseline(codes32)
    nk = 32_000_000 - 24
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    for sort_mode in ["xla"] + (["mergepath"] if best_sort == "mergepath"
                                else []):
        try:
            os.environ["CBL_TPU_SORT"] = sort_mode
            ours = bench.run_tpu(codes32, 1 << 19, 1 << 21, 3)
            assert ours["distinct"] == base["distinct"]
            comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
            log(f"6 e2e static 32Mbp (sort={sort_mode}): combined "
                f"{ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s "
                f"vs_local {comb/base_comb:.2f}x")
        except Exception as e:
            log(f"6 static sort={sort_mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    del codes32
    gc.collect()

    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    gbase = bench.run_baseline_records(ci, oi, cq, oq)
    gnk = gbase["n_kmers_insert"] + gbase["n_kmers_query"]
    gbase_comb = gnk / (gbase["insert_s"] + gbase["query_s"])
    for sort_mode in ["xla"] + (["mergepath"] if best_sort == "mergepath"
                                else []):
        try:
            os.environ["CBL_TPU_SORT"] = sort_mode
            ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 3)
            assert ours["distinct"] == gbase["distinct"]
            assert ours["positive"] == gbase["positive"]
            comb = gnk / (ours["insert_s"] + ours["query_s"])
            log(f"6 e2e genome (sort={sort_mode}): combined "
                f"{ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s "
                f"vs_local {comb/gbase_comb:.2f}x")
        except Exception as e:
            log(f"6 genome sort={sort_mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    del ci, cq
    gc.collect()
    os.environ["CBL_TPU_SORT"] = "xla"

    # ---- 7b. algebra + largek quick ----
    try:
        from cbl_tpu import CBL

        codes16 = np.random.default_rng(1).integers(0, 4, size=16_000_000,
                                                    dtype=np.uint8)
        half = len(codes16) // 2
        a = CBL(k=25)
        a.insert_codes_stream(codes16[:half],
                              np.array([0, half], dtype=np.int64))
        b2 = CBL(k=25)
        b2.insert_codes_stream(codes16[half:],
                               np.array([0, half], dtype=np.int64))
        int(jax.device_get(a.count_device()))
        int(jax.device_get(b2.count_device()))
        for name, op in (("union", lambda: a | b2),
                         ("inter", lambda: a & b2),
                         ("diff", lambda: a - b2),
                         ("symdiff", lambda: a ^ b2)):
            op()  # warm
            t0 = time.time()
            c = op()
            int(jax.device_get(c.count_device()))
            log(f"7b algebra {name}: {(time.time()-t0)*1e3:.0f}ms")
        del a, b2, codes16
        gc.collect()
        codes4 = np.random.default_rng(2).integers(0, 4, size=4_000_000,
                                                   dtype=np.uint8)
        off4 = np.array([0, len(codes4)], dtype=np.int64)
        for rep in range(2):
            idx = CBL(k=59, prefix_bits=28)
            t0 = time.time()
            idx.insert_codes_stream(codes4, off4)
            n59 = int(jax.device_get(idx.count_device()))
            t1 = time.time()
            tt, pp = idx.query_codes_stream(codes4, off4)
            t2 = time.time()
            log(f"7b K=59 rep{rep}: build {t1-t0:.3f}s query {t2-t1:.3f}s "
                f"n={n59} pos={pp}/{tt}")
    except Exception as e:
        log(f"7b FAILED: {type(e).__name__}: {str(e)[:300]}")

    log(f"=== session21 done in {(time.time()-t_start)/60:.1f} min; "
        f"flip_ok={flip_ok} scan_ok={scan_ok} best_sort={best_sort} ===")


if __name__ == "__main__":
    main()
