#!/usr/bin/env python
"""TPU session 19: sharded-insert phase attribution + dynamic-round
component probes.

Session18 measured sharded 1-dev-mesh insert at 0.572s vs 0.131s
single-device (4.39x; target <=1.5x) while sharded QUERY is 1.08x — so
the overhead is insert-specific, not the shared pack/transfer path.
Since then: empty-index groups adopt the sorted bucket with no merge
pass, and the per-group bucket-overflow sync is deferred to one check
per stream.

1. Sharded 1-dev mesh 8Mbp insert, phase-timed: host group
   materialization / device transfer / capacity / step+sync; then the
   pre-staged variant (groups+transfers before the timer — the exact
   protocol of the single-device number it is compared against).
2. 8-Mbp single-device reference on the same box/run.
3. static 64Mbp re-measure (slab-2 sorted-batch insert landed after
   session18's launch).
4. Dynamic-round component probes at round-8 sizes (solo, scalar-sync):
   batch sort 2.62M x 3 cols, merge pass 18.4M+2.62M x 3 cols,
   _slog_count scan at 21M — the roofline attribution for BASELINE.md.

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

LOG = open(os.path.join(REPO, "bench", "session19_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def sharded_phases():
    import jax

    from cbl_tpu import CBL
    from cbl_tpu.parallel import ShardedCBL, make_mesh

    bases = 8_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 24

    # single-device reference (same protocol as bench.py: stream staged
    # before the timers, one final scalar sync)
    best = None
    n_single = None
    for rep in range(2):
        idx = CBL(k=25)
        ps = idx.pack_stream(codes, offsets)
        jax.block_until_ready([s[1] for s in ps.slabs])
        t0 = time.time()
        idx.insert_codes_stream(ps)
        n_single = idx.count()
        t1 = time.time()
        best = min(best or 1e9, t1 - t0)
    log(f"1 single-device 8Mbp insert+count: {best:.3f}s n={n_single}")

    mesh = make_mesh(jax.devices()[:1])
    for rep in range(3):
        sh = ShardedCBL(k=25, mesh=mesh)
        t0 = time.time()
        groups = list(sh._sub_slab_groups(codes, offsets))
        t1 = time.time()
        puts = [
            (nk_sub, sh._put_rows(stream), sh._put_rows(starts),
             sh._put_rows(ends))
            for nk_sub, stream, starts, ends in groups
        ]
        t2 = time.time()
        for nk_sub, s_, st_, en_ in puts:
            sh._insert_group(nk_sub, s_, st_, en_)
        n = sh.count()  # sync
        t3 = time.time()
        assert n == n_single, (n, n_single)
        log(f"2 sharded phases rep{rep}: host-groups {t1-t0:.3f}s "
            f"transfer-enqueue {t2-t1:.3f}s step+sync {t3-t2:.3f}s "
            f"total {t3-t0:.3f}s")

    # pre-staged variant: groups + transfers before the timer (protocol
    # parity with the single-device row)
    for rep in range(2):
        sh = ShardedCBL(k=25, mesh=mesh)
        groups = list(sh._sub_slab_groups(codes, offsets))
        puts = [
            (nk_sub, sh._put_rows(stream), sh._put_rows(starts),
             sh._put_rows(ends))
            for nk_sub, stream, starts, ends in groups
        ]
        jax.block_until_ready([p[1] for p in puts])
        t0 = time.time()
        for nk_sub, s_, st_, en_ in puts:
            sh._insert_group(nk_sub, s_, st_, en_)
        n = sh.count()
        t1 = time.time()
        assert n == n_single
        log(f"2 sharded insert (pre-staged) rep{rep}: {t1-t0:.3f}s "
            f"({(t1-t0)/best:.2f}x single)")

    # query overhead for reference (unchanged path)
    sh = ShardedCBL(k=25, mesh=mesh)
    sh.insert_codes_stream(codes, offsets)
    sh.count()
    bq = None
    for rep in range(2):
        t0 = time.time()
        t, p = sh.query_codes_stream(codes, offsets)
        bq = min(bq or 1e9, time.time() - t0)
        assert p == t == nk
    log(f"2 sharded query 8Mbp: {bq:.3f}s")


def static64():
    import bench

    bases = 64_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    base = bench.run_baseline(codes)
    nk = bases - 24
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    try:
        ours = bench.run_tpu(codes, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
        log(f"3 e2e static 64Mbp (slab2 sorted-batch): combined "
            f"{ours['insert_s']+ours['query_s']:.3f}s {comb/1e6:.1f}M/s "
            f"vs_local {comb/base_comb:.2f}x")
    except Exception as e:
        log(f"3 static 64Mbp FAILED: {type(e).__name__}: {str(e)[:300]}")
    del codes
    gc.collect()


def dynamic_probes():
    import jax
    import jax.numpy as jnp

    from cbl_tpu.ops.merge_pallas import merge_sorted_cols
    from cbl_tpu.ops.sort_pallas import sort_cols_auto
    from cbl_tpu.wordset import _slog_count_kernel

    rng = np.random.default_rng(1)

    def dev_sorted(n, ncols):
        cols = [rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
                .astype(np.uint32) for _ in range(ncols)]
        order = np.lexsort(tuple(cols[::-1]))
        return tuple(jax.device_put(c[order]) for c in cols)

    def sync(x):
        return int(jax.device_get(jnp.asarray(x).reshape(-1)[0]))

    N_BATCH = 2_621_440      # 2^20 + 2^20 + 2^19 (one dynamic round)
    N_LOG = 7 * N_BATCH      # the log entering round 8

    batch = tuple(jax.device_put(
        rng.integers(0, 1 << 32, size=N_BATCH, dtype=np.uint64)
        .astype(np.uint32)) for _ in range(3))
    jax.block_until_ready(batch)
    f_sort = jax.jit(lambda c: sort_cols_auto(c))
    for _ in range(2):
        t0 = time.time()
        out = f_sort(batch)
        sync(out[0][0])
        t_sort = time.time() - t0
    log(f"4 probe batch sort 2.62M x3col: {t_sort*1e3:.1f}ms")

    a = dev_sorted(N_LOG, 3)
    b = dev_sorted(N_BATCH, 3)
    jax.block_until_ready(a + b)
    f_merge = jax.jit(lambda x, y: merge_sorted_cols(x, y))
    for _ in range(2):
        t0 = time.time()
        out = f_merge(a, b)
        sync(out[0][0])
        t_merge = time.time() - t0
    log(f"4 probe merge pass 18.4M+2.62M x3col: {t_merge*1e3:.1f}ms")

    full = dev_sorted(8 * N_BATCH, 2)
    tags = jax.device_put(
        ((rng.integers(1, 1 << 28, size=8 * N_BATCH, dtype=np.uint64)
          .astype(np.uint32)) << 2) | 1)
    cols = full + (tags,)
    jax.block_until_ready(cols)
    for _ in range(2):
        t0 = time.time()
        c = _slog_count_kernel(cols)
        sync(c)
        t_scan = time.time() - t0
    log(f"4 probe _slog_count scan 21M: {t_scan*1e3:.1f}ms")


def main():
    import jax

    t_start = time.time()
    log(f"=== session19 start; devices: {jax.devices()} ===")
    sharded_phases()
    static64()
    dynamic_probes()
    log(f"=== session19 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
