#!/usr/bin/env python
"""TPU session 17: sharded-path and set-algebra cost on the real chip.

1. ShardedCBL on a 1-device mesh, 8Mbp: bulk insert + query vs the
   single-device CBL on the same stream (VERDICT r2 target: insert
   overhead <= 1.5x; was 3.4x with the dedup-every-group fold).
2. Sharded remove at stream scale (the new bulk path) timing.
3. bench.py --mode algebra (2x8M k-mers set ops + serde) under
   CBL_TPU_MERGE_KERNEL=xla vs mergepath (merge set-ops: one pass +
   lazy-state outputs).

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

LOG = open(os.path.join(REPO, "bench", "session17_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def sharded_vs_single():
    import jax

    from cbl_tpu import CBL
    from cbl_tpu.parallel import ShardedCBL, make_mesh

    bases = 8_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 24

    # single-device reference timings (warm best-of-2)
    best_i = best_q = None
    n_single = None
    for rep in range(2):
        idx = CBL(k=25)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n_single = idx.count()
        t1 = time.time()
        t, p = idx.query_codes_stream(codes, offsets)
        t2 = time.time()
        assert p == t == nk
        best_i = min(best_i or 1e9, t1 - t0)
        best_q = min(best_q or 1e9, t2 - t1)
    log(f"1 single-device 8Mbp: insert {best_i:.3f}s query {best_q:.3f}s "
        f"n={n_single}")

    mesh = make_mesh(jax.devices()[:1])
    bi = bq = None
    for rep in range(2):
        sh = ShardedCBL(k=25, mesh=mesh)
        t0 = time.time()
        sh.insert_codes_stream(codes, offsets)
        n = sh.count()
        t1 = time.time()
        t, p = sh.query_codes_stream(codes, offsets)
        t2 = time.time()
        assert n == n_single and p == t == nk, (n, n_single, t, p)
        bi = min(bi or 1e9, t1 - t0)
        bq = min(bq or 1e9, t2 - t1)
    log(f"1 sharded 1-dev mesh 8Mbp: insert {bi:.3f}s ({bi/best_i:.2f}x "
        f"single) query {bq:.3f}s ({bq/best_q:.2f}x single)")

    # bulk remove at stream scale
    sh = ShardedCBL(k=25, mesh=mesh)
    sh.insert_codes_stream(codes, offsets)
    sh.count()
    half = codes[: bases // 2]
    hoff = np.array([0, len(half)], dtype=np.int64)
    for rep in range(2):
        sh2 = ShardedCBL(k=25, mesh=mesh)
        sh2.insert_codes_stream(codes, offsets)
        sh2.count()
        t0 = time.time()
        sh2.remove_codes_stream(half, hoff)
        n2 = sh2.count()
        dt = time.time() - t0
        log(f"2 sharded bulk remove 4Mbp rep{rep}: {dt:.3f}s "
            f"({(len(half)-24)/dt/1e6:.1f}M removals/s) n {n_single}->{n2}")


def algebra():
    """Inline (NOT a subprocess — the TPU grant is single-tenant): set ops
    on two 8M-k-mer indexes, per merge mode, scalar-sync timed."""
    import jax

    from cbl_tpu import CBL

    codes = np.random.default_rng(0).integers(0, 4, size=16_000_000,
                                              dtype=np.uint8)
    half = len(codes) // 2
    for mode in ("xla", "mergepath"):
        os.environ["CBL_TPU_MERGE_KERNEL"] = mode
        os.environ["CBL_TPU_SORT"] = "xla"
        jax.clear_caches()
        gc.collect()
        a = CBL(k=25)
        a.insert_codes_stream(codes[:half],
                              np.array([0, half], dtype=np.int64))
        b = CBL(k=25)
        b.insert_codes_stream(codes[half:],
                              np.array([0, half], dtype=np.int64))
        na, nb = a.count(), b.count()
        counts = {}
        for name, fn in (("union", lambda: a | b), ("inter", lambda: a & b),
                         ("diff", lambda: a - b), ("symdiff", lambda: a ^ b)):
            ts = []
            for _ in range(3):
                t0 = time.time()
                c = fn()
                counts[name] = c.count()  # scalar sync
                ts.append(time.time() - t0)
            log(f"3 algebra merge={mode} {name}: {min(ts)*1e3:.0f}ms "
                f"(n={counts[name]})")
        log(f"3 algebra merge={mode} counts: a={na} b={nb} {counts}")
        del a, b
        gc.collect()
    os.environ.pop("CBL_TPU_MERGE_KERNEL", None)
    os.environ.pop("CBL_TPU_SORT", None)


def dynamic_breakdown():
    """Attribute the fused-round 0.761s (session16, merge=mergepath):
    scalar-sync each round and separately time the flush fold, at two
    pending caps (2^21 = fold every round, 2^22 = every other round)."""
    import jax

    from cbl_tpu import CBL

    os.environ["CBL_TPU_MERGE_KERNEL"] = "mergepath"
    os.environ["CBL_TPU_SORT"] = "xla"
    jax.clear_caches()
    gc.collect()
    bases = 8_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    SEGS = 8
    sb = bases // SEGS
    off1 = np.array([0, sb], dtype=np.int64)
    off_h = np.array([0, sb // 2], dtype=np.int64)
    for cap_log in (21, 22):
        for rep in range(2):  # rep0 compiles
            idx = CBL(k=25, pending_cap=1 << cap_log)
            segs = [idx.pack_stream(codes[i * sb:(i + 1) * sb], off1)
                    for i in range(SEGS)]
            halves = [idx.pack_stream(codes[i * sb:i * sb + sb // 2], off_h)
                      for i in range(SEGS)]
            jax.block_until_ready([s[1] for ps in segs for s in ps.slabs])
            t_all = time.time()
            t_flush = 0.0
            rounds = []
            for i in range(SEGS):
                t0 = time.time()
                ni = segs[i].slabs[0][0]
                nr = halves[i].slabs[0][0]
                ws = idx.wordset
                if ws.n_pending + ni + nr > ws.pending_cap:
                    ws.flush()
                    int(jax.device_get(ws.data[0, 0]))  # sync
                    t_flush += time.time() - t0
                t1 = time.time()
                t, p = idx.dynamic_round(segs[i],
                                         segs[i - 1 if i else 0],
                                         halves[i], lazy=True)
                int(jax.device_get(p))  # sync
                rounds.append(time.time() - t1)
            n = idx.count()
            total = time.time() - t_all
            if rep:
                log(f"4 dyn cap=2^{cap_log}: total(synced) {total:.3f}s "
                    f"flush {t_flush:.3f}s rounds "
                    f"{[f'{r*1e3:.0f}' for r in rounds]}ms n={n}")
    os.environ.pop("CBL_TPU_MERGE_KERNEL", None)
    os.environ.pop("CBL_TPU_SORT", None)


def wide_merge_micro():
    """L=4 merge crossover (session16 showed 2^22+2^22 L=4 LOSES): find
    where the merge pass starts winning for 4-column tuples."""
    import jax
    import jax.numpy as jnp

    from cbl_tpu.ops import merge_pallas

    def sorted_cols(n, seed, L):
        r = np.random.default_rng(seed)
        cols = [r.integers(0, 1 << 32, size=n, dtype=np.uint64)
                .astype(np.uint32) for _ in range(L)]
        order = np.lexsort(tuple(cols[::-1]))
        return tuple(c[order] for c in cols)

    def sync(out):
        return int(jax.device_get(out[0].reshape(-1)[0]))

    for n_log in (22, 24, 25):
        L = 4
        ca = sorted_cols(1 << n_log, 1, L)
        cb = sorted_cols(1 << n_log, 2, L)
        da = tuple(jax.device_put(c) for c in ca)
        db = tuple(jax.device_put(c) for c in cb)
        jax.block_until_ready(da + db)
        cat_fn = jax.jit(lambda a, b: jax.lax.sort(
            tuple(jnp.concatenate([x, y]) for x, y in zip(a, b)),
            num_keys=L))
        mp_fn = jax.jit(lambda a, b: merge_pallas.merge_sorted_cols(
            a, b, t_log=15))
        ts_cat, ts_mp = [], []
        for rep in range(3):
            t0 = time.time(); sync(cat_fn(da, db)); ts_cat.append(time.time() - t0)
            t0 = time.time(); sync(mp_fn(da, db)); ts_mp.append(time.time() - t0)
        log(f"5 L=4 merge 2^{n_log}+2^{n_log}: mergepath {min(ts_mp)*1e3:.1f}ms"
            f" vs concat-sort {min(ts_cat)*1e3:.1f}ms "
            f"({min(ts_cat)/min(ts_mp):.2f}x)")
        del da, db
        gc.collect()


def main():
    import jax

    t_start = time.time()
    log(f"=== session17 start; devices: {jax.devices()} ===")
    sharded_vs_single()
    dynamic_breakdown()
    algebra()
    wide_merge_micro()
    log(f"=== session17 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
