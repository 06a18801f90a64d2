#!/usr/bin/env python
"""TPU session 8 (round 2): measure the packed-join + bulk-sharded paths.

Runs bench.py's own code in-process (one TPU grant):
  1. static e2e at 32Mbp (the exact driver benchmark, repeats 3) and 8Mbp
  2. dynamic mode at 8Mbp (vs CPU baseline, counts cross-checked)
  3. largek (K=59 build+list, 4Mbp)
  4. algebra (4 set ops + serde, 16Mbp split)
  5. ShardedCBL 1-device-mesh bulk insert+query at 8Mbp
  6. static e2e at 64Mbp (two slabs, scale smoke)
Appends to bench/session8_results.log.
"""

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session8_results.log"), "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def codes_of(bases, seed=0):
    return np.random.default_rng(seed).integers(0, 4, size=bases, dtype=np.uint8)


def static_e2e(bases, repeats=2, k=25):
    import bench

    codes = codes_of(bases)
    base = bench.run_baseline(codes) if k == 25 else None
    if base:
        log(f"1 baseline {bases/1e6:.0f}Mbp: ins {base['insert_s']:.3f}s "
            f"qry {base['query_s']:.3f}s")
    ours = bench.run_tpu(codes, 1 << 19, 1 << 21, repeats)
    nk = bases - k + 1
    comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
    vs = None
    if base:
        assert ours["distinct"] == base["distinct"]
        vs = comb / (2 * nk / (base["insert_s"] + base["query_s"]))
    assert ours["positive"] == ours["total"] == nk
    log(f"1 static {bases/1e6:.0f}Mbp: ins {ours['insert_s']:.3f}s "
        f"({nk/ours['insert_s']/1e6:.1f}M/s) qry {ours['query_s']:.3f}s "
        f"({nk/ours['query_s']/1e6:.1f}M/s) combined {comb/1e6:.1f}M/s"
        + (f" vs_baseline {vs:.2f}x" if vs else ""))


def dynamic(bases=8_000_000, repeats=2):
    import bench

    codes = codes_of(bases)
    base = bench.run_baseline_dynamic(codes)
    log(f"2 baseline dynamic {bases/1e6:.0f}Mbp: {base['total_s']:.3f}s "
        f"= {base['ops_per_s']/1e6:.1f}M ops/s")
    ours = bench.run_tpu_dynamic(codes, repeats)
    assert ours["distinct"] == base["distinct"], (ours, base)
    assert ours["positive"] == base["positive"], (ours, base)
    rate = ours["ops"] / ours["total_s"]
    log(f"2 dynamic {bases/1e6:.0f}Mbp: {ours['total_s']:.3f}s = "
        f"{rate/1e6:.1f}M ops/s, vs_baseline {rate/base['ops_per_s']:.2f}x")


def largek(bases=4_000_000, repeats=2):
    from cbl_tpu import CBL

    codes = codes_of(bases)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 59 + 1
    best = None
    for _ in range(repeats):
        idx = CBL(k=59, prefix_bits=28)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n = idx.count()
        t1 = time.time()
        total, pos = idx.query_codes_stream(codes, offsets)
        t2 = time.time()
        lst = idx.kmers_limbs()
        t3 = time.time()
        assert total == pos == nk and lst.shape[0] == n
        r = {"build": t1 - t0, "query": t2 - t1, "list": t3 - t2, "n": n}
        if best is None or r["build"] + r["query"] < best["build"] + best["query"]:
            best = r
        del idx, lst
        gc.collect()
    log(f"3 largek K=59 {bases/1e6:.0f}Mbp: build {best['build']:.3f}s "
        f"({nk/best['build']/1e6:.1f}M/s) query {best['query']:.3f}s "
        f"({nk/best['query']/1e6:.1f}M/s) list {best['list']:.3f}s "
        f"({best['n']/best['list']/1e6:.1f}M/s)")


def algebra(bases=16_000_000, repeats=2):
    from cbl_tpu import CBL

    codes = codes_of(bases)
    half = bases // 2
    a = CBL(k=25)
    a.insert_codes_stream(codes[:half], np.array([0, half], dtype=np.int64))
    b = CBL(k=25)
    b.insert_codes_stream(codes[half:], np.array([0, bases - half], dtype=np.int64))
    na, nb = a.count(), b.count()
    for name, op in (("union", lambda: a | b), ("inter", lambda: a & b),
                     ("diff", lambda: a - b), ("symdiff", lambda: a ^ b)):
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            c = op()
            n = c.count()
            ts.append(time.time() - t0)
            del c
            gc.collect()
        log(f"4 {name}: {min(ts)*1e3:.0f}ms warm (|out|={n}, "
            f"{(na+nb)/min(ts)/1e6:.0f}M rows/s)")
    t0 = time.time()
    a.save_to_file("/tmp/s8_a.cblx.npz")
    t_save = time.time() - t0
    t0 = time.time()
    a2 = CBL.load_from_file("/tmp/s8_a.cblx.npz")
    n2 = a2.count()
    t_load = time.time() - t0
    assert n2 == na
    log(f"4 serde: save {t_save:.2f}s load {t_load:.2f}s ({na} kmers)")
    del a, b, a2
    gc.collect()


def sharded(bases=8_000_000):
    import jax

    from cbl_tpu.parallel import ShardedCBL, make_mesh

    mesh = make_mesh(jax.devices()[:1])
    codes = codes_of(bases)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 24
    for rep in range(2):
        idx = ShardedCBL(k=25, mesh=mesh)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n = idx.count()
        t1 = time.time()
        total, pos = idx.query_codes_stream(codes, offsets)
        t2 = time.time()
        assert total == pos == nk and n == nk, (total, pos, n)
        log(f"5 sharded(1-dev) rep{rep} {bases/1e6:.0f}Mbp: insert {t1-t0:.3f}s "
            f"({nk/(t1-t0)/1e6:.1f}M/s) query {t2-t1:.3f}s "
            f"({nk/(t2-t1)/1e6:.1f}M/s)")
        del idx
        gc.collect()


def main():
    import jax

    log(f"=== session8 start; devices: {jax.devices()} ===")
    for name, fn in (
        ("1 static 32M", lambda: static_e2e(32_000_000, repeats=3)),
        ("1 static 8M", lambda: static_e2e(8_000_000, repeats=2)),
        ("2 dynamic 8M", dynamic),
        ("3 largek", largek),
        ("4 algebra", algebra),
        ("5 sharded", sharded),
        ("6 static 64M", lambda: static_e2e(64_000_000, repeats=2)),
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
    log("=== session8 done ===")


if __name__ == "__main__":
    main()
