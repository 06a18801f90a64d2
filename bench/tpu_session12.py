#!/usr/bin/env python
"""TPU session 12: final round-2 confirmations.

1. sharded 1-device bulk insert+query at 8Mbp (after sort-based routing)
2. K=59 scale smoke at 64Mbp (>=64M distinct k-mers, 4-limb words)
3. K=25 static at 64Mbp (2 fused slabs, post-Pallas)
4. algebra + largek bench modes (warm numbers for BASELINE.md)
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session12_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def codes_of(bases, seed=0):
    return np.random.default_rng(seed).integers(0, 4, size=bases, dtype=np.uint8)


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
        assert total == pos == nk and n == nk
        log(f"1 sharded(1-dev) rep{rep}: insert {t1-t0:.3f}s "
            f"({nk/(t1-t0)/1e6:.1f}M/s) query {t2-t1:.3f}s "
            f"({nk/(t2-t1)/1e6:.1f}M/s)")
        del idx
        gc.collect()


def k59_scale(bases=64_000_000):
    from cbl_tpu import CBL

    codes = codes_of(bases)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 59 + 1
    idx = CBL(k=59, prefix_bits=28)
    t0 = time.time()
    ps = idx.pack_stream(codes, offsets)
    idx.insert_codes_stream(ps)
    n = idx.count()
    t1 = time.time()
    total, pos = idx.query_codes_stream(ps)
    t2 = time.time()
    assert total == pos == nk, (total, pos, nk)
    log(f"2 K=59 scale {bases/1e6:.0f}Mbp: build {t1-t0:.3f}s "
        f"({nk/(t1-t0)/1e6:.1f}M/s) query {t2-t1:.3f}s "
        f"({nk/(t2-t1)/1e6:.1f}M/s) distinct={n} "
        f"(index rows 2^{(idx.wordset.data.shape[0]).bit_length()-1} x 4 limbs)")
    del idx, ps
    gc.collect()


def k25_64M(bases=64_000_000):
    import bench

    codes = codes_of(bases)
    base = bench.run_baseline(codes)
    ours = bench.run_tpu(codes, 1 << 19, 1 << 21, 2)
    nk = bases - 24
    assert ours["distinct"] == base["distinct"]
    comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    log(f"3 static 64Mbp: ins {ours['insert_s']:.3f}s qry "
        f"{ours['query_s']:.3f}s combined {comb/1e6:.1f}M/s "
        f"vs_local {comb/base_comb:.2f}x")


def modes():
    import subprocess

    for mode, bases in (("algebra", 16_000_000), ("largek", 4_000_000)):
        r = subprocess.run(
            [sys.executable, "bench.py", "--mode", mode, "--bases",
             str(bases), "--repeats", "2"],
            capture_output=True, timeout=1800, cwd=REPO,
        )
        log(f"4 mode {mode}: rc={r.returncode} "
            f"{r.stdout.decode().strip()}")
        for line in r.stderr.decode().splitlines()[-6:]:
            log(f"   | {line}")


def main():
    import jax

    log(f"=== session12 start; devices: {jax.devices()} ===")
    for name, fn in (
        ("1 sharded", sharded),
        ("2 k59 scale", k59_scale),
        ("3 k25 64M", k25_64M),
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
    log("=== session12 core done (modes run as subprocesses next) ===")


if __name__ == "__main__":
    main()
