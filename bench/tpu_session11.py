#!/usr/bin/env python
"""TPU session 11: pallas necklace + words-cache measurement.

1. staged bench 32Mbp (driver flow, 3 reps) — pallas chain + words cache
2. same with CBL_TPU_NO_WORDS_CACHE=1 (cache contribution, honest split)
3. staged bench 8Mbp
4. dynamic 8Mbp
5. largek K=59 4Mbp build/query/list (host-side decode now)
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session11_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def codes_of(bases, seed=0):
    return np.random.default_rng(seed).integers(0, 4, size=bases, dtype=np.uint8)


def staged(bases, repeats=3, label=""):
    import bench

    codes = codes_of(bases)
    base = bench.run_baseline(codes)
    ours = bench.run_tpu(codes, 1 << 19, 1 << 21, repeats)
    nk = bases - 24
    assert ours["distinct"] == base["distinct"]
    assert ours["positive"] == ours["total"] == nk
    comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    log(f"{label} {bases/1e6:.0f}Mbp: ins {ours['insert_s']:.3f}s "
        f"qry {ours['query_s']:.3f}s combined {comb/1e6:.1f}M/s "
        f"vs_local {comb/base_comb:.2f}x (local base {base_comb/1e6:.2f}M/s)")


def dynamic(bases=8_000_000):
    import bench

    codes = codes_of(bases)
    base = bench.run_baseline_dynamic(codes)
    ours = bench.run_tpu_dynamic(codes, 2)
    assert ours["distinct"] == base["distinct"]
    assert ours["positive"] == base["positive"]
    rate = ours["ops"] / ours["total_s"]
    log(f"4 dynamic {bases/1e6:.0f}Mbp: {ours['total_s']:.3f}s = "
        f"{rate/1e6:.1f}M ops/s = {rate/base['ops_per_s']:.2f}x")


def largek(bases=4_000_000):
    from cbl_tpu import CBL

    codes = codes_of(bases)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 59 + 1
    best = None
    for _ in range(2):
        idx = CBL(k=59, prefix_bits=28)
        t0 = time.time()
        ps = idx.pack_stream(codes, offsets)
        idx.insert_codes_stream(ps)
        n = idx.count()
        t1 = time.time()
        total, pos = idx.query_codes_stream(ps)
        t2 = time.time()
        lst = idx.kmers_limbs()
        t3 = time.time()
        assert total == pos == nk and lst.shape[0] == n
        r = {"build": t1 - t0, "query": t2 - t1, "list": t3 - t2, "n": n}
        if best is None or r["build"] + r["query"] < best["build"] + best["query"]:
            best = r
        del idx, lst, ps
        gc.collect()
    log(f"5 largek K=59 {bases/1e6:.0f}Mbp: build {best['build']:.3f}s "
        f"({nk/best['build']/1e6:.1f}M/s) query {best['query']:.3f}s "
        f"({nk/best['query']/1e6:.1f}M/s) list {best['list']:.3f}s "
        f"({best['n']/best['list']/1e6:.1f}M/s)")


def main():
    import jax

    log(f"=== session11 start; devices: {jax.devices()} ===")
    steps = [
        ("1 staged 32M", lambda: staged(32_000_000, 3, "1 staged")),
        ("2 nocache 32M", None),  # special-cased below
        ("3 staged 8M", lambda: staged(8_000_000, 2, "3 staged")),
        ("4 dynamic", dynamic),
        ("5 largek", largek),
    ]
    for name, fn in steps:
        t0 = time.time()
        try:
            if name.startswith("2"):
                os.environ["CBL_TPU_NO_WORDS_CACHE"] = "1"
                try:
                    staged(32_000_000, 2, "2 nocache")
                finally:
                    os.environ.pop("CBL_TPU_NO_WORDS_CACHE", None)
            else:
                fn()
        except Exception as e:
            import traceback

            log(f"{name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
        gc.collect()
        log(f"-- {name} done in {time.time()-t0:.1f}s --")
    log("=== session11 done ===")


if __name__ == "__main__":
    main()
