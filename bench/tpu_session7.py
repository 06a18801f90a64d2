#!/usr/bin/env python
"""TPU session 7 (round 2): fused-path measurements on the real chip.

One process, one TPU grant; every experiment is try/except'd and appends to
bench/session7_results.log.  Decides (VERDICT round 1, items 1-2, 5-7):
  A. query-join kernel choice at 2^25: bitonic-merge join vs packed sort-join
     (+ raw lax.sort floor).
  B. necklace kernel choice: unrolled XLA vs pallas v1 vs pallas v2, at K=25
     (2^25 rows) and K=59 (2^22 rows), measured as the full fused word
     pipeline they sit in.
  C. static e2e (bench.py shape) at 8 / 32 Mbp, repeats 2.
  D. 64 Mbp scale smoke (2 slabs) + peak HBM.
  E. K=59 e2e at 4 Mbp + enumeration (list) timing (BASELINE config 3).
  F. two-index set algebra + serde round-trip at 8M k-mers (config 4).
  G. ShardedCBL 1-device-mesh overhead vs DeviceWordSet at 8 Mbp.
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

LOG = open(os.path.join(REPO, "bench", "session7_results.log"), "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def mem(tag=""):
    import jax

    try:
        s = jax.devices()[0].memory_stats()
        log(f"  mem[{tag}]: in_use {s.get('bytes_in_use', 0)/2**30:.2f}GiB "
            f"peak {s.get('peak_bytes_in_use', 0)/2**30:.2f}GiB")
    except Exception as e:
        log(f"  mem[{tag}]: n/a ({type(e).__name__})")


def codes_of(bases, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=bases, dtype=np.uint8)


def slab_inputs(bases, k=25, canonical=False, seed=0):
    """First fused slab's device-ready inputs for a single-record stream."""
    from cbl_tpu import CBL

    idx = CBL(k=k, canonical=canonical)
    codes = codes_of(bases, seed)
    offsets = np.array([0, bases], dtype=np.int64)
    slabs = list(idx._fused_slabs(codes, offsets))
    return idx, slabs


def timeit(fn, reps=4):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


# ---------------------------------------------------------------- A + B


def exp_kernels():
    import jax
    import jax.numpy as jnp

    from cbl_tpu.cbl import _fused_build_fn, _fused_words_fn
    from cbl_tpu.config import get_config
    from cbl_tpu.wordset import (
        _count_hits_kernel_packed,
        _count_hits_merge_kernel,
        sort_rows,
    )

    cfg = get_config(k=25)
    idx, slabs = slab_inputs(32_000_000)
    nk_pad, stream, s_arr, e_arr, n_here = slabs[0]
    log(f"A/B setup: nk_pad=2^{nk_pad.bit_length()-1}")

    # B: necklace/pipeline variants (full fused word program)
    words = None
    for variant in ("", "1", "2"):
        try:
            fn = _fused_words_fn(cfg, False, nk_pad, variant)
            t, out = timeit(lambda: fn(stream, s_arr, e_arr))
            if variant == "":
                words = out[0]
            log(f"B words[k25,{variant or 'xla'}] 2^25: {t*1e3:.1f}ms = "
                f"{nk_pad/t/1e6:.0f}M kmers/s")
        except Exception as e:
            log(f"B words[k25,{variant or '1'}] FAILED: {type(e).__name__}: {e}")

    # build the sorted index once (also times the fused build)
    bf = _fused_build_fn(cfg, False, nk_pad, "")
    t, (data, n_dev) = timeit(lambda: bf(stream, s_arr, e_arr), reps=2)
    log(f"B fused_build[k25] 2^25: {t*1e3:.1f}ms = {nk_pad/t/1e6:.0f}M kmers/s "
        f"(distinct {int(n_dev)})")

    # A: query-join kernels on (data 2^25, queries 2^25)
    t, _ = timeit(lambda: sort_rows(words))
    log(f"A lax.sort 2-key 2^25: {t*1e3:.1f}ms = {nk_pad/t/1e6:.0f}M rows/s")
    t, p = timeit(lambda: _count_hits_merge_kernel(data, words))
    log(f"A merge-join 2^25/2^25: {t*1e3:.1f}ms = {nk_pad/t/1e6:.0f}M q/s "
        f"(pos {int(p)})")
    t, p = timeit(lambda: _count_hits_kernel_packed(data, words))
    log(f"A packed sort-join 2^25/2^25: {t*1e3:.1f}ms = {nk_pad/t/1e6:.0f}M q/s "
        f"(pos {int(p)})")
    mem("A/B")
    del idx, slabs, words, data, stream
    gc.collect()

    # B at K=59 (4-limb words)
    cfg59 = get_config(k=59, prefix_bits=28)
    idx, slabs = slab_inputs(4_000_000, k=59)
    nk_pad, stream, s_arr, e_arr, _ = slabs[0]
    for variant in ("", "1", "2"):
        try:
            fn = _fused_words_fn(cfg59, False, nk_pad, variant)
            t, _ = timeit(lambda: fn(stream, s_arr, e_arr))
            log(f"B words[k59,{variant or 'xla'}] 2^{nk_pad.bit_length()-1}: "
                f"{t*1e3:.1f}ms = {nk_pad/t/1e6:.0f}M kmers/s")
        except Exception as e:
            log(f"B words[k59,{variant or 'xla'}] FAILED: {type(e).__name__}: {e}")
    del idx, slabs, stream
    gc.collect()


# ---------------------------------------------------------------- C/D/E e2e


def e2e(bases, k=25, repeats=2, label="", canonical=False):
    from cbl_tpu import CBL

    codes = codes_of(bases)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - k + 1
    kw = {"prefix_bits": 28} if k == 59 else {}
    best = None
    for _ in range(repeats):
        idx = CBL(k=k, canonical=canonical, **kw)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n = idx.count()
        t1 = time.time()
        total, pos = idx.query_codes_stream(codes, offsets)
        t2 = time.time()
        assert total == pos == nk, (total, pos, nk)
        r = {"n": n, "ins": t1 - t0, "qry": t2 - t1}
        if best is None or r["ins"] + r["qry"] < best["ins"] + best["qry"]:
            best = r
        last_idx = idx
    comb = 2 * nk / (best["ins"] + best["qry"])
    log(f"C e2e {label or f'{bases/1e6:.0f}Mbp'} k={k}: "
        f"insert {nk/best['ins']/1e6:.1f}M/s query {nk/best['qry']/1e6:.1f}M/s "
        f"combined {comb/1e6:.1f}M/s "
        f"(ins {best['ins']:.3f}s qry {best['qry']:.3f}s n={best['n']})")
    mem("e2e")
    return last_idx, best


# ---------------------------------------------------------------- F algebra


def exp_algebra(bases=8_000_000):
    from cbl_tpu import CBL

    offsets = np.array([0, bases], dtype=np.int64)
    a = CBL(k=25)
    a.insert_codes_stream(codes_of(bases, seed=1), offsets)
    b = CBL(k=25)
    b.insert_codes_stream(codes_of(bases, seed=2), offsets)
    na, nb = a.count(), b.count()
    log(f"F operands: |a|={na} |b|={nb}")
    for name, op in (
        ("union", lambda: a | b),
        ("inter", lambda: a & b),
        ("diff", lambda: a - b),
        ("symdiff", lambda: a ^ b),
    ):
        t0 = time.time()
        c = op()
        n = c.count()
        t = time.time() - t0
        log(f"F {name}: {t*1e3:.0f}ms (|out|={n}, "
            f"{(na+nb)/t/1e6:.0f}M rows/s)")
        del c
        gc.collect()
    t0 = time.time()
    a.save_to_file("/tmp/s7_a.cblx.npz")
    t_save = time.time() - t0
    t0 = time.time()
    a2 = CBL.load_from_file("/tmp/s7_a.cblx.npz")
    t_load = time.time() - t0
    assert a2.count() == na
    log(f"F serde: save {t_save:.2f}s load {t_load:.2f}s ({na} kmers)")
    del a, b, a2
    gc.collect()


# ---------------------------------------------------------------- G sharded


def exp_sharded(bases=8_000_000):
    import jax

    from cbl_tpu.parallel import ShardedCBL, make_mesh

    mesh = make_mesh(jax.devices()[:1])
    idx = ShardedCBL(k=25, mesh=mesh)
    codes = codes_of(bases)
    offsets = np.array([0, bases], dtype=np.int64)
    t0 = time.time()
    idx.insert_codes_stream(codes, offsets)
    n = idx.count()
    t1 = time.time()
    log(f"G sharded(1-dev) insert+count {bases/1e6:.0f}Mbp: {t1-t0:.3f}s = "
        f"{(bases-24)/(t1-t0)/1e6:.1f}M kmers/s (n={n})")
    del idx
    gc.collect()


def main():
    import jax

    log(f"=== session7 start; devices: {jax.devices()} ===")

    for name, fn in (
        ("A/B kernels", exp_kernels),
        ("C e2e 8M", lambda: e2e(8_000_000)),
        ("C e2e 32M", lambda: e2e(32_000_000)),
        ("D e2e 64M", lambda: e2e(64_000_000, repeats=1, label="64Mbp scale")),
        ("E e2e k59 4M", lambda: e2e(4_000_000, k=59)),
        ("F algebra", exp_algebra),
        ("G sharded", exp_sharded),
    ):
        t0 = time.time()
        try:
            out = fn()
            if name.startswith(("C", "D", "E")) and out is not None:
                idx = out[0]
                if name.startswith("E"):
                    t1 = time.time()
                    w = idx.wordset.words_array()
                    log(f"E list/enumerate: words_array {time.time()-t1:.2f}s "
                        f"({w.shape[0]} kmers)")
                del idx, out
            gc.collect()
        except Exception as e:
            import traceback

            log(f"{name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
        log(f"-- {name} done in {time.time()-t0:.1f}s --")
    log("=== session7 done ===")


if __name__ == "__main__":
    main()
