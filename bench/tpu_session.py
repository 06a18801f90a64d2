#!/usr/bin/env python
"""One comprehensive TPU measurement session (grant acquisition is slow, so
batch every comparison into a single process).

Measures: pipeline XLA vs Pallas, merge variants, contains variants, and the
end-to-end bench — writing all numbers to stdout as it goes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit_async(fn, *args, reps=8):
    """Average over reps with one final sync (amortises tunnel latency)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    log(f"warm trivial: {int(jnp.arange(4).sum())}")

    from cbl_tpu import kmer as kmod
    from cbl_tpu import wordset as ws
    from cbl_tpu.cbl import CBL, _pipeline_fn, _stream_len
    from cbl_tpu.config import get_config
    from cbl_tpu.ops.necklace_pallas import necklace_pos_pallas

    cfg = get_config(25, 24)
    rng = np.random.default_rng(0)

    # --- 1. pipeline XLA vs Pallas at chunk 2^19 ---
    chunk = 1 << 19
    S = _stream_len(chunk, 25)
    codes = rng.integers(0, 4, size=S, dtype=np.uint8)
    stream = jnp.asarray(kmod.np_pack_stream(codes))
    vbits = jnp.asarray(np.packbits(np.ones(chunk, dtype=bool)))
    for pallas in (False, True):
        try:
            fn = _pipeline_fn(cfg, False, chunk, pallas)
            t = timeit_async(fn, stream, vbits)
            log(f"pipeline chunk={chunk} pallas={pallas}: {t*1e3:.1f}ms = "
                f"{chunk/t/1e6:.1f}M kmers/s")
        except Exception as e:
            log(f"pipeline pallas={pallas} FAILED: {type(e).__name__}: {e}")

    # canonical mode costs
    try:
        fn = _pipeline_fn(cfg, True, chunk, False)
        t = timeit_async(fn, stream, vbits)
        log(f"pipeline canonical xla: {t*1e3:.1f}ms = {chunk/t/1e6:.1f}M kmers/s")
    except Exception as e:
        log(f"canonical pipeline FAILED: {e}")

    # --- 2. merge variants at C=8M, P=2M ---
    C, P = 1 << 23, 1 << 21
    data = np.sort(
        rng.integers(0, 1 << 56, size=C, dtype=np.uint64)
    )
    from cbl_tpu import limbs as lb

    data_rows = jnp.asarray(lb.from_py_ints(list(data[: C // 2]), 2))
    data_arr = jnp.concatenate(
        [data_rows, jnp.full((C - C // 2, 2), np.uint32(0xFFFFFFFF))]
    )
    batch = jnp.asarray(
        lb.from_py_ints(
            list(rng.integers(0, 1 << 56, size=P, dtype=np.uint64)), 2
        )
    )
    t = timeit_async(
        lambda d, b: ws._setop_sort_kernel(d + jnp.uint32(0), b, "union", C),
        data_arr, batch, reps=4,
    )
    log(f"merge sortcompact C={C} P={P}: {t*1e3:.1f}ms = {P/t/1e6:.1f}M inserts/s")
    t = timeit_async(
        lambda d, b: ws._merge_scatter_kernel(d + jnp.uint32(0), b, C, False),
        data_arr, batch, reps=4,
    )
    log(f"merge scatter     C={C} P={P}: {t*1e3:.1f}ms = {P/t/1e6:.1f}M inserts/s")

    # --- 3. contains variants ---
    for Q in (1 << 19, 1 << 23):
        queries = jnp.asarray(
            lb.from_py_ints(list(data[rng.integers(0, C // 2, size=Q)]), 2)
        )
        t = timeit_async(
            lambda d, q: ws._count_hits_kernel(d, q), data_arr, queries, reps=4
        )
        log(f"count-hits sort-join Q={Q} in {C//2}: {t*1e3:.1f}ms = {Q/t/1e6:.1f}M/s")
    Q = 1 << 19
    queries = jnp.asarray(
        lb.from_py_ints(list(data[rng.integers(0, C // 2, size=Q)]), 2)
    )
    tb = 22
    offs, mb = ws._radix_offsets_kernel(data_arr, cfg.n_bits, tb)
    win = 1 << (max(int(mb), 8) - 1).bit_length()
    t = timeit_async(
        lambda d, o, q: ws._contains_bucket_kernel(d, o, q, cfg.n_bits, tb, win),
        data_arr, offs, queries, reps=4,
    )
    log(f"contains radix tb={tb} win={win}: {t*1e3:.1f}ms = {Q/t/1e6:.1f}M/s")

    # --- 4. end-to-end bench (8 Mbp, two repeats) ---
    bases = 8_000_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    for rep in range(2):
        idx = CBL(k=25)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n = idx.count()
        ti = time.time() - t0
        t0 = time.time()
        total, pos = idx.query_codes_stream(codes, offsets)
        tq = time.time() - t0
        log(f"e2e rep{rep}: insert {ti:.2f}s ({(bases-24)/ti/1e6:.2f}M/s), "
            f"query {tq:.2f}s ({total/tq/1e6:.2f}M/s), distinct={n}, pos={pos}")
        combined = 2 * (bases - 24) / (ti + tq)
        log(f"e2e rep{rep}: combined {combined/1e6:.2f}M kmers/s "
            f"(vs CPU baseline 6.3M/s: {combined/6.3e6:.1f}x)")


if __name__ == "__main__":
    main()
