#!/usr/bin/env python
"""Granular TPU kernel probe: exercises each device program separately with
progress prints, to localize tunnel/compile issues and measure per-stage
throughput.  Run from the repo root; one TPU process at a time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    bases = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import jax

    log(f"devices: {jax.devices()}")
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.arange(16).sum()
    log(f"trivial op: {int(x)} ({time.time()-t0:.1f}s)")

    from cbl_tpu import kmer as kmod
    from cbl_tpu import necklace
    from cbl_tpu.cbl import CBL, _pipeline_fn, _stream_len
    from cbl_tpu.config import get_config
    from cbl_tpu import wordset as ws

    cfg = get_config(25, 24)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)

    idx = CBL(k=25)
    chunk = idx._effective_chunk(bases - 24)
    S = _stream_len(chunk, 25)
    log(f"chunk tier: {chunk}")

    stream = kmod.np_pack_stream(np.resize(codes, S))
    vbits = np.packbits(np.ones(chunk, dtype=bool))
    fn = _pipeline_fn(cfg, False, chunk)
    t0 = time.time()
    words = fn(stream, vbits)
    words.block_until_ready()
    log(f"pipeline compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        words = fn(stream, vbits)
    words.block_until_ready()
    dt = (time.time() - t0) / reps
    log(f"pipeline warm: {dt*1e3:.1f}ms = {chunk/dt/1e6:.1f}M kmers/s")

    P = 1 << 21
    import jax.numpy as jnp

    pending = jnp.full((P, 2), np.uint32(0xFFFFFFFF))
    t0 = time.time()
    pending = ws._append_kernel(pending, words, jnp.int32(0))
    pending.block_until_ready()
    log(f"append compile+run: {time.time()-t0:.1f}s")

    C = 1 << 23
    data = jnp.full((C, 2), np.uint32(0xFFFFFFFF))
    t0 = time.time()
    data, n = ws._merge_scatter_kernel(data, pending, C, False)
    data.block_until_ready()
    log(f"merge({C}) compile+run: {time.time()-t0:.1f}s, n={int(n)}")
    t0 = time.time()
    data, n = ws._merge_scatter_kernel(data, pending, C, False)
    data.block_until_ready()
    log(f"merge({C}) warm: {time.time()-t0:.2f}s")

    t0 = time.time()
    mask = ws._contains_kernel(data, words)
    mask.block_until_ready()
    log(f"contains compile+run: {time.time()-t0:.1f}s, hits={int(mask.sum())}")
    t0 = time.time()
    for _ in range(reps):
        mask = ws._contains_kernel(data, words)
    mask.block_until_ready()
    dt = (time.time() - t0) / reps
    log(f"contains warm: {dt*1e3:.1f}ms = {chunk/dt/1e6:.1f}M queries/s")

    # full end-to-end
    t0 = time.time()
    idx2 = CBL(k=25)
    idx2.insert_codes_stream(codes, np.array([0, bases], dtype=np.int64))
    n = idx2.count()
    ti = time.time() - t0
    log(f"end-to-end insert {bases-24} kmers: {ti:.2f}s = {(bases-24)/ti/1e6:.2f}M/s, distinct={n}")
    t0 = time.time()
    total, pos = idx2.query_codes_stream(codes, np.array([0, bases], dtype=np.int64))
    tq = time.time() - t0
    log(f"end-to-end query: {tq:.2f}s = {total/tq/1e6:.2f}M/s, {pos}/{total}")


if __name__ == "__main__":
    main()
