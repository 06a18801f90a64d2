#!/usr/bin/env python
"""Measure primitive op rates on the TPU: gather, scatter, scatter-add,
cumsum, sort, elementwise — to ground the wordset redesign in data."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    C, P = 1 << 23, 1 << 20
    data = jnp.asarray(
        rng.integers(0, 1 << 32, size=(C, 2), dtype=np.uint64).astype(np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, C, size=P, dtype=np.int64).astype(np.int32))
    rows = jnp.asarray(
        rng.integers(0, 1 << 32, size=(P, 2), dtype=np.uint64).astype(np.uint32)
    )

    t = timeit(jax.jit(lambda d: d + jnp.uint32(1)), data)
    log(f"elementwise over [{C},2]: {t*1e3:.2f}ms = {C/t/1e9:.2f}G rows/s")

    t = timeit(jax.jit(lambda d, i: d[i]), data, idx)
    log(f"gather {P} rows from [{C},2]: {t*1e3:.2f}ms = {P/t/1e6:.1f}M rows/s")

    t = timeit(jax.jit(lambda d, i: d[:, 0][i]), data, idx)
    log(f"gather {P} scalars from [{C}]: {t*1e3:.2f}ms = {P/t/1e6:.1f}M/s")

    t = timeit(
        jax.jit(lambda d, i, r: d.at[i].set(r, mode="drop")), data, idx, rows
    )
    log(f"scatter-set {P} rows into [{C},2]: {t*1e3:.2f}ms = {P/t/1e6:.1f}M rows/s")

    ones = jnp.ones((P,), dtype=jnp.int32)
    zer = jnp.zeros((C,), dtype=jnp.int32)
    t = timeit(jax.jit(lambda z, i, o: z.at[i].add(o, mode="drop")), zer, idx, ones)
    log(f"scatter-add {P} into [{C}]: {t*1e3:.2f}ms = {P/t/1e6:.1f}M/s")

    t = timeit(jax.jit(lambda d: jnp.cumsum(d[:, 0].astype(jnp.int32))), data)
    log(f"cumsum over [{C}]: {t*1e3:.2f}ms = {C/t/1e9:.2f}G/s")

    def sort2(d):
        a, b = jax.lax.sort((d[:, 0], d[:, 1]), num_keys=2)
        return a

    t = timeit(jax.jit(sort2), rows)
    log(f"sort [{P},2] 2-key: {t*1e3:.2f}ms = {P/t/1e6:.1f}M rows/s")
    t = timeit(jax.jit(sort2), data)
    log(f"sort [{C},2] 2-key: {t*1e3:.2f}ms = {C/t/1e6:.1f}M rows/s")

    t = timeit(jax.jit(lambda d: jax.lax.sort((d[:, 0],), num_keys=1)[0]), data)
    log(f"sort [{C}] 1-key: {t*1e3:.2f}ms = {C/t/1e6:.1f}M/s")

    # windowed segment gather: [P] bucket starts -> [P, 8, 2] rows
    def window_gather(d, starts):
        w = starts[:, None] + jnp.arange(8)[None, :]
        return d[jnp.clip(w, 0, C - 1)]

    t = timeit(jax.jit(window_gather), data, idx)
    log(f"window-gather {P}x8 rows: {t*1e3:.2f}ms = {P/t/1e6:.1f}M buckets/s")

    # dense offsets table build: bincount over prefixes + cumsum
    pref = jnp.asarray(rng.integers(0, 1 << 24, size=C, dtype=np.int64).astype(np.int32))
    def offsets(pr):
        cnt = jnp.zeros((1 << 24,), jnp.int32).at[pr].add(1)
        return jnp.cumsum(cnt)
    t = timeit(jax.jit(offsets), pref)
    log(f"offsets table (bincount {C} into 2^24 + cumsum): {t*1e3:.2f}ms")


if __name__ == "__main__":
    main()
