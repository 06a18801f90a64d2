"""Pallas TPU single-pass slog liveness scan.

`wordset._slog_scan` decides, for every row of a (word, tag)-sorted log,
whether the latest insert/remove entry at-or-before it in its word run is
an insert.  The XLA form is a `lax.cummax` over a per-row marker — a
log-depth chain of materialised passes (~16ms device time at 2^24 rows on
v5e, the dynamic round's largest single term after the sorts).  A prefix
max is a sequential-friendly associative scan, so this kernel runs it the
same way ops/necklace_pallas.py runs its rotation chain: VMEM-resident
tiles with a scalar carry, touching HBM exactly ONCE per element (read
only — the outputs are two scalars).

Per tile: recompute the marker (run starts need the previous element —
one lane roll + one sublane roll per limb), prefix-max it in linear
(row-major) order via 7 lane stages + log2(block) sublane stages, combine
with the carried running max, and accumulate both counters:

- hits  = rows whose tag equals `qtag` that are live at their position
          (the round's positive-query count);
- live  = word runs whose final entry is an insert
          (the distinct-count scan, `_slog_count_kernel`), with run ends
          resolved one tile late through the carry (a run's last row is
          only known once the next row is seen).

Both counters come back from ONE pass, so a dynamic round gets its
positive count AND the set's distinct count for the price of reading the
log once.  Semantics are identical to `_slog_scan` (oracle-tested in
tests/test_scan_pallas.py); the reference analog is the sequential
last-write-wins walk of `/root/reference/src/wordset/mod.rs:97-137`.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_I32_MIN = -(1 << 31)
_MAXU = 0xFFFFFFFF  # python scalar: pallas kernels must not capture arrays


def _sel(cond, a, b):
    m = jnp.zeros((), a.dtype) - cond.astype(a.dtype)
    return (a & m) | (b & ~m)


def _prev_flat(x, carry_scalar, li, c):
    """y[i] = x[i-1] in row-major flat order; y[0] = carry_scalar."""
    z = pltpu.roll(x, 1, axis=1)  # z[r, c] = x[r, c-1] (c=0 wraps)
    w = pltpu.roll(z, 1, axis=0)  # w[r, 0] = x[r-1, 127]
    y = _sel(c > 0, z, w)
    return _sel(li == 0, jnp.full_like(x, carry_scalar), y)


def _prefix_max_flat(m, block_rows: int):
    """Inclusive prefix max of an int32 [BR, 128] array in row-major flat
    order: 7 masked lane stages, then an exclusive row-prefix of the row
    maxima folded back in."""
    c = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    r = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    mn = jnp.full_like(m, _I32_MIN)
    for k_log in range(7):
        k = 1 << k_log
        sh = jnp.where(c >= k, pltpu.roll(m, k, axis=1), mn)
        m = jnp.maximum(m, sh)
    rowmax = jnp.max(m, axis=1, keepdims=True)  # [BR, 1]
    rp = jnp.where(r[:, :1] >= 1, pltpu.roll(rowmax, 1, axis=0), mn[:, :1])
    for k_log in range(max(block_rows.bit_length() - 1, 0)):
        k = 1 << k_log
        sh = jnp.where(r[:, :1] >= k + 1, pltpu.roll(rp, k, axis=0), mn[:, :1])
        rp = jnp.maximum(rp, sh)
    return jnp.maximum(m, rp)


@lru_cache(maxsize=None)
def _scan_call(L: int, n_rows: int, block_rows: int, interpret: bool,
               pack: bool = False):
    """pack=True: the tag lives in the low 8 bits of the last word limb
    (wordset packed-tag layout) — there are L columns total, the tag is
    extracted with a mask, and run grouping masks those bits out."""
    TILE = block_rows * _LANES
    G = n_rows // block_rows
    NCOL = L if pack else L + 1
    # SMEM carry layout: [0]=running marker max, [1..L]=prev word limbs
    # (as int32 bit patterns), [L+1]=pending liveness of the previous
    # tile's last row, [L+2]=hits accum, [L+3]=live accum
    NC = L + 4

    def kernel(qtag_ref, *refs):
        x_refs = refs[:L]
        tag_ref = refs[L - 1] if pack else refs[L]
        hits_ref, live_ref = refs[NCOL], refs[NCOL + 1]
        carry = refs[NCOL + 2]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            for i in range(NC):
                carry[i] = 0
            carry[0] = -1  # below every real marker

        qtag = qtag_ref[0]
        x = [x_refs[l][...] for l in range(L)]
        tag = tag_ref[...]
        if pack:
            tag = tag & 0xFF
        li = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 1)
        li = li * _LANES + cc

        mx = jnp.uint32(_MAXU)  # built inside the trace (no capture)
        tag_mx = jnp.uint32(0xFF) if pack else mx
        neq = jnp.zeros((block_rows, _LANES), dtype=bool)
        sentinel = jnp.ones((block_rows, _LANES), dtype=bool)
        for l in range(L):
            prev = _prev_flat(x[l], carry[1 + l].astype(jnp.uint32), li, cc)
            cur = x[l]
            if pack and l == L - 1:  # run grouping ignores the in-word tag
                prev = prev & ~jnp.uint32(0xFF)
                cur = cur & ~jnp.uint32(0xFF)
            neq = neq | (prev != cur)
            sentinel = sentinel & (x[l] == mx)
        run_start = neq | ((g == 0) & (li == 0))
        typ = tag & 3
        is_entry = ((typ == 1) | (typ == 3)) & (tag != tag_mx) & ~sentinel
        idx = g * TILE + li
        bits = jnp.where(
            is_entry,
            jnp.int32(2) | (typ == 1).astype(jnp.int32),
            jnp.int32(0),
        )
        marker = jnp.where(
            run_start | is_entry, (idx << 2) | bits, jnp.int32(-1)
        )
        m = _prefix_max_flat(marker, block_rows)
        m = jnp.maximum(m, carry[0])
        live_here = ((m & 2) != 0) & ((m & 1) != 0)

        hits = jnp.sum(
            ((tag == qtag) & ~sentinel & live_here).astype(jnp.int32)
        )
        # run ends inside the tile: row i ends its run iff row i+1 starts
        # one; the tile's last row is resolved via the carry next step
        nx = pltpu.roll(run_start.astype(jnp.int32), _LANES - 1, axis=1)
        nx_w = pltpu.roll(nx, block_rows - 1, axis=0)
        next_rs = _sel(cc < _LANES - 1, nx, nx_w)  # next_rs[i]=run_start[i+1]
        endable = (li < TILE - 1) & (next_rs != 0)
        live_in = jnp.sum((endable & live_here & ~sentinel).astype(jnp.int32))
        # the previous tile's last row ended its run iff our first row
        # starts one (run_start includes the forced g==0 origin)
        first_rs = jnp.max(
            jnp.where(li == 0, run_start.astype(jnp.int32), 0)
        )
        live_in = live_in + first_rs * carry[L + 1]

        last = li == TILE - 1
        last_live = jnp.max(
            jnp.where(last, (live_here & ~sentinel).astype(jnp.int32), 0)
        )
        m_last = jnp.max(jnp.where(last, m, _I32_MIN))

        carry[0] = m_last
        for l in range(L):
            carry[1 + l] = x_refs[l][block_rows - 1, _LANES - 1].astype(
                jnp.int32
            )
        carry[L + 1] = last_live
        carry[L + 2] = carry[L + 2] + hits
        carry[L + 3] = carry[L + 3] + live_in

        @pl.when(g == G - 1)
        def _fin():
            hits_ref[0] = carry[L + 2]
            # the array's very last row always ends its run
            live_ref[0] = carry[L + 3] + last_live

    spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def run(cols2d, qtag):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [spec] * NCOL,
            out_specs=[out_spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32)] * 2,
            scratch_shapes=[pltpu.SMEM((NC,), jnp.int32)],
            interpret=interpret,
        )(jnp.asarray([qtag]).astype(jnp.uint32), *cols2d)

    return run


def slog_scan_counts_pallas(cols, qtag, pack: bool = False,
                            interpret: bool = False):
    """(hits, live) int32 device scalars over slog columns (L word limbs +
    1 tag column, or L packed-tag limbs with pack=True; each [n] uint32,
    n a multiple of 1024 and of the chosen block).  hits counts rows with
    tag == `qtag` whose word is live at their position; live counts
    distinct live words."""
    cols = tuple(cols)
    L = len(cols) if pack else len(cols) - 1
    n = cols[0].shape[0]
    n_rows = n // _LANES
    block_rows = 256
    while n_rows % block_rows:
        block_rows //= 2
    assert block_rows >= 8, (n, block_rows)
    run = _scan_call(L, n_rows, block_rows, interpret, pack)
    cols2d = tuple(c.reshape(n_rows, _LANES) for c in cols)
    hits, live = run(cols2d, qtag)
    return hits[0], live[0]


def _prefix_sum_flat(m, block_rows: int):
    """Inclusive prefix SUM of an int32 [BR, 128] array in row-major flat
    order — same shape as `_prefix_max_flat` with adds."""
    c = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    r = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    z = jnp.zeros_like(m)
    for k_log in range(7):
        k = 1 << k_log
        sh = jnp.where(c >= k, pltpu.roll(m, k, axis=1), z)
        m = m + sh
    rowsum = m[:, 127:128]  # inclusive prefix's last lane = row total
    rp = jnp.where(r[:, :1] >= 1, pltpu.roll(rowsum, 1, axis=0), z[:, :1])
    for k_log in range(max(block_rows.bit_length() - 1, 0)):
        k = 1 << k_log
        sh = jnp.where(r[:, :1] >= k + 1, pltpu.roll(rp, k, axis=0), z[:, :1])
        rp = rp + sh
    return m + rp


@lru_cache(maxsize=None)
def _blank_call(n_rows: int, block_rows: int, interpret: bool):
    """Record-boundary blanking as ONE HBM pass: running sum of the
    +1/-1 interval deltas with a scalar carry -> (int32 blanked mask,
    valid count).  Replaces the `jnp.cumsum` over the whole slab in
    `cbl._device_words` — a log-depth chain of materialised passes that
    was ~40% of the word-pipeline cost at 2^25 (session28)."""
    G = n_rows // block_rows

    def kernel(*refs):
        d_ref, out_ref, nv_ref, carry = refs
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            carry[0] = 0
            carry[1] = 0

        d = d_ref[...]
        s = _prefix_sum_flat(d, block_rows) + carry[0]
        blank = (s > 0).astype(jnp.int32)
        out_ref[...] = blank
        # the tile's last prefix value = previous carry + tile total
        carry[0] = carry[0] + jnp.sum(d)
        carry[1] = carry[1] + jnp.sum(1 - blank)

        @pl.when(g == G - 1)
        def _fin():
            nv_ref[0] = carry[1]

    spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def run(delta2d):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[spec],
            out_specs=[spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((n_rows, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
            interpret=interpret,
        )(delta2d)

    return run


def blank_mask_pallas(delta, interpret: bool = False):
    """(blanked int32 mask [n], n_valid int32 scalar) from int32 interval
    deltas [n] (n a multiple of 1024): mask[i] = cumsum(delta)[:i+1] > 0."""
    n = delta.shape[0]
    n_rows = n // _LANES
    block_rows = 256
    while n_rows % block_rows:
        block_rows //= 2
    assert block_rows >= 8, (n, block_rows)
    run = _blank_call(n_rows, block_rows, interpret)
    mask2d, nv = run(delta.reshape(n_rows, _LANES))
    return mask2d.reshape(n), nv[0]


def blank_engages(n: int) -> bool:
    mode = scan_mode()
    if mode.endswith("-force"):
        return True
    return (
        mode == "pallas"
        and n >= _MIN_PALLAS_SCAN_N
        and n % 1024 == 0
        and jax.default_backend() not in ("cpu",)
    )


_SCAN_MODES = ("xla", "pallas", "pallas-force")
_MIN_PALLAS_SCAN_N = 1 << 19


def scan_mode() -> str:
    mode = os.environ.get("CBL_TPU_SLOG_SCAN", "pallas")
    if mode not in _SCAN_MODES:
        raise ValueError(
            f"CBL_TPU_SLOG_SCAN={mode!r}: expected one of {_SCAN_MODES}"
        )
    return mode


def scan_engages(n: int) -> bool:
    mode = scan_mode()
    if mode.endswith("-force"):
        return True
    return (
        mode == "pallas"
        and n >= _MIN_PALLAS_SCAN_N
        and n % 1024 == 0
        and jax.default_backend() not in ("cpu",)
    )
