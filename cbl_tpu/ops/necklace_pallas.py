"""Pallas TPU kernel for the batched necklace (min-rotation) transform.

The XLA `fori_loop` version (cbl_tpu.necklace.necklace_pos) re-materialises
the (rot, best, pos) carry in HBM every rotation step — ~2K round trips over
the batch.  This kernel keeps the whole carry in VMEM for a block of k-mers
and only touches HBM once per block: O(1) HBM passes instead of O(2K).

Layout: limb-major [L, B] blocks (lanes = k-mers, sublanes = limbs), the
natural VPU shape for multi-limb arithmetic.  Semantics are identical to
`/root/reference/src/necklace/mod.rs:13-25` (min over left-rotations,
smallest position wins ties).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CBLConfig
from ..limbs import width_mask

DEFAULT_BLOCK = 2048


@lru_cache(maxsize=None)
def _kernel_fn(cfg: CBLConfig, block: int, interpret: bool):
    W = cfg.kmer_bits
    L = cfg.kmer_limbs
    mask_rows = [int(m) for m in width_mask(W, L)]  # python scalars, not a
    # captured array constant (pallas kernels must not close over arrays)
    msb_row = L - 1 - (W - 1) // 32
    msb_off = (W - 1) % 32

    def rotl1(v):
        # v: [L, B]; one-bit left rotation of the W-bit values
        msb = (v[msb_row : msb_row + 1, :] >> msb_off) & jnp.uint32(1)
        rows = []
        for l in range(L):
            r = v[l : l + 1, :] << 1
            if l + 1 < L:
                r = r | (v[l + 1 : l + 2, :] >> 31)
            rows.append(r & jnp.uint32(mask_rows[l]))
        rows[L - 1] = rows[L - 1] | msb
        return jnp.concatenate(rows, axis=0)

    def lt(a, b):
        # [1, B] lexicographic less-than over the limb axis
        res = a[L - 1 : L, :] < b[L - 1 : L, :]
        for l in range(L - 2, -1, -1):
            res = (a[l : l + 1, :] < b[l : l + 1, :]) | (
                (a[l : l + 1, :] == b[l : l + 1, :]) & res
            )
        return res

    def kernel(x_ref, neck_ref, pos_ref):
        x = x_ref[...]

        def body(p, carry):
            rot, best, pos = carry
            rot = rotl1(rot)
            better = lt(rot, best)
            best = jnp.where(better, rot, best)
            pos = jnp.where(better, jnp.uint32(p), pos)
            return rot, best, pos

        pos0 = jnp.zeros((1, block), dtype=jnp.uint32)
        _, best, pos = jax.lax.fori_loop(1, W, body, (x, x, pos0))
        neck_ref[...] = best
        pos_ref[...] = pos

    def run(x_lm):  # [L, N] limb-major
        N = x_lm.shape[1]
        assert N % block == 0
        grid = (N // block,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ],
            out_specs=[
                pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((L, N), jnp.uint32),
                jax.ShapeDtypeStruct((1, N), jnp.uint32),
            ],
            interpret=interpret,
        )(x_lm)

    return run


def necklace_pos_pallas(kmers, cfg: CBLConfig, block: int = DEFAULT_BLOCK,
                        interpret: bool = False):
    """[N, L] row-major k-mers -> (necklace [N, L], pos [N]); N % block == 0."""
    run = _kernel_fn(cfg, block, interpret)
    neck_lm, pos = run(kmers.T)
    return neck_lm.T, pos[0]


# --- v2: full-tile per-limb layout ---
#
# v1 lays a block out as [L, B]: the limb axis rides the 8-wide sublane
# dimension, so for L=2 limbs 6/8 sublanes idle on EVERY op of the rotation
# chain.  v2 passes each limb as its own [BR, 128] ref (full (8,128) VPU
# tiles) and carries (rot, best, pos) as per-limb tuples, so all ~2K
# iterations run at full lane occupancy with no in-kernel reshuffles.

_LANES = 128
_MAX_BLOCK_ROWS = 256


@lru_cache(maxsize=None)
def _kernel2_fn(cfg: CBLConfig, n_rows: int, block_rows: int, interpret: bool):
    W = cfg.kmer_bits
    L = cfg.kmer_limbs
    mask_rows = [int(m) for m in width_mask(W, L)]
    msb_row = L - 1 - (W - 1) // 32
    msb_off = (W - 1) % 32

    def rotl1(rot):
        # rot: L-tuple of [BR, 128]; 1-bit left rotation of the W-bit values
        msb = (rot[msb_row] >> msb_off) & jnp.uint32(1)
        out = []
        for l in range(L):
            r = rot[l] << 1
            if l + 1 < L:
                r = r | (rot[l + 1] >> 31)
            out.append(r & jnp.uint32(mask_rows[l]))
        out[L - 1] = out[L - 1] | msb
        return tuple(out)

    def lt(a, b):
        res = a[L - 1] < b[L - 1]
        for l in range(L - 2, -1, -1):
            res = (a[l] < b[l]) | ((a[l] == b[l]) & res)
        return res

    def kernel(*refs):
        x_refs, neck_refs, pos_ref = refs[:L], refs[L : 2 * L], refs[2 * L]
        x = tuple(r[...] for r in x_refs)

        def body(p, carry):
            rot = carry[:L]
            best = carry[L : 2 * L]
            pos = carry[2 * L]
            rot = rotl1(rot)
            better = lt(rot, best)
            best = tuple(
                jnp.where(better, rot[l], best[l]) for l in range(L)
            )
            pos = jnp.where(better, p.astype(jnp.uint32), pos)
            return (*rot, *best, pos)

        pos0 = jnp.zeros_like(x[0])
        carry = jax.lax.fori_loop(1, W, body, (*x, *x, pos0))
        for l in range(L):
            neck_refs[l][...] = carry[L + l]
        pos_ref[...] = carry[2 * L]

    def run(limb_cols):  # L-tuple of [n_rows, 128]
        grid = (n_rows // block_rows,)
        spec = pl.BlockSpec(
            (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * L,
            out_specs=[spec] * (L + 1),
            out_shape=[jax.ShapeDtypeStruct((n_rows, _LANES), jnp.uint32)]
            * (L + 1),
            interpret=interpret,
        )(*limb_cols)
        return outs[:L], outs[L]

    return run


def necklace_pos_pallas2(kmers, cfg: CBLConfig, interpret: bool = False):
    """[N, L] row-major k-mers -> (necklace [N, L], pos [N]).

    Requires N to be a multiple of 4096 (the pipeline chunk is always a
    power of two >= 4096)."""
    N, L = kmers.shape
    assert N % (_LANES * 8) == 0, N
    n_rows = N // _LANES
    block_rows = min(_MAX_BLOCK_ROWS, n_rows)
    run = _kernel2_fn(cfg, n_rows, block_rows, interpret)
    cols = tuple(kmers[:, l].reshape(n_rows, _LANES) for l in range(L))
    neck_cols, pos = run(cols)
    neck = jnp.stack([c.reshape(N) for c in neck_cols], axis=-1)
    return neck, pos.reshape(N)
