"""Pallas TPU kernel for the batched necklace (min-rotation) transform.

The unrolled XLA chain (cbl_tpu.necklace.necklace_pos) materialises the
(rot, best, pos) carry in HBM between fusion groups — measured ~450ms for
2^25 k-mers on v5e (session10, scalar-sync timing; the whole pipeline's
dominant cost).  This kernel keeps the carry in VMEM for a block of k-mers
and touches HBM exactly once per block: read the k-mer limbs, write the
necklace limbs + position.

Layout: each limb is its own [BR, 128] ref (full (8,128) VPU tiles) and the
(rot, best, pos) carry is a per-limb tuple, so all ~2K rotation steps run at
full lane occupancy with no in-kernel reshuffles.  Semantics are identical
to `/root/reference/src/necklace/mod.rs:13-25` (min over left-rotations,
smallest position wins ties) — tested against the XLA chain and the
brute-force oracle in tests/test_necklace_pallas.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CBLConfig
from ..limbs import width_mask

_LANES = 128
_MAX_BLOCK_ROWS = 256


@lru_cache(maxsize=None)
def _kernel_fn(cfg: CBLConfig, n_rows: int, block_rows: int, interpret: bool):
    W = cfg.kmer_bits
    L = cfg.kmer_limbs
    mask_rows = [int(m) for m in width_mask(W, L)]  # python scalars, not a
    # captured array constant (pallas kernels must not close over arrays)
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


def necklace_pos_pallas(kmers, cfg: CBLConfig, interpret: bool = False):
    """[N, L] row-major k-mers -> (necklace [N, L], pos [N]).

    Requires N to be a multiple of 1024 (pipeline shapes are powers of two
    >= 4096)."""
    N, L = kmers.shape
    assert N % (_LANES * 8) == 0, N
    n_rows = N // _LANES
    block_rows = min(_MAX_BLOCK_ROWS, n_rows)
    run = _kernel_fn(cfg, n_rows, block_rows, interpret)
    cols = tuple(kmers[:, l].reshape(n_rows, _LANES) for l in range(L))
    neck_cols, pos = run(cols)
    neck = jnp.stack([c.reshape(N) for c in neck_cols], axis=-1)
    return neck, pos.reshape(N)
