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
