"""Pallas TPU merge-path (co-rank) merge and merge-sort.

Every hot kernel of the word-set store reduces to sorting / merging large
multi-limb uint32 column tuples (wordset.py).  `jax.lax.sort` re-runs a
full comparator network over HBM (~325 materialised stages at 2^25); the
bitonic merge kernel (ops/sort_pallas.merge_cols_pallas) cuts a MERGE of
two sorted runs to ~log2(N) HBM strides; this module cuts it to **~one
HBM pass**:

1. (XLA) co-rank partition: for each output tile boundary g*T, a
   vectorized binary search over the *merge-path diagonal* finds how many
   elements of A (`ai`) and of B (`g*T - ai`) precede it.  Each input
   element belongs to exactly one output tile, and tile g's output is the
   merge of A[ai_g:ai_{g+1}] and B[bi_g:bi_{g+1}] (lengths sum to T).
2. (Pallas, grid g) each program reads the two segment windows from HBM
   via scalar-prefetched block indices (Pallas double-buffers them),
   shifts each window so its segment starts at element 0 (dynamic
   sublane slice + dynamic lane roll), masks the tail to the dtype max,
   bitonic-merges the 2T-element frame entirely in VMEM (log2(2T)
   compare-exchange strides), and writes the first T elements.

HBM traffic: ~2 block reads per side per tile + 1 write ≈ 5 streamed
units/element (vs ~30 for the bitonic merge's ~10 passes, far more for a
monolithic sort).  A full SORT composes a VMEM tile-sort pass with
log2(N/T) merge passes — ~1 + log2(N/T) HBM passes total.

Comparator: lexicographic over ALL columns (column 0 most significant) —
identical to `lax.sort(cols, num_keys=len(cols))`; full-row ties are
bitwise-identical rows, so outputs match lax.sort exactly (same argument
as ops/sort_pallas.py).

This file is TPU-first original work; the reference
(`/root/reference/src/wordset/set_ops.rs`) merges per-bucket pointer
structures element-by-element on a CPU.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sort_pallas import (
    _LANES,
    _cmpex,
    _dtype_max,
    _local_iota,
    _sel,
    _tilesort_call,
)

_LANES_LOG = 7


# --------------------------------------------------------------------------
# co-rank partition (XLA side)
# --------------------------------------------------------------------------


def _gather_rows(cols, idx):
    return tuple(c[idx] for c in cols)


def _lex_le(a, b):
    """a <= b over column tuples (column 0 most significant)."""
    L = len(a)
    le = a[L - 1] <= b[L - 1]
    for l in range(L - 2, -1, -1):
        le = (a[l] < b[l]) | ((a[l] == b[l]) & le)
    return le


def _corank_search(lo, hi, n_iter: int, pred_at):
    """Vectorized first-false binary search: pred_at(mid) is monotone
    decreasing; returns the smallest index where it is false."""

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) >> 1
        pred = pred_at(mid)
        lo = jnp.where(active & pred, mid + 1, lo)
        hi = jnp.where(active & ~pred, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo


def _coranks(cols_a, cols_b, diags):
    """ai[j] = number of A-elements among the first diags[j] merged
    elements (A before B on ties).  pred(i) = (A[i] <= B[d-i-1])."""
    Na = cols_a[0].shape[0]
    Nb = cols_b[0].shape[0]
    d = diags.astype(jnp.int32)
    lo = jnp.maximum(0, d - Nb)
    hi = jnp.minimum(d, Na)

    def pred_at(mid):
        a_row = _gather_rows(cols_a, jnp.clip(mid, 0, Na - 1))
        b_row = _gather_rows(cols_b, jnp.clip(d - mid - 1, 0, Nb - 1))
        return _lex_le(a_row, b_row)

    return _corank_search(lo, hi, int(Na).bit_length() + 1, pred_at)


# --------------------------------------------------------------------------
# in-kernel helpers
# --------------------------------------------------------------------------


def _dyn_lane_roll_left(x, s, use_matmul: bool):
    """y[r, c] = x[r, (c + s) % 128] for a traced scalar s in [0, 128)."""
    if not use_matmul:
        return pltpu.roll(x, (_LANES - s) % _LANES, axis=1)
    # MXU fallback: one-hot permutation matmul over 4 exact uint8 planes.
    # Mosaic has no direct uint32<->float32 casts; bounce through int32.
    jrow = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    P = ((ccol + s) % _LANES == jrow).astype(jnp.float32)
    out = None
    for byte in range(4):
        plane = (
            ((x >> (8 * byte)) & jnp.uint32(0xFF))
            .astype(jnp.int32)
            .astype(jnp.float32)
        )
        moved = jnp.dot(plane, P, preferred_element_type=jnp.float32)
        part = moved.astype(jnp.int32).astype(jnp.uint32) << (8 * byte)
        out = part if out is None else out | part
    return out


def _reverse_flat(x, li):
    """Reverse an (H, 128) array in FLAT element order without lax.rev
    (unimplemented in Mosaic): i -> N-1-i is an index XOR with N-1, which
    factors into one unconditional XOR-swap per index bit — the same
    roll+select exchange `_cmpex` uses (result[i] = x[i ^ j])."""
    H = x.shape[0]
    for j_log in range(_LANES_LOG + int(H).bit_length() - 1):
        j = 1 << j_log
        if j_log >= _LANES_LOG:
            axis, sh = 0, j >> _LANES_LOG
        else:
            axis, sh = 1, j
        size = x.shape[axis]
        lower = (li & j) == 0
        x = _sel(
            lower,
            pltpu.roll(x, size - sh, axis),
            pltpu.roll(x, sh, axis),
        )
    return x


def _window_raw(scr_ref, start_flat, H: int, use_matmul: bool):
    """Flat elements [start_flat, start_flat + T) of the (2H+8, 128)
    scratch ref as an (H, 128) array (row-major flat order).  ONE dynamic
    lane roll of the loaded H+8 rows serves both the aligned rows and
    their +1-row successors (the roll is row-independent)."""
    q = start_flat >> _LANES_LOG
    s = start_flat & (_LANES - 1)
    rows = scr_ref[pl.ds(q, H + 8)]
    z = _dyn_lane_roll_left(rows, s, use_matmul)
    c = jax.lax.broadcasted_iota(jnp.int32, (H, _LANES), 1)
    return jnp.where(c < _LANES - s, z[0:H], z[1 : H + 1])


def _window(scr_ref, start_flat, length, H: int, dt, use_matmul: bool):
    """Extract the sorted window [start_flat, start_flat + T) from the
    (2H+8, 128) scratch ref and mask elements >= length to the dtype max.
    Returns an (H, 128) array whose flat order is [segment, max-pad...]."""
    w = _window_raw(scr_ref, start_flat, H, use_matmul)
    li = _local_iota(H)
    mx = jnp.full((), _dtype_max(dt), dt)
    return jnp.where(li < length, w.astype(dt), mx)


def _window_desc(scr_ref, start_flat, length, H: int, dt, use_matmul: bool):
    """B-side window extraction from the FLIPPED-in-HBM copy of B (R =
    [max-pad^T | B reversed]): the flat elements [start_flat,
    start_flat + T) of R are the segment's values in DESCENDING order
    already sitting at the frame's tail, so masking the leading T-length
    elements to the dtype max yields [max-pad..., segment desc] — exactly
    the bitonic frame's second half, with ZERO in-kernel reversal work
    (the 15-stage `_reverse_flat` roll cascade this replaces was ~45% of
    the merge pass's VPU cost)."""
    w = _window_raw(scr_ref, start_flat, H, use_matmul)
    li = _local_iota(H)
    mx = jnp.full((), _dtype_max(dt), dt)
    return jnp.where(li >= H * _LANES - length, w.astype(dt), mx)


# --------------------------------------------------------------------------
# the merge-pass kernel
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _merge_call(dts, t_log: int, nblk_a: int, nblk_b: int, interpret: bool,
                use_matmul: bool, flipb: bool = False):
    """One merge pass: grid g over output tiles of T = 1 << t_log elements.

    prm: int32 [6, G]: blkA, laA (flat offset of the A-segment inside the
    2-block window), lenA, blkB, laB, lenB.  Window blocks arrive via
    BlockSpec index maps reading prm (pipelined/double-buffered by
    Pallas); the trailing 8 rows of a third block cover sublane spill.

    flipb: the B operand is the flipped-in-HBM copy R = [max^T | B
    reversed] and prm's blkB/laB address R; the kernel then builds the
    bitonic frame's descending half by a plain forward window read
    (`_window_desc`) instead of the in-VMEM `_reverse_flat` cascade."""
    L = len(dts)
    H = (1 << t_log) // _LANES
    H8 = H // 8

    def kernel(prm, *refs):
        a_refs = refs[0 : 3 * L]
        b_refs = refs[3 * L : 6 * L]
        out_refs = refs[6 * L : 7 * L]
        scr_a = refs[7 * L : 8 * L]
        scr_b = refs[8 * L : 9 * L]
        g = pl.program_id(0)
        laA, lenA = prm[1, g], prm[2, g]
        laB, lenB = prm[4, g], prm[5, g]
        cols = []
        for l in range(L):
            scr_a[l][0:H] = a_refs[l][...]
            scr_a[l][H : 2 * H] = a_refs[L + l][...]
            scr_a[l][2 * H : 2 * H + 8] = a_refs[2 * L + l][...]
            scr_b[l][0:H] = b_refs[l][...]
            scr_b[l][H : 2 * H] = b_refs[L + l][...]
            scr_b[l][2 * H : 2 * H + 8] = b_refs[2 * L + l][...]
            wa = _window(scr_a[l], laA, lenA, H, dts[l], use_matmul)
            # [A ascending | B descending] = one bitonic frame of 2T
            if flipb:
                wb_rev = _window_desc(scr_b[l], laB, lenB, H, dts[l],
                                      use_matmul)
            else:
                wb = _window(scr_b[l], laB, lenB, H, dts[l], use_matmul)
                wb_rev = _reverse_flat(wb, _local_iota(H))
            cols.append(jnp.concatenate([wa, wb_rev], axis=0))
        li = _local_iota(2 * H)
        for j_log in range(t_log, -1, -1):
            cols = _cmpex(cols, li, j_log, True)
        for l in range(L):
            out_refs[l][...] = cols[l][0:H]

    def specs_for(nblk: int, row: int):
        # row = prm row holding this side's first window-block index
        own = [
            pl.BlockSpec(
                (H, _LANES),
                (lambda g, prm, d=d, r=row, nb=nblk: (
                    jnp.minimum(prm[r, g] + d, nb - 1), 0)),
                memory_space=pltpu.VMEM,
            )
            for d in (0, 1)
        ]
        spill = pl.BlockSpec(
            (8, _LANES),
            (lambda g, prm, r=row, nb=nblk: (
                jnp.minimum((prm[r, g] + 2) * H8, nb * H8 - 1), 0)),
            memory_space=pltpu.VMEM,
        )
        return own + [spill]

    sa = specs_for(nblk_a, 0)
    sb = specs_for(nblk_b, 3)
    out_spec = pl.BlockSpec(
        (H, _LANES), lambda g, prm: (g, 0), memory_space=pltpu.VMEM
    )

    def run(prm, cols_a2d, cols_b2d, G: int):
        in_specs = (
            [sa[0]] * L + [sa[1]] * L + [sa[2]] * L
            + [sb[0]] * L + [sb[1]] * L + [sb[2]] * L
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=in_specs,
            out_specs=[out_spec] * L,
            scratch_shapes=[pltpu.VMEM((2 * H + 8, _LANES), dt) for dt in dts]
            * 2,
        )
        operands = list(cols_a2d) * 3 + list(cols_b2d) * 3
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((G * H, _LANES), dt) for dt in dts
            ],
            interpret=interpret,
        )(prm, *operands)

    return run


def _pad_cols(cols, n_to: int):
    n = cols[0].shape[0]
    if n == n_to:
        return cols
    return tuple(
        jnp.concatenate(
            [c, jnp.full((n_to - n,), _dtype_max(c.dtype), dtype=c.dtype)]
        )
        for c in cols
    )


def _merge_tile_log(n_cols: int = 2) -> int:
    """Largest measured tile wins on v5e: t=16 edges t=15 for 2-column
    merges (session24: 40.5 vs 41.5ms at 2^25+2^25; session15 had
    54/56/65ms for t=15/14/13), t=15 verified through L=4; 5+ columns at
    t=15 crashed the Mosaic compiler (session16)."""
    env = os.environ.get("CBL_TPU_MERGE_TLOG")
    if env:
        return int(env)
    if n_cols <= 2:
        return 16
    return 15 if n_cols <= 4 else 13


def _use_matmul_roll() -> bool:
    return os.environ.get("CBL_TPU_DYNROLL", "roll") == "matmul"


def _use_flipb() -> bool:
    """Default: build the bitonic frame's descending half from a
    flipped-in-HBM copy of B (one streaming XLA pass over the B side,
    usually the small operand) instead of the 15-stage in-VMEM
    `_reverse_flat` roll cascade.  CBL_TPU_MERGE_REV=inkernel restores
    the round-3 kernel for A/B comparison."""
    return os.environ.get("CBL_TPU_MERGE_REV", "flip") != "inkernel"


def _flip_pad_cols(cols, T: int):
    """R = [dtype-max^T | cols reversed]: R[T + j] = cols[N-1-j].  The
    descending window of segment [b0, b0+len) then sits at flat offset
    N - b0 (leading pad keeps every offset non-negative and adds exactly
    one T-element block)."""
    return tuple(
        jnp.concatenate(
            [jnp.full((T,), _dtype_max(c.dtype), dtype=c.dtype), c[::-1]]
        )
        for c in cols
    )


def merge_sorted_cols(cols_a, cols_b, t_log: int | None = None,
                      interpret: bool = False):
    """Merge two column tuples that are EACH sorted ascending (all columns
    keys, lexicographic) into one fully sorted tuple of length |a|+|b|;
    equals `lax.sort(concat)` exactly (all-max rows are interchangeable
    with the internal pads).  Lengths must be multiples of 128."""
    cols_a = tuple(cols_a)
    cols_b = tuple(cols_b)
    if t_log is None:
        t_log = _merge_tile_log(len(cols_a))
    T = 1 << t_log
    Na, Nb = cols_a[0].shape[0], cols_b[0].shape[0]
    Nap = max(-(-Na // T) * T, T)
    Nbp = max(-(-Nb // T) * T, T)
    a = _pad_cols(cols_a, Nap)
    b = _pad_cols(cols_b, Nbp)
    G = (Nap + Nbp) // T
    diags = jnp.arange(G + 1, dtype=jnp.int32) * T
    ai = _coranks(a, b, diags)
    bi = diags - ai
    flipb = _use_flipb()
    prm = _merge_params(ai, bi, t_log, G, Nbp if flipb else 0)
    dts = tuple(c.dtype for c in a)
    a2d = tuple(c.reshape(Nap // _LANES, _LANES) for c in a)
    if flipb:
        bR = _flip_pad_cols(b, T)
        b2d = tuple(c.reshape((Nbp + T) // _LANES, _LANES) for c in bR)
        nblk_b = Nbp // T + 1
    else:
        b2d = tuple(c.reshape(Nbp // _LANES, _LANES) for c in b)
        nblk_b = Nbp // T
    run = _merge_call(dts, t_log, Nap // T, nblk_b, interpret,
                      _use_matmul_roll(), flipb)
    out2d = run(prm, a2d, b2d, G)
    out = tuple(c.reshape(G * T) for c in out2d)
    if G * T != Na + Nb:
        out = tuple(c[: Na + Nb] for c in out)
    return out


def _merge_params(ai, bi, t_log: int, G: int, flip_n: int = 0):
    """[6, G] int32 kernel params from co-rank boundaries ai/bi [G+1]:
    per tile, each side's window starts at block floor(start / T) and the
    segment sits at flat offset start - block*T within it.  With
    flip_n = Nbp (flipb mode) the B coordinates address the flipped copy
    R: the descending window of segment [b0, b0+len) starts at flat
    offset Nbp - b0 of R (see `_flip_pad_cols`)."""
    a0 = ai[:G]
    b0 = bi[:G]
    lenB = bi[1:] - b0
    if flip_n:
        b0 = flip_n - b0
    blkA = a0 >> t_log
    blkB = b0 >> t_log
    return jnp.stack(
        [
            blkA,
            a0 - (blkA << t_log),
            ai[1:] - a0,
            blkB,
            b0 - (blkB << t_log),
            lenB,
        ]
    ).astype(jnp.int32)


# --------------------------------------------------------------------------
# full sort = tile-sort + log2(N/T) merge passes
# --------------------------------------------------------------------------


def sort_cols_mergepath(cols, t_log: int | None = None,
                        interpret: bool = False):
    """Sort equal-length 1-D integer columns lexicographically (column 0
    most significant; every column a key).  Length must be a power of two
    and a multiple of 1024.  ~1 + log2(N/T) HBM passes."""
    cols = tuple(cols)
    N = cols[0].shape[0]
    n_log = N.bit_length() - 1
    assert N == 1 << n_log and N % (8 * _LANES) == 0, N
    if t_log is None:
        t_log = _merge_tile_log(len(cols))
    t_log = min(t_log, n_log)
    T = 1 << t_log
    dts = tuple(c.dtype for c in cols)
    cols2d = tuple(c.reshape(N // _LANES, _LANES) for c in cols)
    cols2d = _tilesort_call(dts, t_log, interpret, False)(cols2d)
    cols = tuple(c.reshape(N) for c in cols2d)
    G = N // T
    use_mm = _use_matmul_roll()
    flipb = _use_flipb()
    for p in range(n_log - t_log):
        R = T << p  # current sorted-run length
        tiles_per_pair = (2 * R) // T
        g = jnp.arange(G, dtype=jnp.int32)
        pair = g >> (p + 1)
        dloc = (g & (tiles_per_pair - 1)) << t_log
        base = pair * (2 * R)
        ai_loc = _coranks_runs(cols, base, R, dloc)
        # end of tile g's A-segment = start co-rank of tile g+1 within the
        # same pair, or R at the pair's last tile
        ai_end = jnp.where(
            (g & (tiles_per_pair - 1)) == tiles_per_pair - 1,
            R,
            jnp.concatenate([ai_loc[1:], ai_loc[:1]]),
        )
        a0 = base + ai_loc
        b0 = base + R + (dloc - ai_loc)
        if flipb:
            b0 = N - b0  # address the flipped whole-array copy
        lenA = ai_end - ai_loc
        blkA = a0 >> t_log
        blkB = b0 >> t_log
        prm = jnp.stack(
            [
                blkA,
                a0 - (blkA << t_log),
                lenA,
                blkB,
                b0 - (blkB << t_log),
                T - lenA,
            ]
        ).astype(jnp.int32)
        cols2d = tuple(c.reshape(N // _LANES, _LANES) for c in cols)
        if flipb:
            bR = _flip_pad_cols(cols, T)
            b2d = tuple(c.reshape((N + T) // _LANES, _LANES) for c in bR)
            run = _merge_call(dts, t_log, G, G + 1, interpret, use_mm, True)
            out2d = run(prm, cols2d, b2d, G)
        else:
            run = _merge_call(dts, t_log, G, G, interpret, use_mm)
            out2d = run(prm, cols2d, cols2d, G)
        cols = tuple(c.reshape(N) for c in out2d)
    return cols


def _coranks_runs(cols, base, R: int, dloc):
    """Co-rank of diagonal dloc within the run pair [base, base+R) (A) and
    [base+R, base+2R) (B) of the SAME column arrays, vectorized over
    tiles.  Same predicate as `_coranks` with run-relative indexing."""
    lo = jnp.maximum(0, dloc - R)
    hi = jnp.minimum(dloc, R)

    def pred_at(mid):
        a_row = _gather_rows(cols, base + jnp.clip(mid, 0, R - 1))
        b_row = _gather_rows(
            cols, base + R + jnp.clip(dloc - mid - 1, 0, R - 1)
        )
        return _lex_le(a_row, b_row)

    return _corank_search(lo, hi, int(R).bit_length() + 1, pred_at)
