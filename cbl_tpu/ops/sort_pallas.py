"""Pallas TPU bitonic sort over multi-limb uint32 columns.

Every hot kernel of the word-set store funnels into `jax.lax.sort` over
uint32 key columns (build merges, query sort-joins, set algebra, log folds
— see wordset.py).  XLA's sort materialises each of the ~log^2(N)/2
comparator stages to HBM (measured ~150ms for 2-key 2^25 rows on v5e,
~0.46ms/stage — pure HBM traffic).  This kernel runs the same bitonic
network but keeps every stride < TILE inside VMEM, so a 2^25 sort touches
HBM ~36 times instead of ~325:

- one tile-sort pass: each VMEM-resident tile of T elements runs all
  stages k <= T (directions taken from the GLOBAL element index, so tiles
  come out alternately ascending/descending exactly as the global network
  requires);
- per global stage k > T: one cross-tile compare-exchange pass per stride
  j >= T (element i pairs with i^j; each program reads its own block and
  its partner block and writes its own block — streaming, no gathers),
  then ONE fused in-tile pass for all strides j < T.

Comparator: lexicographic over ALL columns (column 0 most significant),
i.e. `lax.sort(cols, num_keys=len(cols))` semantics.  Callers that used
payload columns rely only on run-grouping of the key columns, so making
the payload a tie-break key is observably identical (and the all-ones
sentinel still sorts last).  Ties of full rows are identical rows, so the
output equals lax.sort's exactly.

This file is TPU-first original work; the reference
(`/root/reference/src/wordset/mod.rs`) has no analog — it mutates
pointer-based containers per element.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_LANES_LOG = 7


def _dtype_max(dt):
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return jnp.iinfo(dt).max
    return jnp.iinfo(dt).max  # signed: INT_MAX sorts last among payloads


def _lex_lt(a, b):
    """a < b over column tuples, column 0 most significant."""
    L = len(a)
    lt = a[L - 1] < b[L - 1]
    for l in range(L - 2, -1, -1):
        lt = (a[l] < b[l]) | ((a[l] == b[l]) & lt)
    return lt


def _rows_eq(a, b):
    eq = a[0] == b[0]
    for l in range(1, len(a)):
        eq = eq & (a[l] == b[l])
    return eq


def _sel_mode() -> str:
    return os.environ.get("CBL_TPU_SEL", "mask")


def _sel(cond, a, b):
    """Elementwise `cond ? a : b`.  Default: bitwise masks (round-1
    Mosaic rejected the i1-predicate vector select over rolled operands
    with an unsupported i8->i1 truncation; two's-complement masks
    sidestep predicates — 4 ops).  CBL_TPU_SEL=where tries the native
    predicated select (1 op) for A/B timing on newer Mosaic."""
    if _sel_mode() == "where":
        return jnp.where(cond, a, b)
    m = jnp.zeros((), a.dtype) - cond.astype(a.dtype)  # 0 or all-ones
    return (a & m) | (b & ~m)


def _cmpex(cols, li, j_log: int, asc):
    """One compare-exchange stride within a VMEM block.

    cols: list of [H, 128] arrays; li: [H, 128] local element index
    (i = r*128 + c); asc: bool array or scalar — ascending direction mask.
    Element i exchanges with i ^ (1 << j_log)."""
    j = 1 << j_log
    if j_log >= _LANES_LOG:
        axis, sh = 0, j >> _LANES_LOG
    else:
        axis, sh = 1, j
    size = cols[0].shape[axis]
    lower = (li & j) == 0
    # roll is cyclic and shifts must be non-negative: size-sh ≡ -sh
    other = [
        _sel(lower, pltpu.roll(x, size - sh, axis), pltpu.roll(x, sh, axis))
        for x in cols
    ]
    want_min = ~(lower ^ asc)
    lt_os = _lex_lt(other, cols)
    take_other = (want_min & lt_os) | ~(
        want_min | lt_os | _rows_eq(other, cols)
    )
    return [_sel(take_other, o, s) for o, s in zip(other, cols)]


def _local_iota(H: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (H, _LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (H, _LANES), 1)
    return r * _LANES + c


@lru_cache(maxsize=None)
def _tilesort_call(dts, t_log: int, interpret: bool, alternating: bool = True):
    """Pass 1: full bitonic sort of each tile.

    alternating=True (bitonic network): directions come from the GLOBAL
    element index, so tile g sorts ascending iff g is even — the state the
    first global merge stage (k = 2T) expects.  alternating=False
    (merge-path sort): every tile sorts ascending."""
    L = len(dts)
    H = (1 << t_log) // _LANES

    def kernel(*refs):
        cols = [r[...] for r in refs[:L]]
        g = pl.program_id(0)
        li = _local_iota(H)
        for k_log in range(1, t_log + 1):
            if k_log < t_log:
                asc = (li & (1 << k_log)) == 0
            elif alternating:
                asc = (g & 1) == 0  # bit t_log of the global index
            else:
                asc = True
            for j_log in range(k_log - 1, -1, -1):
                cols = _cmpex(cols, li, j_log, asc)
        for l in range(L):
            refs[L + l][...] = cols[l]

    spec = pl.BlockSpec((H, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def run(cols2d):
        G = cols2d[0].shape[0] // H
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[spec] * L,
            out_specs=[spec] * L,
            out_shape=[
                jax.ShapeDtypeStruct(cols2d[0].shape, dt) for dt in dts
            ],
            interpret=interpret,
        )(*cols2d)

    return run


@lru_cache(maxsize=None)
def _cross_call(dts, t_log: int, interpret: bool):
    """One cross-tile compare-exchange pass: element i pairs with i ^ j for
    a stride j >= T.  The tile-stride jt = j/T and the stage-bit position d
    (k = T << d) are SCALAR-PREFETCH parameters — one compiled kernel
    serves every (stage, stride) pass of the network; the partner block
    index `g ^ jt` is computed from the prefetched scalar in the index
    map.  Program g reads tile g and tile g^jt and writes tile g
    (streaming: 2 reads + 1 write per element, no gathers)."""
    L = len(dts)
    H = (1 << t_log) // _LANES

    def kernel(params, *refs):
        s = [r[...] for r in refs[:L]]
        o = [r[...] for r in refs[L : 2 * L]]
        g = pl.program_id(0)
        jt, d = params[0], params[1]
        lower = (g & jt) == 0
        asc = ((g >> d) & 1) == 0
        want_min = ~(lower ^ asc)
        lt_os = _lex_lt(o, s)
        take_other = (want_min & lt_os) | ~(
            want_min | lt_os | _rows_eq(o, s)
        )
        for l in range(L):
            refs[2 * L + l][...] = _sel(take_other, o[l], s[l])

    own = pl.BlockSpec(
        (H, _LANES), lambda g, p: (g, 0), memory_space=pltpu.VMEM
    )
    par = pl.BlockSpec(
        (H, _LANES), lambda g, p: (g ^ p[0], 0), memory_space=pltpu.VMEM
    )

    def run(cols2d, jt: int, d_log: int):
        G = cols2d[0].shape[0] // H
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[own] * L + [par] * L,
            out_specs=[own] * L,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(cols2d[0].shape, dt) for dt in dts
            ],
            interpret=interpret,
        )(jnp.array([jt, d_log], jnp.int32), *cols2d, *cols2d)

    return run


@lru_cache(maxsize=None)
def _intile_call(dts, t_log: int, interpret: bool):
    """Fused strides j = T/2 .. 1 of the global stage k = T << d.
    Direction is constant per tile — bit (t_log + d) of the global index =
    bit d of the tile index — with d a scalar-prefetch parameter, so one
    compiled kernel serves every global stage."""
    L = len(dts)
    H = (1 << t_log) // _LANES

    def kernel(params, *refs):
        cols = [r[...] for r in refs[:L]]
        g = pl.program_id(0)
        li = _local_iota(H)
        asc = ((g >> params[0]) & 1) == 0
        for j_log in range(t_log - 1, -1, -1):
            cols = _cmpex(cols, li, j_log, asc)
        for l in range(L):
            refs[L + l][...] = cols[l]

    spec = pl.BlockSpec(
        (H, _LANES), lambda i, p: (i, 0), memory_space=pltpu.VMEM
    )

    def run(cols2d, d_log: int):
        G = cols2d[0].shape[0] // H
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[spec] * L,
            out_specs=[spec] * L,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(cols2d[0].shape, dt) for dt in dts
            ],
            interpret=interpret,
        )(jnp.array([d_log], jnp.int32), *cols2d)

    return run


def _tile_log_for(L: int) -> int:
    """Largest tile (log2 elements) whose double-buffered in+out column
    blocks fit comfortably in ~12MB of VMEM."""
    env = os.environ.get("CBL_TPU_SORT_TLOG")
    if env:
        return int(env)
    # t_log=16 is the largest tile that compiles on v5e (17/18 exceed the
    # 16MB scoped-VMEM limit — session13 log); measured 2^25 L=2: 186ms.
    return 16


def sort_cols_pallas(cols, t_log: int | None = None, interpret: bool = False):
    """Sort equal-length 1-D integer columns lexicographically (column 0
    most significant; every column is a key).  Length must be a power of
    two and a multiple of 1024.  Returns the sorted column tuple."""
    cols = tuple(cols)
    N = cols[0].shape[0]
    n_log = N.bit_length() - 1
    assert N == 1 << n_log and N % (8 * _LANES) == 0, N
    L = len(cols)
    if t_log is None:
        t_log = _tile_log_for(L)
    t_log = min(t_log, n_log)
    dts = tuple(c.dtype for c in cols)
    cols2d = tuple(c.reshape(N // _LANES, _LANES) for c in cols)

    cols2d = _tilesort_call(dts, t_log, interpret)(cols2d)
    cross = _cross_call(dts, t_log, interpret)
    intile = _intile_call(dts, t_log, interpret)
    for k_log in range(t_log + 1, n_log + 1):
        d_log = k_log - t_log
        for j_log in range(k_log - 1, t_log - 1, -1):
            cols2d = cross(cols2d, 1 << (j_log - t_log), d_log)
        cols2d = intile(cols2d, d_log)
    return tuple(c.reshape(N) for c in cols2d)


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length() if n > 1 else 1


_ASC_BIT = 30  # (g >> 30) & 1 == 0 for every realistic tile index


def merge_cols_pallas(cols_a, cols_b, t_log: int | None = None,
                      interpret: bool = False):
    """Merge two column tuples that are EACH sorted ascending (all columns
    keys, lexicographic) into one fully sorted tuple of length |a|+|b|.

    This is the structural win over a full sort: a bitonic MERGE is
    ~log2(N) compare-exchange strides versus ~log2(N)^2/2 for the full
    network (26 vs ~325 at 2^26) — and `jax.lax.sort` on TPU is
    comparator-bound, so maintaining sortedness and merging is an order of
    magnitude cheaper than re-sorting (wordset.py's merge/join/set-op
    kernels all exploit this).

    Mechanics: pad both sides to a common power-of-two M with dtype-max
    rows (pads sort to the back), reverse B (one streaming XLA pass), so
    [A asc | B desc] is a single bitonic sequence; then run the existing
    cross-tile/in-tile compare-exchange passes for strides M..1 with the
    direction pinned ascending (stage bit _ASC_BIT of any tile index is 0).
    Output rows [:|a|+|b|] are the exact `lax.sort(concat)` result."""
    cols_a = tuple(cols_a)
    cols_b = tuple(cols_b)
    Na, Nb = cols_a[0].shape[0], cols_b[0].shape[0]
    M = max(_next_pow2(max(Na, Nb)), 1 << 12)
    L = len(cols_a)
    dts = tuple(c.dtype for c in cols_a)

    def _pad(c, n):
        if n == M:
            return c
        return jnp.concatenate(
            [c, jnp.full((M - n,), _dtype_max(c.dtype), dtype=c.dtype)]
        )

    if t_log is None:
        t_log = _tile_log_for(L)
    t_log = min(t_log, M.bit_length())  # N = 2M, n_log = log2(M) + 1
    cat = tuple(
        jnp.concatenate([_pad(a, Na), _pad(b, Nb)[::-1]])
        for a, b in zip(cols_a, cols_b)
    )
    N = 2 * M
    cols2d = tuple(c.reshape(N // _LANES, _LANES) for c in cat)
    cross = _cross_call(dts, t_log, interpret)
    intile = _intile_call(dts, t_log, interpret)
    for j_log in range(M.bit_length() - 1, t_log - 1, -1):
        cols2d = cross(cols2d, 1 << (j_log - t_log), _ASC_BIT)
    cols2d = intile(cols2d, _ASC_BIT)
    out = tuple(c.reshape(N) for c in cols2d)
    if N != Na + Nb:
        out = tuple(c[: Na + Nb] for c in out)
    return out


_MIN_PALLAS_MERGE_N = 1 << 19


def _merge_engages(mode: str, n: int, n_cols: int,
                   presorted: bool = False) -> bool:
    """Whether the Pallas merge path runs for an n-row combine of n_cols
    columns.  Floors are measured (sessions 15/16/21): 2-3 column merges
    win from the dynamic-fold sizes up.  Wide tuples split by whether
    BOTH sides arrive sorted: a pure merge pass at L=4 2^23+2^23 runs
    32.8ms vs 113.7ms lax (session21, 3.5x), so presorted wide merges
    engage from 2^23 total; sort+merge combines (`merge_with_unsorted`)
    keep the 2^25 floor — there the batch sort dominates and K=59
    end-to-end measured slower below that (session16)."""
    if mode.endswith("-force"):
        return True
    if mode == "xla" or jax.default_backend() in ("cpu",):
        return False
    if n_cols <= 3:
        floor = _MIN_PALLAS_MERGE_N
    else:
        floor = (1 << 23) if presorted else (1 << 25)
    return n >= floor
_MERGE_MODES = ("xla", "pallas", "pallas-force", "mergepath",
                "mergepath-force")


def _merge_mode() -> str:
    """Merge-kernel selector: 'xla' = lax.sort(concat); 'pallas' = bitonic
    merge on TPU for large n; 'mergepath' = co-rank single-pass merge
    (ops/merge_pallas.py) on TPU for large n; '-force' variants always
    engage (interpret mode on CPU — tests/probes).

    Default 'mergepath': measured on v5e with scalar-sync timing
    (session15): one co-rank merge pass of 2^25+2^25 L=2 runs 54ms vs
    298ms for lax.sort(concat) (5.5x) and 40ms vs 187ms at 2^25+2^19
    (4.7x); the bitonic merge also wins (72ms) but loses to merge-path."""
    mode = os.environ.get("CBL_TPU_MERGE_KERNEL", "mergepath")
    if mode not in _MERGE_MODES:
        raise ValueError(
            f"CBL_TPU_MERGE_KERNEL={mode!r}: expected one of {_MERGE_MODES}"
        )
    return mode


def merge_with_unsorted(sorted_cols, unsorted_cols):
    """Combine an already-sorted column tuple with an UNSORTED one into a
    fully sorted tuple; equals `lax.sort(concat, num_keys=all)` exactly.

    Default (CBL_TPU_MERGE_KERNEL=mergepath, TPU, large n): sort only the
    unsorted side (via sort_cols_auto), then ONE merge-path Pallas pass
    (ops/merge_pallas.py).  'pallas' uses the bitonic merge network
    (~log N HBM strides) instead; 'xla' is one lax.sort of the
    concatenation."""
    sorted_cols = tuple(sorted_cols)
    unsorted_cols = tuple(unsorted_cols)
    mode = _merge_mode()
    n = sorted_cols[0].shape[0] + unsorted_cols[0].shape[0]
    engage = _merge_engages(mode, n, len(sorted_cols))
    if engage:
        us = sort_cols_auto(unsorted_cols)
        interpret = jax.default_backend() in ("cpu",)
        if mode.startswith("mergepath"):
            from .merge_pallas import merge_sorted_cols

            return merge_sorted_cols(sorted_cols, us, interpret=interpret)
        return merge_cols_pallas(sorted_cols, us, interpret=interpret)
    cat = tuple(
        jnp.concatenate([a, b]) for a, b in zip(sorted_cols, unsorted_cols)
    )
    out = jax.lax.sort(cat, num_keys=len(cat))
    return out if isinstance(out, tuple) else (out,)


def merge_sorted_pair(sorted_a, sorted_b):
    """Merge two column tuples that are EACH already sorted ascending into
    one fully sorted tuple; equals `lax.sort(concat, num_keys=all)`.
    Dispatches on CBL_TPU_MERGE_KERNEL like `merge_with_unsorted` but
    skips sorting either side — the set-algebra path where BOTH operands
    are sorted indexes (one streamed pass instead of a full re-sort)."""
    a = tuple(sorted_a)
    b = tuple(sorted_b)
    mode = _merge_mode()
    n = a[0].shape[0] + b[0].shape[0]
    engage = _merge_engages(mode, n, len(a), presorted=True)
    if engage:
        interpret = jax.default_backend() in ("cpu",)
        if mode.startswith("mergepath"):
            from .merge_pallas import merge_sorted_cols

            return merge_sorted_cols(a, b, interpret=interpret)
        return merge_cols_pallas(a, b, interpret=interpret)
    cat = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))
    out = jax.lax.sort(cat, num_keys=len(cat))
    return out if isinstance(out, tuple) else (out,)


def use_merge_combine(n_total: int, n_cols: int = 2) -> bool:
    """True when the one-pass merge path will actually engage for a
    combine of n_total rows of n_cols columns — callers use this to pick
    merge-friendly state layouts (e.g. defer compaction) only when it
    pays."""
    return _merge_engages(_merge_mode(), n_total, n_cols)


_MIN_PALLAS_N = 1 << 20
_SORT_MODES = ("xla", "pallas", "pallas-force", "mergepath",
               "mergepath-force")


def _sort_mode() -> str:
    """Sort selector.  'xla' = lax.sort; 'pallas' = the monolithic bitonic
    network (measured SLOWER than lax.sort on v5e: 186ms vs 145ms at 2^25
    L=2 — session13); 'mergepath' = tile-sort + log2(N/T) merge-path
    passes (ops/merge_pallas.py).  '-force' variants always engage
    (interpret mode on CPU).

    Default stays 'xla': BOTH Pallas sorts measured SLOWER than lax.sort
    on v5e (session13: bitonic 186ms vs 145ms at 2^25 L=2; session15:
    merge-path sort 178-440ms vs 145ms across t_log 12-15 — the in-VMEM
    compare-exchange work dominates, not HBM passes).  Only the single
    merge PASS of two sorted runs beats XLA (see _merge_mode)."""
    mode = os.environ.get("CBL_TPU_SORT", "xla")
    if mode not in _SORT_MODES:
        raise ValueError(
            f"CBL_TPU_SORT={mode!r}: expected one of {_SORT_MODES}"
        )
    return mode


def sort_cols_auto(cols):
    """`jax.lax.sort(cols, num_keys=len(cols))` with a Pallas sort on TPU
    for large inputs.  Handles non-power-of-two lengths by padding every
    column with its dtype max (pads sort to the back and are sliced off;
    all-max sentinel rows are interchangeable with pads, so the leading N
    rows are multiset-exact)."""
    cols = tuple(cols)
    N = cols[0].shape[0]
    mode = _sort_mode()
    engage = mode.endswith("-force") or (
        mode != "xla"
        and N >= _MIN_PALLAS_N
        and jax.default_backend() not in ("cpu",)
    )
    if not engage:
        out = jax.lax.sort(cols, num_keys=len(cols))
        return out if isinstance(out, tuple) else (out,)
    P = _next_pow2(max(N, 1 << 13))
    if P != N:
        padded = tuple(
            jnp.concatenate(
                [c, jnp.full((P - N,), _dtype_max(c.dtype), dtype=c.dtype)]
            )
            for c in cols
        )
    else:
        padded = cols
    interpret = jax.default_backend() in ("cpu",)
    if mode.startswith("mergepath"):
        from .merge_pallas import sort_cols_mergepath

        out = sort_cols_mergepath(padded, interpret=interpret)
    else:
        out = sort_cols_pallas(padded, interpret=interpret)
    if P != N:
        out = tuple(c[:N] for c in out)
    return out
