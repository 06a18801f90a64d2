"""Merge-path (co-rank) Pallas kernel parity vs lax.sort (interpret mode).

Small tiles force many output tiles, misaligned co-ranks, window clamping
at array ends, and multiple merge-sort passes; with all columns as keys
the output is value-identical to lax.sort (full-row ties are identical
rows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbl_tpu.ops import merge_pallas


def _oracle(cols):
    out = jax.lax.sort(tuple(cols), num_keys=len(cols))
    return out if isinstance(out, tuple) else (out,)


def _sorted_cols(n, seed, L=2, lo=0, hi=1 << 16, sent_frac=0.04):
    r = np.random.default_rng(seed)
    cols = [r.integers(lo, hi, size=n).astype(np.uint32) for _ in range(L)]
    sent = r.random(n) < sent_frac
    for c in cols:
        c[sent] = 0xFFFFFFFF
    order = np.lexsort(tuple(cols[::-1]))
    return tuple(c[order] for c in cols)


@pytest.mark.parametrize("na_log,nb_log,t_log", [
    (12, 12, 10), (13, 11, 10), (14, 14, 11), (12, 10, 12),
])
@pytest.mark.parametrize("L", [1, 2, 3])
def test_merge_matches_sorted_concat(na_log, nb_log, t_log, L):
    ca = _sorted_cols(1 << na_log, na_log * 13 + L, L=L)
    cb = _sorted_cols(1 << nb_log, nb_log * 7 + L, L=L)
    got = merge_pallas.merge_sorted_cols(
        tuple(jnp.asarray(c) for c in ca),
        tuple(jnp.asarray(c) for c in cb),
        t_log=t_log,
        interpret=True,
    )
    want = _oracle(tuple(
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
        for x, y in zip(ca, cb)
    ))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_merge_heavy_duplicates():
    """Long equal runs straddling tile boundaries stress the co-rank tie
    rule (A before B) and the in-tile masking."""
    ca = _sorted_cols(1 << 12, 1, L=2, hi=7, sent_frac=0.1)
    cb = _sorted_cols(1 << 12, 2, L=2, hi=7, sent_frac=0.1)
    got = merge_pallas.merge_sorted_cols(
        tuple(jnp.asarray(c) for c in ca),
        tuple(jnp.asarray(c) for c in cb),
        t_log=10,
        interpret=True,
    )
    want = _oracle(tuple(
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
        for x, y in zip(ca, cb)
    ))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_merge_skewed_sides():
    """One side far smaller than the other (the insert-batch shape) and a
    non-multiple-of-tile length on the small side."""
    ca = _sorted_cols(1 << 14, 3, L=2)
    cb = _sorted_cols(3 * (1 << 8), 4, L=2)  # 768: not a tile multiple
    got = merge_pallas.merge_sorted_cols(
        tuple(jnp.asarray(c) for c in ca),
        tuple(jnp.asarray(c) for c in cb),
        t_log=10,
        interpret=True,
    )
    want = _oracle(tuple(
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
        for x, y in zip(ca, cb)
    ))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_merge_payload_column():
    """int32 payload rides as a tie-break key (the sort-join pattern)."""
    rng = np.random.default_rng(5)
    Na = Nb = 1 << 11
    ka = np.sort(rng.integers(0, 64, size=Na).astype(np.uint32))
    kb = np.sort(rng.integers(0, 64, size=Nb).astype(np.uint32))
    pa = np.arange(Na, dtype=np.int32)
    pb = np.arange(Nb, dtype=np.int32) + Na
    oa = np.lexsort((pa, ka))
    ob = np.lexsort((pb, kb))
    got = merge_pallas.merge_sorted_cols(
        (jnp.asarray(ka[oa]), jnp.asarray(pa[oa])),
        (jnp.asarray(kb[ob]), jnp.asarray(pb[ob])),
        t_log=10,
        interpret=True,
    )
    want = _oracle((
        jnp.concatenate([jnp.asarray(ka[oa]), jnp.asarray(kb[ob])]),
        jnp.concatenate([jnp.asarray(pa[oa]), jnp.asarray(pb[ob])]),
    ))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("n_log,t_log", [(10, 10), (13, 10), (14, 11)])
@pytest.mark.parametrize("L", [1, 2, 3])
def test_sort_matches_lax_sort(n_log, t_log, L):
    rng = np.random.default_rng(n_log * 10 + L)
    N = 1 << n_log
    cols = [rng.integers(0, 7, size=N).astype(np.uint32) for _ in range(L)]
    sent = rng.random(N) < 0.05
    for c in cols:
        c[sent] = 0xFFFFFFFF
    got = merge_pallas.sort_cols_mergepath(
        tuple(jnp.asarray(c) for c in cols), t_log=t_log, interpret=True
    )
    want = _oracle(tuple(jnp.asarray(c) for c in cols))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sort_wide_values():
    rng = np.random.default_rng(0)
    N = 1 << 14
    hi = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    hi[: N // 2] = hi[N // 2 :]  # long equal-prefix runs
    got = merge_pallas.sort_cols_mergepath(
        (jnp.asarray(hi), jnp.asarray(lo)), t_log=10, interpret=True
    )
    want = _oracle((jnp.asarray(hi), jnp.asarray(lo)))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_matmul_roll_variant(monkeypatch):
    """The MXU one-hot-permutation fallback for the dynamic lane roll must
    be bit-exact with the pltpu.roll path."""
    monkeypatch.setenv("CBL_TPU_DYNROLL", "matmul")
    ca = _sorted_cols(1 << 12, 8, L=2)
    cb = _sorted_cols(1 << 11, 9, L=2)
    got = merge_pallas.merge_sorted_cols(
        tuple(jnp.asarray(c) for c in ca),
        tuple(jnp.asarray(c) for c in cb),
        t_log=10,
        interpret=True,
    )
    want = _oracle(tuple(
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
        for x, y in zip(ca, cb)
    ))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_cbl_end_to_end_forced_mergepath(monkeypatch):
    """Whole-stack smoke with every sort AND merge forced through the
    merge-path kernels (interpret mode): build + query + export must match
    a default (lax.sort) build exactly."""
    from cbl_tpu import CBL

    rng = np.random.default_rng(7)
    seq = bytes(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 3000)]
    )
    ref = CBL.new_canonical(k=25)
    ref.insert_seq(seq)
    want_words = ref.wordset.words_array()
    want_count = ref.count()

    monkeypatch.setenv("CBL_TPU_SORT", "mergepath-force")
    monkeypatch.setenv("CBL_TPU_MERGE_KERNEL", "mergepath-force")
    jax.clear_caches()
    try:
        idx = CBL.new_canonical(k=25)
        idx.insert_seq(seq)
        assert idx.count() == want_count
        assert bool(idx.contains_seq(seq).all())
        np.testing.assert_array_equal(idx.wordset.words_array(), want_words)
    finally:
        jax.clear_caches()  # drop interpret-mode traces for later tests


def test_stream_query_sorted_memo_forced_mergepath(monkeypatch):
    """The single-sync bench protocol under forced merge-path kernels
    (interpret mode): build from a PackedStream, then (a) re-query the
    SAME stream — exercising `_count_hits_merge_sorted_kernel` (both
    sides sorted, no query sort) — and (b) a dynamic slog round; counts
    must match the python-set oracle."""
    from cbl_tpu import CBL

    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
    off = np.array([0, len(codes)], dtype=np.int64)

    monkeypatch.setenv("CBL_TPU_MERGE_KERNEL", "mergepath-force")
    jax.clear_caches()
    try:
        idx = CBL(k=25)
        ps = idx.pack_stream(codes, off)
        idx.insert_codes_stream(ps)
        n_dev = idx.count_device()
        total_dev, pos_dev = idx.query_codes_stream(ps, lazy=True)
        n, t, p = (int(x) for x in jax.device_get((n_dev, total_dev,
                                                   pos_dev)))
        assert ps._words[0][2] is True  # memo really holds sorted rows
        nk = len(codes) - 24
        assert t == nk and p == nk
        assert n == len({tuple(w) for w in idx.wordset.words_array()})

        dyn = CBL(k=25)
        t2, p2 = dyn.dynamic_round((codes, off), (codes, off), (codes, off))
        assert (t2, p2) == (nk, nk)
        assert dyn.count() == 0
        # a SECOND round exercises the slog merge_sorted_pair path (the
        # first round has an empty log and skips the merge)
        t3, p3 = dyn.dynamic_round((codes, off), (codes, off),
                                   (codes[:2000], np.array([0, 2000])))
        assert (t3, p3) == (nk, nk)
        assert dyn.count() == nk - (2000 - 24)
    finally:
        jax.clear_caches()
