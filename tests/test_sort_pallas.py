"""Pallas bitonic sort parity vs lax.sort (interpret mode on CPU).

Small tiles (t_log) force the cross-tile and fused-in-tile global merge
passes to run, exercising every kernel of the network; with all columns
as keys the output is value-identical to lax.sort (full-row ties are
identical rows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cbl_tpu.ops import sort_pallas


def _oracle(cols):
    out = jax.lax.sort(tuple(cols), num_keys=len(cols))
    return out if isinstance(out, tuple) else (out,)


def _check(cols, t_log):
    got = sort_pallas.sort_cols_pallas(
        tuple(jnp.asarray(c) for c in cols), t_log=t_log, interpret=True
    )
    want = _oracle(tuple(jnp.asarray(c) for c in cols))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("L", [1, 2, 3])
@pytest.mark.parametrize("n_log,t_log", [(10, 10), (13, 10), (14, 11)])
def test_matches_lax_sort(L, n_log, t_log):
    rng = np.random.default_rng(n_log * 10 + L)
    N = 1 << n_log
    # duplicates (small value range on the minor key) + sentinel rows
    cols = [rng.integers(0, 7, size=N).astype(np.uint32) for _ in range(L)]
    sent = rng.random(N) < 0.05
    for c in cols:
        c[sent] = 0xFFFFFFFF
    _check(cols, t_log)


def test_wide_values_and_runs():
    rng = np.random.default_rng(0)
    N = 1 << 13
    hi = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    hi[: N // 2] = hi[N // 2 :]  # force long equal-prefix runs
    _check([hi, lo], t_log=10)


def test_int32_payload_column():
    rng = np.random.default_rng(1)
    N = 1 << 13
    key = rng.integers(0, 50, size=N).astype(np.uint32)
    pay = np.arange(N, dtype=np.int32)
    rng.shuffle(pay)
    got = sort_pallas.sort_cols_pallas(
        (jnp.asarray(key), jnp.asarray(pay)), t_log=10, interpret=True
    )
    want = _oracle((jnp.asarray(key), jnp.asarray(pay)))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pad_then_slice_matches_unpadded_sort():
    """The auto wrapper's pad-with-dtype-max scheme: sorted(padded)[:N]
    must equal sorted(original) — pads sort to the back past every
    original row (including rows with a max-valued leading limb)."""
    rng = np.random.default_rng(2)
    N = (1 << 13) + (1 << 11)  # non-power-of-two
    a = rng.integers(0, 1 << 16, size=N).astype(np.uint32)
    b = rng.integers(0, 1 << 16, size=N).astype(np.uint32)
    a[rng.random(N) < 0.03] = 0xFFFFFFFF
    padded = sort_pallas._next_pow2(N)
    ap = np.full(padded, 0xFFFFFFFF, np.uint32)
    bp = np.full(padded, 0xFFFFFFFF, np.uint32)
    ap[:N], bp[:N] = a, b
    got = sort_pallas.sort_cols_pallas(
        (jnp.asarray(ap), jnp.asarray(bp)), t_log=10, interpret=True
    )
    want = _oracle((jnp.asarray(a), jnp.asarray(b)))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g)[:N], np.asarray(w))


def test_cbl_end_to_end_forced_pallas(monkeypatch):
    """Whole-stack smoke with every sort forced through the Pallas network
    (interpret mode on CPU): build + query + export must match a default
    (lax.sort) build exactly.

    The sort dispatch is read at TRACE time, so the jit caches are cleared
    around the forced-pallas section — otherwise this test would reuse (or
    leak) lax.sort traces keyed only by shape."""
    from cbl_tpu import CBL

    rng = np.random.default_rng(7)
    seq = bytes(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 3000)]
    )
    ref = CBL.new_canonical(k=25)
    ref.insert_seq(seq)
    want_words = ref.wordset.words_array()

    monkeypatch.setenv("CBL_TPU_SORT", "pallas-force")
    jax.clear_caches()
    try:
        idx = CBL.new_canonical(k=25)
        idx.insert_seq(seq)
        assert idx.count() == ref.count()
        assert bool(idx.contains_seq(seq).all())
        np.testing.assert_array_equal(idx.wordset.words_array(), want_words)
    finally:
        jax.clear_caches()  # drop interpret-pallas traces for later tests


@pytest.mark.parametrize("na_log,nb_log,t_log", [(12, 12, 10), (13, 11, 10),
                                                 (12, 12, 13)])
def test_merge_matches_sorted_concat(na_log, nb_log, t_log):
    rng = np.random.default_rng(na_log * 7 + nb_log)
    Na, Nb = 1 << na_log, 1 << nb_log

    # multi-column sorted sides: sort rows via lexsort on the oracle
    def sorted_cols(n, seed):
        r = np.random.default_rng(seed)
        c0 = r.integers(0, 1 << 16, size=n).astype(np.uint32)
        c1 = r.integers(0, 1 << 16, size=n).astype(np.uint32)
        c0[r.random(n) < 0.04] = 0xFFFFFFFF
        c1[c0 == 0xFFFFFFFF] = 0xFFFFFFFF
        order = np.lexsort((c1, c0))
        return c0[order], c1[order]

    ca = sorted_cols(Na, 1)
    cb = sorted_cols(Nb, 2)
    got = sort_pallas.merge_cols_pallas(
        tuple(jnp.asarray(c) for c in ca),
        tuple(jnp.asarray(c) for c in cb),
        t_log=t_log,
        interpret=True,
    )
    cat = tuple(
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
        for x, y in zip(ca, cb)
    )
    want = _oracle(cat)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_merge_with_duplicates_and_payload():
    rng = np.random.default_rng(5)
    Na = Nb = 1 << 12
    ka = np.sort(rng.integers(0, 64, size=Na).astype(np.uint32))
    kb = np.sort(rng.integers(0, 64, size=Nb).astype(np.uint32))
    pa = np.arange(Na, dtype=np.int32)
    pb = np.arange(Nb, dtype=np.int32) + Na
    # payload must ride as a tie-break key: sort each side by (key, payload)
    oa = np.lexsort((pa, ka)); ob = np.lexsort((pb, kb))
    got = sort_pallas.merge_cols_pallas(
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


def test_merge_with_unsorted_forced_pallas(monkeypatch):
    """merge_with_unsorted's bitonic branch (CBL_TPU_MERGE_KERNEL=
    pallas-force: lax.sort of the unsorted side + merge_cols_pallas,
    incl. the single-column tuple normalization) vs lax.sort(concat)."""
    rng = np.random.default_rng(11)
    monkeypatch.setenv("CBL_TPU_MERGE_KERNEL", "pallas-force")
    jax.clear_caches()
    try:
        for L in (1, 2):
            srt = tuple(
                jnp.asarray(np.sort(rng.integers(0, 1 << 20, 1 << 12))
                            .astype(np.uint32))
                for _ in range(L)
            )
            if L == 2:  # sorted side must be lexicographically sorted
                order = np.lexsort((np.asarray(srt[1]), np.asarray(srt[0])))
                srt = tuple(jnp.asarray(np.asarray(c)[order]) for c in srt)
            uns = tuple(
                jnp.asarray(rng.integers(0, 1 << 20, 3 * (1 << 8))
                            .astype(np.uint32))
                for _ in range(L)
            )
            got = sort_pallas.merge_with_unsorted(srt, uns)
            want = _oracle(tuple(
                jnp.concatenate([a, b]) for a, b in zip(srt, uns)
            ))
            for g, w in zip(got, want):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    finally:
        jax.clear_caches()
