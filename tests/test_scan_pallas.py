"""Oracle tests for the single-pass Pallas slog scan (ops/scan_pallas.py,
interpret mode on CPU) against the XLA `_slog_scan` formulation, across
limb widths, block-size fallbacks, tile-boundary runs, and the dispatch
wrapper `slog_counts_auto`."""

import numpy as np
import pytest

import jax.numpy as jnp

from cbl_tpu.ops.scan_pallas import slog_scan_counts_pallas
from cbl_tpu.wordset import _U32_MAX, _slog_scan


def _oracle(cols, qtag):
    L = len(cols) - 1
    neq, sent, live_here = _slog_scan(cols, L)
    hit = (cols[L] == qtag) & ~sent & live_here
    run_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    live = run_end & ~sent & live_here
    return (
        int(jnp.sum(hit.astype(jnp.int32))),
        int(jnp.sum(live.astype(jnp.int32))),
    )


def _make_slog(rng, n, L, n_words, p_insert=0.6, p_query=0.2, frac_sent=0.1):
    """A (word, tag)-sorted log over few distinct words (long runs that
    straddle tile boundaries) with mixed insert/remove/query tags and a
    sentinel tail."""
    words = np.sort(rng.integers(0, n_words, size=n).astype(np.uint64) * 977)
    limbs = []
    for l in range(L):
        sh = 32 * (L - 1 - l)
        limbs.append(((words >> sh) & 0xFFFFFFFF).astype(np.uint32))
    r = rng.random(n)
    typ = np.where(r < p_insert, 1, np.where(r < p_insert + p_query, 2, 3))
    seq = rng.integers(0, 7, size=n).astype(np.uint32)
    tags = (seq << 2) | typ.astype(np.uint32)
    ns = int(n * frac_sent)
    if ns:
        for lb in limbs:
            lb[-ns:] = 0xFFFFFFFF
        tags[-ns:] = 0xFFFFFFFF
    order = np.lexsort(tuple([tags] + limbs[::-1]))
    cols = tuple(
        jnp.asarray(a[order]) for a in (limbs + [tags])
    )
    return cols


@pytest.mark.parametrize("L", [1, 2, 3])
@pytest.mark.parametrize("n", [1024, 4096, 131072])
def test_scan_kernel_matches_xla_oracle(L, n):
    rng = np.random.default_rng(L * 100 + n % 97)
    cols = _make_slog(rng, n, L, n_words=max(n // 64, 4))
    for qt in (np.uint32((3 << 2) | 2), np.uint32(_U32_MAX)):
        want = _oracle(cols, qt)
        h, lv = slog_scan_counts_pallas(cols, qt, interpret=True)
        assert (int(h), int(lv)) == want
    assert _oracle(cols, np.uint32(_U32_MAX))[1] > 0  # non-trivial data


def test_scan_kernel_run_straddles_tiles():
    """One giant run covering several 1024-element tiles, whose liveness
    flips deep inside: the carry chain must propagate the marker."""
    n = 8192
    L = 2
    c0 = np.zeros(n, np.uint32)
    c1 = np.full(n, 42, np.uint32)
    tags = np.full(n, (1 << 2) | 2, np.uint32)  # queries everywhere
    tags[0] = 1  # seq-0 insert
    tags[5000] = (1 << 2) | 3  # remove later in the run
    tags.sort()
    cols = (jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(tags))
    qt = np.uint32((1 << 2) | 2)
    want = _oracle(cols, qt)
    h, lv = slog_scan_counts_pallas(cols, qt, interpret=True)
    assert (int(h), int(lv)) == want
    assert int(lv) == 0  # the only word's last entry is the remove
    assert int(h) == n - 2  # queries sit between insert and remove


def test_dynamic_round_with_forced_scan_kernel(monkeypatch):
    """A full fused dynamic round driven through the Pallas scan must
    match the XLA-scan rounds exactly (positives, free live count, fold)."""
    from cbl_tpu import CBL

    rng = np.random.default_rng(33)
    codes = rng.integers(0, 4, size=12_000, dtype=np.uint8)
    off = np.array([0, 6_000], dtype=np.int64)

    def run():
        idx = CBL(k=25)
        out = []
        out.append(idx.dynamic_round(
            (codes[:6000], off), (codes[:6000], off),
            (codes[3000:9000], off)))
        out.append(idx.dynamic_round(
            (codes[6000:], off), (codes[:6000], off), (codes[:6000], off)))
        out.append(idx.count())
        idx.wordset.flush()
        out.append(idx.count())
        return out

    import cbl_tpu.cbl as cmod

    # the fused round fn is lru_cached on shapes only; clear it so each
    # env actually re-traces its own scan dispatch
    monkeypatch.setenv("CBL_TPU_SLOG_SCAN", "pallas-force")
    cmod._fused_round_slog_fn.cache_clear()
    got = run()
    monkeypatch.setenv("CBL_TPU_SLOG_SCAN", "xla")
    cmod._fused_round_slog_fn.cache_clear()
    want = run()
    cmod._fused_round_slog_fn.cache_clear()
    assert got == want


def test_slog_counts_auto_forced_pallas_matches():
    """The dispatch wrapper under CBL_TPU_SLOG_SCAN=pallas-force must take
    the kernel path and agree with the XLA path."""
    import os

    from cbl_tpu.wordset import slog_counts_auto

    rng = np.random.default_rng(7)
    cols = _make_slog(rng, 4096, 2, n_words=50)
    qt = jnp.uint32((2 << 2) | 2)
    want = _oracle(cols, qt)
    os.environ["CBL_TPU_SLOG_SCAN"] = "pallas-force"
    try:
        h, lv = slog_counts_auto(cols, qt)
    finally:
        del os.environ["CBL_TPU_SLOG_SCAN"]
    assert (int(h), int(lv)) == want


@pytest.mark.parametrize("n", [1024, 65536])
def test_scan_kernel_packed_layout(n):
    """Packed-tag layout (tag in the low 8 bits of the last limb): kernel
    and XLA scan must agree; run grouping must ignore the tag bits."""
    from cbl_tpu.wordset import _shl8_or, _slog_scan, _slog_tag

    rng = np.random.default_rng(n)
    L = 2
    words = np.sort(rng.integers(0, n // 16, size=n).astype(np.uint64) * 131)
    c0 = (words >> 32).astype(np.uint32)
    c1 = (words & 0xFFFFFFFF).astype(np.uint32)
    typ = rng.choice([1, 2, 3], size=n).astype(np.uint32)
    seq = rng.integers(0, 8, size=n).astype(np.uint32)
    tag = (seq << 2) | typ
    ns = n // 8
    c0[-ns:] = 0xFFFFFFFF
    c1[-ns:] = 0xFFFFFFFF
    tag[-ns:] = 0xFF
    packed = np.stack(
        [np.asarray(x) for x in _shl8_or(
            (jnp.asarray(c0), jnp.asarray(c1)), jnp.asarray(tag))],
        axis=-1,
    )
    order = np.lexsort((packed[:, 1], packed[:, 0]))
    cols = tuple(jnp.asarray(packed[order, l].copy()) for l in range(L))
    qt = np.uint32((3 << 2) | 2)
    # XLA oracle in packed mode
    neq, sent, live = _slog_scan(cols, L, pack=True)
    hit = (_slog_tag(cols, L, True) == qt) & ~sent & live
    run_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    want = (int(jnp.sum(hit.astype(jnp.int32))),
            int(jnp.sum((run_end & ~sent & live).astype(jnp.int32))))
    h, lv = slog_scan_counts_pallas(cols, qt, pack=True, interpret=True)
    assert (int(h), int(lv)) == want
    assert want[1] > 0


@pytest.mark.parametrize("n", [1024, 4096, 131072])
def test_blank_mask_kernel_matches_cumsum(n):
    """The single-pass blanking kernel must equal the cumsum formula for
    random overlapping intervals, including carries across tiles."""
    from cbl_tpu.ops.scan_pallas import blank_mask_pallas

    rng = np.random.default_rng(n)
    n_iv = 37
    starts = rng.integers(0, n, size=n_iv).astype(np.int32)
    lens = rng.integers(1, max(n // 8, 2), size=n_iv).astype(np.int32)
    ends = np.minimum(starts + lens, n).astype(np.int32)
    delta = np.zeros(n, np.int32)
    np.add.at(delta, starts, 1)
    for e in ends:
        if e < n:
            delta[e] -= 1
    want_mask = np.cumsum(delta) > 0
    mask, nv = blank_mask_pallas(jnp.asarray(delta), interpret=True)
    np.testing.assert_array_equal(np.asarray(mask) > 0, want_mask)
    assert int(nv) == int((~want_mask).sum())
    assert want_mask.any() and not want_mask.all()


def test_device_words_blank_kernel_forced(monkeypatch):
    """_device_words under CBL_TPU_SLOG_SCAN=pallas-force (which forces
    the blanking kernel too) must produce identical words and valid
    counts to the XLA cumsum path on a multi-record stream."""
    from cbl_tpu import CBL
    import cbl_tpu.cbl as cmod

    rng = np.random.default_rng(77)
    codes = rng.integers(0, 4, size=9_000, dtype=np.uint8)
    offsets = np.array([0, 1_000, 1_024, 5_000, 9_000], dtype=np.int64)

    def words_of(env):
        monkeypatch.setenv("CBL_TPU_SLOG_SCAN", env)
        cmod._fused_words_fn.cache_clear()
        idx = CBL(k=25)
        ps = idx.pack_stream(codes, offsets)
        nk_pad, stream, s_arr, e_arr, _ = ps.slabs[0]
        w, nv = cmod._fused_words_fn(idx.cfg, False, nk_pad)(
            stream, s_arr, e_arr
        )
        return np.asarray(w), int(nv)

    w_f, nv_f = words_of("pallas-force")
    w_x, nv_x = words_of("xla")
    cmod._fused_words_fn.cache_clear()
    assert nv_f == nv_x
    np.testing.assert_array_equal(w_f, w_x)
