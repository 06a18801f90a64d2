"""Necklace kernel vs brute-force oracle, mirroring
`/root/reference/src/necklace/mod.rs:33-99`."""

import numpy as np
import pytest

from cbl_tpu import kmer, limbs, necklace
from cbl_tpu.config import get_config


def _random_kmers(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [int(rng.integers(0, 1 << 30)) for _ in range(n)]
    # widen to full kmer_bits range
    vals = [
        (v * 0x9E3779B97F4A7C15 ^ (v << 7)) & ((1 << cfg.kmer_bits) - 1) for v in vals
    ]
    return vals, limbs.from_py_ints(vals, cfg.kmer_limbs)


@pytest.mark.parametrize("k", [5, 25, 29, 59])
def test_necklace_matches_bruteforce(k):
    cfg = get_config(k=k, prefix_bits=min(24, 2 * k - 1))
    vals, arr = _random_kmers(cfg, 300, seed=k)
    best, pos = necklace.necklace_pos(arr, cfg)
    best = limbs.to_py_ints(np.asarray(best))
    pos = np.asarray(pos)
    for i, v in enumerate(vals):
        eb, ep = necklace.py_necklace_pos(v, cfg.kmer_bits)
        assert best[i] == eb, f"value {i}"
        assert pos[i] == ep, f"pos {i}"


@pytest.mark.parametrize("k", [25, 59])
def test_necklace_revert_roundtrip(k):
    cfg = get_config(k=k, prefix_bits=24)
    vals, arr = _random_kmers(cfg, 300, seed=100 + k)
    best, pos = necklace.necklace_pos(arr, cfg)
    back = np.asarray(necklace.revert_necklace_pos(best, pos, cfg))
    np.testing.assert_array_equal(back, arr)


def test_periodic_words():
    # `/root/reference/src/necklace/mod.rs:83-98`: periodic words edge case
    cfg = get_config(k=15, prefix_bits=24)  # kmer_bits=30
    rng = np.random.default_rng(9)
    vals = []
    for _ in range(200):
        half = int(rng.integers(0, 1 << 15))
        vals.append((half << 15) | half)  # period-15 word in 30 bits
    arr = limbs.from_py_ints(vals, cfg.kmer_limbs)
    best, pos = necklace.necklace_pos(arr, cfg)
    best = limbs.to_py_ints(np.asarray(best))
    pos = np.asarray(pos)
    for i, v in enumerate(vals):
        eb, ep = necklace.py_necklace_pos(v, cfg.kmer_bits)
        assert (best[i], pos[i]) == (eb, ep)


@pytest.mark.parametrize("k", [25, 59])
def test_pack_unpack_word(k):
    cfg = get_config(k=k, prefix_bits=24)
    vals, arr = _random_kmers(cfg, 200, seed=5)
    best, pos = necklace.necklace_pos(arr, cfg)
    word = necklace.pack_word(best, pos, cfg)
    wvals = limbs.to_py_ints(np.asarray(word))
    bvals = limbs.to_py_ints(np.asarray(best))
    for i in range(len(vals)):
        assert wvals[i] == (bvals[i] << cfg.pos_bits) | int(np.asarray(pos)[i])
    n2, p2 = necklace.unpack_word(word, cfg)
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(best))
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(pos))
    km = np.asarray(necklace.word_to_kmer(word, cfg))
    np.testing.assert_array_equal(km, arr)


def test_word_prefix():
    cfg = get_config(k=25, prefix_bits=24)
    vals, arr = _random_kmers(cfg, 100, seed=11)
    best, pos = necklace.necklace_pos(arr, cfg)
    word = necklace.pack_word(best, pos, cfg)
    pref = np.asarray(necklace.word_prefix(word, cfg))
    for w, p in zip(limbs.to_py_ints(np.asarray(word)), pref):
        assert (w >> cfg.suffix_bits) == int(p)
