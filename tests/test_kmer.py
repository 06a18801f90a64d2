"""k-mer encoding tests, mirroring `/root/reference/src/kmer.rs:350-414`
plus brute-force oracles for the batched extraction."""

import numpy as np
import pytest

from cbl_tpu import kmer, limbs
from cbl_tpu.config import get_config


def _pad16(codes):
    pad = (-len(codes)) % 16
    return np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])


def _extract(codes, cfg):
    stream = kmer.pack_stream(_pad16(codes))
    n = len(codes) - cfg.k + 1
    return np.asarray(kmer.extract_kmers(stream, n, cfg))


def test_encode_skips_invalid():
    # filter_map semantics: `/root/reference/src/kmer.rs:131-135`
    codes = kmer.encode_seq(b"ANCxTg\n")
    assert codes.tolist() == [0, 1, 2, 3]


def test_encode_values():
    assert kmer.encode_seq(b"ACTG").tolist() == [0, 1, 2, 3]
    assert kmer.encode_seq(b"actg").tolist() == [0, 1, 2, 3]


@pytest.mark.parametrize("k", [5, 25, 31, 59])
def test_extract_kmers_matches_oracle(k):
    cfg = get_config(k=k, prefix_bits=min(24, 2 * k - 1))
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=200, dtype=np.uint8)
    got = _extract(codes, cfg)
    n = len(codes) - k + 1
    for i in range(n):
        expect = kmer.kmer_to_int(codes[i : i + k])
        assert limbs.to_py_ints(got[i : i + 1])[0] == expect, f"kmer {i}"


def test_revcomp_known_answer():
    # `/root/reference/src/kmer.rs:365-373`: rc(CATAATCCAGC) == GCTGGATTATG
    cfg = get_config(k=11, prefix_bits=20)
    codes = kmer.encode_seq(b"CATAATCCAGC")
    km = _extract(codes, cfg)
    rc = np.asarray(kmer.revcomp(km, cfg))
    out = np.asarray(kmer.unpack_bases(rc, cfg))
    assert kmer.decode_codes(out[0]) == b"GCTGGATTATG"


@pytest.mark.parametrize("k", [11, 25, 59])
def test_revcomp_involution_and_oracle(k):
    cfg = get_config(k=k, prefix_bits=min(24, 2 * k - 1))
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=300, dtype=np.uint8)
    km = _extract(codes, cfg)
    rc = np.asarray(kmer.revcomp(km, cfg))
    rcrc = np.asarray(kmer.revcomp(rc, cfg))
    np.testing.assert_array_equal(rcrc, km)
    vals = limbs.to_py_ints(km)
    rcs = limbs.to_py_ints(rc)
    for v, r in zip(vals, rcs):
        assert r == kmer.py_revcomp(v, k)


@pytest.mark.parametrize("k", [25, 59])
def test_canonical_parity(k):
    cfg = get_config(k=k, prefix_bits=24)
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=200, dtype=np.uint8)
    km = _extract(codes, cfg)
    canon = np.asarray(kmer.is_canonical(km))
    rc = np.asarray(kmer.revcomp(km, cfg))
    canon_rc = np.asarray(kmer.is_canonical(rc))
    # K odd: exactly one of (kmer, rc) is canonical
    assert np.all(canon ^ canon_rc)
    for v, c in zip(limbs.to_py_ints(km), canon):
        assert kmer.py_is_canonical(v) == bool(c)


def test_canonicalize_selects_min_parity():
    cfg = get_config(k=25, prefix_bits=24)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=120, dtype=np.uint8)
    km = _extract(codes, cfg)
    canon_kmers, was_canon = kmer.canonicalize(km, cfg)
    canon_kmers = np.asarray(canon_kmers)
    assert np.all(np.asarray(kmer.is_canonical(canon_kmers)))
    # canonical(kmer) == canonical(rc(kmer))
    rc = kmer.revcomp(km, cfg)
    canon2, _ = kmer.canonicalize(rc, cfg)
    np.testing.assert_array_equal(canon_kmers, np.asarray(canon2))


def test_unpack_roundtrip():
    cfg = get_config(k=31, prefix_bits=24)
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=100, dtype=np.uint8)
    km = _extract(codes, cfg)
    out = np.asarray(kmer.unpack_bases(km, cfg))
    for i in range(out.shape[0]):
        np.testing.assert_array_equal(out[i], codes[i : i + cfg.k])


def test_neighborhood_ops():
    # `/root/reference/src/kmer.rs:61-90`: append/prepend/extend semantics,
    # successors/predecessors as the 4 append/prepend images
    rng = np.random.default_rng(7)
    for k in (5, 25, 59):
        mask = (1 << (2 * k)) - 1
        for _ in range(50):
            v = int(rng.integers(0, 1 << 31)) & mask
            codes = kmer.int_to_codes(v, k)
            for b in range(4):
                # extend keeps all bases; append is the k-window slide
                assert kmer.extend_kmer(v, b) == (v << 2) | b
                ap = kmer.append_kmer(v, b, k)
                assert ap == kmer.kmer_to_int(
                    np.concatenate([codes[1:], [b]])
                )
                pp = kmer.prepend_kmer(v, b, k)
                assert pp == kmer.kmer_to_int(np.concatenate([[b], codes[:-1]]))
            assert kmer.successors(v, k) == [
                kmer.append_kmer(v, b, k) for b in range(4)
            ]
            assert kmer.predecessors(v, k) == [
                kmer.prepend_kmer(v, b, k) for b in range(4)
            ]
            # append and prepend are mutually inverse along an edge
            for b in range(4):
                y = kmer.append_kmer(v, b, k)
                assert v in kmer.predecessors(y, k)
                assert y in kmer.successors(v, k)


def test_consecutive_kmers_are_graph_edges():
    # every consecutive k-mer pair of a sequence is a successor edge
    k = 11
    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, size=60, dtype=np.uint8)
    ints = [kmer.kmer_to_int(codes[i : i + k]) for i in range(len(codes) - k + 1)]
    for x, y in zip(ints, ints[1:]):
        assert y in kmer.successors(x, k)
