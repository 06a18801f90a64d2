"""Reference .cbl (bincode varint) format interop tests."""

import io

import numpy as np
import pytest

from cbl_tpu import CBL, interop
from cbl_tpu.kmer import decode_codes


def _random_nucs(n, seed):
    rng = np.random.default_rng(seed)
    return decode_codes(rng.integers(0, 4, size=n, dtype=np.uint8))


def test_roundtrip_through_reference_format(tmp_path):
    seq = _random_nucs(4_000, seed=0)
    s = CBL.new_canonical(k=25)
    s.insert_seq(seq)
    p = tmp_path / "idx.cbl"
    interop.save_reference(s, p)
    t = interop.load_reference(p, k=25, prefix_bits=24)
    assert t.is_canonical()
    assert t.count() == s.count()
    np.testing.assert_array_equal(
        t.wordset.words_array(), s.wordset.words_array()
    )


def test_golden_bytes_small_config(tmp_path):
    # k=7, prefix_bits=13: n_bits=18, suffix_bits=5 -> 1-byte suffixes
    s = CBL(k=7, prefix_bits=13)
    # choose packed words directly via known k-mers
    s.insert_kmers([0b10, 0b0101010101010, 0b11111111111111])
    p = tmp_path / "small.cbl"
    interop.save_reference(s, p)
    raw = p.read_bytes()
    # independent decode: bool + map len + ascending (prefix, Vec) entries
    r = interop._Reader(raw)
    assert r.take(1) == b"\x00"  # non-canonical
    n_buckets = r.varint()
    seen = []
    last = -1
    for _ in range(n_buckets):
        prefix = r.varint()
        assert prefix > last
        last = prefix
        assert r.varint() == 0  # Vec variant
        n = r.varint()
        for _ in range(n):
            assert r.varint() == 1  # 1-byte suffix
            suffix = r.take(1)[0]
            seen.append((prefix << 5) | suffix)
    assert r.eof()
    from cbl_tpu import limbs

    assert sorted(seen) == limbs.to_py_ints(s.wordset.words_array())


def test_trie_variant_decode(tmp_path):
    # hand-craft a reference file with one Trie bucket (k=25/pb=24:
    # suffix_bits=32 -> 4-byte paths) holding suffixes 0x01020304, 0x01020399
    buf = io.BytesIO()
    buf.write(b"\x00")                      # canonical=false
    interop._write_varint(buf, 1)           # one bucket
    interop._write_varint(buf, 7)           # prefix=7
    interop._write_varint(buf, 1)           # Trie variant
    # depth0: bv {1}, children [..]
    interop._write_varint(buf, 1); interop._write_varint(buf, 0x01)
    interop._write_varint(buf, 1)
    # depth1: bv {2}, children [..]
    interop._write_varint(buf, 1); interop._write_varint(buf, 0x02)
    interop._write_varint(buf, 1)
    # depth2: bv {3}, children [..]
    interop._write_varint(buf, 1); interop._write_varint(buf, 0x03)
    interop._write_varint(buf, 1)
    # depth3 (leaf): bv {4, 0x99}, no children
    interop._write_varint(buf, 2)
    interop._write_varint(buf, 0x04); interop._write_varint(buf, 0x99)
    interop._write_varint(buf, 0)
    interop._write_varint(buf, 2)           # trie len (usize)
    p = tmp_path / "trie.cbl"
    p.write_bytes(buf.getvalue())

    cbl = interop.load_reference(p, k=25, prefix_bits=24)
    assert cbl.count() == 2
    from cbl_tpu import limbs

    words = limbs.to_py_ints(cbl.wordset.words_array())
    assert words == [(7 << 32) | 0x01020304, (7 << 32) | 0x01020399]


def test_wrong_constants_detected(tmp_path):
    s = CBL(k=25)
    s.insert_seq(_random_nucs(200, seed=1))
    p = tmp_path / "x.cbl"
    interop.save_reference(s, p)
    with pytest.raises(ValueError):
        interop.load_reference(p, k=31, prefix_bits=24)  # wrong suffix width
