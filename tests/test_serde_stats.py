"""Persistence round-trip (`/root/reference/src/cbl.rs:127-160`) and
repartition statistics (`src/wordset/mod.rs:254-295`)."""

import numpy as np
import pytest

from cbl_tpu import CBL
from cbl_tpu.kmer import decode_codes


def _random_nucs(n, seed):
    rng = np.random.default_rng(seed)
    return decode_codes(rng.integers(0, 4, size=n, dtype=np.uint8))


def test_save_load_roundtrip(tmp_path):
    seq = _random_nucs(5_000, seed=0)
    s = CBL.new_canonical(k=25)
    s.insert_seq(seq)
    path = tmp_path / "idx.cblx.npz"
    s.save_to_file(path)
    t = CBL.load_from_file(path)
    assert t.is_canonical()
    assert t.count() == s.count()
    assert np.array_equal(t.wordset.words_array(), s.wordset.words_array())
    assert np.all(t.contains_seq(seq))


def test_load_rejects_garbage(tmp_path):
    p = tmp_path / "bad.npz"
    np.savez(p, magic=np.array("NOPE"), version=np.array(1))
    with pytest.raises(ValueError):
        CBL.load_from_file(p)


def test_prefix_load_and_bucket_sizes():
    seq = _random_nucs(8_000, seed=1)
    s = CBL(k=25)
    s.insert_seq(seq)
    uniq_prefixes = len({w >> s.cfg.suffix_bits for w in _words(s)})
    assert s.prefix_load() == uniq_prefixes / (1 << s.cfg.prefix_bits)
    sizes = s.buckets_sizes()
    assert sum(c for _, c in sizes) == s.count()
    assert len(sizes) == uniq_prefixes
    sc = s.buckets_size_count()
    assert sum(sc.values()) == uniq_prefixes
    rep = s.buckets_load_repartition()
    assert abs(sum(rep.values()) - 1.0) < 1e-9


def test_buckets_nodes_small_is_len():
    # buckets <= 1024 report their length (`src/trievec/mod.rs:37-42`)
    seq = _random_nucs(3_000, seed=2)
    s = CBL(k=25)
    s.insert_seq(seq)
    sizes = dict(s.buckets_sizes())
    nodes = dict(s.buckets_nodes())
    for p, sz in sizes.items():
        if sz <= 1024:
            assert nodes[p] == sz


def test_trie_node_count():
    # force one giant bucket with k=7, prefix_bits=1 -> suffix 17 bits, 3 bytes
    s = CBL(k=7, prefix_bits=1)
    seq = _random_nucs(6_000, seed=3)
    s.insert_seq(seq)
    nodes = dict(s.buckets_nodes())
    sizes = dict(s.buckets_sizes())
    words = _words(s)
    sb = s.cfg.suffix_bits
    nbytes = (sb + 7) // 8
    for p, sz in sizes.items():
        suffixes = sorted(w & ((1 << sb) - 1) for w in words if (w >> sb) == p)
        if sz <= 1024:
            continue
        expect = 1
        for depth in range(1, nbytes):
            shift = 8 * (nbytes - depth)
            expect += len({v >> shift for v in suffixes})
        assert nodes[p] == expect


def test_shard_balance():
    from cbl_tpu import stats

    seq = _random_nucs(4_000, seed=4)
    s = CBL(k=25)
    s.insert_seq(seq)
    bal = stats.shard_balance(s, 8)
    assert bal.sum() == s.count()
    assert len(bal) == 8


def _words(s):
    from cbl_tpu import limbs

    return limbs.to_py_ints(s.wordset.words_array())
