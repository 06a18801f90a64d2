"""Multi-device prefix-space sharding on the 8-device CPU mesh.

Exactness contract (SURVEY.md §2.9): the sharded index must contain the
same word set as the single-device index, with shard-major order equal to
global sorted order."""

import numpy as np
import pytest

import jax

from cbl_tpu import CBL, limbs
from cbl_tpu.config import get_config
from cbl_tpu.kmer import decode_codes
from cbl_tpu.parallel import ShardedCBL, make_mesh


def _random_nucs(n, seed):
    rng = np.random.default_rng(seed)
    return decode_codes(rng.integers(0, 4, size=n, dtype=np.uint8))


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(jax.devices()[:8])


def test_sharded_matches_single_device(mesh):
    seq = _random_nucs(20_000, seed=0)
    codes_offsets = None
    single = CBL(k=25)
    single.insert_seq(seq)

    sharded = ShardedCBL(k=25, mesh=mesh, batch_per_device=1024)
    from cbl_tpu.kmer import encode_seq

    codes = encode_seq(seq)
    offsets = np.array([0, len(codes)], dtype=np.int64)
    sharded.insert_codes_stream(codes, offsets)

    assert sharded.count() == single.count()
    np.testing.assert_array_equal(
        sharded.words_array(), single.wordset.words_array()
    )


def test_sharded_contains_routing(mesh):
    seq = _random_nucs(8_000, seed=1)
    other = _random_nucs(8_000, seed=2)
    sharded = ShardedCBL(k=25, canonical=True, mesh=mesh, batch_per_device=512)
    single = CBL.new_canonical(k=25)
    from cbl_tpu.kmer import encode_seq

    codes = encode_seq(seq)
    offsets = np.array([0, len(codes)], dtype=np.int64)
    sharded.insert_codes_stream(codes, offsets)
    single.insert_seq(seq)

    # query words derived from a different sequence: mixed hits/misses
    front = CBL.new_canonical(k=25)
    qcodes = encode_seq(other)
    valid = front._stream_valid(qcodes, np.array([0, len(qcodes)]))
    qwords = np.concatenate(
        [np.asarray(w) for w, _, _ in front._stream_words(qcodes, valid)]
    )
    got = sharded.contains_words(qwords)
    expect = np.asarray(single.wordset.contains_words(qwords))
    np.testing.assert_array_equal(got, expect)


def test_sharded_union(mesh):
    s1 = _random_nucs(6_000, seed=3)
    s2 = _random_nucs(6_000, seed=4)
    from cbl_tpu.kmer import encode_seq

    a = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    b = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c1, c2 = encode_seq(s1), encode_seq(s2)
    a.insert_codes_stream(c1, np.array([0, len(c1)]))
    b.insert_codes_stream(c2, np.array([0, len(c2)]))
    u = a.union(b)

    single = CBL(k=25)
    single.insert_seq(s1)
    single.insert_seq(s2)
    assert u.count() == single.count()
    np.testing.assert_array_equal(u.words_array(), single.wordset.words_array())


def test_sharded_set_algebra(mesh):
    s1 = _random_nucs(5_000, seed=6)
    s2 = _random_nucs(5_000, seed=7)
    from cbl_tpu.kmer import encode_seq

    def build_sharded(s):
        x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
        c = encode_seq(s)
        x.insert_codes_stream(c, np.array([0, len(c)]))
        return x

    def build_single(s):
        x = CBL(k=25)
        x.insert_seq(s)
        return x

    a, b = build_sharded(s1), build_sharded(s2)
    sa, sb = build_single(s1), build_single(s2)
    for op in ["__and__", "__sub__", "__xor__", "__or__"]:
        got = getattr(a, op)(b)
        expect = getattr(sa, op)(sb)
        assert got.count() == expect.count(), op
        np.testing.assert_array_equal(
            got.words_array(), expect.wordset.words_array(), err_msg=op
        )
    merged = ShardedCBL.merge_many([a, b, a])
    assert merged.count() == (sa | sb).count()
    inter = ShardedCBL.intersect_many([a, b])
    assert inter.count() == (sa & sb).count()


def test_sharded_remove(mesh):
    # distributed remove: route to owner shards + local tagged-sort diff;
    # must match the single-device remove exactly
    from cbl_tpu.kmer import encode_seq

    s1 = _random_nucs(8_000, seed=60)
    s2 = _random_nucs(2_000, seed=61)  # disjoint stream: remove is a no-op
    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c1, c2 = encode_seq(s1), encode_seq(s2)
    x.insert_codes_stream(c1, np.array([0, len(c1)]))
    single = CBL(k=25)
    single.insert_seq(s1)

    # remove half of the stored words (mixed with absent words + sentinels)
    stored = single.wordset.words_array()
    to_remove = stored[::2]
    x.remove_words(to_remove)
    single.wordset.remove_words(jax.numpy.asarray(to_remove))
    assert x.count() == single.count()
    np.testing.assert_array_equal(x.words_array(), single.wordset.words_array())

    # removing absent words changes nothing
    before = x.count()
    x.remove_codes_stream(c2, np.array([0, len(c2)]))
    single.remove_codes_stream(c2, np.array([0, len(c2)], dtype=np.int64))
    assert x.count() == single.count() == before - (before - single.count())
    np.testing.assert_array_equal(x.words_array(), single.wordset.words_array())


def test_sharded_query_codes_stream(mesh):
    from cbl_tpu.kmer import encode_seq

    s1 = _random_nucs(6_000, seed=62)
    s2 = _random_nucs(3_000, seed=63)
    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c1, c2 = encode_seq(s1), encode_seq(s2)
    x.insert_codes_stream(c1, np.array([0, len(c1)]))
    single = CBL(k=25)
    single.insert_seq(s1)
    mixed = np.concatenate([c1[:3000], c2])
    offs = np.array([0, 3000, 3000 + len(c2)], dtype=np.int64)
    got = x.query_codes_stream(mixed, offs)
    expect = single.query_codes_stream(mixed, offs)
    assert got == expect


def test_to_cbl_roundtrip(mesh):
    seq = _random_nucs(5_000, seed=5)
    from cbl_tpu.kmer import encode_seq

    sharded = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    codes = encode_seq(seq)
    sharded.insert_codes_stream(codes, np.array([0, len(codes)]))
    local = sharded.to_cbl()
    assert local.count() == sharded.count()
    assert np.all(local.contains_seq(seq))


def test_sharded_count_hits(mesh):
    from cbl_tpu.kmer import encode_seq

    seq = _random_nucs(6_000, seed=50)
    other = _random_nucs(3_000, seed=51)
    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c = encode_seq(seq)
    x.insert_codes_stream(c, np.array([0, len(c)]))
    single = CBL(k=25)
    single.insert_seq(seq)
    # mixed members + non-members
    member_words = single.wordset.words_array()[:1000]
    front = CBL(k=25)
    oc = encode_seq(other)
    valid = front._stream_valid(oc, np.array([0, len(oc)]))
    other_words = np.concatenate(
        [np.asarray(w) for w, _, _ in front._stream_words(oc, valid)]
    )
    mixed = np.concatenate([member_words, other_words])
    expect = int(np.asarray(single.wordset.contains_words(mixed)).sum())
    assert x.count_hits(mixed) == expect


def test_sharded_wide_words_k59(mesh):
    # 125-bit packed words = 4 uint32 limbs through routing/boundaries
    from cbl_tpu.kmer import encode_seq

    seq = _random_nucs(3_000, seed=40)
    x = ShardedCBL(k=59, prefix_bits=28, mesh=mesh, batch_per_device=512)
    c = encode_seq(seq)
    x.insert_codes_stream(c, np.array([0, len(c)]))
    single = CBL(k=59, prefix_bits=28)
    single.insert_seq(seq)
    assert x.count() == single.count()
    np.testing.assert_array_equal(x.words_array(), single.wordset.words_array())
    words = single.wordset.words_array()
    got = x.contains_words(words[:500])
    assert got.all()


def test_shard_load_balance(mesh):
    # necklace words skew toward small values; quantile boundaries must keep
    # shards balanced (naive top-bits sharding puts ~98% on shard 0)
    seq = _random_nucs(30_000, seed=30)
    from cbl_tpu.kmer import encode_seq

    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=4096)
    c = encode_seq(seq)
    x.insert_codes_stream(c, np.array([0, len(c)]))
    bal = x.shard_balance()
    assert bal.sum() == x.count()
    assert bal.min() > 0
    assert bal.max() / max(bal.min(), 1) < 3, bal.tolist()


def test_misaligned_boundaries_reshard(mesh):
    # operands built from different data get different quantile boundaries;
    # binary ops must still be exact (auto-reshard)
    from cbl_tpu.kmer import encode_seq

    s1, s2 = _random_nucs(4_000, seed=31), _random_nucs(4_000, seed=32)
    a = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    b = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c1, c2 = encode_seq(s1), encode_seq(s2)
    a.insert_codes_stream(c1, np.array([0, len(c1)]))
    b.insert_codes_stream(c2, np.array([0, len(c2)]))
    assert not np.array_equal(a.boundaries, b.boundaries)
    sa, sb = CBL(k=25), CBL(k=25)
    sa.insert_seq(s1)
    sb.insert_seq(s2)
    u = a | b
    assert u.count() == (sa | sb).count()
    np.testing.assert_array_equal(u.words_array(), (sa | sb).wordset.words_array())


def test_from_cbl_and_persistence(mesh, tmp_path):
    seq = _random_nucs(4_000, seed=20)
    single = CBL.new_canonical(k=25)
    single.insert_seq(seq)
    sharded = ShardedCBL.from_cbl(single, mesh=mesh, batch_per_device=512)
    assert sharded.count() == single.count()
    np.testing.assert_array_equal(
        sharded.words_array(), single.wordset.words_array()
    )
    p = tmp_path / "sharded.npz"
    sharded.save_to_file(p)
    back = ShardedCBL.load_from_file(p, mesh=mesh, batch_per_device=512)
    assert back.canonical
    assert back.count() == single.count()
    bal = sharded.shard_balance()
    assert bal.sum() == single.count()


def test_host_record_slicing():
    # DP read streaming: hosts get disjoint contiguous record ranges that
    # cover the input; per-host insert of slices == global insert
    from cbl_tpu.parallel.distributed import host_record_slice, slice_codes
    from cbl_tpu.kmer import encode_seq

    rng = np.random.default_rng(8)
    recs = [
        rng.integers(0, 4, size=int(n), dtype=np.uint8)
        for n in rng.integers(30, 400, size=23)
    ]
    codes = np.concatenate(recs)
    offsets = np.cumsum([0] + [len(r) for r in recs], dtype=np.int64)
    n_hosts = 4
    ranges = [host_record_slice(offsets, h, n_hosts) for h in range(n_hosts)]
    # disjoint cover
    assert ranges[0][0] == 0 and ranges[-1][1] == len(recs)
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c
    # union of per-host inserts == global insert
    glob = CBL(k=25)
    glob.insert_codes_stream(codes, offsets)
    parts = []
    for h in range(n_hosts):
        lo, hi = ranges[h]
        sub, sub_off = slice_codes(codes, offsets, lo, hi)
        c = CBL(k=25)
        if len(sub_off) > 1:
            c.insert_codes_stream(sub, sub_off)
        parts.append(c)
    merged = CBL.merge(parts)
    assert merged.count() == glob.count()
    np.testing.assert_array_equal(
        merged.wordset.words_array(), glob.wordset.words_array()
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_checkpoint_roundtrip(mesh, tmp_path):
    """Per-shard checkpoint: save never gathers the index through a
    single-device CBL; load re-creates the mesh layout directly and
    preserves words, counts, boundaries, and canonical mode."""
    from cbl_tpu.kmer import encode_seq

    seq = _random_nucs(12_000, seed=70)
    x = ShardedCBL(k=25, canonical=True, mesh=mesh, batch_per_device=512)
    c = encode_seq(seq)
    x.insert_codes_stream(c, np.array([0, len(c)]))
    p = tmp_path / "ck.npz"
    x.save_to_file(p)
    back = ShardedCBL.load_from_file(p, mesh=mesh, batch_per_device=512)
    assert back.canonical
    assert back.count() == x.count()
    np.testing.assert_array_equal(back.boundaries, x.boundaries)
    np.testing.assert_array_equal(back.shard_counts, x.shard_counts)
    np.testing.assert_array_equal(back.words_array(), x.words_array())
    # the loaded index stays fully functional: insert + query + remove
    more = _random_nucs(2_000, seed=71)
    cm = encode_seq(more)
    back.insert_codes_stream(cm, np.array([0, len(cm)]))
    single = CBL.new_canonical(k=25)
    single.insert_seq(seq)
    single.insert_seq(more)
    assert back.count() == single.count()
    np.testing.assert_array_equal(
        back.words_array(), single.wordset.words_array()
    )


def test_sharded_remove_stream_bulk(mesh):
    """Bulk sharded remove (fused pipeline+route+tagged-diff) at stream
    scale: insert two streams, remove one, compare with single-device."""
    from cbl_tpu.kmer import encode_seq

    s1 = _random_nucs(20_000, seed=80)
    s2 = _random_nucs(9_000, seed=81)
    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=1024)
    c1, c2 = encode_seq(s1), encode_seq(s2)
    x.insert_codes_stream(c1, np.array([0, len(c1)]))
    x.insert_codes_stream(c2, np.array([0, len(c2)]))
    x.remove_codes_stream(c2, np.array([0, len(c2)]))
    single = CBL(k=25)
    single.insert_seq(s1)
    single.insert_seq(s2)
    single.remove_codes_stream(c2, np.array([0, len(c2)], dtype=np.int64))
    assert x.count() == single.count()
    np.testing.assert_array_equal(
        x.words_array(), single.wordset.words_array()
    )
    # remove everything else too -> empty
    x.remove_codes_stream(c1, np.array([0, len(c1)]))
    single.remove_codes_stream(c1, np.array([0, len(c1)], dtype=np.int64))
    assert x.count() == single.count()


def test_sharded_merge_many_words(mesh):
    """k-way merge is one concat-sort per shard; words must equal the
    chained single-device union exactly."""
    from cbl_tpu.kmer import encode_seq

    seqs = [_random_nucs(4_000, seed=90 + i) for i in range(4)]
    shardeds, singles = [], []
    for s in seqs:
        x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
        c = encode_seq(s)
        x.insert_codes_stream(c, np.array([0, len(c)]))
        shardeds.append(x)
        y = CBL(k=25)
        y.insert_seq(s)
        singles.append(y)
    merged = ShardedCBL.merge_many(shardeds)
    expect = CBL.merge(singles)
    assert merged.count() == expect.count()
    np.testing.assert_array_equal(
        merged.words_array(), expect.wordset.words_array()
    )


def test_sharded_dup_state_interleaving(mesh):
    """The keep-dups insert fold must stay exact through interleaved
    queries, re-inserts of the same stream (max duplication), capacity
    pressure, and set ops that require a clean state."""
    from cbl_tpu.kmer import encode_seq

    s1 = _random_nucs(10_000, seed=95)
    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c1 = encode_seq(s1)
    off = np.array([0, len(c1)])
    x.insert_codes_stream(c1, off)
    n0 = x.count()
    # re-insert the identical stream twice: every routed word is a dup
    x.insert_codes_stream(c1, off)
    x.insert_codes_stream(c1, off)
    assert x.count() == n0
    # queries on the dup-holding state
    total, pos = x.query_codes_stream(c1, off)
    assert total == pos == len(c1) - 24
    single = CBL(k=25)
    single.insert_seq(s1)
    np.testing.assert_array_equal(
        x.words_array(), single.wordset.words_array()
    )
    assert x.count() == single.count()


def test_sharded_contains_seqs_ordered(mesh):
    """Distributed ordered membership: per-record masks must equal the
    single-device contains_seq exactly (mixed hits/misses, multi-record)."""
    from cbl_tpu.kmer import encode_seq

    s1 = _random_nucs(9_000, seed=100)
    x = ShardedCBL(k=25, mesh=mesh, batch_per_device=512)
    c1 = encode_seq(s1)
    x.insert_codes_stream(c1, np.array([0, len(c1)]))
    single = CBL(k=25)
    single.insert_seq(s1)

    queries = [
        s1[:2_000],                      # all hits
        _random_nucs(1_500, seed=101),   # ~all misses
        s1[4_000:5_000],                 # hits
    ]
    got = x.contains_seqs(queries)
    expect = single.contains_seqs(queries)
    assert len(got) == len(expect) == 3
    for g, e, q in zip(got, expect, queries):
        assert g.shape[0] == len(q) - 24
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))
    assert got[0].all() and got[2].all()
    assert not got[1].any()


def test_sharded_insert_overflow_recovers(mesh):
    """A pathologically skewed range partition overflows its routing
    buckets; the insert stream must RECOVER (repartition + retry with
    grown buckets — inserts are idempotent) with ZERO lost words instead
    of permanently corrupting the index (round-4 verdict item 1)."""
    idx = ShardedCBL(k=25, mesh=mesh)
    # route every word to shard 0 and forbid the data-driven re-partition
    idx.boundaries = np.full_like(np.asarray(idx.boundaries), 0xFFFFFFFF)
    idx._boundaries_from_data = True
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=300_000, dtype=np.uint8)
    offsets = np.array([0, len(codes)], dtype=np.int64)
    idx.insert_codes_stream(codes, offsets)  # recovers internally
    single = CBL(k=25)
    single.insert_codes_stream(codes, offsets)
    assert idx.count() == single.count()
    np.testing.assert_array_equal(
        idx.words_array(), single.wordset.words_array()
    )
    # and the recovered index keeps working (no sticky corruption)
    t, p = idx.query_codes_stream(codes[:1000], np.array([0, 1000]))
    assert t == 1000 - 24 and p == t
    # recovery ends with a re-balance on the FULL contents (the
    # mid-recovery repartition only saw the biased partial survivors)
    bal = idx.shard_balance()
    tot = int(bal.sum())
    assert bal.max() <= 2 * max(1, (tot + idx.D - 1) // idx.D), bal


def test_sharded_repartition_rebalances_skewed_growth(mesh):
    """Boundaries frozen from an early uniform batch, then a heavy
    skewed growth burst (tiny-valued words all route to shard 0): the
    index never corrupts, and `repartition()` restores balance within 2x
    of uniform with zero lost words and unchanged global order."""
    idx = ShardedCBL(k=25, mesh=mesh)
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    idx.insert_codes_stream(codes, np.array([0, len(codes)], dtype=np.int64))
    # skewed growth: values 0..30000 sort below every data-quantile
    # boundary (a random necklace word needs a ~41-zero-bit run to be
    # this small), so the whole burst lands on shard 0
    skew = np.zeros((30_000, idx.L), dtype=np.uint32)
    skew[:, idx.L - 1] = np.arange(30_000, dtype=np.uint32)
    idx.insert_words(skew)
    bal0 = idx.shard_balance()
    total = int(bal0.sum())
    assert bal0.max() > 2 * ((total + idx.D - 1) // idx.D)  # skewed indeed
    before = idx.words_array()
    idx.repartition()
    bal = idx.shard_balance()
    assert int(bal.sum()) == total == idx.count()
    assert bal.max() <= 2 * max(1, (total + idx.D - 1) // idx.D)
    np.testing.assert_array_equal(idx.words_array(), before)
    assert np.asarray(idx.contains_words(before[:100])).all()


def test_sharded_overflow_flag_is_sticky(mesh):
    """Paths that cannot re-run their input (a committed dynamic round)
    still corrupt permanently: once `_check_dropped` sees a nonzero
    counter, every later sync/query re-raises (ADVICE round 3)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    idx = ShardedCBL(k=25, mesh=mesh)
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=30_000, dtype=np.uint8)
    idx.insert_codes_stream(codes, np.array([0, len(codes)], dtype=np.int64))
    # plant a nonzero deferred drop counter (what a round whose routing
    # overflowed leaves behind after its state already committed)
    idx._dropped_dev = jax.device_put(
        np.ones(idx.D, dtype=np.int32), NamedSharding(mesh, P("d"))
    )
    with pytest.raises(RuntimeError, match="bucket overflow"):
        idx.query_codes_stream(codes[:1000], np.array([0, 1000]))
    with pytest.raises(RuntimeError, match="corrupt"):
        idx.query_codes_stream(codes[:1000], np.array([0, 1000]))
    with pytest.raises(RuntimeError, match="corrupt"):
        idx.contains_words(np.zeros((4, idx.L), dtype=np.uint32))


def test_sharded_non_pow2_mesh():
    """Word-level and bulk paths on a 6-device mesh (the sorted routing is
    D-agnostic; round 3 asserted power-of-two)."""
    from cbl_tpu.kmer import encode_seq

    mesh6 = make_mesh(jax.devices()[:6])
    seq = _random_nucs(9_000, seed=55)
    codes = encode_seq(seq)
    x = ShardedCBL(k=25, mesh=mesh6, batch_per_device=512)
    x.insert_codes_stream(codes, np.array([0, len(codes)], dtype=np.int64))
    single = CBL(k=25)
    single.insert_seq(seq)
    assert x.count() == single.count()
    np.testing.assert_array_equal(x.words_array(),
                                  single.wordset.words_array())
    # word-level point paths (insert/contains/remove via _route_sorted)
    extra = single.wordset.words_array()[:64]
    mask = x.contains_words(extra)
    assert mask.all()
    miss = np.asarray(extra).copy()
    miss[:, -1] ^= 1
    got = x.contains_words(np.concatenate([extra, miss]))
    expect = np.asarray(single.wordset.contains_words(
        np.concatenate([extra, miss])))
    np.testing.assert_array_equal(got, expect)
    x.remove_words(extra)
    assert x.count() == single.count() - len(extra)
    x.insert_words(extra)
    assert x.count() == single.count()
    # ordered stream masks on 6 devices
    masks = x.contains_seqs([seq[:2_000], _random_nucs(1_000, seed=56)])
    e = single.contains_seqs([seq[:2_000], _random_nucs(1_000, seed=56)])
    for g, w in zip(masks, e):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("nd", [1, 8])
def test_sharded_dynamic_rounds_match_single_chip(nd):
    """Sharded interleaved dynamic rounds (one fused program per round over
    the mesh's sorted-log slices) must match single-chip dynamic_round
    exactly: per-round totals/positives, mid-workload count, and the final
    folded word set."""
    from cbl_tpu.kmer import encode_seq

    mesh_n = make_mesh(jax.devices()[:nd])
    rng = np.random.default_rng(77)
    bases = 40_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    SEGS = 4
    sb = bases // SEGS
    off1 = np.array([0, sb], dtype=np.int64)
    off_h = np.array([0, sb // 2], dtype=np.int64)

    single = CBL(k=25)
    x = ShardedCBL(k=25, mesh=mesh_n, batch_per_device=512)
    for i in range(SEGS):
        seg = codes[i * sb:(i + 1) * sb]
        q0 = codes[(i - 1 if i else 0) * sb:((i - 1 if i else 0) + 1) * sb]
        half = codes[i * sb:i * sb + sb // 2]
        want = single.dynamic_round(
            (seg, off1), (q0, off1), (half, off_h))
        got = x.dynamic_round((seg, off1), (q0, off1), (half, off_h))
        assert got == want, (i, got, want)
        # mid-workload count: free by-product of the round's scan
        assert x._slog_dev is not None
        assert x.count() == single.count()
        assert x._slog_dev is not None  # count did not fold
    np.testing.assert_array_equal(
        x.words_array(), single.wordset.words_array()
    )
    assert x._slog_dev is None  # words_array folded


def test_sharded_dynamic_then_mixed_api():
    """APIs interleaved with sharded rounds fold the log first and stay
    exact (insert/contains/query/algebra after rounds)."""
    from cbl_tpu.kmer import encode_seq

    mesh8 = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(78)
    codes = rng.integers(0, 4, size=24_000, dtype=np.uint8)
    off = np.array([0, 8_000], dtype=np.int64)
    single = CBL(k=25)
    x = ShardedCBL(k=25, mesh=mesh8, batch_per_device=512)
    for idx0 in (single, x):
        idx0.dynamic_round(
            (codes[:8_000], off), (codes[:8_000], off),
            (codes[4_000:12_000], off))
    t_s, p_s = single.query_codes_stream(codes[8_000:16_000], off)
    t_x, p_x = x.query_codes_stream(codes[8_000:16_000], off)
    assert (t_x, p_x) == (t_s, p_s)
    # a second round AFTER the fold re-enters the slog cleanly
    r_s = single.dynamic_round(
        (codes[16_000:], off), (codes[:8_000], off), (codes[:8_000], off))
    r_x = x.dynamic_round(
        (codes[16_000:], off), (codes[:8_000], off), (codes[:8_000], off))
    assert r_x == r_s
    assert x.count() == single.count()
    np.testing.assert_array_equal(
        x.words_array(), single.wordset.words_array()
    )


def test_sharded_stream_staging_and_memo():
    """ShardedCBL.pack_stream: staged streams reused across rounds compute
    their sorted words once; results equal the tuple path exactly."""
    mesh8 = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(91)
    bases = 24_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    sb = bases // 3
    off = np.array([0, sb], dtype=np.int64)

    a = ShardedCBL(k=25, mesh=mesh8, batch_per_device=512)
    segs = [a.pack_stream(codes[i * sb:(i + 1) * sb], off) for i in range(3)]
    got = []
    for i in range(3):
        got.append(a.dynamic_round(segs[i], segs[i - 1 if i else 0],
                                   segs[0]))
        assert 0 in segs[i]._words  # memo populated
    b = ShardedCBL(k=25, mesh=mesh8, batch_per_device=512)
    want = []
    for i in range(3):
        q0 = (i - 1 if i else 0) * sb
        want.append(b.dynamic_round(
            (codes[i * sb:(i + 1) * sb], off),
            (codes[q0:q0 + sb], off),
            (codes[:sb], off)))
    assert got == want
    np.testing.assert_array_equal(a.words_array(), b.words_array())
    # mismatched config is rejected
    other = ShardedCBL(k=25, canonical=True, mesh=mesh8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="different"):
        other.dynamic_round(segs[0], segs[0], segs[0])


def test_sharded_dynamic_largek_unpacked(mesh):
    """K=59 leaves <8 spare bits, so the SHARDED slog keeps the separate
    tag column and routes it as an all-to-all payload — that branch of
    _dyn_round_step_fn must match the single-chip rounds exactly."""
    from cbl_tpu.wordset import slog_packed

    rng = np.random.default_rng(123)
    k = 59
    sb = 4_000
    codes = rng.integers(0, 4, size=3 * sb, dtype=np.uint8)
    off = np.array([0, sb], dtype=np.int64)
    x = ShardedCBL(k=k, prefix_bits=28, mesh=mesh, batch_per_device=512)
    assert not slog_packed(x.cfg)
    single = CBL(k=k, prefix_bits=28)
    for r in range(3):
        seg = codes[r * sb:(r + 1) * sb]
        qry = codes[max(r - 1, 0) * sb:(max(r - 1, 0) + 1) * sb]
        rm = codes[r * sb + sb // 2:(r + 1) * sb + sb // 2] \
            if r < 2 else codes[:sb]
        got = x.dynamic_round((seg, off), (qry, off), (rm, off))
        want = single.dynamic_round((seg, off), (qry, off), (rm, off))
        assert got == want, r
        assert x.count() == single.count()
    np.testing.assert_array_equal(
        x.words_array(), single.wordset.words_array()
    )


def test_sharded_iter_words_chunks(mesh):
    """Sharded chunked export equals words_array in global order, in
    bounded pieces (multi-device analog of the chunked list path)."""
    idx = ShardedCBL(k=25, mesh=mesh)
    rng = np.random.default_rng(12)
    codes = rng.integers(0, 4, size=40_000, dtype=np.uint8)
    idx.insert_codes_stream(codes, np.array([0, len(codes)], dtype=np.int64))
    full = idx.words_array()
    parts = list(idx.iter_words_chunks(chunk_rows=1024))
    assert all(p.shape[0] <= 1024 for p in parts)
    assert len(parts) > idx.D  # actually chunked within shards
    np.testing.assert_array_equal(np.concatenate(parts), full)


def test_sharded_repartition_fuzz_vs_oracle(mesh):
    """Interleave bulk inserts, removes, skewed word-level growth, and
    repartition() calls: after every re-balance the index must equal the
    single-device build exactly (zero lost/duplicated words, unchanged
    global order), and boundaries keep adapting to the moving contents."""
    rng = np.random.default_rng(77)
    idx = ShardedCBL(k=25, mesh=mesh)
    single = CBL(k=25)
    pool = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    for r in range(6):
        n = int(rng.integers(5_000, 15_000))
        s0 = int(rng.integers(0, len(pool) - n))
        off = np.array([0, n], dtype=np.int64)
        idx.insert_codes_stream(pool[s0 : s0 + n], off)
        single.insert_codes_stream(pool[s0 : s0 + n], off)
        if r % 2 == 1:
            m = int(rng.integers(2_000, 6_000))
            s1 = int(rng.integers(0, len(pool) - m))
            offm = np.array([0, m], dtype=np.int64)
            idx.remove_codes_stream(pool[s1 : s1 + m], offm)
            single.remove_codes_stream(pool[s1 : s1 + m], offm)
        if r % 3 == 2:
            # tiny-valued words skew the load onto shard 0 before the
            # re-balance
            skew = np.zeros((4_000, idx.L), dtype=np.uint32)
            skew[:, idx.L - 1] = rng.integers(
                0, 50_000, size=4_000
            ).astype(np.uint32)
            idx.insert_words(skew)
            single.wordset.insert_words(skew)
        idx.repartition()
        assert idx.count() == single.count(), r
        np.testing.assert_array_equal(
            idx.words_array(), single.wordset.words_array(), err_msg=str(r)
        )
        bal = idx.shard_balance()
        tot = int(bal.sum())
        assert bal.max() <= 2 * max(1, -(-tot // idx.D)), (r, bal)
