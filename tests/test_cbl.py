"""CBL API tests mirroring `/root/reference/src/cbl.rs:577-915`, scaled for
the CPU test backend.  Oracle: a host python set of (canonical) k-mer ints —
valid because word packing is a bijection on k-mers."""

import numpy as np
import pytest

from cbl_tpu import CBL
from cbl_tpu.kmer import (
    decode_codes,
    encode_seq,
    kmer_to_int,
    py_is_canonical,
    py_revcomp,
)

N = 20_000


def _random_nucs(n, seed):
    rng = np.random.default_rng(seed)
    return decode_codes(rng.integers(0, 4, size=n, dtype=np.uint8))


def _kmers_of(seq, k):
    codes = encode_seq(seq)
    return [kmer_to_int(codes[i : i + k]) for i in range(len(codes) - k + 1)]


def _canon(v, k):
    return v if py_is_canonical(v) else py_revcomp(v, k)


@pytest.mark.parametrize("k", [25, 59])
def test_insert_contains_remove(k):
    seq = _random_nucs(N, seed=k)
    kmers = _kmers_of(seq, k)
    s = CBL(k=k, chunk_size=4096)
    s.insert_seq(seq)
    assert s.count() == len(set(kmers))
    assert np.all(s.contains_seq(seq))
    s.remove_seq(seq)
    assert not np.any(s.contains_seq(seq))
    assert s.is_empty()


def test_point_vs_batch_equivalence():
    k = 25
    seq = _random_nucs(2_000, seed=1)
    kmers = _kmers_of(seq, k)
    a = CBL(k=k)
    b = CBL(k=k)
    a.insert_seq(seq)
    for v in kmers:
        b.insert(v)
    assert a.count() == b.count()
    assert np.all(a.contains_kmers(kmers))
    assert np.all(b.contains_kmers(kmers))
    # insert returns absent-flag (`src/cbl.rs:223-228`)
    fresh = CBL(k=k)
    assert fresh.insert(kmers[0])
    assert not fresh.insert(kmers[0])
    assert fresh.remove(kmers[0])
    assert not fresh.remove(kmers[0])


def test_canonical_mode():
    k = 25
    seq = _random_nucs(N, seed=2)
    kmers = _kmers_of(seq, k)
    s = CBL.new_canonical(k=k)
    s.insert_seq(seq)
    for v in kmers[:100]:
        assert s.contains(v)
        assert s.contains(py_revcomp(v, k))
    assert s.count() == len({_canon(v, k) for v in kmers})
    s.remove_seq(seq)
    assert s.is_empty()
    for v in kmers[:50]:
        assert not s.contains(v)
        assert not s.contains(py_revcomp(v, k))


def test_canonical_rc_sequence_query():
    # querying the reverse-complement *sequence* hits the same canonical set
    k = 25
    seq = _random_nucs(3_000, seed=3)
    codes = encode_seq(seq)
    rc_codes = (codes[::-1] ^ 0b10).astype(np.uint8)
    rc_seq = decode_codes(rc_codes)
    s = CBL.new_canonical(k=k)
    s.insert_seq(seq)
    assert np.all(s.contains_seq(rc_seq))


def test_iter_roundtrip():
    # `/root/reference/src/cbl.rs:763-773`
    k = 25
    kmers = list(range(0, 7000, 7))
    s = CBL(k=k)
    s.insert_kmers(kmers)
    got = sorted(s)
    assert got == kmers


def test_invalid_chars_skipped():
    k = 11
    s = CBL(k=k, prefix_bits=20)
    s.insert_seq(b"ACGTNNNACGTACGTatt")  # N's removed, lowercase ok
    t = CBL(k=k, prefix_bits=20)
    t.insert_seq(b"ACGTACGTACGTATT")
    assert s.count() == t.count()
    assert sorted(s) == sorted(t)


def test_seq_too_short_raises():
    s = CBL(k=25)
    with pytest.raises(ValueError):
        s.insert_seq(b"ACGT")
    with pytest.raises(ValueError):
        s.contains_seq(b"ACGT")


@pytest.mark.parametrize("op", ["or", "and", "sub", "xor"])
def test_set_algebra(op):
    # `/root/reference/src/cbl.rs:776-863`
    k = 25
    seq1 = _random_nucs(6_000, seed=4)
    seq2 = _random_nucs(6_000, seed=5)
    s1, s2 = set(_kmers_of(seq1, k)), set(_kmers_of(seq2, k))
    a, b = CBL(k=k), CBL(k=k)
    a.insert_seq(seq1)
    b.insert_seq(seq2)
    import operator

    pyop = {"or": operator.or_, "and": operator.and_, "sub": operator.sub, "xor": operator.xor}[op]
    res = pyop(a, b)
    expect = pyop(s1, s2)
    assert res.count() == len(expect)
    sample = list(s1 | s2)[:300]
    got = res.contains_kmers(sample)
    for v, g in zip(sample, got):
        assert bool(g) == (v in expect)
    # in-place variant
    iop = {"or": operator.ior, "and": operator.iand, "sub": operator.isub, "xor": operator.ixor}[op]
    a = iop(a, b)
    assert a.count() == len(expect)
    # operand b unchanged
    assert b.count() == len(s2)


def test_mode_mismatch_raises():
    a = CBL(k=25)
    b = CBL.new_canonical(k=25)
    with pytest.raises(ValueError):
        _ = a | b


def test_multi_merge_intersect():
    # `/root/reference/src/cbl.rs:865-914` with K=7 small config
    k, pb = 7, 13
    C = 6
    chunks = [_random_nucs(800 + k - 1, seed=10 + i) for i in range(C)]
    sets = []
    fams = []
    for ch in chunks:
        c = CBL(k=k, prefix_bits=pb)
        c.insert_seq(ch)
        sets.append(c)
        fams.append(set(_kmers_of(ch, k)))
    merged = CBL.merge(sets)
    assert merged.count() == len(set().union(*fams))
    for c in sets:
        for v in list(c)[:50]:
            assert merged.contains(v)
    inter = CBL.intersect(sets)
    assert inter.count() == len(set.intersection(*fams))


def test_contains_seq_order_and_contains_all():
    k = 25
    seq = _random_nucs(2_000, seed=6)
    kmers = _kmers_of(seq, k)
    s = CBL(k=k)
    s.insert_seq(seq)
    other = _random_nucs(2_000, seed=7)
    mask = s.contains_seq(other)
    expect = [kmer_to_int(encode_seq(other)[i : i + k]) in set(kmers) for i in range(len(mask))]
    assert mask.tolist() == expect
    assert s.contains_all(seq)
    assert not s.contains_all(other)


def test_chunk_boundary_consistency():
    # same set regardless of chunk size (reference CHUNK_SIZE invariance).
    # NB: chunk sizes below 4096 clamp to 4096 (`CBL._effective_chunk`), so
    # use 4096 vs 16384 on an input long enough to span several chunks.
    k = 25
    seq = _random_nucs(40_000, seed=8)
    a = CBL(k=k, chunk_size=4096)
    b = CBL(k=k, chunk_size=16384)
    a.insert_seq(seq)
    b.insert_seq(seq)
    assert a.count() == b.count()
    assert np.array_equal(a.wordset.words_array(), b.wordset.words_array())
    # the fused stream path must agree with the chunked insert_seq path
    c = CBL(k=k)
    codes = encode_seq(seq)
    c.insert_codes_stream(codes, np.array([0, len(codes)], dtype=np.int64))
    assert c.count() == a.count()
    assert np.array_equal(c.wordset.words_array(), a.wordset.words_array())


def test_multiple_records():
    k = 25
    r1 = _random_nucs(1_000, seed=9)
    r2 = _random_nucs(1_000, seed=10)
    s = CBL(k=k)
    s.insert_seqs([r1, r2])
    t = CBL(k=k)
    t.insert_seq(r1)
    t.insert_seq(r2)
    assert s.count() == t.count()
    # no k-mer spans the record boundary
    joined = set(_kmers_of(r1, k)) | set(_kmers_of(r2, k))
    assert s.count() == len(joined)


def test_insert_codes_stream_multi_slab(monkeypatch):
    # force several bulk slabs within one stream; result must equal one-shot
    from cbl_tpu.cbl import CBL as _CBL

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    offsets = np.array([0, 30_000, 60_000], dtype=np.int64)

    a = _CBL(k=25, chunk_size=4096)
    b = _CBL(k=25, chunk_size=4096)
    a.insert_codes_stream(codes, offsets)
    monkeypatch.setattr("cbl_tpu.cbl._FUSED_SLAB", 8192)
    b.insert_codes_stream(codes, offsets)  # several fused slab merges
    monkeypatch.undo()
    assert a.count() == b.count()
    ta, tb = a.query_codes_stream(codes, offsets), b.query_codes_stream(codes, offsets)
    assert ta == tb
    assert ta[0] == ta[1]


def test_remove_codes_stream_and_contains_seqs():
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, size=20_000, dtype=np.uint8)
    offsets = np.array([0, 10_000, 20_000], dtype=np.int64)
    idx = CBL(k=25, chunk_size=4096)
    idx.insert_codes_stream(codes, offsets)
    n0 = idx.count()
    # remove the first record's k-mers
    idx.remove_codes_stream(codes[:10_000], np.array([0, 10_000], dtype=np.int64))
    t, p = idx.query_codes_stream(codes, offsets)
    assert idx.count() < n0
    # second record still fully present (minus any k-mers shared with rec 1)
    seq2 = bytes(b"ACTG"[c] for c in codes[10_000:])
    masks = idx.contains_seqs([seq2])
    assert len(masks) == 1 and len(masks[0]) == 10_000 - 24


def test_packed_stream_reuse_and_cache():
    # one staged stream drives insert + query + remove; results must match
    # the unstaged path, with and without the words memo
    import os

    from cbl_tpu import PackedStream

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=50_000, dtype=np.uint8)
    offsets = np.array([0, 20_000, 50_000], dtype=np.int64)

    ref = CBL(k=25)
    ref.insert_codes_stream(codes, offsets)

    a = CBL(k=25)
    ps = a.pack_stream(codes, offsets)
    assert isinstance(ps, PackedStream)
    a.insert_codes_stream(ps)
    assert a.count() == ref.count()
    t, p = a.query_codes_stream(ps)
    assert (t, p) == (t, t)
    # lazy query returns device scalars
    td, pd = a.query_codes_stream(ps, lazy=True)
    assert (int(td), int(pd)) == (t, p)
    # remove via the same staged stream empties the index
    a.remove_codes_stream(ps)
    assert a.count() == 0

    # config mismatch is rejected
    b31 = CBL(k=31)
    try:
        b31.insert_codes_stream(ps)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    # cache disabled: same results
    os.environ["CBL_TPU_NO_WORDS_CACHE"] = "1"
    try:
        c = CBL(k=25)
        ps2 = c.pack_stream(codes, offsets)
        c.insert_codes_stream(ps2)
        t2, p2 = c.query_codes_stream(ps2)
        assert c.count() == ref.count() and (t2, p2) == (t, p)
        assert not ps2._words
    finally:
        os.environ.pop("CBL_TPU_NO_WORDS_CACHE", None)


def test_insert_after_remove_interleaved_streams():
    # interleaved stream ops must match a python-set oracle across fold
    # boundaries (log-append inserts + tombstone removes)
    rng = np.random.default_rng(22)
    k = 25
    codes = rng.integers(0, 4, size=30_000, dtype=np.uint8)
    segs = [codes[i * 10_000 : (i + 1) * 10_000] for i in range(3)]
    off = np.array([0, 10_000], dtype=np.int64)
    off_h = np.array([0, 5_000], dtype=np.int64)

    idx = CBL(k=k)
    oracle = set()
    for i, seg in enumerate(segs):
        idx.insert_codes_stream(seg, off)
        oracle |= {kmer_to_int(seg[j : j + k]) for j in range(len(seg) - k + 1)}
        half = seg[:5_000]
        idx.remove_codes_stream(half, off_h)
        oracle -= {kmer_to_int(half[j : j + k]) for j in range(len(half) - k + 1)}
        assert idx.count() == len(oracle), f"round {i}"


def test_contains_seqs_bulk_matches_per_seq():
    """contains_seqs (fused bulk path) must equal per-sequence word-path
    masks for mixed hit/miss multi-record batches, across both the
    small-stream and (forced) fused-slab dispatch."""
    import numpy as np

    from cbl_tpu import wordset as wmod
    from cbl_tpu.kmer import decode_codes

    rng = np.random.default_rng(42)
    base = decode_codes(rng.integers(0, 4, size=6_000, dtype=np.uint8))
    idx = CBL(k=25)
    idx.insert_seq(base)

    queries = [
        base[100:900],
        decode_codes(rng.integers(0, 4, size=700, dtype=np.uint8)),
        base[3_000:3_030],  # tiny record: 6 k-mers
        decode_codes(rng.integers(0, 4, size=40, dtype=np.uint8)),
    ]

    def oracle(seq):
        # per-k-mer membership via the point-word path
        from cbl_tpu.kmer import encode_seq

        codes = encode_seq(seq)
        valid = idx._stream_valid(codes, np.array([0, len(codes)]))
        masks, ns = [], []
        for words, _, n in idx._stream_words(codes, valid):
            masks.append(np.asarray(idx.wordset.contains_words(words)))
            ns.append(n)
        return np.concatenate([m[:n] for m, n in zip(masks, ns)])

    got = idx.contains_seqs(queries)
    for g, q in zip(got, queries):
        np.testing.assert_array_equal(g, oracle(q))
    assert got[0].all() and got[2].all()
    assert not got[1].any() and not got[3].any()

    # force the fused-slab sort-join dispatch with a tiny threshold
    orig = wmod._SORTJOIN_MIN_QUERIES
    try:
        import cbl_tpu.cbl  # noqa: F401  (threshold read at call time)
        wmod._SORTJOIN_MIN_QUERIES = 1
        got2 = idx.contains_seqs(queries)
        for g, g2 in zip(got, got2):
            np.testing.assert_array_equal(g, g2)
    finally:
        wmod._SORTJOIN_MIN_QUERIES = orig


def test_dynamic_round_fused_matches_unfused():
    """The fused interleaved round (one device program) must match the
    separate insert/query/remove calls exactly: per-round positives, final
    count, and final word set."""
    import numpy as np

    rng = np.random.default_rng(9)
    bases = 40_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    SEGS = 4
    sb = bases // SEGS
    off1 = np.array([0, sb], dtype=np.int64)
    off_h = np.array([0, sb // 2], dtype=np.int64)

    def run(fused: bool):
        idx = CBL(k=25)
        segs = [idx.pack_stream(codes[i * sb:(i + 1) * sb], off1)
                for i in range(SEGS)]
        halves = [idx.pack_stream(codes[i * sb:i * sb + sb // 2], off_h)
                  for i in range(SEGS)]
        pos = []
        for i in range(SEGS):
            q = segs[i - 1 if i else 0]
            if fused:
                t, p = idx.dynamic_round(segs[i], q, halves[i])
            else:
                idx.insert_codes_stream(segs[i])
                t, p = idx.query_codes_stream(q)
                idx.remove_codes_stream(halves[i])
            pos.append((t, p))
        return pos, idx.count(), np.asarray(idx.wordset.words_array())

    pos_u, n_u, words_u = run(False)
    pos_f, n_f, words_f = run(True)
    assert pos_f == pos_u
    assert n_f == n_u
    np.testing.assert_array_equal(words_f, words_u)
    # round 0 self-queries right after its own insert: all positive
    assert pos_f[0][1] == pos_f[0][0]
    # later rounds see removes: strictly fewer positives
    assert pos_f[1][1] < pos_f[1][0]


def test_dynamic_round_multislab_falls_back(monkeypatch):
    """Multi-slab streams take the unfused path and stay exact."""
    import numpy as np

    import cbl_tpu.cbl as cmod

    monkeypatch.setattr(cmod, "_FUSED_SLAB", 8192)
    rng = np.random.default_rng(10)
    codes = rng.integers(0, 4, size=30_000, dtype=np.uint8)
    off = np.array([0, len(codes)], dtype=np.int64)
    idx = CBL(k=25)
    ps = idx.pack_stream(codes, off)
    assert len(ps.slabs) > 1  # really exercises the fallback
    t, p = idx.dynamic_round(ps, ps, ps)
    assert t == len(codes) - 24
    assert p == t  # queried after insert
    assert idx.count() == 0  # everything removed


def test_dynamic_round_slog_mid_state_and_mixed_api():
    """Sorted-log specifics: mid-workload count() (scan, no fold), rounds
    entered on a PRE-POPULATED index (data side merged into the log), and
    mixed API calls after rounds (fold path) — all against a python-set
    oracle."""
    import numpy as np

    rng = np.random.default_rng(11)
    k = 25
    bases = 30_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    sb = bases // 3
    off1 = np.array([0, sb], dtype=np.int64)

    idx = CBL(k=k)
    # pre-populate via the static path -> slog entry sees non-empty data
    idx.insert_codes_stream(codes[:sb], off1)
    oracle = set(map(tuple, idx.wordset.words_array()))

    def words_of(c):
        i2 = CBL(k=k)
        i2.insert_codes_stream(c, np.array([0, len(c)], dtype=np.int64))
        return [tuple(w) for w in i2.wordset.words_array()]

    for r in range(2):
        lo = sb * (r + 1)
        seg = codes[lo : lo + sb]
        qry = codes[lo - sb // 2 : lo + sb // 2]
        rm = codes[lo - sb // 4 : lo + sb // 4]
        seg_w, qry_w, rm_w = words_of(seg), words_of(qry), words_of(rm)
        oracle |= set(seg_w)
        expect_pos = sum(1 for w in qry_w if w in oracle)
        t, p = idx.dynamic_round(
            (seg, np.array([0, len(seg)], dtype=np.int64)),
            (qry, np.array([0, len(qry)], dtype=np.int64)),
            (rm, np.array([0, len(rm)], dtype=np.int64)),
        )
        assert (t, p) == (len(qry_w), expect_pos)
        oracle -= set(rm_w)
        # mid-workload count scans the sorted log without folding it
        assert idx.wordset._slog is not None
        assert idx.count() == len(oracle)
        assert idx.wordset._slog is not None
    # mixed API: point-ish mutation after rounds appends to the pending
    # log on top of the slog; queries and the final fold stay exact
    import jax.numpy as jnp

    extra = words_of(codes[:k + 40])
    idx.wordset.insert_words(jnp.asarray(np.array(extra, dtype=np.uint32)))
    oracle |= set(extra)
    assert idx.count() == len(oracle)
    got = set(map(tuple, idx.wordset.words_array()))
    assert got == oracle


def test_dynamic_round_canonical_matches_unfused():
    """Sorted-log rounds under CANONICAL mode (rev-comp pipeline inside
    the fused program) must match the separate calls exactly, including a
    query stream that is the reverse complement of an inserted segment."""
    rng = np.random.default_rng(12)
    bases = 24_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    sb = bases // 2
    off1 = np.array([0, sb], dtype=np.int64)
    rc = (codes[:sb] ^ 2)[::-1].copy()  # reverse complement of segment 0

    def run(fused: bool):
        idx = CBL.new_canonical(k=25)
        rounds = [
            (codes[:sb], rc, codes[:sb // 2]),
            (codes[sb:], codes[:sb], rc[: sb // 2]),
        ]
        pos = []
        for seg, qry, rm in rounds:
            so = np.array([0, len(seg)], dtype=np.int64)
            qo = np.array([0, len(qry)], dtype=np.int64)
            ro = np.array([0, len(rm)], dtype=np.int64)
            if fused:
                t, p = idx.dynamic_round((seg, so), (qry, qo), (rm, ro))
            else:
                idx.insert_codes_stream(seg, so)
                t, p = idx.query_codes_stream(qry, qo)
                idx.remove_codes_stream(rm, ro)
            pos.append((t, p))
        return pos, idx.count(), np.asarray(idx.wordset.words_array())

    pos_u, n_u, words_u = run(False)
    pos_f, n_f, words_f = run(True)
    assert pos_f == pos_u and n_f == n_u
    np.testing.assert_array_equal(words_f, words_u)
    # the RC query of round 0 hits everything round 0 just inserted
    assert pos_f[0][1] == pos_f[0][0]


def test_dynamic_round_capacity_quantized_and_words_memoized():
    """Round 4 slog contract: the stored capacity comes from the 1/8-step
    quantized family (bounded compile variants, <=12.5% padding) and a
    stream re-used across rounds computes + sorts its words ONCE (the
    PackedStream memo) — querying what an earlier round inserted adds no
    pipeline or sort work."""
    from cbl_tpu.wordset import _quantize_cap

    rng = np.random.default_rng(21)
    bases = 48_000
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    SEGS = 6
    sb = bases // SEGS
    off1 = np.array([0, sb], dtype=np.int64)
    off_h = np.array([0, sb // 2], dtype=np.int64)
    idx = CBL(k=25)
    ws = idx.wordset
    segs = [idx.pack_stream(codes[i * sb:(i + 1) * sb], off1)
            for i in range(SEGS)]
    halves = [idx.pack_stream(codes[i * sb:i * sb + sb // 2], off_h)
              for i in range(SEGS)]
    expect_real = 0
    caps = []
    for i in range(SEGS):
        idx.dynamic_round(segs[i], segs[i - 1 if i else 0], halves[i])
        nk_i = segs[i].slabs[0][0]
        nk_r = halves[i].slabs[0][0]
        expect_real += 2 * nk_i + nk_r  # insert + query (same pad) + remove
        assert ws._slog_real == expect_real
        cap = ws._slog[0].shape[0]
        assert cap >= expect_real
        assert cap == _quantize_cap(expect_real) or cap in caps
        caps.append(cap)
        # the memo holds every touched stream's SORTED words
        assert segs[i]._words[0][2] is True
        assert halves[i]._words[0][2] is True
    # the stored log folds to the exact same set
    n = idx.count()
    ws.flush()
    assert ws._slog is None and idx.count() == n


def test_slog_autofold_bounds_memory():
    """Remove-heavy interleaved workloads must not grow the log without
    bound: maybe_autofold_slog folds once the real-row bound exceeds the
    policy multiple of the live-set bound, and results stay exact."""
    rng = np.random.default_rng(22)
    k = 25
    sb = 4_000
    codes = rng.integers(0, 4, size=sb, dtype=np.uint8)
    # large ABSENT remove stream: the log grows ~5x faster than the
    # insert bound, so the fold policy must engage
    miss = rng.integers(0, 4, size=4 * sb, dtype=np.uint8)
    off = np.array([0, sb], dtype=np.int64)
    off_m = np.array([0, 4 * sb], dtype=np.int64)
    idx = CBL(k=k)
    idx.dynamic_round((codes, off), (codes, off), (miss, off_m))
    n0 = idx.count()
    ws = idx.wordset
    assert ws._slog is not None
    folded = False
    for _ in range(12):
        seq_before = ws._slog_seq
        idx.dynamic_round((codes, off), (codes, off), (miss, off_m))
        if ws._slog_seq <= seq_before:
            folded = True  # auto-fold reset the log mid-workload
    assert folded, "auto-fold never triggered on a growing log"
    from cbl_tpu.wordset import _next_pow2

    per_round = sum(s[0] for s in (
        2 * idx.pack_stream(codes, off).slabs
        + idx.pack_stream(miss, off_m).slabs
    ))
    assert ws._slog_real <= ws._SLOG_FOLD_MULT * _next_pow2(
        max(ws._n_upper, 1)
    ) + per_round
    assert idx.count() == n0  # workload is idempotent on the set


def test_dynamic_rounds_then_serde_and_algebra():
    """After sorted-log rounds, checkpointing and set algebra must see the
    folded state exactly (fold happens implicitly via flush)."""
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, size=20_000, dtype=np.uint8)
    off = np.array([0, 10_000], dtype=np.int64)
    idx = CBL(k=25)
    idx.dynamic_round(
        (codes[:10_000], off), (codes[:10_000], off), (codes[:5_000], off // 2)
    )
    idx.dynamic_round(
        (codes[10_000:], off), (codes[:10_000], off), (codes[5_000:7_500],
                                                       np.array([0, 2_500])),
    )
    n = idx.count()
    assert idx.wordset._slog is not None  # count() did not fold
    idx.save_to_file("/tmp/slog_roundtrip.cblx.npz")
    back = CBL.load_from_file("/tmp/slog_roundtrip.cblx.npz")
    assert back.count() == n == idx.count()
    other = CBL(k=25)
    other.insert_codes_stream(codes[:10_000], off)
    u = idx | other
    inter = idx & other
    assert u.count() >= idx.count()
    assert inter.count() <= other.count()
    # oracle check via host sets
    got_u = {tuple(w) for w in u.wordset.words_array()}
    want_u = {tuple(w) for w in idx.wordset.words_array()} | {
        tuple(w) for w in other.wordset.words_array()
    }
    assert got_u == want_u


def test_dynamic_round_largek_unpacked_slog():
    """K=59 leaves only 3 spare bits, so its slog keeps the separate tag
    column (wordset.slog_packed False) — the unpacked path must stay
    exact through fused rounds, mid-count, and the fold."""
    from cbl_tpu.wordset import slog_packed

    rng = np.random.default_rng(41)
    k = 59
    sb = 4_000
    codes = rng.integers(0, 4, size=3 * sb, dtype=np.uint8)
    off = np.array([0, sb], dtype=np.int64)
    idx = CBL(k=k, prefix_bits=28)
    assert not slog_packed(idx.cfg)

    def run(fused):
        i2 = CBL(k=k, prefix_bits=28)
        out = []
        for r in range(3):
            seg = codes[r * sb:(r + 1) * sb]
            qry = codes[max(r - 1, 0) * sb:(max(r - 1, 0) + 1) * sb]
            rm = codes[r * sb + sb // 2:(r + 1) * sb + sb // 2] \
                if r < 2 else codes[:sb]
            if fused:
                out.append(i2.dynamic_round((seg, off), (qry, off),
                                            (rm, off)))
            else:
                i2.insert_codes_stream(seg, off)
                out.append(i2.query_codes_stream(qry, off))
                i2.remove_codes_stream(rm, off)
            out.append(i2.count())
        return out, sorted(map(tuple, i2.wordset.words_array().tolist()))

    got, words_f = run(True)
    want, words_u = run(False)
    assert got == want
    assert words_f == words_u


def test_dynamic_round_randomized_fuzz_vs_set_oracle():
    """Adversarial interleaving fuzz: 12 rounds of randomly-sized,
    randomly-overlapping insert/query/remove streams checked against a
    host python-set oracle round by round (positives, live count) and at
    the end (exact word set)."""
    rng = np.random.default_rng(99)
    k = 25
    pool = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    idx = CBL(k=k)
    oracle = set()

    def words_of(c):
        i2 = CBL(k=k)
        i2.insert_codes_stream(c, np.array([0, len(c)], dtype=np.int64))
        return [tuple(w) for w in i2.wordset.words_array()]

    for r in range(12):
        ni, nq, nr = (int(rng.integers(k + 5, 6_000)) for _ in range(3))
        si, sq, sr = (int(rng.integers(0, len(pool) - n))
                      for n in (ni, nq, nr))
        ins = pool[si:si + ni]
        qry = pool[sq:sq + nq]
        rm = pool[sr:sr + nr]
        wi, wq, wr = words_of(ins), words_of(qry), words_of(rm)
        oracle |= set(wi)
        expect_pos = sum(1 for w in wq if w in oracle)
        t, p = idx.dynamic_round(
            (ins, np.array([0, ni], dtype=np.int64)),
            (qry, np.array([0, nq], dtype=np.int64)),
            (rm, np.array([0, nr], dtype=np.int64)),
        )
        assert (t, p) == (len(wq), expect_pos), r
        oracle -= set(wr)
        assert idx.count() == len(oracle), r
    got = set(map(tuple, idx.wordset.words_array()))
    assert got == oracle


def test_packed_slog_seq_cap_forces_fold():
    """The packed 8-bit tag caps round_seq at 62: a 70-round workload must
    fold transparently at the cap and stay exact."""
    from cbl_tpu.wordset import _SLOG_SEQ_MAX

    rng = np.random.default_rng(100)
    k = 25
    sb = 200
    codes = rng.integers(0, 4, size=sb * 4, dtype=np.uint8)
    off = np.array([0, sb], dtype=np.int64)
    idx = CBL(k=k)
    ws = idx.wordset
    seqs = []
    for r in range(70):
        s0 = (r * 37) % (3 * sb)
        idx.dynamic_round(
            (codes[s0:s0 + sb], off), (codes[:sb], off),
            (codes[s0 // 2:s0 // 2 + sb], off),
        )
        seqs.append(ws._slog_seq)
        assert ws._slog_seq <= _SLOG_SEQ_MAX
    assert max(seqs) == _SLOG_SEQ_MAX  # the cap was actually reached
    assert min(seqs[_SLOG_SEQ_MAX:]) < _SLOG_SEQ_MAX  # fold reset it
    # exactness after the cap-fold: rebuild the same workload unfused
    other = CBL(k=k)
    for r in range(70):
        s0 = (r * 37) % (3 * sb)
        other.insert_codes_stream(codes[s0:s0 + sb], off)
        other.remove_codes_stream(codes[s0 // 2:s0 // 2 + sb], off)
    assert idx.count() == other.count()
    np.testing.assert_array_equal(
        idx.wordset.words_array(), other.wordset.words_array()
    )


def test_packed_slog_remove_at_max_seq_sticks():
    """A remove issued in a round running at exactly seq == _SLOG_SEQ_MAX
    must not pack its tag to the 0xFF sentinel: the removed word (never
    re-inserted) stays absent.  Regression for the cap off-by-one (at
    cap=63 the tag (63<<2)|3 == 0xFF collided with the sentinel and the
    remove was silently dropped)."""
    from cbl_tpu.wordset import _SLOG_SEQ_MAX, slog_packed

    rng = np.random.default_rng(321)
    k = 25
    idx = CBL(k=k)
    assert slog_packed(idx.cfg)
    ws = idx.wordset
    target = rng.integers(0, 4, size=k, dtype=np.uint8)
    off1 = np.array([0, k], dtype=np.int64)
    pool = rng.integers(0, 4, size=20_000, dtype=np.uint8)
    sb = 100
    off = np.array([0, sb], dtype=np.int64)
    idx.insert_codes_stream(target, off1)
    assert idx.count() == 1
    removed = False
    for r in range(3 * _SLOG_SEQ_MAX):
        at_max = ws._slog_seq == _SLOG_SEQ_MAX - 1
        s0 = (r * 53) % 15_000
        rm = (target, off1) if at_max else (pool[s0 + sb:s0 + 2 * sb], off)
        idx.dynamic_round(
            (pool[s0:s0 + sb], off), (pool[s0:s0 + sb], off), rm
        )
        if at_max:
            assert ws._slog_seq == _SLOG_SEQ_MAX  # ran at the cap itself
            removed = True
            break
    assert removed
    # later rounds observe the absence (and never re-insert the target)
    for r in range(3):
        s0 = ((r + 7) * 97) % 15_000
        t, p = idx.dynamic_round(
            (pool[s0:s0 + sb], off), (target, off1),
            (pool[s0 + sb:s0 + 2 * sb], off),
        )
        assert (t, p) == (1, 0), r
    ref = CBL(k=k)
    ref.insert_codes_stream(target, off1)
    tw = tuple(ref.wordset.words_array()[0])
    assert tw not in set(map(tuple, idx.wordset.words_array()))


def test_dynamic_round_single_limb_packed_slog():
    """K=7/PREFIX_BITS=13 packs into ONE limb (18 word bits + 8 tag
    bits): the packed slog's tag masking must apply to limb 0 itself —
    round-3 of this bug split word runs by tag and broke liveness."""
    from cbl_tpu.wordset import slog_packed

    rng = np.random.default_rng(55)
    k = 7
    sb = 600
    codes = rng.integers(0, 4, size=3 * sb, dtype=np.uint8)
    off = np.array([0, sb], dtype=np.int64)
    idx = CBL(k=k, prefix_bits=13)
    assert idx.cfg.word_limbs == 1 and slog_packed(idx.cfg)

    def run(fused):
        i2 = CBL(k=k, prefix_bits=13)
        out = []
        for r in range(3):
            seg = codes[r * sb:(r + 1) * sb]
            qry = codes[max(r - 1, 0) * sb:(max(r - 1, 0) + 1) * sb]
            rm = codes[r * sb // 2:r * sb // 2 + sb]
            if fused:
                out.append(i2.dynamic_round((seg, off), (qry, off),
                                            (rm, off)))
            else:
                i2.insert_codes_stream(seg, off)
                out.append(i2.query_codes_stream(qry, off))
                i2.remove_codes_stream(rm, off)
            out.append(i2.count())
        return out, sorted(map(tuple, i2.wordset.words_array().tolist()))

    got, wf = run(True)
    want, wu = run(False)
    assert got == want
    assert wf == wu


def test_single_limb_mixed_api_fuzz_vs_set_oracle():
    """K=7/PREFIX_BITS=13 (1-limb words) mixed-API fuzz: stream inserts/
    removes/queries, point contains, count, and binary algebra against a
    python-set oracle — the L=1 family broke two packed-sentinel kernels
    this round; this sweeps the remaining one-limb paths."""
    rng = np.random.default_rng(321)
    k, pb = 7, 13
    pool = rng.integers(0, 4, size=8_000, dtype=np.uint8)
    idx = CBL(k=k, prefix_bits=pb)
    oracle = set()
    kmer_oracle = set()

    def words_of(c):
        i2 = CBL(k=k, prefix_bits=pb)
        i2.insert_codes_stream(c, np.array([0, len(c)], dtype=np.int64))
        return [tuple(w) for w in i2.wordset.words_array()]

    for r in range(10):
        n = int(rng.integers(k + 3, 900))
        s0 = int(rng.integers(0, len(pool) - n))
        chunk = pool[s0:s0 + n]
        cw = words_of(chunk)
        off = np.array([0, n], dtype=np.int64)
        op = r % 3
        if op == 0:
            idx.insert_codes_stream(chunk, off)
            oracle |= set(cw)
            kmer_oracle |= set(_kmers_of(decode_codes(chunk), k))
        elif op == 1:
            idx.remove_codes_stream(chunk, off)
            oracle -= set(cw)
            kmer_oracle -= set(_kmers_of(decode_codes(chunk), k))
        else:
            # per-OCCURRENCE expectation via kmer ints (kmer<->word is a
            # bijection, so kmer membership equals word membership)
            km = _kmers_of(decode_codes(chunk), k)
            t, p = idx.query_codes_stream(chunk, off)
            assert t == len(km)
            assert p == sum(1 for v in km if v in kmer_oracle), r
        assert idx.count() == len(oracle), r
    got = set(map(tuple, idx.wordset.words_array()))
    assert got == oracle
    # point membership on a mix of present/absent words
    some = list(oracle)[:50] + [(int(w[0]) ^ 1,) for w in list(oracle)[:50]]
    mask = np.asarray(idx.wordset.contains_words(
        np.array(some, dtype=np.uint32)))
    for w, m in zip(some, mask):
        assert bool(m) == (tuple(w) in oracle)
    # binary algebra against a second fuzzed index
    other = CBL(k=k, prefix_bits=pb)
    other.insert_codes_stream(pool[:2_000], np.array([0, 2_000]))
    so = set(map(tuple, other.wordset.words_array()))
    import operator

    for pyop, cop in ((operator.or_, idx | other), (operator.and_, idx & other),
                      (operator.sub, idx - other), (operator.xor, idx ^ other)):
        assert set(map(tuple, cop.wordset.words_array())) == pyop(oracle, so)
