"""CBL — the public TPU-native k-mer set API.

Parity target: `/root/reference/src/cbl.rs` (struct `CBL<K, T, PREFIX_BITS>`,
`:41-54`).  Semantics preserved exactly:

- k-mer -> (canonical form if canonical mode) -> necklace + rotation pos ->
  packed word -> set membership (`src/cbl.rs:199-206`).
- sequences: every k-mer of the ACGT-filtered sequence (invalid bytes are
  skipped as in `src/kmer.rs:131-135`); k-mers never span record boundaries.
- canonical mode: K odd, canonical = even popcount (`src/kmer.rs:93-97`).

Pipeline design (TPU-first, replaces `src/cbl.rs:239-289`): the base stream
is packed 16 bases/uint32, chunked into fixed-size windows with K-1 overlap
(the reference's own halo pattern, CHUNK_SIZE=2048 at `src/cbl.rs:67`; ours is
larger to fill the VPU), and each chunk runs one jitted program:
extract -> canonicalize -> necklace -> pack -> (query | queue for merge).

Divergences (documented, CLI-observable behavior preserved):
- `contains_seq` returns results in *sequence order* in canonical mode; the
  reference emits forward-canonical results before reverse-complement ones
  within each 2048-chunk (`src/cbl.rs:249-274`) — its own CLI only counts
  positives (`examples/cbl.rs:214-223`), which is order-insensitive.
- iteration is in ascending packed-word order (prefix-major, sorted
  suffixes); reference vec-buckets iterate in insertion order
  (`src/wordset/mod.rs:349-361`) and its tests sort before comparing
  (`src/cbl.rs:763-773`).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import kmer as kmod
from . import limbs, necklace
from .config import CBLConfig, get_config
from .wordset import DeviceWordSet

DEFAULT_CHUNK = 1 << 19  # k-mers per device program
_U32_MAX = np.uint32(0xFFFFFFFF)


def _stream_len(chunk: int, k: int) -> int:
    """Padded base-stream length per chunk (multiple of 16)."""
    raw = chunk + k - 1
    return (raw + 15) // 16 * 16


def _use_pallas() -> str:
    """Necklace kernel selector: "" = XLA chain, "1" = pallas v1 ([L, B]
    blocks), "2" = pallas v2 (full-tile per-limb layout)."""
    import os

    return os.environ.get("CBL_TPU_PALLAS", "")


@lru_cache(maxsize=None)
def _pipeline_fn(cfg: CBLConfig, canonical: bool, chunk: int, pallas: str = ""):
    """stream [S/16] uint32 (16 packed bases/word), validbits [chunk/8] uint8
    (np.packbits) -> words [chunk, L] (invalid rows = sentinel).  One fused
    XLA program per (config, mode, chunk); inputs are bit-packed host-side to
    minimise host->device transfer."""

    def run(stream, validbits):
        kmers = kmod.extract_kmers(stream, chunk, cfg)
        if canonical:
            kmers, _ = kmod.canonicalize(kmers, cfg)
        if pallas == "2":
            from .ops.necklace_pallas import necklace_pos_pallas2

            best, pos = necklace_pos_pallas2(kmers, cfg)
        elif pallas == "1":
            from .ops.necklace_pallas import necklace_pos_pallas

            best, pos = necklace_pos_pallas(kmers, cfg)
        else:
            best, pos = necklace.necklace_pos(kmers, cfg)
        words = necklace.pack_word(best, pos, cfg)
        valid = (
            (validbits[:, None] >> jnp.arange(7, -1, -1, dtype=jnp.uint8))
            & jnp.uint8(1)
        ).astype(bool).reshape(-1)
        return jnp.where(valid[:, None], words, _U32_MAX)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _kmer_word_fn(cfg: CBLConfig, canonical: bool):
    """[N, L] k-mer limbs -> [N, L] packed words (point-op path,
    `src/cbl.rs:199-206`)."""

    def run(kmers):
        if canonical:
            kmers, _ = kmod.canonicalize(kmers, cfg)
        best, pos = necklace.necklace_pos(kmers, cfg)
        return necklace.pack_word(best, pos, cfg)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _decode_fn(cfg: CBLConfig):
    """[N, L] packed words -> ([N, L] k-mer limbs, [N, K] base codes)."""

    def run(words):
        km = necklace.word_to_kmer(words, cfg)
        return km, kmod.unpack_bases(km, cfg)

    return jax.jit(run)


class CBL:
    """A fully dynamic, exact set of k-mers (TPU-native CBL).

    Parameters mirror the reference's const generics: `k` (odd, <= 59) and
    `prefix_bits` (`/root/reference/src/cbl.rs:34-46`).
    """

    def __init__(
        self,
        k: int = 25,
        prefix_bits: int = 24,
        canonical: bool = False,
        chunk_size: int = DEFAULT_CHUNK,
        pending_cap: int | None = None,
    ):
        self.cfg = get_config(k=k, prefix_bits=prefix_bits)
        self.canonical = canonical
        self.chunk = chunk_size
        kwargs = {} if pending_cap is None else {"pending_cap": pending_cap}
        self.wordset = DeviceWordSet(self.cfg, **kwargs)

    # --- constructors (`src/cbl.rs:71-79`) ---

    @classmethod
    def new(cls, k: int = 25, prefix_bits: int = 24, **kw) -> "CBL":
        return cls(k=k, prefix_bits=prefix_bits, canonical=False, **kw)

    @classmethod
    def new_canonical(cls, k: int = 25, prefix_bits: int = 24, **kw) -> "CBL":
        return cls(k=k, prefix_bits=prefix_bits, canonical=True, **kw)

    def _like(self) -> "CBL":
        return CBL(
            k=self.cfg.k,
            prefix_bits=self.cfg.prefix_bits,
            canonical=self.canonical,
            chunk_size=self.chunk,
        )

    # --- basic queries (`src/cbl.rs:164-177`) ---

    def is_canonical(self) -> bool:
        return self.canonical

    def count(self) -> int:
        return self.wordset.count()

    def is_empty(self) -> bool:
        return self.wordset.is_empty()

    def __len__(self) -> int:
        return self.count()

    # --- sequence pipeline ---

    def _codes_of(self, seq) -> np.ndarray:
        if isinstance(seq, np.ndarray) and seq.dtype == np.uint8:
            return seq
        return kmod.encode_seq(seq)

    def _effective_chunk(self, total_kmers: int) -> int:
        """Scale the chunk to the workload: small inputs compile/run small
        programs, large streams use the full configured chunk (power-of-two
        tiers keep the jit cache bounded)."""
        if total_kmers <= 0:
            return min(self.chunk, 4096)
        tier = 1 << max(total_kmers - 1, 1).bit_length()
        eff = max(min(self.chunk, tier), 4096)
        # chunk windows must fall on 16-base packed-word boundaries
        return (eff + 15) // 16 * 16

    def _stream_chunks(self, codes: np.ndarray, valid: np.ndarray, chunk: int):
        """Yield (stream [S/16] u32, validbits [chunk/8] u8, valid [chunk],
        n_kmers) windows; both device inputs are bit-packed host-side.

        The whole code/valid stream is packed ONCE (vectorized) and chunk
        windows are word-aligned slices of it — chunk sizes are powers of two
        >= 4096, so every chunk boundary falls on a 16-base word boundary and
        an 8-k-mer byte boundary.  Per-chunk host cost drops from
        alloc+copy+pack to two slice views."""
        k = self.cfg.k
        S = _stream_len(chunk, k)
        total = len(valid)
        if total <= 0:
            return
        n_chunks = (total + chunk - 1) // chunk
        cbuf = np.zeros((n_chunks - 1) * chunk + S, dtype=np.uint8)
        cbuf[: len(codes)] = codes[: len(cbuf)]
        packed = kmod.np_pack_stream(cbuf)
        vfull = np.zeros(n_chunks * chunk, dtype=bool)
        vfull[:total] = valid
        vbits_all = np.packbits(vfull)
        nw = S // 16
        for i in range(n_chunks):
            start = i * chunk
            n = min(chunk, total - start)
            yield (
                packed[start // 16 : start // 16 + nw],
                vbits_all[start // 8 : start // 8 + chunk // 8],
                vfull[start : start + chunk],
                n,
            )

    def _stream_valid(self, codes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Valid-start mask for a concatenated record stream: a k-mer is
        valid iff it lies entirely inside one record (the reference forms
        k-mers per record; k-mers never span records)."""
        k = self.cfg.k
        nk = max(len(codes) - k + 1, 0)
        if nk == 0:
            return np.zeros(0, dtype=bool)
        # vectorized interval blanking (inputs can have millions of records):
        # each interior boundary b blanks starts [b-k+1, b); accumulate the
        # intervals as +1/-1 deltas and mark covered positions by prefix sum
        b = np.asarray(offsets[1:-1], dtype=np.int64)
        starts = np.clip(b - k + 1, 0, nk)
        ends = np.clip(b, 0, nk)
        # short trailing record: no k-mer may start inside it
        if len(offsets) >= 2 and offsets[-1] - offsets[-2] < k:
            starts = np.append(starts, max(offsets[-2] - k + 1, 0))
            ends = np.append(ends, nk)
        delta = np.zeros(nk + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
        return np.cumsum(delta[:nk]) == 0

    def _stream_words(self, codes: np.ndarray, valid: np.ndarray):
        chunk = self._effective_chunk(len(valid))
        fn = _pipeline_fn(self.cfg, self.canonical, chunk, _use_pallas())
        for stream, vbits, vbuf, n in self._stream_chunks(codes, valid, chunk):
            yield fn(stream, vbits), vbuf, n

    def _seqs_words(self, seqs):
        """Concatenate sequences into one base stream; yield per-chunk word
        arrays.  K-mers never span sequence boundaries."""
        k = self.cfg.k
        parts = []
        for s in seqs:
            c = self._codes_of(s)
            if len(c) >= k:
                parts.append(c)
        if not parts:
            return
        codes = np.concatenate(parts)
        offsets = np.cumsum([0] + [len(c) for c in parts], dtype=np.int64)
        yield from self._stream_words(codes, self._stream_valid(codes, offsets))

    # --- streaming fast path (feeds straight from io.parse_fastx) ---

    # ~16M rows/slab: one bulk merge per slab keeps peak HBM bounded while
    # the per-row merge cost stays ~2 sorts of the slab + live index.
    _BULK_SLAB_ROWS = 1 << 24

    def insert_codes_stream(self, codes: np.ndarray, offsets: np.ndarray) -> None:
        """Insert every k-mer of a concatenated code stream with record
        `offsets` ([n_records+1]).  This is the CLI/bench hot path: chunk
        word batches are accumulated and folded into the index with ONE
        concat+sort+dedup merge per slab (not per pending-buffer flush)."""
        valid = self._stream_valid(codes, offsets)
        if len(valid) == 0:
            return
        batches: list = []
        n_rows = 0
        for words, _, _ in self._stream_words(codes, valid):
            batches.append(words)
            n_rows += words.shape[0]
            if n_rows >= self._BULK_SLAB_ROWS:
                self.wordset.insert_rows_bulk(batches)
                batches, n_rows = [], 0
        self.wordset.insert_rows_bulk(batches)

    def remove_codes_stream(self, codes: np.ndarray, offsets: np.ndarray) -> None:
        valid = self._stream_valid(codes, offsets)
        if len(valid) == 0:
            return
        batches = [w for w, _, _ in self._stream_words(codes, valid)]
        if batches:
            self.wordset.remove_words(jnp.concatenate(batches, axis=0))

    def query_codes_stream(self, codes: np.ndarray, offsets: np.ndarray):
        """(total_kmers, positive_kmers) over a record stream — the CLI
        `query` counters (`/root/reference/examples/cbl.rs:212-228`).

        Positives are accumulated on device; only one scalar comes back per
        stream (invalid lanes are sentinel words, which can never match)."""
        valid = self._stream_valid(codes, offsets)
        total = int(valid.sum())
        self.wordset.flush()
        # batch the whole stream's words into one sort-join count per slab:
        # each slab pays one sort of (live index + slab), so the slab should
        # be at least as large as the index (bounded for memory)
        from .wordset import _next_pow2

        slab_rows = min(
            max(1 << 23, _next_pow2(max(self.wordset._n_upper, 1))), 1 << 26
        )
        positive = 0
        pending: list = []
        n_pend = 0
        for words, _, _ in self._stream_words(codes, valid):
            pending.append(words)
            n_pend += words.shape[0]
            if n_pend >= slab_rows:
                positive += self.wordset.count_hits(jnp.concatenate(pending))
                pending, n_pend = [], 0
        if pending:
            positive += self.wordset.count_hits(jnp.concatenate(pending))
        return total, positive

    def _check_len(self, seq) -> None:
        # `src/cbl.rs:293-298`: assert seq.len() >= K
        if len(seq) < self.cfg.k:
            raise ValueError(
                f"Sequence size ({len(seq)}) is smaller than K ({self.cfg.k})"
            )

    # --- sequence ops (`src/cbl.rs:293-354`) ---

    def insert_seq(self, seq) -> None:
        self._check_len(seq)
        self.insert_seqs([seq])

    def insert_seqs(self, seqs) -> None:
        for words, _, _ in self._seqs_words(seqs):
            self.wordset.insert_words(words)

    def remove_seq(self, seq) -> None:
        self._check_len(seq)
        self.remove_seqs([seq])

    def remove_seqs(self, seqs) -> None:
        batches = [w for w, _, _ in self._seqs_words(seqs)]
        if batches:
            self.wordset.remove_words(jnp.concatenate(batches, axis=0))

    def contains_seq(self, seq) -> np.ndarray:
        """Per-k-mer membership, in sequence order (see module docstring)."""
        self._check_len(seq)
        self.wordset.flush()
        masks, ns = [], []
        for words, vbuf, n in self._seqs_words([seq]):
            masks.append(self.wordset.contains_words(words))
            ns.append(n)
        if not masks:
            return np.zeros(0, dtype=bool)
        masks = jax.device_get(masks)  # one transfer for the whole stream
        return np.concatenate([m[:n] for m, n in zip(masks, ns)])

    def contains_seqs(self, seqs) -> list[np.ndarray]:
        res = []
        for s in seqs:
            self._check_len(s)
            res.append(self.contains_seq(s))
        return res

    def contains_all(self, seq) -> bool:
        """True iff every k-mer of `seq` is present
        (`/root/reference/src/cbl.rs:291-307`)."""
        self._check_len(seq)
        codes = self._codes_of(seq)
        if len(codes) < self.cfg.k:
            return True
        offsets = np.array([0, len(codes)], dtype=np.int64)
        total, positive = self.query_codes_stream(codes, offsets)
        return positive == total

    def __contains__(self, kmer_int: int) -> bool:
        return self.contains(kmer_int)

    # --- point ops (`src/cbl.rs:219-235`); k-mers given as packed ints ---

    def _word_rows_of_kmers(self, kmers_int) -> jax.Array:
        rows = limbs.from_py_ints([int(v) for v in kmers_int], self.cfg.kmer_limbs)
        return _kmer_word_fn(self.cfg, self.canonical)(jnp.asarray(rows))

    def contains(self, kmer_int: int) -> bool:
        return bool(np.asarray(self.contains_kmers([kmer_int]))[0])

    def insert(self, kmer_int: int) -> bool:
        """Returns True if the k-mer was absent (reference contract)."""
        words = self._word_rows_of_kmers([kmer_int])
        absent = not bool(np.asarray(self.wordset.contains_words(words))[0])
        self.wordset.insert_words(words)
        return absent

    def remove(self, kmer_int: int) -> bool:
        """Returns True if the k-mer was present (reference contract)."""
        words = self._word_rows_of_kmers([kmer_int])
        present = bool(np.asarray(self.wordset.contains_words(words))[0])
        self.wordset.remove_words(words)
        return present

    def contains_kmers(self, kmers_int) -> np.ndarray:
        words = self._word_rows_of_kmers(kmers_int)
        return np.asarray(self.wordset.contains_words(words))

    def insert_kmers(self, kmers_int) -> None:
        self.wordset.insert_words(self._word_rows_of_kmers(kmers_int))

    def remove_kmers(self, kmers_int) -> None:
        self.wordset.remove_words(self._word_rows_of_kmers(kmers_int))

    # --- iteration (`src/cbl.rs:358-360`) ---

    def kmers_limbs(self) -> np.ndarray:
        """[n, L] k-mer limb rows, ascending packed-word order."""
        words = self.wordset.words_array()
        if words.shape[0] == 0:
            return words
        out = []
        fn = _decode_fn(self.cfg)
        for start in range(0, words.shape[0], self.chunk):
            km, _ = fn(jnp.asarray(words[start : start + self.chunk]))
            out.append(np.asarray(km))
        return np.concatenate(out)

    def __iter__(self):
        for row in self.kmers_limbs():
            yield limbs.to_py_ints(row[None, :])[0]

    def iter_nucs(self):
        """Yield k-mers as ASCII bytes (CLI `list`)."""
        words = self.wordset.words_array()
        fn = _decode_fn(self.cfg)
        for start in range(0, words.shape[0], self.chunk):
            _, codes = fn(jnp.asarray(words[start : start + self.chunk]))
            codes = np.asarray(codes)
            lut = kmod.BASE_LOOKUP
            for row in codes:
                yield lut[row].tobytes()

    # --- set algebra (`src/cbl.rs:411-569`) ---

    def _check_mode(self, other: "CBL") -> None:
        if self.canonical != other.canonical:
            raise ValueError("One of the index is canonical while the other isn't")
        if self.cfg != other.cfg:
            raise ValueError("Mismatched CBL configurations")

    def __or__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        out = self._like()
        out.wordset = self.wordset.union(other.wordset)
        return out

    def __ior__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        self.wordset = self.wordset.union(other.wordset)
        return self

    def __and__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        out = self._like()
        out.wordset = self.wordset.intersection(other.wordset)
        return out

    def __iand__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        self.wordset = self.wordset.intersection(other.wordset)
        return self

    def __sub__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        out = self._like()
        out.wordset = self.wordset.difference(other.wordset)
        return out

    def __isub__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        self.wordset = self.wordset.difference(other.wordset)
        return self

    def __xor__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        out = self._like()
        out.wordset = self.wordset.symmetric_difference(other.wordset)
        return out

    def __ixor__(self, other: "CBL") -> "CBL":
        self._check_mode(other)
        self.wordset = self.wordset.symmetric_difference(other.wordset)
        return self

    @classmethod
    def merge(cls, cbls: list["CBL"]) -> "CBL":
        """k-way union (`src/cbl.rs:106-114`)."""
        assert cbls
        for c in cbls[1:]:
            cbls[0]._check_mode(c)
        out = cbls[0]._like()
        out.wordset = DeviceWordSet.merge_many([c.wordset for c in cbls])
        return out

    @classmethod
    def intersect(cls, cbls: list["CBL"]) -> "CBL":
        """k-way intersection (`src/cbl.rs:116-124`)."""
        assert cbls
        for c in cbls[1:]:
            cbls[0]._check_mode(c)
        out = cbls[0]._like()
        out.wordset = DeviceWordSet.intersect_many([c.wordset for c in cbls])
        return out

    # --- persistence (`src/cbl.rs:127-160`) ---

    def save_to_file(self, path) -> None:
        from . import serialize

        serialize.save(self, path)

    @classmethod
    def load_from_file(cls, path) -> "CBL":
        from . import serialize

        return serialize.load(path)

    # --- repartition stats (`src/cbl.rs:364-396`) ---

    def prefix_load(self) -> float:
        from . import stats

        return stats.prefix_load(self)

    def buckets_sizes(self):
        from . import stats

        return stats.buckets_sizes(self)

    def buckets_size_count(self):
        from . import stats

        return stats.buckets_size_count(self)

    def buckets_load_repartition(self):
        from . import stats

        return stats.buckets_load_repartition(self)

    def buckets_nodes(self):
        from . import stats

        return stats.buckets_nodes(self)

    def buckets_node_count(self):
        from . import stats

        return stats.buckets_node_count(self)
