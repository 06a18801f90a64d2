"""Reference index-file interop (.cbl bincode format).

The reference serialises `CBL` with bincode `DefaultOptions` + varint
encoding (`/root/reference/src/cbl.rs:127-160`): a bool `canonical` flag
followed by the WordSet as a map of `prefix: u32 -> TrieVec` in ascending
prefix order (`src/wordset/mod.rs:382-437`).  Bucket payloads are either a
Vec of little-endian SlicedInt byte strings (`src/sliced_int.rs:110-134`) or
a serialized 256-ary trie (`src/trie.rs:8,53-57`,
`src/bitvector/tiny/mod.rs:97-129`).  The format has **no K/PREFIX_BITS
header** — the caller must supply the compile-time constants the file was
built with (mismatches are undefined behavior in the reference; we check
suffix widths where possible).

- `load_reference(path, k, prefix_bits)` reads a reference-written index.
- `save_reference(cbl, path)` writes a file the reference binary can load:
  buckets of <= 1024 suffixes in Vec form, larger buckets in Trie form —
  matching the container the reference itself would hold at that size
  (THRESHOLD=1024, `/root/reference/src/wordset/mod.rs:34`), so the bytes
  are structurally faithful, not merely loadable.

bincode varint scheme (unsigned): < 251 one byte; 0xFB + u16 LE;
0xFC + u32 LE; 0xFD + u64 LE.
"""

from __future__ import annotations

import io

import numpy as np

from . import limbs
from .config import get_config


# --- varint primitives ---


def _write_varint(buf: io.BytesIO, v: int) -> None:
    if v < 251:
        buf.write(bytes([v]))
    elif v <= 0xFFFF:
        buf.write(b"\xfb" + v.to_bytes(2, "little"))
    elif v <= 0xFFFFFFFF:
        buf.write(b"\xfc" + v.to_bytes(4, "little"))
    else:
        buf.write(b"\xfd" + v.to_bytes(8, "little"))


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated reference index file")
        self.pos += n
        return b

    def varint(self) -> int:
        tag = self.take(1)[0]
        if tag < 251:
            return tag
        size = {0xFB: 2, 0xFC: 4, 0xFD: 8, 0xFE: 16}[tag]
        return int.from_bytes(self.take(size), "little")

    def eof(self) -> bool:
        return self.pos == len(self.data)


# --- trie bucket decode (variant 1) ---


def _read_trie_node(r: _Reader, depth: int, nbytes: int, prefix_bytes: tuple,
                    out: list) -> None:
    """TrieNode { bv: TinyBitvector (seq of set indices), children: Vec<Trie> }
    (`src/trie.rs:53-57`); big-endian byte path = sorted order."""
    count = r.varint()
    indices = [r.varint() for _ in range(count)]
    n_children = r.varint()
    if depth == nbytes - 1:
        if n_children:
            raise ValueError("reference trie: leaf with children")
        for idx in indices:
            out.append(prefix_bytes + (idx,))
        return
    if n_children != len(indices):
        raise ValueError("reference trie: children/bitvector mismatch")
    for idx in indices:
        _read_trie_node(r, depth + 1, nbytes, prefix_bytes + (idx,), out)


# --- public API ---


def load_reference(path, k: int, prefix_bits: int = 24):
    """Read a reference-binary index file into a CBL (k/prefix_bits must be
    the constants the file was built with)."""
    from .cbl import CBL

    cfg = get_config(k=k, prefix_bits=prefix_bits)
    nbytes = (cfg.suffix_bits + 7) // 8
    with open(path, "rb") as f:
        r = _Reader(f.read())

    canonical = bool(r.take(1)[0])
    n_buckets = r.varint()
    prefixes: list[int] = []
    suffixes: list[int] = []
    last_prefix = -1
    for _ in range(n_buckets):
        prefix = r.varint()
        if prefix <= last_prefix:
            raise ValueError("reference index: prefixes not ascending")
        last_prefix = prefix
        variant = r.varint()
        if variant == 0:  # Vec(Vec<SlicedInt>)
            n = r.varint()
            for _ in range(n):
                blen = r.varint()
                if blen != nbytes:
                    raise ValueError(
                        f"suffix width {blen}B != expected {nbytes}B — "
                        f"wrong K/PREFIX_BITS for this file?"
                    )
                raw = r.take(blen)  # little-endian value
                prefixes.append(prefix)
                suffixes.append(int.from_bytes(raw, "little"))
        elif variant == 1:  # Trie(Trie, usize)
            paths: list[tuple] = []
            _read_trie_node(r, 0, nbytes, (), paths)
            stored = r.varint()  # element count (`src/trievec/mod.rs:8-12`)
            if stored != len(paths):
                raise ValueError(
                    f"reference trie bucket {prefix}: stored element count "
                    f"{stored} != {len(paths)} decoded leaves — corrupted "
                    "or truncated index file"
                )
            for p in paths:  # big-endian byte path -> value
                prefixes.append(prefix)
                suffixes.append(int.from_bytes(bytes(p), "big"))
        else:
            raise ValueError(f"reference index: unknown bucket variant {variant}")
    if not r.eof():
        raise ValueError("reference index: trailing bytes")

    cbl = CBL(k=k, prefix_bits=prefix_bits, canonical=canonical)
    if prefixes:
        words = [
            (p << cfg.suffix_bits) | s for p, s in zip(prefixes, suffixes)
        ]
        rows = limbs.from_py_ints(words, cfg.word_limbs)
        cbl.wordset.insert_words(rows)
        cbl.wordset.flush()
    return cbl


TRIE_THRESHOLD = 1024  # `/root/reference/src/wordset/mod.rs:34`


def _write_trie_node(buf: io.BytesIO, rows: np.ndarray, depth: int,
                     nbytes: int) -> None:
    """Serialize one TrieNode { bv: TinyBitvector (seq of set byte values),
    children: Vec<Trie> } (`/root/reference/src/trie.rs:53-57`,
    `src/bitvector/tiny/mod.rs:97-110`).  `rows` are the big-endian suffix
    byte rows of this subtree, sorted, sharing bytes [0, depth)."""
    vals, starts = np.unique(rows[:, depth], return_index=True)
    _write_varint(buf, len(vals))
    for v in vals:
        _write_varint(buf, int(v))
    if depth == nbytes - 1:
        _write_varint(buf, 0)  # leaves hold the last byte; no children
        return
    _write_varint(buf, len(vals))
    bounds = list(starts) + [rows.shape[0]]
    for i in range(len(vals)):
        _write_trie_node(buf, rows[bounds[i] : bounds[i + 1]], depth + 1,
                         nbytes)


def save_reference(cbl, path) -> None:
    """Write an index file loadable by the reference binary compiled with
    the same K/PREFIX_BITS.  Ascending prefix order; buckets above the
    reference's vec->trie threshold are written in Trie form (variant 1),
    the rest in Vec form (variant 0) — mirroring `TrieOrVec` serde
    (`/root/reference/src/trievec/mod.rs:8-12`)."""
    cfg = cbl.cfg
    nbytes = (cfg.suffix_bits + 7) // 8
    words = limbs.to_py_ints(cbl.wordset.words_array())
    buf = io.BytesIO()
    buf.write(bytes([1 if cbl.canonical else 0]))
    # group by prefix (words are sorted, so groups are contiguous+ascending)
    groups: list[tuple[int, list[int]]] = []
    mask = (1 << cfg.suffix_bits) - 1
    for w in words:
        p = w >> cfg.suffix_bits
        s = w & mask
        if groups and groups[-1][0] == p:
            groups[-1][1].append(s)
        else:
            groups.append((p, [s]))
    _write_varint(buf, len(groups))
    for p, sufs in groups:
        _write_varint(buf, p)
        if len(sufs) > TRIE_THRESHOLD:
            _write_varint(buf, 1)  # Trie(Trie, usize) variant
            rows = np.zeros((len(sufs), nbytes), dtype=np.uint8)
            for i, s in enumerate(sufs):
                rows[i] = np.frombuffer(
                    s.to_bytes(nbytes, "big"), dtype=np.uint8
                )
            # suffixes ascend within a bucket, so big-endian byte rows are
            # already in trie (DFS) order
            _write_trie_node(buf, rows, 0, nbytes)
            _write_varint(buf, len(sufs))
        else:
            _write_varint(buf, 0)  # Vec variant
            _write_varint(buf, len(sufs))
            for s in sufs:
                _write_varint(buf, nbytes)
                buf.write(s.to_bytes(nbytes, "little"))
    with open(path, "wb") as f:
        f.write(buf.getvalue())
