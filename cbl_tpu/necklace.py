"""Batched necklace (smallest cyclic rotation) computation.

Reference: `/root/reference/src/necklace/mod.rs:13-31`.  The necklace of a
2K-bit word is its minimum over all 2K bit-rotations; the position `pos` is
the smallest left-rotation amount achieving the minimum (the reference's
`rot <= necklace` update over decreasing `i` keeps the smallest position).
`revert_necklace_pos(necklace, pos)` rotates right by `pos` to recover the
word.

The reference optimises the sequential stream with a monotone minimizer queue
(`src/necklace/queue.rs`, `src/necklace/minimizer.rs`) because each update must
be O(1) on a CPU.  On TPU the whole batch is data-parallel, so we evaluate all
2K rotations of thousands of k-mers at once with a `fori_loop` over the
rotation amount — a few VPU ops per rotation per word.  The results are
bit-identical to the reference's `necklace_pos` by construction.

The packed word layout matches `/root/reference/src/cbl.rs:181-195`:
`word = (necklace << POS_BITS) | pos`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limbs
from .config import CBLConfig


def necklace_pos(kmers, cfg: CBLConfig):
    """[N, L] k-mer limbs -> (necklace [N, L], pos [N] uint32).

    necklace = min over p in [0, 2K) of rotl(kmer, p); pos = smallest
    argmin.  Oracle: `/root/reference/src/necklace/mod.rs:13-25`.

    The rotation loop is UNROLLED (python loop, static trip count <= 117):
    the chain is purely elementwise, so XLA fuses all ~2K steps into ONE
    HBM pass over the batch, whereas a `fori_loop` re-materialises the
    (rot, best, pos) carry in HBM every iteration.
    """
    W = cfg.kmer_bits
    rot, best = kmers, kmers
    pos = jnp.zeros(kmers.shape[:-1], dtype=jnp.uint32)
    for p in range(1, W):
        rot = limbs.rotl1(rot, W)
        better = limbs.lt(rot, best)
        best = jnp.where(better[..., None], rot, best)
        pos = jnp.where(better, jnp.uint32(p), pos)
    return best, pos


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() not in ("cpu",)


def necklace_pos_auto(kmers, cfg: CBLConfig):
    """Platform dispatch: the Pallas VMEM-resident kernel on TPU backends
    (ONE HBM pass; the XLA chain re-materialises its carry ~2K times and
    measured ~450ms per 2^25 k-mers on v5e — session10), the fused XLA
    chain on CPU (pallas interpret mode is far slower than compiled XLA
    for tests).  Both are bit-identical to `py_necklace_pos`."""
    N = kmers.shape[0]
    if _on_tpu() and N % 1024 == 0:
        from .ops.necklace_pallas import necklace_pos_pallas

        return necklace_pos_pallas(kmers, cfg)
    return necklace_pos(kmers, cfg)


def revert_necklace_pos(necklace, pos, cfg: CBLConfig):
    """Rotate right by pos to recover the original k-mer;
    `/root/reference/src/necklace/mod.rs:29-31`."""
    W = cfg.kmer_bits
    s = (jnp.uint32(W) - pos.astype(jnp.uint32)) % jnp.uint32(W)
    return limbs.variable_rotl(necklace, s, W)


def pack_word(necklace, pos, cfg: CBLConfig):
    """word = (necklace << POS_BITS) | pos; `/root/reference/src/cbl.rs:181-184`."""
    word = limbs.shift_left(necklace, cfg.pos_bits)
    L = word.shape[-1]
    return word.at[..., L - 1].set(word[..., L - 1] | pos.astype(jnp.uint32))


def unpack_word(word, cfg: CBLConfig):
    """word -> (necklace, pos); `/root/reference/src/cbl.rs:188-195`."""
    pos = limbs.extract_bits(word, 0, cfg.pos_bits)
    necklace = limbs.shift_right(word, cfg.pos_bits)
    return necklace, pos


def word_to_kmer(word, cfg: CBLConfig):
    """Recover k-mer limbs from a packed word; `/root/reference/src/cbl.rs:210-215`."""
    necklace, pos = unpack_word(word, cfg)
    return revert_necklace_pos(necklace, pos, cfg)


def word_prefix(word, cfg: CBLConfig):
    """prefix = word >> SUFFIX_BITS as uint32;
    `/root/reference/src/wordset/mod.rs:63-71`."""
    return limbs.extract_bits(word, cfg.suffix_bits, cfg.prefix_bits)


# --- host-side decode (export/list paths) ---


def np_word_to_kmer(words: "np.ndarray", cfg: CBLConfig) -> "np.ndarray":
    """Host (numpy) twin of `word_to_kmer`: decode exported packed words
    without any device round-trip — the `list` path is transfer-bound over
    the sandbox's host<->TPU relay, so decode runs where the bytes already
    are."""
    import numpy as np

    W = cfg.kmer_bits
    words = np.ascontiguousarray(words, dtype=np.uint32)
    pos = limbs.np_extract_bits(words, 0, cfg.pos_bits)
    necklace = limbs.np_shift_right(words, cfg.pos_bits)
    s = (np.uint32(W) - pos.astype(np.uint32)) % np.uint32(W)
    return limbs.np_variable_rotl(necklace, s, W)


# --- host-side oracle (tests) ---


def py_necklace_pos(word: int, bits: int) -> tuple[int, int]:
    """Pure-python transcription of the necklace definition for testing."""
    best = word
    pos = 0
    mask = (1 << bits) - 1
    for p in range(1, bits):
        rot = ((word << p) & mask) | (word >> (bits - p))
        if rot < best:
            best = rot
            pos = p
    return best, pos
