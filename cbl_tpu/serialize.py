"""Index persistence (checkpoint/resume).

The reference serialises with bincode varint as a prefix->container map
(`/root/reference/src/cbl.rs:127-160`, `src/wordset/mod.rs:382-437`), a
*structure-canonicalising* format with no K/PREFIX_BITS header (§3.5 of
SURVEY.md).  Our format is the TPU-native analog: the dense sorted word
array itself (the index's canonical form), stored as a compressed .npz with
an explicit header so mismatched K/PREFIX_BITS fail loudly instead of
undefined behavior.  Semantic equality (same k-mer sets) is what the
reference's own equality harness demands; byte-compat with bincode is not a
goal (BASELINE.md).
"""

from __future__ import annotations

import numpy as np

MAGIC = "CBLX"
VERSION = 1


def save(cbl, path) -> None:
    words = cbl.wordset.words_array()
    np.savez_compressed(
        path if str(path).endswith(".npz") else str(path),
        magic=np.array(MAGIC),
        version=np.array(VERSION),
        k=np.array(cbl.cfg.k),
        prefix_bits=np.array(cbl.cfg.prefix_bits),
        canonical=np.array(cbl.canonical),
        words=words,
    )


def _npz_path(path) -> str:
    import os

    p = str(path)
    if os.path.exists(p):
        return p
    if os.path.exists(p + ".npz"):
        return p + ".npz"
    return p


def load(path):
    from .cbl import CBL

    with np.load(_npz_path(path)) as z:
        if str(z["magic"]) != MAGIC:
            raise ValueError(f"{path}: not a cbl_tpu index file")
        version = int(z["version"])
        if version > VERSION:
            raise ValueError(f"{path}: unsupported index version {version}")
        k = int(z["k"])
        prefix_bits = int(z["prefix_bits"])
        canonical = bool(z["canonical"])
        words = z["words"]
    cbl = CBL(k=k, prefix_bits=prefix_bits, canonical=canonical)
    if words.shape[0]:
        cbl.wordset.insert_words(words)  # rows are sorted+unique; merge is a no-op pass
        cbl.wordset.flush()
    return cbl
