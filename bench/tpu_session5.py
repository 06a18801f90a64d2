#!/usr/bin/env python
"""TPU session 5: pick the fastest defaults for bench.py.

Measures (one process, single TPU grant, logs to /tmp/tpu_session5.log):
  A. warm pipeline throughput per necklace variant (XLA chain / pallas v1 /
     pallas v2) at the bench chunk size;
  B. end-to-end insert+query at chunk 2^19 / 2^20 / 2^21;
  C. canonical-mode end-to-end at the best chunk;
  D. K=59 (4-limb) end-to-end at reduced scale.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

LOG = open("/tmp/tpu_session5.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def time_pipeline(variant: str, chunk: int, reps: int = 8):
    import jax

    from cbl_tpu.cbl import _pipeline_fn, _stream_len
    from cbl_tpu.config import get_config
    from cbl_tpu import kmer as kmod

    cfg = get_config(k=25, prefix_bits=24)
    fn = _pipeline_fn(cfg, False, chunk, variant)
    rng = np.random.default_rng(1)
    S = _stream_len(chunk, 25)
    stream = kmod.np_pack_stream(rng.integers(0, 4, size=S, dtype=np.uint8))
    vbits = np.packbits(np.ones(chunk, dtype=bool))
    out = fn(stream, vbits)
    out.block_until_ready()  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(stream, vbits)
    out.block_until_ready()
    t = (time.time() - t0) / reps
    log(f"A pipeline[{variant or 'xla'}] chunk={chunk}: {t*1e3:.2f}ms = "
        f"{chunk/t/1e6:.1f}M kmers/s")
    return t


def e2e(bases, chunk, label, repeats=2, k=25, canonical=False):
    from cbl_tpu import CBL

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - k + 1
    best = None
    for r in range(repeats):
        idx = CBL(k=k, chunk_size=chunk, canonical=canonical)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n = idx.count()
        t1 = time.time()
        total, pos = idx.query_codes_stream(codes, offsets)
        t2 = time.time()
        rd = {"n": n, "pos": pos, "ins": round(t1 - t0, 3),
              "qry": round(t2 - t1, 3)}
        assert pos == total == nk, rd
        if best is None or rd["ins"] + rd["qry"] < best["ins"] + best["qry"]:
            best = rd
    comb = 2 * nk / (best["ins"] + best["qry"])
    log(f"B {label}: insert {nk/best['ins']/1e6:.1f}M/s "
        f"query {nk/best['qry']/1e6:.1f}M/s combined {comb/1e6:.1f}M/s "
        f"{best}")
    return best


def main():
    import jax

    log(f"devices: {jax.devices()}")

    # A. necklace variant shoot-out at the bench chunk
    for variant in ("", "1", "2"):
        try:
            time_pipeline(variant, 1 << 19)
        except Exception as e:  # pallas may not support this config
            log(f"A pipeline[{variant}] FAILED: {type(e).__name__}: {e}")

    # B. chunk sweep, 8Mbp (bench.py workload)
    for chunk in (1 << 19, 1 << 20, 1 << 21):
        try:
            e2e(8_000_000, chunk, f"e2e chunk=2^{chunk.bit_length()-1}")
        except Exception as e:
            log(f"B chunk={chunk} FAILED: {type(e).__name__}: {e}")

    # C. canonical mode
    try:
        e2e(8_000_000, 1 << 19, "e2e canonical", canonical=True)
    except Exception as e:
        log(f"C canonical FAILED: {type(e).__name__}: {e}")

    # D. K=59 reduced scale
    try:
        e2e(2_000_000, 1 << 18, "e2e k=59", k=59)
    except Exception as e:
        log(f"D k59 FAILED: {type(e).__name__}: {e}")

    log("session5 done")


if __name__ == "__main__":
    main()
