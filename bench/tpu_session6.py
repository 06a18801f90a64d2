#!/usr/bin/env python
"""TPU session 6: locate the e2e insert bottleneck.

Session 5 showed: warm pipeline ~0.2ms/chunk (2^19), merge sort ~25ms, yet
e2e insert is ~150-190ms for 8Mbp — ~140ms unaccounted.  Hypotheses:
per-chunk host packing, per-dispatch tunnel latency, or a pipeline cliff
above 2^19.  Measures (logs to /tmp/tpu_session6.log):
  A. warm pipeline per chunk size (2^17..2^20) x variant (xla, pallas1);
  B. phase-split e2e at 8Mbp: host packing alone / pipeline dispatch wall /
     merge+count wall;
  C. e2e best-variant sweep at chunk 2^17 / 2^18 / 2^19.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

LOG = open("/tmp/tpu_session6.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def time_pipeline(variant: str, chunk: int, reps: int = 16):
    from cbl_tpu.cbl import _pipeline_fn, _stream_len
    from cbl_tpu.config import get_config
    from cbl_tpu import kmer as kmod

    cfg = get_config(k=25, prefix_bits=24)
    fn = _pipeline_fn(cfg, False, chunk, variant)
    rng = np.random.default_rng(1)
    S = _stream_len(chunk, 25)
    stream = kmod.np_pack_stream(rng.integers(0, 4, size=S, dtype=np.uint8))
    vbits = np.packbits(np.ones(chunk, dtype=bool))
    fn(stream, vbits).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(stream, vbits)
    out.block_until_ready()
    t = (time.time() - t0) / reps
    log(f"A pipeline[{variant or 'xla'}] chunk=2^{chunk.bit_length()-1}: "
        f"{t*1e3:.2f}ms = {chunk/t/1e6:.0f}M kmers/s")
    return t


def phase_split(bases=8_000_000, chunk=1 << 19, variant="", canonical=False):
    os.environ["CBL_TPU_PALLAS"] = variant
    from cbl_tpu import CBL
    import jax

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    idx = CBL(k=25, chunk_size=chunk, canonical=canonical)
    valid = idx._stream_valid(codes, offsets)

    # warm every shape once
    ws = [w for w, _, _ in idx._stream_words(codes, valid)]
    jax.block_until_ready(ws)

    # B1: host packing only (no dispatch)
    t0 = time.time()
    n = 0
    for stream, vbits, _, _ in idx._stream_chunks(codes, valid, chunk):
        n += len(vbits)
    t_pack = time.time() - t0
    log(f"B pack-only ({bases/1e6:.0f}Mbp, chunk=2^{chunk.bit_length()-1}): "
        f"{t_pack*1e3:.0f}ms")

    # B2: packing + dispatch + pipeline, wall until all outputs ready
    t0 = time.time()
    ws = [w for w, _, _ in idx._stream_words(codes, valid)]
    jax.block_until_ready(ws)
    t_pipe = time.time() - t0
    log(f"B pipeline wall [{variant or 'xla'}]: {t_pipe*1e3:.0f}ms "
        f"({(bases-24)/t_pipe/1e6:.0f}M kmers/s)")

    # B3: merge + count on the prepared word batches
    t0 = time.time()
    idx.wordset.insert_rows_bulk(ws)
    nn = idx.count()
    t_merge = time.time() - t0
    log(f"B merge+count: {t_merge*1e3:.0f}ms (n={nn})")

    # B4: query join wall on fresh words
    ws2 = [w for w, _, _ in idx._stream_words(codes, valid)]
    jax.block_until_ready(ws2)
    import jax.numpy as jnp
    t0 = time.time()
    pos = idx.wordset.count_hits(jnp.concatenate(ws2))
    t_join = time.time() - t0
    log(f"B query-join wall: {t_join*1e3:.0f}ms (pos={pos})")
    os.environ.pop("CBL_TPU_PALLAS", None)


def e2e(bases, chunk, label, variant="", repeats=2, k=25):
    os.environ["CBL_TPU_PALLAS"] = variant
    from cbl_tpu import CBL

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=bases, dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - k + 1
    best = None
    for r in range(repeats):
        idx = CBL(k=k, chunk_size=chunk)
        t0 = time.time()
        idx.insert_codes_stream(codes, offsets)
        n = idx.count()
        t1 = time.time()
        total, pos = idx.query_codes_stream(codes, offsets)
        t2 = time.time()
        rd = {"n": n, "ins": round(t1 - t0, 3), "qry": round(t2 - t1, 3)}
        assert pos == total == nk
        if best is None or rd["ins"] + rd["qry"] < best["ins"] + best["qry"]:
            best = rd
    comb = 2 * nk / (best["ins"] + best["qry"])
    log(f"C {label}: insert {nk/best['ins']/1e6:.1f}M/s "
        f"query {nk/best['qry']/1e6:.1f}M/s combined {comb/1e6:.1f}M/s {best}")
    os.environ.pop("CBL_TPU_PALLAS", None)
    return best


def main():
    import jax

    log(f"devices: {jax.devices()}")

    for chunk in (1 << 17, 1 << 18, 1 << 19, 1 << 20):
        for variant in ("", "1"):
            try:
                time_pipeline(variant, chunk)
            except Exception as e:
                log(f"A [{variant}] 2^{chunk.bit_length()-1} FAILED: {e}")

    try:
        phase_split()
    except Exception as e:
        log(f"B FAILED: {type(e).__name__}: {e}")

    try:
        log("-- canonical phase split --")
        phase_split(canonical=True)
    except Exception as e:
        log(f"B canonical FAILED: {type(e).__name__}: {e}")

    for chunk in (1 << 17, 1 << 18, 1 << 19):
        for variant in ("", "1"):
            try:
                e2e(8_000_000, chunk,
                    f"chunk=2^{chunk.bit_length()-1} [{variant or 'xla'}]",
                    variant)
            except Exception as e:
                log(f"C 2^{chunk.bit_length()-1} [{variant}] FAILED: {e}")

    log("session6 done")


if __name__ == "__main__":
    main()
