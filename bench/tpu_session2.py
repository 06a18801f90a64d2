#!/usr/bin/env python
"""One-shot TPU measurement session (single-tenant tunnel: batch EVERYTHING
into this one process, let it run to completion).

Phases:
  A. correctness smoke on the real chip (small input, counts vs baseline.cpp)
  B. stage breakdown at bench scale: pipeline-only / bulk-merge / count-hits
  C. end-to-end bench runs (chunk sweep + a larger stream)
  D. pallas-vs-XLA necklace A/B at one chunk size

Writes a human log to /tmp/tpu_session2.log as it goes (tail -f to watch).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

LOG = open("/tmp/tpu_session2.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def block(x):
    jax.block_until_ready(x)
    return x


def main():
    global jax
    import jax

    from cbl_tpu import CBL
    from cbl_tpu.wordset import _count_hits_kernel

    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(0)

    # ---------------- A. smoke ----------------
    try:
        codes_s = rng.integers(0, 4, size=200_000, dtype=np.uint8)
        off_s = np.array([0, len(codes_s)], dtype=np.int64)
        idx = CBL(k=25, chunk_size=1 << 16)
        t0 = time.time()
        idx.insert_codes_stream(codes_s, off_s)
        n = idx.count()
        total, pos = idx.query_codes_stream(codes_s, off_s)
        log(f"A smoke: n={n} total={total} pos={pos} wall={time.time()-t0:.1f}s")
        assert pos == total == len(codes_s) - 24
        # canonical smoke
        idxc = CBL.new_canonical(k=25, chunk_size=1 << 16)
        idxc.insert_codes_stream(codes_s, off_s)
        log(f"A canonical smoke: n={idxc.count()}")
    except Exception as e:
        log(f"A FAILED: {e!r}")

    # ---------------- shared big input ----------------
    BASES = int(os.environ.get("CBL_TPU_SESSION_BASES", 8_000_000))
    codes = rng.integers(0, 4, size=BASES, dtype=np.uint8)
    offsets = np.array([0, BASES], dtype=np.int64)
    n_kmers = BASES - 24

    # baseline distinct count for cross-validation
    base_distinct = None
    try:
        from importlib.machinery import SourceFileLoader

        benchmod = SourceFileLoader("benchmod", os.path.join(REPO, "bench.py")).load_module()
        base = benchmod.run_baseline(codes)
        base_distinct = base["distinct"]
        log(f"baseline.cpp: {base}")
    except Exception as e:
        log(f"baseline FAILED: {e!r}")

    # ---------------- B. stage breakdown ----------------
    for chunk in (1 << 19, 1 << 20):
        try:
            idx = CBL(k=25, chunk_size=chunk)
            valid = idx._stream_valid(codes, offsets)
            # warm compile
            batches = [w for w, _, _ in idx._stream_words(codes, valid)]
            block(batches[-1])
            t0 = time.time()
            batches = [w for w, _, _ in idx._stream_words(codes, valid)]
            block(batches[-1])
            t_pipe = time.time() - t0
            t0 = time.time()
            idx.wordset.insert_rows_bulk(batches)
            n = idx.count()
            t_merge = time.time() - t0
            # count-hits on a fresh word stream (realistic query side)
            qbatches = [w for w, _, _ in idx._stream_words(codes, valid)]
            import jax.numpy as jnp

            q = jnp.concatenate(qbatches)
            block(q)
            hits = _count_hits_kernel(idx.wordset._live(), q)
            block(hits)  # warm compile
            t0 = time.time()
            hits = int(_count_hits_kernel(idx.wordset._live(), q))
            t_count = time.time() - t0
            log(
                f"B chunk={chunk}: pipeline={t_pipe:.3f}s ({n_kmers/t_pipe/1e6:.1f}M/s) "
                f"merge={t_merge:.3f}s count_hits={t_count:.3f}s n={n} hits={hits}"
            )
            if base_distinct is not None and n != base_distinct:
                log(f"B COUNT MISMATCH: {n} vs {base_distinct}")
        except Exception as e:
            log(f"B chunk={chunk} FAILED: {e!r}")

    # ---------------- C. end-to-end bench ----------------
    def e2e(codes, offsets, chunk, label, repeats=2):
        nk = len(codes) - 24
        best = None
        for r in range(repeats):
            idx = CBL(k=25, chunk_size=chunk)
            t0 = time.time()
            idx.insert_codes_stream(codes, offsets)
            n = idx.count()
            t1 = time.time()
            total, pos = idx.query_codes_stream(codes, offsets)
            t2 = time.time()
            rdict = {"n": n, "pos": pos, "ins": t1 - t0, "qry": t2 - t1}
            log(f"C {label} rep{r}: {rdict}")
            if best is None or rdict["ins"] + rdict["qry"] < best["ins"] + best["qry"]:
                best = rdict
        comb = 2 * nk / (best["ins"] + best["qry"])
        log(
            f"C {label} BEST: insert {nk/best['ins']/1e6:.1f}M/s "
            f"query {nk/best['qry']/1e6:.1f}M/s combined {comb/1e6:.1f}M/s"
        )
        return best

    for chunk in (1 << 19, 1 << 20):
        try:
            b = e2e(codes, offsets, chunk, f"8Mbp chunk={chunk}")
            if base_distinct is not None and b["n"] != base_distinct:
                log("C COUNT MISMATCH vs baseline!")
        except Exception as e:
            log(f"C chunk={chunk} FAILED: {e!r}")

    # larger stream: 4x the base size
    try:
        codes32 = rng.integers(0, 4, size=4 * BASES, dtype=np.uint8)
        off32 = np.array([0, len(codes32)], dtype=np.int64)
        e2e(codes32, off32, 1 << 20, f"{4*BASES//10**6}Mbp chunk=1M", repeats=2)
    except Exception as e:
        log(f"C 4x FAILED: {e!r}")

    # ---------------- D. pallas necklace A/B ----------------
    try:
        os.environ["CBL_TPU_PALLAS"] = "1"
        idx = CBL(k=25, chunk_size=1 << 19)
        valid = idx._stream_valid(codes, offsets)
        batches = [w for w, _, _ in idx._stream_words(codes, valid)]
        block(batches[-1])
        t0 = time.time()
        batches = [w for w, _, _ in idx._stream_words(codes, valid)]
        block(batches[-1])
        log(f"D pallas pipeline: {time.time()-t0:.3f}s")
        del os.environ["CBL_TPU_PALLAS"]
    except Exception as e:
        log(f"D FAILED: {e!r}")
        os.environ.pop("CBL_TPU_PALLAS", None)

    log("session done")


if __name__ == "__main__":
    main()
