#!/usr/bin/env python
"""TPU session 4: measure the unrolled-necklace pipeline, payload sort-join,
and adaptive query slabs.  Logs to /tmp/tpu_session4.log."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

LOG = open("/tmp/tpu_session4.log", "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    import jax

    from cbl_tpu import CBL

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def e2e(bases, chunk, label, repeats=2, k=25, canonical=False):
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
            rd = {"n": n, "pos": pos, "ins": round(t1 - t0, 3), "qry": round(t2 - t1, 3)}
            log(f"{label} rep{r}: {rd}")
            assert pos == total == nk, rd
            if best is None or rd["ins"] + rd["qry"] < best["ins"] + best["qry"]:
                best = rd
        comb = 2 * nk / (best["ins"] + best["qry"])
        log(
            f"{label} BEST: insert {nk/best['ins']/1e6:.1f}M/s "
            f"query {nk/best['qry']/1e6:.1f}M/s combined {comb/1e6:.1f}M/s"
        )
        return best

    try:
        e2e(500_000, 1 << 19, "0.5Mbp c512K", repeats=1)
    except Exception as e:
        log(f"0.5Mbp FAILED: {e!r}")
        return
    for chunk, lbl in ((1 << 19, "c512K"), (1 << 20, "c1M"), (1 << 21, "c2M")):
        try:
            e2e(8_000_000, chunk, f"8Mbp {lbl}")
        except Exception as e:
            log(f"8Mbp {lbl} FAILED: {e!r}")

    # canonical-mode e2e (the mode the paper cares about)
    try:
        e2e(8_000_000, 1 << 20, "8Mbp c1M canonical", canonical=True)
    except Exception as e:
        log(f"canonical FAILED: {e!r}")

    # breakdown at 8Mbp c1M (kernels already compiled by e2e above)
    try:
        import jax.numpy as jnp

        from cbl_tpu.wordset import _count_hits_kernel

        codes = rng.integers(0, 4, size=8_000_000, dtype=np.uint8)
        offsets = np.array([0, len(codes)], dtype=np.int64)
        idx = CBL(k=25, chunk_size=1 << 20)
        valid = idx._stream_valid(codes, offsets)
        batches = [w for w, _, _ in idx._stream_words(codes, valid)]
        jax.block_until_ready(batches[-1])
        t0 = time.time()
        batches = [w for w, _, _ in idx._stream_words(codes, valid)]
        jax.block_until_ready(batches[-1])
        t_pipe = time.time() - t0
        t0 = time.time()
        idx.wordset.insert_rows_bulk(batches)
        n = idx.count()
        t_merge = time.time() - t0
        q = jnp.concatenate([w for w, _, _ in idx._stream_words(codes, valid)])
        jax.block_until_ready(q)
        hits = _count_hits_kernel(idx.wordset._live(), q)
        jax.block_until_ready(hits)  # compiled in e2e? ensure warm
        t0 = time.time()
        hits = int(_count_hits_kernel(idx.wordset._live(), q))
        t_count = time.time() - t0
        nk = len(codes) - 24
        log(
            f"breakdown 8Mbp c1M: pipeline={t_pipe:.3f}s ({nk/t_pipe/1e6:.1f}M/s) "
            f"merge={t_merge:.3f}s count={t_count:.3f}s n={n} hits={hits}"
        )
    except Exception as e:
        log(f"breakdown FAILED: {e!r}")

    # pallas A/B on the same chunk
    try:
        os.environ["CBL_TPU_PALLAS"] = "1"
        idx = CBL(k=25, chunk_size=1 << 20)
        valid = idx._stream_valid(codes, offsets)
        batches = [w for w, _, _ in idx._stream_words(codes, valid)]
        jax.block_until_ready(batches[-1])
        t0 = time.time()
        batches = [w for w, _, _ in idx._stream_words(codes, valid)]
        jax.block_until_ready(batches[-1])
        log(f"pallas pipeline 8Mbp c1M: {time.time()-t0:.3f}s")
    except Exception as e:
        log(f"pallas FAILED: {e!r}")
    finally:
        os.environ.pop("CBL_TPU_PALLAS", None)

    # scale
    try:
        e2e(32_000_000, 1 << 20, "32Mbp c1M")
    except Exception as e:
        log(f"32Mbp FAILED: {e!r}")

    log("session4 done")


if __name__ == "__main__":
    main()
