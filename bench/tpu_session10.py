#!/usr/bin/env python
"""TPU session 10: solo-dispatch phase profile of the 32Mbp staged bench.

Times each stage of insert/query as ONE dispatch + block (no rep
pipelining), to localize the ~0.4s/phase gap between kernel estimates
(sort 130ms, pipeline 5ms) and the staged e2e (ins 0.602s qry 0.807s).
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session10_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def solo(label, fn, reps=3):
    import jax

    for r in range(reps):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        log(f"  {label} rep{r}: {(time.time()-t0)*1e3:.1f}ms")
    return out


def main():
    import jax

    from cbl_tpu import CBL
    from cbl_tpu.cbl import _fused_build_fn, _fused_query_fn, _fused_words_fn
    from cbl_tpu.wordset import _count_hits_kernel_packed, sort_rows

    log(f"=== session10 start; devices: {jax.devices()} ===")
    bases = 32_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases, dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    idx = CBL(k=25)
    t0 = time.time()
    ps = idx.pack_stream(codes, offsets)
    jax.block_until_ready([s[1] for s in ps.slabs])
    log(f"stage: {(time.time()-t0)*1e3:.0f}ms")
    nk_pad, stream, s_arr, e_arr, _ = ps.slabs[0]
    cfg = idx.cfg

    wfn = _fused_words_fn(cfg, False, nk_pad)
    words = solo("words (pipeline only)", lambda: wfn(stream, s_arr, e_arr))[0]
    solo("sort_rows 2^25x2", lambda: sort_rows(words))
    bfn = _fused_build_fn(cfg, False, nk_pad)
    data, n_dev = solo("fused_build (pipeline+sort+count)",
                       lambda: bfn(stream, s_arr, e_arr))
    t0 = time.time()
    n = int(n_dev)
    log(f"  count sync: {(time.time()-t0)*1e3:.1f}ms (n={n})")
    solo("packed join 2^25 data / 2^25 q",
         lambda: _count_hits_kernel_packed(data, words))
    qfn = _fused_query_fn(cfg, False, nk_pad)
    solo("fused_query (pipeline+join)",
         lambda: qfn(stream, s_arr, e_arr, data))

    # e2e staged for reference
    for rep in range(2):
        idx2 = CBL(k=25)
        t0 = time.time()
        idx2.insert_codes_stream(ps)
        n2 = idx2.count()
        t1 = time.time()
        total, pos = idx2.query_codes_stream(ps)
        t2 = time.time()
        log(f"e2e rep{rep}: insert {t1-t0:.3f}s query {t2-t1:.3f}s "
            f"(n={n2}, pos={pos})")
        del idx2
        gc.collect()
    log("=== session10 done ===")


if __name__ == "__main__":
    main()
