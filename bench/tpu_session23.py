#!/usr/bin/env python
"""TPU session 23: sharded-dynamic with staged ShardedStreams + protocol-
correct K=59, closing out round 4's numbers.

Since session22: ShardedCBL.pack_stream stages per-device groups and
memoizes each stream's SORTED per-device words (the sharded analog of
the PackedStream memo), and the sharded round consumes pre-sorted words
— at D=1 the round is structurally identical to the single-chip one.
Session22's 0.547s (2.8x single-chip) re-ran the pipeline + a 2.62M
batch sort per round; target is within 2x of 0.195s.

Also: K=59 with PackedStream staging (session22's 0.245s probe re-packed
the stream between insert and query, paying an un-memoized 4-col query
sort; BASELINE's 0.141s row used staging).

1. sharded-dynamic D=1, staged streams (3 repeats).
2. e2e dynamic re-confirm (1 repeat, warm cache).
3. K=59 4Mbp insert+query via ONE PackedStream (memo protocol).
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session23_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def main():
    import jax

    import bench

    t_start = time.time()
    log(f"=== session23 start; devices: {jax.devices()} ===")

    codes8 = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                               dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes8)
    log(f"0 baseline.cpp dynamic: {based}")
    try:
        ours = bench.run_tpu_sharded_dynamic(codes8, 3)
        assert ours["distinct"] == based["distinct"], (ours, based)
        assert ours["positive"] == based["positive"], (ours, based)
        ops_s = ours["ops"] / ours["total_s"]
        log(f"1 sharded-dynamic D=1 (staged ShardedStreams): "
            f"{ours['total_s']:.3f}s {ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"1 sharded-dynamic FAILED: {type(e).__name__}: {str(e)[:400]}")
    try:
        ours = bench.run_tpu_dynamic(codes8, 2)
        assert ours["distinct"] == based["distinct"], (ours, based)
        assert ours["positive"] == based["positive"], (ours, based)
        ops_s = ours["ops"] / ours["total_s"]
        log(f"2 e2e dynamic re-confirm: {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"2 dynamic FAILED: {type(e).__name__}: {str(e)[:400]}")
    del codes8
    gc.collect()

    try:
        from cbl_tpu import CBL

        codes4 = np.random.default_rng(2).integers(0, 4, size=4_000_000,
                                                   dtype=np.uint8)
        off4 = np.array([0, len(codes4)], dtype=np.int64)
        best = None
        for rep in range(3):
            idx = CBL(k=59, prefix_bits=28)
            ps = idx.pack_stream(codes4, off4)
            jax.block_until_ready([s[1] for s in ps.slabs])
            t0 = time.time()
            idx.insert_codes_stream(ps)
            n59 = int(jax.device_get(idx.count_device()))
            t1 = time.time()
            tt, pp = idx.query_codes_stream(ps)
            t2 = time.time()
            assert pp == tt
            if best is None or (t2 - t0) < best[0]:
                best = (t2 - t0, t1 - t0, t2 - t1)
        log(f"3 K=59 4Mbp (staged, memo): combined {best[0]:.3f}s "
            f"(build {best[1]:.3f} query {best[2]:.3f}) n={n59}")
    except Exception as e:
        log(f"3 K=59 FAILED: {type(e).__name__}: {str(e)[:400]}")

    log(f"=== session23 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
