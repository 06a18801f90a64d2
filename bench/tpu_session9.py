#!/usr/bin/env python
"""TPU session 9 (round 2): staged-bench measurement + link/overhead probes.

1. link probe: device_put bandwidth (8MB), scalar sync round-trip
2. bench.run_tpu at 32Mbp exactly as the driver runs it (staging excluded
   from the timed phases, reported separately)
3. staged dynamic mode at 8Mbp
4. staged bench at 8Mbp and 64Mbp
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session9_results.log"), "a", buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def link_probe():
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).integers(
        0, 2**32, size=2_000_000, dtype=np.uint32
    )  # 8MB
    d = jax.device_put(buf)
    d.block_until_ready()
    for rep in range(3):
        t0 = time.time()
        d = jax.device_put(buf)
        d.block_until_ready()
        t = time.time() - t0
        log(f"1 device_put 8MB rep{rep}: {t*1e3:.0f}ms = {8/t:.1f}MB/s")
    s = jnp.sum(d)
    s.block_until_ready()
    for rep in range(3):
        t0 = time.time()
        int(jnp.sum(d))
        log(f"1 dispatch+scalar-sync rep{rep}: {(time.time()-t0)*1e3:.1f}ms")
    # device->host transfer
    for rep in range(2):
        t0 = time.time()
        _ = np.asarray(d)
        t = time.time() - t0
        log(f"1 device_get 8MB rep{rep}: {t*1e3:.0f}ms = {8/t:.1f}MB/s")
    del d
    gc.collect()


def staged_bench(bases, repeats=3):
    import bench

    codes = np.random.default_rng(0).integers(0, 4, size=bases, dtype=np.uint8)
    base = bench.run_baseline(codes)
    ours = bench.run_tpu(codes, 1 << 19, 1 << 21, repeats)
    nk = bases - 24
    assert ours["distinct"] == base["distinct"]
    assert ours["positive"] == ours["total"] == nk
    comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
    base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
    log(f"2 staged {bases/1e6:.0f}Mbp: ins {ours['insert_s']:.3f}s "
        f"qry {ours['query_s']:.3f}s combined {comb/1e6:.1f}M/s "
        f"vs_local_baseline {comb/base_comb:.2f}x")


def staged_dynamic(bases=8_000_000, repeats=2):
    import bench

    codes = np.random.default_rng(0).integers(0, 4, size=bases, dtype=np.uint8)
    base = bench.run_baseline_dynamic(codes)
    ours = bench.run_tpu_dynamic(codes, repeats)
    assert ours["distinct"] == base["distinct"]
    assert ours["positive"] == base["positive"]
    rate = ours["ops"] / ours["total_s"]
    log(f"3 staged dynamic {bases/1e6:.0f}Mbp: {ours['total_s']:.3f}s = "
        f"{rate/1e6:.1f}M ops/s vs {base['ops_per_s']/1e6:.1f}M = "
        f"{rate/base['ops_per_s']:.2f}x")


def main():
    import jax

    log(f"=== session9 start; devices: {jax.devices()} ===")
    for name, fn in (
        ("1 link", link_probe),
        ("2 staged 32M", lambda: staged_bench(32_000_000)),
        ("3 dynamic", staged_dynamic),
        ("2 staged 8M", lambda: staged_bench(8_000_000, repeats=2)),
        ("2 staged 64M", lambda: staged_bench(64_000_000, repeats=2)),
    ):
        t0 = time.time()
        try:
            fn()
        except Exception as e:
            import traceback

            log(f"{name} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc()
        gc.collect()
        log(f"-- {name} done in {time.time()-t0:.1f}s --")
    log("=== session9 done ===")


if __name__ == "__main__":
    main()
