#!/usr/bin/env python
"""TPU session 18: the round-3 sorted-log + single-sync configuration.

New since session16/17 (never ran — no grant): the dynamic workload now
lives in ONE (word, tag)-sorted log (one batch sort + one merge pass per
round, no per-round fold), the static self-stream query joins two sorted
runs with no query sort (words-memo sorted flag), and bench.py batches
every workload scalar into one device_get.

1. e2e static 32/64Mbp, new protocol: default (sorted memo) and
   CBL_TPU_NO_WORDS_CACHE=1 (full pipeline per pass).
2. e2e dynamic 8Mbp (sorted-log rounds) + per-round scalar-synced
   breakdown for the roofline writeup.
3. e2e genome 32Mbp (distinct query stream -> query sort stays).
4. ShardedCBL 1-device mesh vs single device, 8Mbp (VERDICT r2 target:
   insert overhead <= 1.5x; 3.4x in r2 before the keep-dups fold) +
   sharded bulk remove timing.
5. Set algebra 2x8M k-mers, xla vs mergepath (one-pass merge set ops).
6. K=59 build/query sanity under the new defaults.

Timing: scalar sync only (see CLAUDE.md).
"""

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

LOG = open(os.path.join(REPO, "bench", "session18_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


def clear():
    import jax

    jax.clear_caches()
    gc.collect()


def e2e_static():
    import bench

    for bases in (32_000_000, 64_000_000):
        codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                                  dtype=np.uint8)
        base = bench.run_baseline(codes)
        nk = bases - 24
        base_comb = 2 * nk / (base["insert_s"] + base["query_s"])
        log(f"1 baseline.cpp {bases//10**6}Mbp: ins {base['insert_s']:.3f}s "
            f"qry {base['query_s']:.3f}s ({base_comb/1e6:.2f}M/s)")
        for memo in (True, False):
            if not memo:
                os.environ["CBL_TPU_NO_WORDS_CACHE"] = "1"
            clear()
            try:
                ours = bench.run_tpu(codes, 1 << 19, 1 << 21, 3)
                assert ours["distinct"] == base["distinct"]
                assert ours["positive"] == ours["total"] == nk
                comb = 2 * nk / (ours["insert_s"] + ours["query_s"])
                log(f"1 e2e static {bases//10**6}Mbp memo={memo}: combined "
                    f"{ours['insert_s']+ours['query_s']:.3f}s "
                    f"{comb/1e6:.1f}M/s vs_local {comb/base_comb:.2f}x")
            except Exception as e:
                log(f"1 e2e static {bases//10**6}Mbp memo={memo} FAILED: "
                    f"{type(e).__name__}: {str(e)[:300]}")
            os.environ.pop("CBL_TPU_NO_WORDS_CACHE", None)
        del codes
        gc.collect()


def e2e_dynamic():
    import bench

    codes = np.random.default_rng(0).integers(0, 4, size=8_000_000,
                                              dtype=np.uint8)
    based = bench.run_baseline_dynamic(codes)
    log(f"2 baseline.cpp dynamic: {based}")
    clear()
    try:
        ours = bench.run_tpu_dynamic(codes, 3)
        assert ours["distinct"] == based["distinct"]
        assert ours["positive"] == based["positive"]
        ops_s = ours["ops"] / ours["total_s"]
        log(f"2 e2e dynamic (sorted-log): {ours['total_s']:.3f}s "
            f"{ops_s/1e6:.1f}M ops/s vs_local "
            f"{ops_s/based['ops_per_s']:.2f}x")
    except Exception as e:
        log(f"2 e2e dynamic FAILED: {type(e).__name__}: {str(e)[:300]}")

    # per-round breakdown (scalar sync per round; warm rep only)
    import jax

    from cbl_tpu import CBL

    SEGS = 8
    sb = len(codes) // SEGS
    off1 = np.array([0, sb], dtype=np.int64)
    off_h = np.array([0, sb // 2], dtype=np.int64)
    try:
        for rep in range(2):
            idx = CBL(k=25)
            segs = [idx.pack_stream(codes[i * sb:(i + 1) * sb], off1)
                    for i in range(SEGS)]
            halves = [idx.pack_stream(codes[i * sb:i * sb + sb // 2], off_h)
                      for i in range(SEGS)]
            jax.block_until_ready([s[1] for ps in segs for s in ps.slabs])
            rounds = []
            t_all = time.time()
            for i in range(SEGS):
                t0 = time.time()
                t, p = idx.dynamic_round(segs[i], segs[i - 1 if i else 0],
                                         halves[i], lazy=True)
                int(jax.device_get(p))  # sync
                rounds.append(time.time() - t0)
            t_count = time.time()
            n = idx.count()
            t_end = time.time()
            if rep:
                log(f"2 dyn breakdown (synced): rounds "
                    f"{[f'{r*1e3:.0f}' for r in rounds]}ms "
                    f"count(scan) {(t_end-t_count)*1e3:.0f}ms "
                    f"total {t_end-t_all:.3f}s n={n}")
    except Exception as e:
        log(f"2 dyn breakdown FAILED: {type(e).__name__}: {str(e)[:300]}")


def e2e_genome():
    import bench

    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    base = bench.run_baseline_records(ci, oi, cq, oq)
    log(f"3 baseline.cpp genome: {base}")
    nk = base["n_kmers_insert"] + base["n_kmers_query"]
    base_comb = nk / (base["insert_s"] + base["query_s"])
    clear()
    try:
        ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 3)
        assert ours["distinct"] == base["distinct"]
        assert ours["positive"] == base["positive"]
        comb = nk / (ours["insert_s"] + ours["query_s"])
        log(f"3 e2e genome: combined {ours['insert_s']+ours['query_s']:.3f}s "
            f"{comb/1e6:.1f}M/s vs_local {comb/base_comb:.2f}x "
            f"hit-rate {ours['positive']/ours['total']:.3f}")
    except Exception as e:
        log(f"3 e2e genome FAILED: {type(e).__name__}: {str(e)[:300]}")


def sharded_vs_single():
    import jax

    from cbl_tpu import CBL
    from cbl_tpu.parallel import ShardedCBL, make_mesh

    clear()
    bases = 8_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 24

    best_i = best_q = None
    n_single = None
    try:
        for rep in range(2):
            idx = CBL(k=25)
            t0 = time.time()
            idx.insert_codes_stream(codes, offsets)
            n_single = idx.count()
            t1 = time.time()
            t, p = idx.query_codes_stream(codes, offsets)
            t2 = time.time()
            assert p == t == nk
            best_i = min(best_i or 1e9, t1 - t0)
            best_q = min(best_q or 1e9, t2 - t1)
        log(f"4 single-device 8Mbp: insert {best_i:.3f}s query {best_q:.3f}s "
            f"n={n_single}")

        mesh = make_mesh(jax.devices()[:1])
        bi = bq = None
        for rep in range(2):
            sh = ShardedCBL(k=25, mesh=mesh)
            t0 = time.time()
            sh.insert_codes_stream(codes, offsets)
            n = sh.count()
            t1 = time.time()
            t, p = sh.query_codes_stream(codes, offsets)
            t2 = time.time()
            assert n == n_single and p == t == nk, (n, n_single, t, p)
            bi = min(bi or 1e9, t1 - t0)
            bq = min(bq or 1e9, t2 - t1)
        log(f"4 sharded 1-dev mesh 8Mbp: insert {bi:.3f}s ({bi/best_i:.2f}x "
            f"single) query {bq:.3f}s ({bq/best_q:.2f}x single)")

        half = codes[: bases // 2]
        hoff = np.array([0, len(half)], dtype=np.int64)
        for rep in range(2):
            sh2 = ShardedCBL(k=25, mesh=mesh)
            sh2.insert_codes_stream(codes, offsets)
            sh2.count()
            t0 = time.time()
            sh2.remove_codes_stream(half, hoff)
            n2 = sh2.count()
            dt = time.time() - t0
            log(f"4 sharded bulk remove 4Mbp rep{rep}: {dt:.3f}s "
                f"({(len(half)-24)/dt/1e6:.1f}M removals/s) "
                f"n {n_single}->{n2}")
    except Exception as e:
        log(f"4 sharded FAILED: {type(e).__name__}: {str(e)[:300]}")


def algebra():
    import jax

    from cbl_tpu import CBL

    codes = np.random.default_rng(0).integers(0, 4, size=16_000_000,
                                              dtype=np.uint8)
    half = len(codes) // 2
    for mode in ("xla", "mergepath"):
        os.environ["CBL_TPU_MERGE_KERNEL"] = mode
        os.environ["CBL_TPU_SORT"] = "xla"
        clear()
        try:
            a = CBL(k=25)
            a.insert_codes_stream(codes[:half],
                                  np.array([0, half], dtype=np.int64))
            b = CBL(k=25)
            b.insert_codes_stream(codes[half:],
                                  np.array([0, half], dtype=np.int64))
            na, nb = a.count(), b.count()
            counts = {}
            for name, fn in (("union", lambda: a | b),
                             ("inter", lambda: a & b),
                             ("diff", lambda: a - b),
                             ("symdiff", lambda: a ^ b)):
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    c = fn()
                    counts[name] = c.count()  # scalar sync
                    ts.append(time.time() - t0)
                log(f"5 algebra merge={mode} {name}: {min(ts)*1e3:.0f}ms "
                    f"(n={counts[name]})")
            log(f"5 algebra merge={mode}: a={na} b={nb}")
            del a, b
        except Exception as e:
            log(f"5 algebra merge={mode} FAILED: {type(e).__name__}: "
                f"{str(e)[:300]}")
        gc.collect()
    os.environ.pop("CBL_TPU_MERGE_KERNEL", None)
    os.environ.pop("CBL_TPU_SORT", None)


def e2e_largek():
    import jax

    from cbl_tpu import CBL

    clear()
    bases = 4_000_000
    codes = np.random.default_rng(0).integers(0, 4, size=bases,
                                              dtype=np.uint8)
    offsets = np.array([0, bases], dtype=np.int64)
    nk = bases - 58
    try:
        for rep in range(2):
            idx = CBL(k=59, prefix_bits=28)
            t0 = time.time()
            idx.insert_codes_stream(codes, offsets)
            n_dev = idx.count_device()
            t1 = time.time()
            td, pd = idx.query_codes_stream(codes, offsets, lazy=True)
            n, total, pos = (int(x) for x in
                             jax.device_get((n_dev, td, pd)))
            t2 = time.time()
            assert pos == total == nk
            log(f"6 K=59 rep{rep}: build {t1-t0:.3f}s combined "
                f"{t2-t0:.3f}s ({2*nk/(t2-t0)/1e6:.1f}M/s) n={n}")
    except Exception as e:
        log(f"6 K=59 FAILED: {type(e).__name__}: {str(e)[:300]}")


def main():
    import jax

    t_start = time.time()
    log(f"=== session18 start; devices: {jax.devices()} ===")
    e2e_static()
    e2e_dynamic()
    e2e_genome()
    sharded_vs_single()
    algebra()
    e2e_largek()
    log(f"=== session18 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
