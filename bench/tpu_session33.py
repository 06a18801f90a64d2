"""TPU session 33 (round 5).

One grant, three jobs:

1. SORT-FAMILY CLOSURE (round-4 verdict item 5): measure the primitive
   lower bound of the radix-partition / samplesort family at 2^25 L=2.
   Any scatter-free partition sort decomposes into
     (a) bucket-id pass (compare vs 255 quantile boundaries),
     (b) permutation materialization = lax.sort of (key, iota) pairs,
     (c) >=1 full-row gather by that permutation,
     (d) per-bucket tile sorts (>0) and a final compaction gather.
   If (b) + (c) alone >= a direct 2-column lax.sort, every member of the
   family loses before tile sorts even start — a measured closure of the
   round-3/4 question.  We also measure (a) and a 1-key+2-payload sort
   (carrying the rows as payload instead of re-gathering).

2. CANONICAL A/B (verdict item 3): static 32Mbp pipeline with
   canonical=False vs canonical=True, counts cross-checked against
   baseline.cpp's min(kmer, revcomp) oracle.

3. CACHE WARM + FINAL LINE: one full default bench run (static headline
   + all extra keys) so the driver's run hits a warm XLA cache.

Timing honesty: every measurement ends in a scalar jax.device_get sync
(block_until_ready is not a barrier on this backend, BASELINE.md); the
~28ms RPC floor is measured and reported alongside.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LOG = open("/root/repo/bench/session33_results.log", "a")


def log(msg):
    print(msg, file=LOG, flush=True)
    print(msg, file=sys.stderr, flush=True)


def sync_scalar(x):
    import jax

    return jax.device_get(x)


def timeit(fn, *args, repeats=4):
    """Enqueue fn(*args) -> (result_scalar,) and sync; return best seconds."""
    best = None
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        sync_scalar(out)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def main(n_sort: int = 1 << 25, bases: int = 32_000_000,
         repeats: int = 3, skip_extras: bool = False):
    import jax
    import jax.numpy as jnp

    log(f"=== session33 start {time.strftime('%F %T')} ===")
    dev = jax.devices()[0]
    log(f"device: {dev}")

    # RPC floor
    one = jax.device_put(np.ones((), np.uint32))
    floor = timeit(jax.jit(lambda x: x + 1), one, repeats=6)
    log(f"rpc floor (scalar sync): {floor*1e3:.1f}ms")

    n = n_sort
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32)
    rows[:, 0] &= (1 << 24) - 1  # K=25 top-limb occupancy
    c0 = jax.device_put(rows[:, 0])
    c1 = jax.device_put(rows[:, 1])
    boundaries = np.sort(
        rng.choice(rows[:, 0], size=255, replace=False).astype(np.uint32)
    )
    bnd = jax.device_put(boundaries)
    perm = jax.device_put(
        rng.permutation(n).astype(np.uint32)
    )

    # (1) direct 2-column lexicographic sort — the baseline to beat
    @jax.jit
    def sort2(a, b):
        sa, sb = jax.lax.sort((a, b), num_keys=2)
        return sa[0] + sb[-1]

    t_sort2 = timeit(sort2, c0, c1)
    log(f"sort2 (2-key lax.sort, 2^25): {t_sort2*1e3:.1f}ms")

    # (b) permutation materialization: 1 key + iota payload
    @jax.jit
    def sortkp(a):
        idx = jnp.arange(a.shape[0], dtype=jnp.uint32)
        sa, si = jax.lax.sort((a, idx), num_keys=1)
        return sa[0] + si[-1]

    t_sortkp = timeit(sortkp, c0)
    log(f"sortkp (1-key + iota payload): {t_sortkp*1e3:.1f}ms")

    # 1 key + rows as payload (permute-in-sort; saves the later gather)
    @jax.jit
    def sortkpp(a, b):
        idx = jnp.arange(a.shape[0], dtype=jnp.uint32)
        sa, sb, si = jax.lax.sort((a, b, idx), num_keys=1)
        return sa[0] + sb[-1] + si[-1]

    t_sortkpp = timeit(sortkpp, c0, c1)
    log(f"sortkpp (1-key + 2 payload cols): {t_sortkpp*1e3:.1f}ms")

    # (c) full-row gather by a device permutation
    @jax.jit
    def gather2(a, b, p):
        return a[p][0] + b[p][-1]

    t_gather = timeit(gather2, c0, c1, perm)
    log(f"gather2 (2 cols by perm): {t_gather*1e3:.1f}ms")

    # (a) bucket-id pass: branchless binary search vs 255 boundaries
    @jax.jit
    def bucket_ids(a, bd):
        b = jnp.zeros(a.shape, jnp.uint32)
        step = jnp.uint32(128)
        for _ in range(8):
            probe = jnp.minimum(b + step, jnp.uint32(254))
            go = a >= bd[probe]
            b = jnp.where(go, probe, b)
            step = step >> 1
        return b[0] + b[-1]

    t_bucket = timeit(bucket_ids, c0, bnd)
    log(f"bucket ids (8-step bsearch vs 255 bnds): {t_bucket*1e3:.1f}ms")

    lower = t_sortkp + t_gather - 2 * floor
    lower_alt = t_sortkpp - floor
    base = t_sort2 - floor
    log(f"radix family lower bound: perm-sort+gather = "
        f"{lower*1e3:.1f}ms, permute-in-sort = {lower_alt*1e3:.1f}ms "
        f"vs direct 2-key sort {base*1e3:.1f}ms")
    verdict = ("FUTILE" if min(lower, lower_alt) >= 0.9 * base
               else "PROMISING")
    log(f"sort-family verdict: {verdict} (tile sorts + final compaction "
        f"would still be added on top of the lower bound)")

    # ---- canonical A/B (32Mbp static) ----
    import bench as B

    class Args:
        chunk = 1 << 19
        pending_cap = 1 << 21
        skip_baseline = False
        canonical = False
        headline_only = False

    Args.bases = bases
    Args.repeats = repeats
    codes = np.random.default_rng(0).integers(
        0, 4, size=Args.bases, dtype=np.uint8
    )
    log("--- static non-canonical ---")
    st = B.collect_static(Args, codes, canonical=False)
    log(f"static: {st['kmers_per_s']/1e6:.1f}M kmers/s "
        f"(vs_baseline {st['vs_baseline']:.1f}x)")
    log("--- static canonical ---")
    stc = B.collect_static(Args, codes, canonical=True)
    log(f"canonical: {stc['kmers_per_s']/1e6:.1f}M kmers/s "
        f"(vs_baseline {stc['vs_baseline']:.1f}x); "
        f"ratio canonical/plain = "
        f"{stc['kmers_per_s']/st['kmers_per_s']:.3f}")

    # ---- full extras, in-process (the TPU grant is single-tenant: no
    # bench.py subprocess while this session holds it).  Exercises every
    # program the driver's `python bench.py` will run -> warm XLA cache,
    # and logs the same numbers as committed evidence. ----
    extras = {
        "static_kmers_per_s": round(st["kmers_per_s"], 1),
        "static_vs_baseline": round(st["vs_baseline"], 3),
        "canonical_kmers_per_s": round(stc["kmers_per_s"], 1),
        "canonical_vs_baseline": round(stc["vs_baseline"], 3),
    }
    if skip_extras:
        log(f"extras skipped; === session33 end {time.strftime('%F %T')} ===")
        return
    log("--- dynamic ---")
    d = B.collect_dynamic(Args, codes)
    extras["dynamic_ops_per_s"] = round(d["ops_per_s"], 1)
    extras["dynamic_vs_local"] = round(d["vs_local"], 3)
    log("--- sharded dynamic (D=1) ---")
    s = B.collect_sharded_dynamic(Args, codes, base=d["base"])
    extras["sharded_dynamic_ops_per_s"] = round(s["ops_per_s"], 1)
    extras["sharded_dynamic_ratio"] = round(
        s["ops_per_s"] / d["ops_per_s"], 3
    )
    log("--- genome ---")
    g = B.collect_genome(Args)
    extras["genome_kmers_per_s"] = round(g["kmers_per_s"], 1)
    extras["genome_vs_baseline"] = round(g["vs_baseline"], 3)
    log("--- algebra ---")
    rows_a = B.collect_algebra(Args, codes)
    extras["algebra_ms"] = {
        k_: round(rows_a[k_] * 1e3, 1)
        for k_ in ("union", "inter", "diff", "symdiff")
    }
    extras["serde_s"] = round(rows_a["serde_s"], 3)
    log(f"extras: {json.dumps(extras)}")
    log(f"=== session33 end {time.strftime('%F %T')} ===")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sort", type=int, default=1 << 25)
    ap.add_argument("--bases", type=int, default=32_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-extras", action="store_true")
    a = ap.parse_args()
    main(a.n_sort, a.bases, a.repeats, a.skip_extras)
