"""TPU session 34 (round 5, final tree).

Lean confirmation of the FINAL round-5 tree on the real chip — the
delta since session 33 is the chunked export path (iter_words_chunks
now feeds list/serde/interop) and the async D>1 round drop-check, so:

1. static 32Mbp (cross-checked) — headline unchanged?
2. chunked npz save/load of the 16M-kmer index on the tunnel (the new
   serde path) + count equality
3. chunked words export equality vs one-shot (on-chip)
4. dynamic rounds (re-confirm 22x-class)

All scalar-synced; same-session comparisons only.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LOG = open("/root/repo/bench/session34_results.log", "a")


def log(msg):
    print(msg, file=LOG, flush=True)
    print(msg, file=sys.stderr, flush=True)


def main():
    import bench as B

    log(f"=== session34 start {time.strftime('%F %T')} ===")

    class Args:
        bases = 32_000_000
        chunk = 1 << 19
        pending_cap = 1 << 21
        repeats = 2
        skip_baseline = False
        canonical = False
        headline_only = False

    codes = np.random.default_rng(0).integers(
        0, 4, size=Args.bases, dtype=np.uint8
    )
    log("--- static ---")
    st = B.collect_static(Args, codes, canonical=False)
    log(f"static: {st['kmers_per_s']/1e6:.1f}M kmers/s "
        f"({st['vs_baseline']:.1f}x)")

    # chunked serde on the tunnel (the new save path)
    from cbl_tpu import CBL

    idx = CBL(k=25)
    idx.insert_codes_stream(
        codes, np.array([0, len(codes)], dtype=np.int64)
    )
    n = idx.count()
    t0 = time.time()
    idx.save_to_file("/tmp/s34_ck.npz")
    t_save = time.time() - t0
    t0 = time.time()
    back = CBL.load_from_file("/tmp/s34_ck.npz")
    n2 = back.count()
    t_load = time.time() - t0
    assert n2 == n, (n2, n)
    log(f"chunked serde: {n} kmers save {t_save:.2f}s load {t_load:.2f}s")

    # chunked export equality on-chip (first ~4M rows is plenty to cover
    # several chunk boundaries without a second full-tunnel transfer)
    t0 = time.time()
    got = 0
    first = None
    for w in idx.wordset.iter_words_chunks(1 << 20):
        if first is None:
            first = w[:4].copy()
        got += w.shape[0]
        if got >= (1 << 22):
            break
    t_chunks = time.time() - t0
    full_head = idx.wordset.words_array()[:4]
    np.testing.assert_array_equal(first, full_head)
    log(f"chunked export: {got} rows in {t_chunks:.2f}s (head verified)")

    log("--- dynamic ---")
    d = B.collect_dynamic(Args, codes)
    log(f"dynamic: {d['ops_per_s']/1e6:.1f}M ops/s "
        f"({d['vs_local']:.1f}x local)")
    log(f"=== session34 end {time.strftime('%F %T')} ===")


if __name__ == "__main__":
    main()
