#!/usr/bin/env python
"""TPU session 28: genome-mode solo-dispatch attribution (the 0.435s
breakdown: necklace+blank, +sort, adopt/merge, query words, query join,
count scan).  Each probe ends in ONE scalar sync (~28ms RPC included —
subtract it).  Identifies the ~90ms not explained by the two lax.sorts
(290ms) + merge (40ms) + pipelines (10ms)."""
import gc, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); os.chdir(REPO)
import numpy as np
LOG = open(os.path.join(REPO, "bench", "session28_results.log"), "a", buffering=1)
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"; print(line, flush=True); LOG.write(line + "\n")
def main():
    import jax
    import jax.numpy as jnp
    import bench
    from cbl_tpu import CBL
    from cbl_tpu.cbl import (_fused_build_fn, _fused_query_fn,
                             _fused_words_fn, _fused_words_sorted_fn)
    from cbl_tpu.wordset import (_count_hits_merge_kernel,
                                 _count_hits_merge_sorted_kernel)
    log(f"=== session28 start; devices: {jax.devices()} ===")
    ci, oi, cq, oq = bench.make_genome_corpus(32_000_000)
    idx = CBL(k=25, chunk_size=1 << 19, pending_cap=1 << 21)
    psi = idx.pack_stream(ci, oi)
    psq = idx.pack_stream(cq, oq)
    jax.block_until_ready([s[1] for s in psi.slabs] + [s[1] for s in psq.slabs])
    nk_i, st_i, s_i, e_i, _ = psi.slabs[0]
    nk_q, st_q, s_q, e_q, _ = psq.slabs[0]
    log(f"slabs: insert nk_pad={nk_i} ({len(psi.slabs)}), "
        f"query nk_pad={nk_q} ({len(psq.slabs)})")

    def probe(name, fn, reps=3):
        fn()  # compile + warm
        jax.block_until_ready([])
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            jax.device_get(out)
            ts.append(time.time() - t0)
        log(f"{name}: {min(ts)*1e3:.1f}ms (incl ~28ms RPC)")
        return min(ts)

    fw = _fused_words_fn(idx.cfg, False, nk_i)
    probe("A insert words (extract+necklace+pack+blank)",
          lambda: fw(st_i, s_i, e_i)[1])
    fws = _fused_words_sorted_fn(idx.cfg, False, nk_i)
    probe("B insert words SORTED (A + lax.sort)",
          lambda: fws(st_i, s_i, e_i)[1])
    fb = _fused_build_fn(idx.cfg, False, nk_i)
    probe("C fused build (B + distinct count)",
          lambda: fb(st_i, s_i, e_i)[1])
    # materialize the index like the bench does
    data, n_dev, _ = fb(st_i, s_i, e_i)
    idx.wordset.adopt_built(data + jnp.uint32(0), n_dev, psi.slabs[0][4])
    probe("D count_device (adjacency scan on dup array)",
          lambda: idx.wordset.count_device())
    fqw = _fused_words_fn(idx.cfg, False, nk_q)
    probe("E query words only", lambda: fqw(st_q, s_q, e_q)[1])
    live = idx.wordset._live()
    fq = _fused_query_fn(idx.cfg, False, nk_q, False)
    probe("F fused query (E + sort + merge-join + count)",
          lambda: fq(st_q, s_q, e_q, live)[1])
    wq, _ = fqw(st_q, s_q, e_q)
    jax.device_get(wq[0, 0])
    probe("G join only, unsorted queries (sort+merge+count)",
          lambda: _count_hits_merge_kernel(live, wq)[1])
    wqs, _ = _fused_words_sorted_fn(idx.cfg, False, nk_q)(st_q, s_q, e_q)
    jax.device_get(wqs[0, 0])
    probe("H join only, PRE-SORTED queries (merge+count)",
          lambda: _count_hits_merge_sorted_kernel(live, wqs)[1])
    log("=== session28 done ===")
if __name__ == "__main__":
    main()
