#!/usr/bin/env python
"""TPU session 15: merge-path kernels, attempt 2 (rev-free reversal).

Session 14 found two Mosaic lowering blockers (lax.rev unimplemented;
uint32<->float32 casts); both fixed (XOR-swap reversal, int32 bounce).
This session re-runs: correctness on chip -> sort/merge microbench with
tile sweep -> e2e static/dynamic/genome under xla vs mergepath.

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

LOG = open(os.path.join(REPO, "bench", "session15_results.log"), "a",
           buffering=1)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    LOG.write(line + "\n")


import importlib.util

_spec = importlib.util.spec_from_file_location(
    "tpu_session14", os.path.join(REPO, "bench", "tpu_session14.py")
)
s14 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(s14)
s14.log = log  # route everything into session15's log


def e2e_genome():
    import jax

    import bench

    bases = 32_000_000
    ci, oi, cq, oq = bench.make_genome_corpus(bases)
    base = bench.run_baseline_records(ci, oi, cq, oq)
    log(f"6 baseline.cpp genome: {base}")
    nk = base["n_kmers_insert"] + base["n_kmers_query"]
    base_comb = nk / (base["insert_s"] + base["query_s"])
    for mode in ("xla", "mergepath"):
        os.environ["CBL_TPU_SORT"] = mode
        os.environ["CBL_TPU_MERGE_KERNEL"] = mode
        jax.clear_caches()
        gc.collect()
        try:
            ours = bench.run_tpu_records(ci, oi, cq, oq, 1 << 19, 1 << 21, 2)
            assert ours["distinct"] == base["distinct"]
            assert ours["positive"] == base["positive"]
            comb = nk / (ours["insert_s"] + ours["query_s"])
            log(f"6 e2e genome 32Mbp mode={mode}: ins {ours['insert_s']:.3f}s"
                f" qry {ours['query_s']:.3f}s combined {comb/1e6:.1f}M/s "
                f"vs_local {comb/base_comb:.2f}x")
        except Exception as e:
            log(f"6 e2e genome mode={mode} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
    os.environ.pop("CBL_TPU_SORT", None)
    os.environ.pop("CBL_TPU_MERGE_KERNEL", None)


def main():
    import jax

    t_start = time.time()
    log(f"=== session15 start; devices: {jax.devices()} ===")
    ok = s14.correctness()
    if not ok and os.environ.get("CBL_TPU_DYNROLL", "roll") == "roll":
        log("=== retrying correctness with CBL_TPU_DYNROLL=matmul ===")
        os.environ["CBL_TPU_DYNROLL"] = "matmul"
        jax.clear_caches()
        ok = s14.correctness()
    if ok:
        s14.micro_sort()
        s14.micro_merge()
        s14.e2e()
        e2e_genome()
    else:
        log("=== kernels still incorrect on-chip; ran nothing else ===")
    log(f"=== session15 done in {(time.time()-t_start)/60:.1f} min ===")


if __name__ == "__main__":
    main()
