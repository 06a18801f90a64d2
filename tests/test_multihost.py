"""Multi-process (N=2 hosts x 4 CPU devices) validation of the multi-host
path (BASELINE config 5, the sandbox-testable half).

Spawns two fresh processes that join one JAX cluster over a localhost
coordinator (gloo collectives), build ONE global ShardedCBL from disjoint
per-process record slices, and verify count/query totals against a
single-device reference build.  Reference seam being generalized:
`/root/reference/src/wordset/set_ops.rs:11-76` (k-way merge of
independently built indexes)."""

import numpy as np

from cbl_tpu.parallel.distributed import launch_multihost_dryrun


def test_two_process_build_and_query():
    launch_multihost_dryrun(n_proc=2, devices_per_proc=4, bases=60_000)


def test_multihost_pack_stream_many_short_records():
    """A stream with MORE records than local devices must stage into one
    group without hanging (the slab count is ceil(nk/nk_sub) — slabs
    cover the stream contiguously, records live in blank intervals) and
    with an interval cap that fits the record density; the staged round
    matches the single-device oracle."""
    import jax

    from cbl_tpu import CBL
    from cbl_tpu.parallel import ShardedCBL, make_mesh
    from cbl_tpu.parallel.distributed import (
        multihost_dynamic_round,
        multihost_pack_stream,
    )

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(21)
    n_rec, rl = 300, 60
    codes = rng.integers(0, 4, size=n_rec * rl, dtype=np.uint8)
    offs = np.arange(0, n_rec * rl + 1, rl, dtype=np.int64)
    idx = ShardedCBL(k=25, mesh=mesh)
    st = multihost_pack_stream(idx, codes, offs)
    assert len(st.groups) == 1
    t, p = multihost_dynamic_round(idx, st, st, st)
    single = CBL(k=25)
    t2, p2 = single.dynamic_round(
        (codes, offs), (codes, offs), (codes, offs)
    )
    assert (t, p) == (t2, p2)
    idx._fold_slog()
    assert idx.count() == single.count() == 0  # everything removed
