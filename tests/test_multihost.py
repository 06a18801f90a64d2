"""Multi-process (N=2 hosts x 4 CPU devices) validation of the multi-host
path (BASELINE config 5, the sandbox-testable half).

Spawns two fresh processes that join one JAX cluster over a localhost
coordinator (gloo collectives), build ONE global ShardedCBL from disjoint
per-process record slices, and verify count/query totals against a
single-device reference build.  Reference seam being generalized:
`/root/reference/src/wordset/set_ops.rs:11-76` (k-way merge of
independently built indexes)."""

from cbl_tpu.parallel.distributed import launch_multihost_dryrun


def test_two_process_build_and_query():
    launch_multihost_dryrun(n_proc=2, devices_per_proc=4, bases=60_000)
