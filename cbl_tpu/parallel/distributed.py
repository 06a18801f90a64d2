"""Multi-host (multi-process) scaffolding.

A multi-host TPU pod runs one process per host; `jax.distributed.initialize`
joins them into one global device mesh, after which ShardedCBL works
unchanged (its mesh spans all global devices and `all_to_all`/`psum` ride
ICI).  The host-side seam is input partitioning: each host parses and streams
a disjoint slice of the input records (DP read streaming, SURVEY.md §2.9) —
set semantics make insert order irrelevant, so no cross-host coordination is
needed beyond the collectives in the update step.

This sandbox has a single host, so multi-process bring-up is exercised only
as far as the helpers below; the device-level collectives are validated on
the 8-device CPU mesh (tests/test_sharding.py) and via dryrun_multichip.
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join a multi-process JAX cluster (no-op if single-process).

    On Cloud TPU pods the arguments are auto-detected; pass them explicitly
    for manual clusters."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def host_record_slice(offsets: np.ndarray, host_id: int, n_hosts: int):
    """Assign records to this host, balanced by total bases.

    offsets: [n_records+1] record boundaries of a code stream.  Returns
    (record_lo, record_hi): this host's contiguous record range.  Contiguous
    ranges keep each host's stream a single slice of the input file."""
    total = int(offsets[-1])
    lo_target = total * host_id // n_hosts
    hi_target = total * (host_id + 1) // n_hosts
    record_lo = int(np.searchsorted(offsets[:-1], lo_target, side="left"))
    record_hi = int(np.searchsorted(offsets[:-1], hi_target, side="left"))
    if host_id == n_hosts - 1:
        record_hi = len(offsets) - 1
    return record_lo, record_hi


def slice_codes(codes: np.ndarray, offsets: np.ndarray, record_lo: int,
                record_hi: int):
    """Extract one host's (codes, offsets) sub-stream."""
    lo = int(offsets[record_lo])
    hi = int(offsets[record_hi])
    sub = codes[lo:hi]
    sub_off = offsets[record_lo : record_hi + 1] - lo
    return sub, sub_off.astype(np.int64)
