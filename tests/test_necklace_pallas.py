"""Pallas necklace kernel parity vs the XLA chain (interpret mode on CPU).

The TPU-compiled kernel is exercised on-chip by every fused-path bench run
(necklace_pos_auto dispatches to it on TPU backends)."""

import numpy as np
import pytest

from cbl_tpu import limbs
from cbl_tpu.config import get_config
from cbl_tpu.necklace import necklace_pos
from cbl_tpu.ops.necklace_pallas import necklace_pos_pallas


@pytest.mark.parametrize("k", [25, 59])
def test_pallas_matches_xla(k):
    cfg = get_config(k=k, prefix_bits=24 if k == 25 else 28)
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(0, 1 << 30)) | (int(rng.integers(0, 1 << 30))
            << (cfg.kmer_bits - 30)) for _ in range(1024)]
    arr = limbs.from_py_ints(vals, cfg.kmer_limbs)
    want_neck, want_pos = necklace_pos(arr, cfg)
    got_neck, got_pos = necklace_pos_pallas(arr, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_neck), np.asarray(want_neck))
    np.testing.assert_array_equal(np.asarray(got_pos), np.asarray(want_pos))
