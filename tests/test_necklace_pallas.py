"""Pallas necklace kernel vs the XLA reference implementation (interpret
mode on CPU; the driver/bench exercises compiled mode on real TPU)."""

import numpy as np
import pytest

from cbl_tpu import limbs, necklace
from cbl_tpu.config import get_config
from cbl_tpu.ops.necklace_pallas import necklace_pos_pallas


@pytest.mark.parametrize("k", [25, 59])
def test_pallas_matches_xla(k):
    cfg = get_config(k=k, prefix_bits=24)
    rng = np.random.default_rng(k)
    N, L = 4096, cfg.kmer_limbs
    arr = rng.integers(0, 1 << 32, size=(N, L), dtype=np.uint64).astype(np.uint32)
    arr &= limbs.width_mask(cfg.kmer_bits, L)
    want_neck, want_pos = necklace.necklace_pos(arr, cfg)
    got_neck, got_pos = necklace_pos_pallas(arr, cfg, block=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_neck), np.asarray(want_neck))
    np.testing.assert_array_equal(np.asarray(got_pos), np.asarray(want_pos))


@pytest.mark.parametrize("k", [25, 59])
def test_pallas2_matches_xla(k):
    from cbl_tpu.ops.necklace_pallas import necklace_pos_pallas2

    cfg = get_config(k=k, prefix_bits=24)
    rng = np.random.default_rng(100 + k)
    N, L = 4096, cfg.kmer_limbs
    arr = rng.integers(0, 1 << 32, size=(N, L), dtype=np.uint64).astype(np.uint32)
    arr &= limbs.width_mask(cfg.kmer_bits, L)
    want_neck, want_pos = necklace.necklace_pos(arr, cfg)
    got_neck, got_pos = necklace_pos_pallas2(arr, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_neck), np.asarray(want_neck))
    np.testing.assert_array_equal(np.asarray(got_pos), np.asarray(want_pos))
