"""W-table decomposition vs predict_core: the Pallas intra scan kernel
computes pred = (ref @ W[mode] + 32) >> 6 plus boundary fixups; this must
equal ops/intra_jax.predict_core (itself pinned to intra_ref/dec265) for
every (mode, log2) on random substituted borders."""
import numpy as np
import jax.numpy as jnp
import pytest

from libde265_tpu.ops.intra_wtab import wtab, predict_w, lpad
from libde265_tpu.ops.intra_jax import predict_core


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_wtab_all_modes_unfiltered(log2):
    n = 1 << log2
    L = 4 * n + 1
    rng = np.random.RandomState(100 + log2)
    ref = rng.randint(0, 256, (35, L)).astype(np.int32)
    modes = np.arange(35, dtype=np.int32)
    # smooth=False => predict_core applies NO filtering: pure mode math
    want = np.asarray(predict_core(jnp.asarray(ref), jnp.asarray(modes),
                                   log2, True, 8, False, smooth=False))
    for m in range(35):
        got = predict_w(ref[m], m, log2, luma=True)
        assert np.array_equal(got, want[m]), (log2, m)


@pytest.mark.parametrize("log2", [2, 3, 4])
def test_wtab_chroma_no_fixups(log2):
    """Chroma (luma=False): no DC/26/10 boundary fixups."""
    n = 1 << log2
    L = 4 * n + 1
    rng = np.random.RandomState(200 + log2)
    ref = rng.randint(0, 256, (35, L)).astype(np.int32)
    modes = np.arange(35, dtype=np.int32)
    want = np.asarray(predict_core(jnp.asarray(ref), jnp.asarray(modes),
                                   log2, False, 8, False, smooth=False))
    for m in range(35):
        got = predict_w(ref[m], m, log2, luma=False)
        assert np.array_equal(got, want[m]), (log2, m)


def test_wtab_10bit():
    """Weights are depth-independent; clips use maxv."""
    log2, n = 3, 8
    rng = np.random.RandomState(7)
    ref = rng.randint(0, 1024, (35, 4 * n + 1)).astype(np.int32)
    modes = np.arange(35, dtype=np.int32)
    want = np.asarray(predict_core(jnp.asarray(ref), jnp.asarray(modes),
                                   log2, True, 10, False, smooth=False))
    for m in range(35):
        got = predict_w(ref[m], m, log2, luma=True, bitdepth=10)
        assert np.array_equal(got, want[m]), m


def test_weight_bounds():
    for log2 in (2, 3, 4, 5):
        t = wtab(log2)
        assert t.min() >= 0 and t.max() <= 64
        n = 1 << log2
        Lp = lpad(log2)
        assert t.shape == (35 * Lp, n * n)
        # padded rows are zero
        for m in range(35):
            assert not t[m * Lp + 4 * n + 1:(m + 1) * Lp].any()
