"""Differential test: the Mosaic SAO kernel (interpret mode on CPU) +
compact planner vs the proven XLA path (plan_sao_device + sao_apply),
which is itself golden-MD5 verified on every SAO test vector."""
import numpy as np
import pytest


def _grids(rng, nctby, nctbx, S1, gh, gw):
    # picture-boundary neighbor pairs are never available (host planners
    # guarantee this; the two backends read different padding otherwise)
    pair_ok = rng.rand(4, nctby, nctbx) < 0.8
    pair_ok[0, :, 0] = False
    pair_ok[1, :, -1] = False
    pair_ok[2, 0, :] = False
    pair_ok[3, -1, :] = False
    return {
        "sao_type": rng.randint(0, 3, (nctby, nctbx, 3)).astype(np.uint8),
        "sao_eo": rng.randint(0, 4, (nctby, nctbx, 3)).astype(np.uint8),
        "sao_band": rng.randint(0, 32, (nctby, nctbx, 3)).astype(np.uint8),
        "sao_off": rng.randint(-7, 8, (nctby, nctbx, 3, 4)).astype(np.int16),
        "sidx": rng.randint(0, S1, (nctby, nctbx)).astype(np.int32),
        "sh_sao_luma": rng.randint(0, 2, S1).astype(np.int32),
        "sh_sao_chroma": rng.randint(0, 2, S1).astype(np.int32),
        "off": (rng.rand(gh, gw) < 0.05).astype(np.uint8),
        "pair_ok": pair_ok,
    }


@pytest.mark.parametrize("seed,bitdepth", [(0, 8), (1, 8), (2, 10)])
def test_sao_pallas_matches_xla(seed, bitdepth):
    import jax.numpy as jnp
    from libde265_tpu.ops.filter_plan_jax import (plan_sao_device,
                                                  plan_sao_compact)
    from libde265_tpu.ops.sao_jax import sao_apply
    from libde265_tpu.ops.pallas.sao_filter import sao_pallas
    rng = np.random.RandomState(seed)
    nctby, nctbx, S1 = 3, 5, 4
    H, W = nctby * 64, nctbx * 64
    g = {k: jnp.asarray(v)
         for k, v in _grids(rng, nctby, nctbx, S1, H // 4, W // 4).items()}
    cfg_s = (6, 1, H, W, 2, 2)
    maxv = (1 << bitdepth) - 1
    for ci in range(3):
        sub = 1 if ci == 0 else 2
        x = jnp.asarray(rng.randint(
            0, maxv + 1, (H // sub, W // sub)).astype(np.int32))
        maps = plan_sao_device(g, cfg_s, ci)
        a = np.asarray(sao_apply(x, *maps, bitdepth=bitdepth))
        mode, aux, offs = plan_sao_compact(g, cfg_s, ci)
        b = np.asarray(sao_pallas(x, mode, aux, offs, bitdepth=bitdepth,
                                  interpret=True))
        if not np.array_equal(a, b):
            bad = np.argwhere(a != b)
            raise AssertionError(
                f"plane {ci}: {len(bad)} mismatches, first at {bad[0]}: "
                f"{a[tuple(bad[0])]} vs {b[tuple(bad[0])]}")
