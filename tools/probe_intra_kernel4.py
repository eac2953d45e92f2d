#!/usr/bin/env python3
"""Bisect the P34 banded-grid failure: alias / halo / RMW in isolation."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, ok, note=""):
    print(f"{'OK  ' if ok else 'FAIL'} {name} {note}", flush=True)


NB, K, BH, W = 4, 3, 16, 256


def _mk(S, use_alias, use_halo):
    def kern(s_ref, x_ref, o_ref, halo):
        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[...] = x_ref[...]

        t = i * K + j
        yin = s_ref[t, 0]
        val = s_ref[t, 1]
        en = s_ref[t, 2]
        if use_halo:
            h = halo[pl.ds(0, 1), :]
        else:
            h = jnp.zeros((1, W), jnp.int32)

        @pl.when(en != 0)
        def _():
            o_ref[pl.ds(yin, 1), :] = (o_ref[pl.ds(yin, 1), :]
                                       + val + h * (i > 0))

        @pl.when(j == K - 1)
        def _():
            halo[pl.ds(0, 1), :] = o_ref[pl.ds(BH - 1, 1), :]

    kwargs = dict(
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NB, K),
            in_specs=[pl.BlockSpec((BH, W), lambda i, j, s: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BH, W), lambda i, j, s: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, W), jnp.int32)]),
        out_shape=jax.ShapeDtypeStruct((NB * BH, W), jnp.int32))
    if use_alias:
        kwargs["input_output_aliases"] = {1: 0}
    return pl.pallas_call(kern, **kwargs)


def model(x, S, use_halo):
    want = x.astype(np.int64).copy()
    halo = np.zeros(W, np.int64)
    for i in range(NB):
        for j in range(K):
            t = i * K + j
            yin, val, en = S[t, 0], S[t, 1], S[t, 2]
            if en:
                want[i * BH + yin] += val + \
                    (halo if (use_halo and i > 0) else 0)
        halo = want[i * BH + BH - 1].copy()
    return want


def run(name, use_alias, use_halo, seed=6):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 100, (NB * BH, W)).astype(np.int32)
    S = np.zeros((NB * K, 8), np.int32)
    for t in range(NB * K):
        S[t] = [rng.randint(0, BH), rng.randint(1, 50),
                int(t % 3 != 2)] + [0] * 5
    try:
        y = np.asarray(_mk(S, use_alias, use_halo)(jnp.asarray(S), x))
    except Exception as e:
        report(name, False, f"EXC {type(e).__name__}: {str(e)[:200]}")
        return
    want = model(x, S, use_halo)
    ok = np.array_equal(y.astype(np.int64), want)
    if not ok:
        bad = np.argwhere(y.astype(np.int64) != want)
        rows = sorted(set(bad[:, 0].tolist()))
        d = (y.astype(np.int64) - want)
        report(name, False,
               f"bad rows {rows[:8]} deltas "
               f"{[int(d[r, bad[bad[:,0]==r][0][1]]) for r in rows[:8]]}")
    else:
        report(name, True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["a", "b", "c", "d"]
    print(f"backend: {jax.default_backend()}", flush=True)
    if "a" in which:
        run("P34a no-alias no-halo", False, False)
    if "b" in which:
        run("P34b alias no-halo", True, False)
    if "c" in which:
        run("P34c no-alias halo", False, True)
    if "d" in which:
        run("P34d alias halo", True, True)
