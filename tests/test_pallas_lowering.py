"""Mosaic compile-check for every Pallas kernel (VERDICT r2 item 7).

interpret=True tests validate semantics but skip the Mosaic TPU lowering
entirely, so kernel/layout API drift only surfaced on real hardware.
jax.export cross-platform lowering runs the FULL Mosaic pass (kernel ->
serialized TPU custom call) from the CPU test environment, so any
signature mismatch, unsupported op, or layout violation fails CI here.
"""
import functools
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _lower_tpu(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0
    return exp


def test_mosaic_lowering_build_tile_table_luma():
    from libde265_tpu.ops.pallas.mc_tables import build_tile_table_pallas
    f = functools.partial(build_tile_table_pallas, T=16,
                          out_dtype=jnp.uint8)
    _lower_tpu(f, jnp.zeros((2, 104, 168), jnp.int16))


def test_mosaic_lowering_build_tile_table_chroma():
    from libde265_tpu.ops.pallas.mc_tables import build_tile_table_pallas
    f = functools.partial(build_tile_table_pallas, T=8,
                          out_dtype=jnp.uint8)
    _lower_tpu(f, jnp.zeros((2, 52, 84), jnp.int16))


def test_mosaic_lowering_update_tile_table():
    """The round-2 snapshot shipped exactly this call with a stale
    signature; a trace through the real lowering now guards it."""
    from libde265_tpu.ops.pallas.mc_tables import update_tile_table_pallas
    from libde265_tpu.ops.mc_tile_jax import n_tiles_y, n_tiles_c
    H, W = 72, 136
    ry = int(np.prod(n_tiles_y(H, W)))
    rc = int(np.prod(n_tiles_c(H // 2, W // 2)))
    ty = jnp.zeros((4 * ry, 256), jnp.uint8)
    tc = jnp.zeros((4 * rc, 128), jnp.uint8)
    py = jnp.zeros((1, H + 32, W + 32), jnp.int16)
    pc = jnp.zeros((2, H // 2 + 16, W // 2 + 16), jnp.int16)

    def f(ty, tc, py, pc, slot):
        ty = update_tile_table_pallas(ty, py, slot, 16)
        tc = update_tile_table_pallas(tc, pc, slot, 8)
        return ty, tc

    _lower_tpu(f, ty, tc, py, pc, jnp.int32(1))


def test_mosaic_lowering_sao():
    from libde265_tpu.ops.pallas.sao_filter import sao_pallas
    H, W = 72, 136
    f = functools.partial(sao_pallas, bitdepth=8)
    _lower_tpu(f, jnp.zeros((H, W), jnp.int32),
               jnp.zeros((H, W), jnp.int8), jnp.zeros((H, W), jnp.int8),
               jnp.zeros((4, H, W), jnp.int8))


def test_mosaic_lowering_mc_taps():
    from libde265_tpu.ops.pallas.mc_filter import mc_taps_pallas, BLK
    f = functools.partial(mc_taps_pallas, T=16, U=11, TMP=80, OUT=64,
                          shift1=0)
    _lower_tpu(f, jnp.zeros((BLK, 256), jnp.uint8),
               jnp.zeros((BLK, 32), jnp.int8))


def test_mosaic_lowering_intra_scan_luma():
    """Serial band-scan intra kernel (both shapes of the round-3 perf
    work): full Mosaic lowering from the CPU env."""
    from libde265_tpu.ops.pallas.intra_scan import build_scan
    BH, C, NB, K, RW = 64, 2, 2, 8, 256
    scan = build_scan((3, 4), BH, C, NB, K, 1, 8, True, True, RW)

    def f(scal, sp, rg, av, res, plane):
        return scan(scal, sp, [rg], av, [res], [plane])

    _lower_tpu(f,
               jnp.zeros((NB * K,), jnp.int32),
               jnp.zeros((NB * K,), jnp.int32),
               jnp.zeros((NB * K,), jnp.int32),
               jnp.zeros((64, 256), jnp.int32),
               jnp.zeros((64, RW), jnp.int32),
               jnp.zeros((NB * BH, C, 128), jnp.int32))


def test_mosaic_lowering_intra_scan_chroma():
    from libde265_tpu.ops.pallas.intra_scan import build_scan
    BH, C, NB, K, RW = 32, 2, 2, 8, 256
    scan = build_scan((2, 3), BH, C, NB, K, 2, 8, False, False, RW)

    def f(scal, sp, rg0, rg1, av, res, pcb, pcr):
        return scan(scal, sp, [rg0, rg1], av, [res, res], [pcb, pcr])

    z = jnp.zeros((NB * K,), jnp.int32)
    _lower_tpu(f, z, z, z, z,
               jnp.zeros((64, 256), jnp.int32),
               jnp.zeros((64, RW), jnp.int32),
               jnp.zeros((NB * BH, C, 128), jnp.int32),
               jnp.zeros((NB * BH, C, 128), jnp.int32))
