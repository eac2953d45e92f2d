"""Differential test: tile-table MC (ops/mc_tile_jax) vs the proven dense
MC (ops/inter_dense_jax) on random motion fields, including far
out-of-range MVs (edge-clip path), bi-pred, weighted pred, and 10-bit.
The dense path is itself bit-exact vs the numpy reference on all golden
vectors, so agreement here transfers that guarantee."""
import numpy as np
import pytest


def _rand_case(seed, H, W, R, bitdepth, weighted, wild_mv):
    rng = np.random.RandomState(seed)
    maxv = (1 << bitdepth) - 1
    refs_y = rng.randint(0, maxv + 1, (R, H, W)).astype(np.int32)
    refs_cb = rng.randint(0, maxv + 1, (R, H // 2, W // 2)).astype(np.int32)
    refs_cr = rng.randint(0, maxv + 1, (R, H // 2, W // 2)).astype(np.int32)
    N = (H // 4) * (W // 4)
    lim = 1 << 14 if wild_mv else 64
    mv = rng.randint(-lim, lim, (N, 2, 2)).astype(np.int32)
    slot = rng.randint(0, R, (N, 2)).astype(np.int32)
    pf = np.zeros((N, 2), np.int32)
    pf[:, 0] = 1
    pf[:, 1] = rng.randint(0, 2, N)
    wts = np.zeros((N, 3, 5), np.int32)
    ex = np.zeros(N, bool)
    if weighted:
        ex[:] = rng.randint(0, 2, N) > 0
        denom = 6 + 14 - bitdepth
        wts[:, :, 4] = denom
        wts[:, :, 0] = rng.randint(30, 90, (N, 1))
        wts[:, :, 2] = rng.randint(30, 90, (N, 1))
        wts[:, :, 1] = rng.randint(-20, 20, (N, 1))
        wts[:, :, 3] = rng.randint(-20, 20, (N, 1))
    return refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex


@pytest.mark.parametrize("seed,bitdepth,weighted,wild_mv", [
    (0, 8, False, False),
    (1, 8, False, True),
    (2, 8, True, False),
    (3, 10, False, True),
    (4, 10, True, False),
])
def test_mc_tile_matches_dense(seed, bitdepth, weighted, wild_mv):
    import jax.numpy as jnp
    from libde265_tpu.ops.inter_dense_jax import mc_dense
    from libde265_tpu.ops.mc_tile_jax import _mc_standalone
    H, W = 64, 96
    R = 2
    refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex = _rand_case(
        seed, H, W, R, bitdepth, weighted, wild_mv)
    a = mc_dense(jnp.asarray(refs_y), jnp.asarray(refs_cb),
                 jnp.asarray(refs_cr), jnp.asarray(mv), jnp.asarray(slot),
                 jnp.asarray(pf), jnp.asarray(wts), jnp.asarray(ex), bitdepth)
    b = _mc_standalone(jnp.asarray(refs_y), jnp.asarray(refs_cb),
                       jnp.asarray(refs_cr), jnp.asarray(mv),
                       jnp.asarray(slot), jnp.asarray(pf), jnp.asarray(wts),
                       jnp.asarray(ex), (H, W), bitdepth)
    for ci in range(3):
        aa, bb = np.asarray(a[ci]), np.asarray(b[ci])
        assert aa.shape == bb.shape
        if not np.array_equal(aa, bb):
            bad = np.argwhere(aa != bb)
            raise AssertionError(
                f"plane {ci}: {len(bad)} mismatches, first at {bad[0]} "
                f"{aa[tuple(bad[0])]} vs {bb[tuple(bad[0])]}")


@pytest.mark.parametrize("seed,bitdepth", [(0, 8), (1, 10)])
def test_mc_pallas_filter_matches_xla(seed, bitdepth):
    """The pallas tap-filter kernel (interpret mode on CPU) must agree
    bit-for-bit with the XLA tap passes, incl. bi-pred and 10-bit."""
    import jax.numpy as jnp
    from libde265_tpu.ops.mc_tile_jax import build_tables, mc_frame_tile
    refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex = _rand_case(
        seed, 64, 128, 4, bitdepth, False, True)
    tabs = build_tables(jnp.asarray(refs_y), jnp.asarray(refs_cb),
                        jnp.asarray(refs_cr), bitdepth=bitdepth)
    args = (tabs, (64, 128), jnp.asarray(mv), jnp.asarray(slot),
            jnp.asarray(pf), jnp.asarray(wts), jnp.asarray(ex), bitdepth)
    a = mc_frame_tile(*args, use_pallas=False)
    b = mc_frame_tile(*args, use_pallas=True)
    for ci in range(3):
        assert (np.asarray(a[ci]) == np.asarray(b[ci])).all(), ci


@pytest.mark.parametrize("seed,bitdepth,weighted", [
    (0, 8, False), (1, 8, True), (2, 10, False),
])
def test_mc_mxu_matches_vpu(seed, bitdepth, weighted):
    """The class-sorted MXU luma MC (ops/mc_mxu_jax) must agree
    bit-for-bit with the VPU tap passes, incl. wild MVs (edge clamp),
    bi-pred, weighted pred, 10-bit, and per-stream class capacities."""
    import jax.numpy as jnp
    from libde265_tpu.ops.mc_tile_jax import build_tables, mc_frame_tile
    from libde265_tpu.ops.mc_mxu_jax import (caps_from_counts,
                                             luma_class_counts)
    H, W = 64, 128
    refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex = _rand_case(
        seed, H, W, 4, bitdepth, weighted, True)
    N = mv.shape[0]
    # replicate the device's lane-0 swap for the capacity analysis
    swap = (pf[:, 0] == 0)[:, None]
    l0 = np.where(swap, mv[:, 1, :], mv[:, 0, :])
    hmax = np.zeros(16, np.int64)
    vmax = np.zeros(16, np.int64)
    for lane_mv in (l0, mv[:, 1, :]):
        hc, vc = luma_class_counts(lane_mv.astype(np.int64), H, W)
        hmax = np.maximum(hmax, hc)
        vmax = np.maximum(vmax, vc)
    caps = caps_from_counts(hmax, vmax)
    tabs = build_tables(jnp.asarray(refs_y), jnp.asarray(refs_cb),
                        jnp.asarray(refs_cr), bitdepth=bitdepth)
    args = (tabs, (H, W), jnp.asarray(mv), jnp.asarray(slot),
            jnp.asarray(pf), jnp.asarray(wts), jnp.asarray(ex), bitdepth)
    a = mc_frame_tile(*args)
    b = mc_frame_tile(*args, mc_caps=caps)
    for ci in range(3):
        aa, bb = np.asarray(a[ci]), np.asarray(b[ci])
        if not np.array_equal(aa, bb):
            bad = np.argwhere(aa != bb)
            raise AssertionError(
                f"plane {ci}: {len(bad)} mismatches, first at {bad[0]} "
                f"{aa[tuple(bad[0])]} vs {bb[tuple(bad[0])]}")


@pytest.mark.parametrize("mode", ["const", "hconst", "vconst"])
def test_mc_mxu_single_class_shortcuts(mode):
    """Constant-phase streams take the sort-free MXU shortcuts; they
    must stay bit-exact vs the VPU path."""
    import jax.numpy as jnp
    from libde265_tpu.ops.mc_tile_jax import build_tables, mc_frame_tile
    from libde265_tpu.ops.mc_mxu_jax import (caps_from_counts,
                                             luma_class_counts)
    H, W = 64, 128
    refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex = _rand_case(
        5, H, W, 2, 8, False, False)
    if mode == "const":
        mv[:, :, 0] = -21          # one global qpel MV
        mv[:, :, 1] = 13
    elif mode == "hconst":
        mv[:, :, 0] = 8            # constant full-pel x -> single h-class
    else:
        mv[:, :, 1] = -12          # constant full-pel y -> single v-class
    hmax = np.zeros(16, np.int64)
    vmax = np.zeros(16, np.int64)
    for lane_mv in (mv[:, 0, :], mv[:, 1, :]):
        hc, vc = luma_class_counts(lane_mv.astype(np.int64), H, W)
        hmax = np.maximum(hmax, hc)
        vmax = np.maximum(vmax, vc)
    caps = caps_from_counts(hmax, vmax)
    if mode == "const":
        assert sum(1 for c in caps[0] if c) == 1
        assert sum(1 for c in caps[1] if c) == 1
    tabs = build_tables(jnp.asarray(refs_y), jnp.asarray(refs_cb),
                        jnp.asarray(refs_cr), bitdepth=8)
    args = (tabs, (H, W), jnp.asarray(mv), jnp.asarray(slot),
            jnp.asarray(pf), jnp.asarray(wts), jnp.asarray(ex), 8)
    a = mc_frame_tile(*args)
    b = mc_frame_tile(*args, mc_caps=caps)
    for ci in range(3):
        assert (np.asarray(a[ci]) == np.asarray(b[ci])).all(), ci


@pytest.mark.parametrize("T,dt", [(16, "uint8"), (8, "uint8"), (16, "int16")])
def test_pallas_table_builder_matches_xla(T, dt):
    """The Mosaic tile-table builder (interpret mode on CPU) must emit
    exactly the XLA builder's layout for both tile sides and dtypes,
    including the multi-band-per-step batching."""
    import jax.numpy as jnp
    from libde265_tpu.ops.mc_tile_jax import (build_tile_table_y,
                                              build_tile_table_c)
    from libde265_tpu.ops.pallas.mc_tables import build_tile_table_pallas
    rng = np.random.RandomState(3)
    H, W = (72, 136)
    pad = 16 if T == 16 else 8
    padded = jnp.asarray(rng.randint(
        0, 256, (2, H + 2 * pad, W + 2 * pad)).astype(np.int16))
    ref_fn = build_tile_table_y if T == 16 else build_tile_table_c
    want = np.asarray(ref_fn(padded, getattr(jnp, dt)))
    got = np.asarray(build_tile_table_pallas(
        padded, T, out_dtype=getattr(jnp, dt), interpret=True))
    assert got.shape == want.shape
    # ROWPAD layout-padding rows are don't-care (zeros in XLA, roll
    # residue in pallas — never gathered); compare the valid rows
    from libde265_tpu.ops.mc_tile_jax import ROWPAD
    Hp, Wp = padded.shape[1:]
    nty = (Hp - 12) // 4 if T == 16 else (Hp - 4) // 4
    ntx = (Wp - 12) // 4 if T == 16 else (Wp - 4) // 4
    nty_p = -(-nty // ROWPAD) * ROWPAD
    wv = want.reshape(2, nty_p, ntx, T * T)[:, :nty]
    gv = got.reshape(2, nty_p, ntx, T * T)[:, :nty]
    assert (gv == wv).all()


@pytest.mark.parametrize("seed,bitdepth,weighted", [
    (0, 8, False), (1, 8, True), (2, 10, False), (3, 8, False),
])
def test_mc_chroma_mxu_matches_vpu(seed, bitdepth, weighted):
    """The paired Cb|Cr class-sorted MXU chroma MC (ops/mc_mxu_jax
    .mc_chroma_mxu) must agree bit-for-bit with the VPU epel passes,
    incl. wild MVs (edge clamp), bi-pred, weighted pred, 10-bit."""
    import jax.numpy as jnp
    from libde265_tpu.ops.mc_tile_jax import build_tables, mc_frame_tile
    from libde265_tpu.ops.mc_mxu_jax import (caps_from_counts,
                                             chroma_class_counts, NCLS_C)
    H, W = 64, 128
    refs_y, refs_cb, refs_cr, mv, slot, pf, wts, ex = _rand_case(
        seed, H, W, 4, bitdepth, weighted, True)
    swap = (pf[:, 0] == 0)[:, None]
    l0 = np.where(swap, mv[:, 1, :], mv[:, 0, :])
    hmax = np.zeros(NCLS_C, np.int64)
    vmax = np.zeros(NCLS_C, np.int64)
    for lane_mv in (l0, mv[:, 1, :]):
        hc, vc = chroma_class_counts(lane_mv.astype(np.int64), H, W)
        hmax = np.maximum(hmax, hc)
        vmax = np.maximum(vmax, vc)
    caps_c = caps_from_counts(hmax, vmax)
    tabs = build_tables(jnp.asarray(refs_y), jnp.asarray(refs_cb),
                        jnp.asarray(refs_cr), bitdepth=bitdepth)
    args = (tabs, (H, W), jnp.asarray(mv), jnp.asarray(slot),
            jnp.asarray(pf), jnp.asarray(wts), jnp.asarray(ex), bitdepth)
    a = mc_frame_tile(*args)
    b = mc_frame_tile(*args, mc_caps_c=caps_c)
    for ci in range(3):
        aa, bb = np.asarray(a[ci]), np.asarray(b[ci])
        if not np.array_equal(aa, bb):
            bad = np.argwhere(aa != bb)
            raise AssertionError(
                f"plane {ci}: {len(bad)} mismatches, first at {bad[0]} "
                f"{aa[tuple(bad[0])]} vs {bb[tuple(bad[0])]}")


def test_inplace_table_update_matches_build_dus():
    """update_tile_table_pallas (scalar-prefetch slot + in/out aliasing)
    must equal XLA build + dynamic_update_slice on the valid rows, for
    luma and both halves of the interleaved chroma table, and must leave
    the other slots untouched."""
    import jax
    import jax.numpy as jnp
    from libde265_tpu.ops.mc_tile_jax import (build_tables, PAD_Y, PAD_C,
                                              n_tiles_y, n_tiles_c)
    from libde265_tpu.ops.pallas.mc_tables import update_tile_table_pallas
    rng = np.random.RandomState(7)
    H, W = 72, 136
    NS = 4
    Y = rng.randint(0, 256, (H, W)).astype(np.int16)
    Cb = rng.randint(0, 256, (H // 2, W // 2)).astype(np.int16)
    Cr = rng.randint(0, 256, (H // 2, W // 2)).astype(np.int16)
    ny, nc = build_tables(jnp.asarray(Y)[None], jnp.asarray(Cb)[None],
                          jnp.asarray(Cr)[None], bitdepth=8)
    ry, rc = ny.shape[0], nc.shape[0]
    ty = jnp.zeros((NS * ry, 256), jnp.uint8)
    tc = jnp.zeros((NS * rc, 128), jnp.uint8)
    slot = 2
    want_y = jax.lax.dynamic_update_slice(ty, ny, (slot * ry, 0))
    want_c = jax.lax.dynamic_update_slice(tc, nc, (slot * rc, 0))
    py = jnp.pad(jnp.asarray(Y), ((PAD_Y,) * 2,) * 2, mode="edge")
    pcb = jnp.pad(jnp.asarray(Cb), ((PAD_C,) * 2,) * 2, mode="edge")
    pcr = jnp.pad(jnp.asarray(Cr), ((PAD_C,) * 2,) * 2, mode="edge")
    got_y = update_tile_table_pallas(ty, py[None], np.int32(slot), 16,
                                     interpret=True)
    got_c = update_tile_table_pallas(tc, jnp.stack([pcb, pcr]),
                                     np.int32(slot), 8, interpret=True)
    ntyp, ntx = n_tiles_y(H, W)
    ntyc, ntxc = n_tiles_c(H // 2, W // 2)
    nty_true = (H + 20) // 4
    ntyc_true = (H // 2 + 12) // 4
    gy = np.asarray(got_y).reshape(NS, ntyp, ntx, 256)
    wy = np.asarray(want_y).reshape(NS, ntyp, ntx, 256)
    gc = np.asarray(got_c).reshape(NS, ntyc, ntxc, 128)
    wc = np.asarray(want_c).reshape(NS, ntyc, ntxc, 128)
    assert (gy[:, :nty_true] == wy[:, :nty_true]).all()
    assert (gc[:, :ntyc_true] == wc[:, :ntyc_true]).all()
