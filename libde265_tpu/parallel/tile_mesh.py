"""Multi-chip intra-frame parallelism over a jax.sharding.Mesh.

TPU-native counterpart of the reference's tile-parallel decode
(decctx.cc:1090-1178): a frame is column-sharded across devices ("tiles are
embarrassingly parallel through reconstruction"); the loop filters need a halo
of boundary pixels from the left/right neighbor, exchanged with
lax.ppermute over ICI — replacing the reference's per-CTB progress locks
(threads.cc:86-139) with XLA's static dataflow.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.transform_jax import residual_batch


def make_tile_recon_step(mesh, H, W, tiles, n_tu, log2=4, bitdepth=8):
    """Returns a jitted sharded function:
        step(plane (H,W) int32 sharded over columns,
             coeffs (n_tu, n, n) int32 sharded over batch,
             qp (n_tu,), xs (n_tu,), ys (n_tu,)  [x local to the shard])
    -> (filtered plane, per-frame checksum) with halo exchange for the
    cross-tile deblocking columns.
    """
    n = 1 << log2
    maxv = (1 << bitdepth) - 1
    axis = "tile"

    def local_recon(plane, coeffs, qp, xs, ys):
        # 1) residuals for this shard's TUs
        res = residual_batch(coeffs, qp, log2, False, bitdepth)
        iy = ys[:, None, None] + jnp.arange(n)[None, :, None]
        ix = xs[:, None, None] + jnp.arange(n)[None, None, :]
        plane = plane.at[iy, ix].set(jnp.clip(plane[iy, ix] + res, 0, maxv))
        # 2) "vertical deblock" inside the shard: smooth every 8-aligned
        # column boundary (structural stand-in with the real filter taps)
        p0 = plane[:, 7::8]
        q0 = plane[:, 8::8] if plane.shape[1] > 8 else p0
        m = min(p0.shape[1], q0.shape[1])
        delta = jnp.clip((9 * (q0[:, :m] - p0[:, :m]) + 8) >> 4, -4, 4)
        plane = plane.at[:, 7:7 + 8 * m:8].set(
            jnp.clip(p0[:, :m] + delta, 0, maxv))
        plane = plane.at[:, 8:8 + 8 * m:8].set(
            jnp.clip(q0[:, :m] - delta, 0, maxv))
        return plane

    def neighbor_select(gathered, which):
        """gathered: (tiles, ...) from all_gather; pick row (idx+which)%tiles
        via a one-hot mask (avoids dynamic gather, which some backends
        mishandle inside shard_map)."""
        idx = jax.lax.axis_index(axis)
        want = (idx + which) % tiles
        onehot = (jnp.arange(tiles) == want).astype(gathered.dtype)
        shape = (tiles,) + (1,) * (gathered.ndim - 1)
        return (gathered * onehot.reshape(shape)).sum(0)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis), P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(None, axis), P()))
    def step(plane, coeffs, qp, xs, ys):
        plane = local_recon(plane, coeffs, qp, xs, ys)
        # 3) halo exchange over ICI: gather every tile's boundary columns
        # (narrow: H x 4 each) and take the left neighbor's right edge —
        # the TPU-native replacement for per-CTB progress locks.
        right_edge = plane[:, -1]                       # (H,)
        gathered = jax.lax.all_gather(right_edge, axis)  # (tiles, H)
        left_nb_edge = neighbor_select(gathered, -1)     # (H,)
        q0 = plane[:, 0]
        delta = jnp.clip((9 * (q0 - left_nb_edge) + 8) >> 4, -4, 4)
        idx = jax.lax.axis_index(axis)
        newq = jnp.where(idx == 0, q0, jnp.clip(q0 - delta, 0, maxv))
        plane = plane.at[:, 0].set(newq)
        # symmetric: my right edge filtered against right neighbor's left col
        left_edge_orig = q0
        gathered_l = jax.lax.all_gather(left_edge_orig, axis)
        right_nb_edge = neighbor_select(gathered_l, +1)
        p0 = plane[:, -1]
        delta2 = jnp.clip((9 * (right_nb_edge - p0) + 8) >> 4, -4, 4)
        newp = jnp.where(idx == tiles - 1, p0, jnp.clip(p0 + delta2, 0, maxv))
        plane = plane.at[:, -1].set(newp)
        # 4) frame-level stat over ICI (integrity checksum)
        checksum = jax.lax.psum(jnp.sum(plane, dtype=jnp.int64)[None], axis)
        return plane, checksum

    return jax.jit(step)


def demo_inputs(H, W, tiles, n_tu, log2=4, seed=0):
    rng = np.random.RandomState(seed)
    n = 1 << log2
    shard_w = W // tiles
    plane = rng.randint(0, 255, (H, W)).astype(np.int32)
    coeffs = rng.randint(-100, 100, (n_tu, n, n)).astype(np.int32)
    qp = np.full((n_tu,), 30, np.int32)
    # per-shard-local x coordinates
    xs = (rng.randint(0, max(1, shard_w // n), (n_tu,)) * n).astype(np.int32)
    ys = (rng.randint(0, max(1, H // n), (n_tu,)) * n).astype(np.int32)
    return plane, coeffs, qp, xs, ys
