"""Fused in-loop filters: deblocking (V+H, luma+chroma) + SAO in ONE
compiled program per resolution.

The reference pipelines filter tasks per CTB row across a thread pool
(threads.cc / deblock.cc, sao.cc); here the whole frame's filter chain is
a single XLA program — metadata (boundary strengths, QP averages, SAO
maps) is planned on the host into dense, resolution-static tensors, so one
compilation serves every frame of a stream and the per-frame cost is one
dispatch instead of ~10 (critical over a high-latency device link).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .deblock_jax import (plan_luma_metadata, plan_chroma_metadata,
                          deblock_luma_pass, deblock_chroma_pass)
from .sao_jax import plan_sao_maps, sao_apply


@partial(jax.jit, static_argnames=("bd_y", "bd_c"))
def _filters_fused(Y, Cb, Cr, lm, cm, sao, bd_y=8, bd_c=8):
    """lm: (meta_v, meta_h) luma deblock metadata tuples or None;
    cm: (meta_v, meta_h) chroma ditto; sao: per-plane map tuples or None.
    Nones are static pytree structure -> specialized per stream config."""
    if lm is not None:
        for vertical, meta in ((True, lm[0]), (False, lm[1])):
            if meta is not None:
                Y = deblock_luma_pass(Y, *meta, vertical=vertical,
                                      bitdepth=bd_y)
    if cm is not None:
        for vertical, meta in ((True, cm[0]), (False, cm[1])):
            if meta is not None:
                act, tc, p_off, q_off = meta
                Cb = deblock_chroma_pass(Cb, act[0], tc[0], p_off, q_off,
                                         vertical=vertical, bitdepth=bd_c)
                Cr = deblock_chroma_pass(Cr, act[1], tc[1], p_off, q_off,
                                         vertical=vertical, bitdepth=bd_c)
    if sao is not None:
        planes = [Y, Cb, Cr]
        out = []
        for ci in range(3):
            if sao[ci] is None:
                out.append(planes[ci])
                continue
            t, eo, bp, offs, skip, avail = sao[ci]
            out.append(sao_apply(planes[ci], t, eo, bp, offs, skip, avail,
                                 bitdepth=bd_y if ci == 0 else bd_c))
        Y, Cb, Cr = out
    return Y, Cb, Cr


def apply_filters_fused(plan, planes):
    """Host wrapper: plans metadata, runs the single fused program,
    writes planes back in place. Returns the (possibly new) plane list."""
    shs = plan.slice_headers or []
    if not shs:
        return planes
    # any-slice gate; per-CTB slice flags are honored inside the planners
    do_deblock = any(not sh.slice_deblocking_filter_disabled_flag for sh in shs)
    do_sao = any(sh.slice_sao_luma_flag or sh.slice_sao_chroma_flag
                 for sh in shs)
    if not do_deblock and not do_sao:
        return planes
    bd_y, bd_c = plan.sps.BitDepthY, plan.sps.BitDepthC

    lm = cm = sao = None
    if do_deblock:
        metas = []
        for vertical in (True, False):
            m = plan_luma_metadata(plan, vertical)
            metas.append(tuple(jnp.asarray(a) for a in m) if m[0].size else None)
        lm = tuple(metas) if any(m is not None for m in metas) else None
        if plan.sps.ChromaArrayType:
            metas = []
            for vertical in (True, False):
                act, tc, p_off, q_off = plan_chroma_metadata(plan, vertical)
                if act.size:
                    metas.append((jnp.asarray(act), jnp.asarray(tc),
                                  jnp.asarray(p_off), jnp.asarray(q_off)))
                else:
                    metas.append(None)
            cm = tuple(metas) if any(m is not None for m in metas) else None
    if do_sao:
        maps = []
        for ci in range(3):
            m = plan_sao_maps(plan, ci)
            maps.append(tuple(jnp.asarray(a) for a in m)
                        if m is not None else None)
        sao = tuple(maps) if any(m is not None for m in maps) else None

    Y, Cb, Cr = _filters_fused(jnp.asarray(planes[0], jnp.int32),
                               jnp.asarray(planes[1], jnp.int32),
                               jnp.asarray(planes[2], jnp.int32),
                               lm, cm, sao, bd_y=bd_y, bd_c=bd_c)
    dt = planes[0].dtype
    planes[0][...] = np.asarray(Y).astype(dt)
    planes[1][...] = np.asarray(Cb).astype(dt)
    planes[2][...] = np.asarray(Cr).astype(dt)
    return planes
