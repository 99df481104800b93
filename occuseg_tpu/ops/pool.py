"""Pooling / unpooling / IO-layer scatter ops.

Replaces the reference's rulebook gather/scatter CUDA kernels
(`SCN/CUDA/{MaxPooling,AveragePooling,UnPooling,IOLayers}.cu`). Same
output-side-gather principle as `ops/conv.py`: no scatter on the forward
path except voxelization itself, which is a segment reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from occuseg_tpu.ops.gather import gather_rows


def _interpreted_shard_map(*arrays) -> bool:
    """CPU tests run pallas in interpret mode, whose HLO interpreter cannot
    typecheck block slicing under shard_map's check_vma — same workaround
    as chunk_conv's `_dechunked_conv` dispatch."""
    from occuseg_tpu.ops.pallas.chunk_conv import (
        _interpret_default, _under_shard_map,
    )
    return _interpret_default() and _under_shard_map(*arrays)


def _point_gather(vox, p2v, vox_seg, ns: int):
    """Voxel-row gather for per-point rows. ns > 1 (blocked batch layout):
    the sorted point layout is scene-major (voxel blocks are scene-major,
    point slots follow voxel blocks), so the main region decomposes into
    per-scene gathers from STATIC windows of the voxel table — an XLA row
    gather from a >100 MB multi-scene table runs ~10x slower than the same
    gather from a standalone single-scene-sized buffer that memory-space
    assignment prefetches into VMEM (PERF.md batch-4; same fix as
    chunk_conv._stage). The overflow tail (points past B*r) can reference
    any scene and takes the global gather."""
    if ns <= 1 or vox_seg is None:
        return gather_rows(vox, p2v)
    N = vox.shape[0]
    B, _, r = vox_seg.shape
    w = N // B
    scap = N // ns
    bs = scap // w                    # voxel blocks per scene
    mrs = bs * r                      # main point rows per scene
    main = B * r
    outs = []
    for s in range(ns):
        pv = jax.lax.slice_in_dim(p2v, s * mrs, (s + 1) * mrs)
        pv = jnp.where(pv >= 0, pv - s * scap, pv)
        win = jax.lax.slice_in_dim(vox, s * scap, (s + 1) * scap)
        # fusion-materialize the window (see chunk_conv._runtime_zero)
        from occuseg_tpu.ops.pallas.chunk_conv import _runtime_zero
        win = win + _runtime_zero(win.dtype)
        outs.append(gather_rows(win, pv))
    parts = [jnp.concatenate(outs, axis=0)]
    if p2v.shape[0] > main:
        parts.append(gather_rows(
            vox, jax.lax.slice_in_dim(p2v, main, p2v.shape[0])))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


@functools.lru_cache(maxsize=None)
def _make_sorted_voxelize(num_out: int, ns: int = 1):
    """Differentiable scatter-free points->voxels sum for the sorted point
    layout (ops/pallas/segsum.py). Backward is the devoxelize gather."""
    from occuseg_tpu.ops.pallas.segsum import sorted_segment_sum

    @jax.custom_vjp
    def f(x, p2v, vox_seg):
        return sorted_segment_sum(x, p2v, vox_seg, num_out)

    def fwd(x, p2v, vox_seg):
        return f(x, p2v, vox_seg), (p2v, vox_seg)

    def bwd(res, ct):
        p2v, vox_seg = res
        # x is pre-cast to f32 by the caller, so d_x is f32 too
        return _point_gather(ct, p2v, vox_seg, ns), None, None

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _make_sorted_devoxelize(num_out: int, dtype_name: str, ns: int = 1):
    """Voxels->points gather whose BACKWARD is the scatter-free blocked
    segment sum — the d_points->d_voxels scatter is the single largest
    non-conv op of the step (measured 3.4 ms as an XLA scatter)."""
    from occuseg_tpu.ops.pallas.segsum import sorted_segment_sum

    @jax.custom_vjp
    def f(vox, p2v, vox_seg):
        return _point_gather(vox, p2v, vox_seg, ns)

    def fwd(vox, p2v, vox_seg):
        return f(vox, p2v, vox_seg), (p2v, vox_seg)

    def bwd(res, ct):
        p2v, vox_seg = res
        d_vox = sorted_segment_sum(ct, p2v, vox_seg, num_out)
        return d_vox.astype(dtype_name), None, None

    f.defvjp(fwd, bwd)
    return f


def max_pool(feats: jnp.ndarray, child: jnp.ndarray) -> jnp.ndarray:
    """Max over each coarse site's children (reference `MaxPooling.cu`).
    feats [N,C], child [M,K] -> [M,C]. Sites with no children -> 0."""
    neg = jnp.finfo(feats.dtype).min
    g = gather_rows(feats, child, fill_value=neg)  # [M,K,C]
    out = jnp.max(g, axis=1)
    any_child = jnp.any(child >= 0, axis=1, keepdims=True)
    return jnp.where(any_child, out, 0)


def avg_pool(feats: jnp.ndarray, child: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid children (reference `AveragePooling.cu`)."""
    g = gather_rows(feats, child)
    cnt = jnp.sum((child >= 0).astype(feats.dtype), axis=1, keepdims=True)
    return jnp.sum(g, axis=1) / jnp.maximum(cnt, 1)


def unpool(coarse_feats: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Broadcast coarse features back to fine sites (reference
    `UnPooling.cu`); mean over the (usually single) covering coarse sites."""
    g = gather_rows(coarse_feats, up)
    cnt = jnp.sum((up >= 0).astype(coarse_feats.dtype), axis=1, keepdims=True)
    return jnp.sum(g, axis=1) / jnp.maximum(cnt, 1)


def voxelize_features(point_feats: jnp.ndarray, p2v: jnp.ndarray,
                      num_voxels_cap: int, mode: str = "mean",
                      vox_seg: jnp.ndarray = None,
                      vox_counts: jnp.ndarray = None,
                      ns: int = 1) -> jnp.ndarray:
    """Points -> voxels reduction: the InputLayer forward
    (`SCN/CUDA/IOLayers.cu` InputLayer_fp; modes per `IOLayersRules.h:10-16`:
    0 unique / 2 keep = 'first', 1 overwrite = 'last', 3 = 'sum',
    4 = 'mean'; 'max' added for completeness).

    point_feats [P,C], p2v [P] int32 (-1 = dropped/padding point).
    vox_seg/vox_counts (plan.vox_seg/.vox_counts): sorted point layout —
    sum/mean run scatter-free on the Pallas blocked kernel, and the
    point-count pass disappears (counts are plan-static host data).
    """
    if vox_seg is not None and mode in ("sum", "mean") \
            and not _interpreted_shard_map(point_feats):
        s = _make_sorted_voxelize(num_voxels_cap, ns)(
            point_feats.astype(jnp.float32), p2v, vox_seg)
        if mode == "mean":
            s = s / jnp.maximum(vox_counts[:, None], 1)
        return s.astype(point_feats.dtype)
    seg = jnp.where(p2v >= 0, p2v, num_voxels_cap).astype(jnp.int32)
    f32 = point_feats.astype(jnp.float32)
    if mode in ("first", "last"):
        # one representative point per voxel: reference modes 0/2 take the
        # first point written, mode 1 the last
        P = point_feats.shape[0]
        idx = jnp.arange(P, dtype=jnp.int32)
        reduce = jax.ops.segment_min if mode == "first" \
            else jax.ops.segment_max
        sel = reduce(idx, seg, num_segments=num_voxels_cap + 1)
        sel = sel[:num_voxels_cap]
        hit = (sel >= 0) & (sel < P)
        safe = jnp.where(hit, sel, 0)
        return jnp.where(hit[:, None], point_feats[safe], 0)
    if mode == "sum" or mode == "mean":
        s = jax.ops.segment_sum(f32, seg, num_segments=num_voxels_cap + 1)
        s = s[:num_voxels_cap]
        if mode == "mean":
            ones = jnp.ones((point_feats.shape[0], 1), jnp.float32)
            cnt = jax.ops.segment_sum(ones, seg,
                                      num_segments=num_voxels_cap + 1)
            s = s / jnp.maximum(cnt[:num_voxels_cap], 1)
        return s.astype(point_feats.dtype)
    if mode == "max":
        s = jax.ops.segment_max(f32, seg, num_segments=num_voxels_cap + 1)
        s = jnp.where(jnp.isfinite(s[:num_voxels_cap]), s[:num_voxels_cap], 0)
        return s.astype(point_feats.dtype)
    raise ValueError(f"unknown voxelize mode: {mode}")


def devoxelize_features(voxel_feats: jnp.ndarray, p2v: jnp.ndarray,
                        vox_seg: jnp.ndarray = None,
                        ns: int = 1) -> jnp.ndarray:
    """Voxels -> points gather: the OutputLayer forward
    (`ioLayers.py:66-87`; backward of InputLayer in the reference). With
    the sorted point layout (`vox_seg`), the backward scatter runs on the
    Pallas blocked segment-sum kernel. `ns` > 1: blocked batch layout,
    per-scene window gathers (`_point_gather`)."""
    if vox_seg is not None and not _interpreted_shard_map(voxel_feats):
        return _make_sorted_devoxelize(
            voxel_feats.shape[0], jnp.dtype(voxel_feats.dtype).name, ns)(
            voxel_feats, p2v, vox_seg)
    return gather_rows(voxel_feats, p2v)
