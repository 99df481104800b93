"""Supervoxel (region) feature aggregation — device-side segment reductions.

Replaces the reference's CPU/GPU-mixed per-scene aggregation
(`evaluate_instance.py:119-133` gaussian_weighted_region_mean and the
region-stat block at `:485-535`): per-region gaussian-weighted means of
embedding / pose-embedding / bandwidth, max offset, point counts, majority
semantic class, and mean occupancy. Regions are padded to a static R_cap.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RegionFeatures(NamedTuple):
    embedding: jnp.ndarray      # [R, E] gaussian-weighted mean embedding
    pose_embedding: jnp.ndarray  # [R, 3] gw-mean of (xyz - displacement)
    bw: jnp.ndarray             # [R, 2] gw-mean bandwidths
    offset: jnp.ndarray         # [R] max centredness
    count: jnp.ndarray          # [R] point count
    semantic: jnp.ndarray       # [R] majority predicted class
    occupancy: jnp.ndarray      # [R] mean log-occupancy
    center: jnp.ndarray         # [R, 3] mean xyz
    valid: jnp.ndarray          # [R] bool


def _gw_region_mean(values: jnp.ndarray, region: jnp.ndarray, r_cap: int
                    ) -> jnp.ndarray:
    """Gaussian-weighted per-region mean (reference
    `evaluate_instance.py:119-133`): weight_p = exp(-(||v_p - mean_r|| /
    ||std_r||)^2), then weighted mean."""
    v = values.astype(jnp.float32)
    num = r_cap + 1
    mean = jax.ops.segment_sum(v, region, num_segments=num)
    cnt = jax.ops.segment_sum(jnp.ones(v.shape[:1], jnp.float32), region,
                              num_segments=num)
    mean = mean / jnp.maximum(cnt[:, None], 1)
    centered = v - mean[region]
    var = jax.ops.segment_sum(centered * centered, region, num_segments=num)
    # unbiased per-dim std, as torch_scatter scatter_std
    std = jnp.sqrt(var / jnp.maximum(cnt[:, None] - 1, 1))
    std_norm = jnp.sqrt(jnp.sum((std + 1e-8) ** 2, axis=1))
    # NB: no epsilon inside this sqrt — for a region of identical values
    # (e.g. pose-embedding with perfect displacement) d must be EXACTLY 0 so
    # the weight is 1, matching the reference (d=0, std~1e-8 -> exp(0)=1).
    d = jnp.sqrt(jnp.sum(centered * centered, axis=1))
    w = jnp.exp(-((d / jnp.maximum(std_norm[region], 1e-12)) ** 2))
    wsum = jax.ops.segment_sum(w, region, num_segments=num)
    wmean = jax.ops.segment_sum(v * w[:, None], region, num_segments=num)
    gw = wmean / jnp.maximum(wsum[:, None], 1e-12)
    # degenerate fallback: if all weights underflowed, use the plain mean
    return jnp.where((wsum[:, None] > 1e-12), gw, mean)[:r_cap]


def aggregate_regions(embedding: jnp.ndarray, displacement: jnp.ndarray,
                      xyz: jnp.ndarray, bw: jnp.ndarray,
                      offset: jnp.ndarray, semantic_pred: jnp.ndarray,
                      occupancy: jnp.ndarray, region: jnp.ndarray,
                      r_cap: int, num_classes: int = 20) -> RegionFeatures:
    """region: [P] int32 supervoxel id per point (-1 = padding point)."""
    seg = jnp.where(region >= 0, region, r_cap).astype(jnp.int32)
    num = r_cap + 1
    ones = (region >= 0).astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=num)[:r_cap]

    emb_r = _gw_region_mean(embedding, seg, r_cap)
    pose_emb_r = _gw_region_mean(xyz - displacement, seg, r_cap)
    bw_r = _gw_region_mean(bw, seg, r_cap)

    off_r = jax.ops.segment_max(
        jnp.where(region >= 0, offset.reshape(-1), -jnp.inf), seg,
        num_segments=num)[:r_cap]
    off_r = jnp.where(cnt > 0, off_r, 0.0)

    # majority class via one-hot histogram (stats.mode analog)
    onehot = jax.nn.one_hot(jnp.clip(semantic_pred, 0, num_classes - 1),
                            num_classes, dtype=jnp.float32) * ones[:, None]
    hist = jax.ops.segment_sum(onehot, seg, num_segments=num)[:r_cap]
    sem_r = jnp.argmax(hist, axis=-1).astype(jnp.int32)

    occ_sum = jax.ops.segment_sum(
        jnp.where(region >= 0, occupancy.reshape(-1), 0), seg,
        num_segments=num)[:r_cap]
    occ_r = occ_sum / jnp.maximum(cnt, 1)

    ctr = jax.ops.segment_sum(xyz * ones[:, None], seg,
                              num_segments=num)[:r_cap]
    ctr = ctr / jnp.maximum(cnt[:, None], 1)

    return RegionFeatures(embedding=emb_r, pose_embedding=pose_emb_r,
                          bw=bw_r, offset=off_r, count=cnt,
                          semantic=sem_r, occupancy=occ_r, center=ctr,
                          valid=cnt > 0)
