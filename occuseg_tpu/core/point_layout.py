"""Host-side sorted point layout for scatter-free voxelize/devoxelize.

The level-0 voxels are Morton-sorted (`core/coords.py`); this module sorts
the POINTS by their voxel row and packs them into fixed-size runs so the
points of voxel block b (W consecutive voxels) occupy exactly point slots
[b*R, (b+1)*R) — padded with -1 slots, overflowing (rare) into the array
tail. Under that layout the voxelize segment reduction
(`ops/pallas/segsum.py`) is a block-local one-hot MXU product instead of a
serializing TPU scatter, the same move the chunked conv kernels make for
the gather (`ops/pallas/chunk_conv.py`).

This replaces the device-side point ordering freedom the reference's
atomic scatters buy (`SCN/CUDA/IOLayers.cu` InputLayer_fp) with a loader
permutation: `apply_point_layout` reorders every per-point batch array
once on the host (the losses are order-invariant segment reductions, so
training semantics are unchanged); `plan.point_perm` keeps the mapping for
un-permuting per-point predictions at dump/eval time.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from occuseg_tpu.native import gather_rows_native

# Defaults sized for the ScanNet-like regime (~1.1-1.4 points per active
# voxel): W voxels per block, R point slots per block. R/W = 1.29 slots
# per voxel; blocks denser than that overflow into the tail sidecar.
DEFAULT_W = 192
DEFAULT_R = 248

# batch keys that are per-point rows, with their pad-slot fill values
_POINT_KEYS = {
    "coords": -1, "features": 0, "labels": -1, "instance_id": -1,
    "point_scene": None,  # filled with num_scenes (the existing pad value)
    "pose": 0, "normals": 0, "offsets": 0, "displacements": 0,
    "occupancy": 0, "xyz": 0,
}


def build_point_layout(p2v: np.ndarray, cap0: int, w: int = DEFAULT_W,
                       r: int = DEFAULT_R) -> Optional[Dict]:
    """Compute the sorted layout for one batch.

    p2v: [P] int32 point -> level-0 voxel row (-1 = dropped/pad), in the
    CURRENT point order. Returns dict(perm, vox_seg, counts, p2v) — perm
    [P] int64 (perm[slot] = old point index, -1 = pad slot) — or None when
    the layout does not fit (overflow exceeds the tail slack); callers
    then stay on the XLA scatter path.
    """
    p2v = np.asarray(p2v)
    P = p2v.shape[0]
    if cap0 % w or r % 8 or (cap0 // w) * r > P:
        return None
    B = cap0 // w
    main_rows = B * r

    idx = np.nonzero(p2v >= 0)[0]
    order = idx[np.argsort(p2v[idx], kind="stable")]
    sv = p2v[order]
    blk = sv // w
    counts_b = np.bincount(blk, minlength=B)
    starts = np.zeros(B, np.int64)
    np.cumsum(counts_b[:-1], out=starts[1:])
    pos = np.arange(order.size, dtype=np.int64) - starts[blk]
    main = pos < r
    n_over = int((~main).sum())
    if n_over > P - main_rows:
        return None

    perm = np.full(P, -1, np.int64)
    slot = blk[main] * r + pos[main]
    perm[slot] = order[main]
    perm[main_rows:main_rows + n_over] = order[~main]

    vox_seg = np.full(B * r, -1, np.int32)
    vox_seg[slot] = (sv[main] - blk[main] * w).astype(np.int32)

    counts = np.bincount(p2v[idx], minlength=cap0).astype(np.float32)
    new_p2v = np.where(perm >= 0, p2v[np.maximum(perm, 0)], -1).astype(
        np.int32)
    return {
        "perm": perm,
        "vox_seg": vox_seg.reshape(B, 1, r),
        "counts": counts[:cap0],
        "p2v": new_p2v,
    }


def augment_plan_with_point_layout(plan, w: int = DEFAULT_W,
                                   r: int = DEFAULT_R):
    """Attach the sorted point layout to a host Topology. Returns the new
    plan (vox_seg/vox_counts/point_perm set, p2v permuted) or the original
    plan unchanged when the layout does not fit."""
    lay = build_point_layout(np.asarray(plan.p2v), plan.levels[0].cap, w, r)
    if lay is None:
        return plan
    return dataclasses.replace(
        plan, p2v=lay["p2v"], vox_seg=lay["vox_seg"],
        vox_counts=lay["counts"],
        point_perm=lay["perm"].astype(np.int32))


def apply_point_layout(batch: Dict[str, np.ndarray], plan,
                       num_scenes: int = None) -> Dict[str, np.ndarray]:
    """Permute every per-point batch array into the plan's sorted layout.
    No-op when the plan has no layout. Non-point keys pass through.

    Pad-slot point_scene is `num_scenes` (the loader pad convention) when
    given, else -1 — either value matches no real scene in the loss masks.
    """
    perm = getattr(plan, "point_perm", None)
    if perm is None:
        return batch
    perm = np.asarray(perm)
    pad = perm < 0
    safe = np.maximum(perm, 0)
    out = {}
    for k, v in batch.items():
        if k not in _POINT_KEYS or np.shape(v)[:1] != perm.shape:
            out[k] = v
            continue
        fill = _POINT_KEYS[k]
        if fill is None:
            fill = -1 if num_scenes is None else num_scenes
        pv = gather_rows_native(np.asarray(v), perm, fill)
        if pv is None:
            # fancy gather yields a fresh array; overwrite just the pad
            # rows in place (a full-array np.where pass doubled traffic)
            pv = np.asarray(v)[safe]
            pv[pad] = fill
        out[k] = pv
    return out
