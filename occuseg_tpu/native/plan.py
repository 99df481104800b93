"""Host-side (C++) topology plan builder.

Produces the exact same `Topology` pytree as the jitted
`core.topology.build_plan`, but on the host via hash maps
(csrc/native.cpp) — ~10s of milliseconds instead of XLA int64 sort /
searchsorted chains on device. In a training pipeline this runs in the data
loader, overlapped with device compute, exactly like the reference's
host-driven rulebook construction (only built once per batch, not lazily
per layer). Falls back to the jitted builder when the C library is
unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from occuseg_tpu.core.topology import (
    LevelTopology,
    LevelTransition,
    PlanSpec,
    Topology,
    _offsets,
)
from occuseg_tpu.native import _load


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


_KEY_PAD = np.int64(1) << np.int64(62)


def _spread3_np(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.int64) & 0x1FFFFF
    x = (x | (x << 32)) & 0x1F00000000FFFF
    x = (x | (x << 16)) & 0x1F0000FF0000FF
    x = (x | (x << 8)) & 0x100F00F00F00F00F
    x = (x | (x << 4)) & 0x10C30C30C30C30C3
    x = (x | (x << 2)) & 0x1249249249249249
    return x


def _pack_np(coords: np.ndarray) -> np.ndarray:
    """NumPy mirror of core/coords.pack (Morton keys, KEY_PAD invalid)."""
    c = coords.astype(np.int64)
    invalid = (c < 0).any(axis=1) | (c[:, 1:] >= 4096).any(axis=1)
    key = ((c[:, 0] << 36) | (_spread3_np(c[:, 1]) << 2)
           | (_spread3_np(c[:, 2]) << 1) | _spread3_np(c[:, 3]))
    return np.where(invalid, _KEY_PAD, key)


def _lookup_np(keys: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row of each query key in sorted `keys`, -1 if absent."""
    pos = np.searchsorted(keys, q)
    pos_c = np.clip(pos, 0, len(keys) - 1)
    hit = (keys[pos_c] == q) & (q < _KEY_PAD)
    return np.where(hit, pos_c, -1).astype(np.int32)


def _even_offsets_np(size: int) -> np.ndarray:
    r = np.arange(size)
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1)
    return g.reshape(-1, 3).astype(np.int32)


def _general_downsample_np(keys: np.ndarray, coords: np.ndarray,
                           cap_c: int, size: int, stride: int):
    """General output-region transition (size != stride), the host mirror
    of `topology.downsample_keys`/`build_transition` general paths
    (reference `ConvolutionRules.h:18-128` OutputRegionCalculator)."""
    valid = coords[:, 0] >= 0
    sp = coords[:, 1:]
    ncand = -(-size // stride)
    cand = []
    for tz in range(ncand):
        for ty in range(ncand):
            for tx in range(ncand):
                t = np.array([tz, ty, tx], np.int32)
                j = sp // stride - t
                ok = valid & (j >= 0).all(1) & (sp - j * stride < size).all(1)
                cc = np.concatenate([coords[:, :1], j], axis=1)
                cc[~ok] = -1
                cand.append(_pack_np(cc))
    u = np.unique(np.concatenate(cand))
    u = u[u < _KEY_PAD][:cap_c]
    ckeys = np.full(cap_c, _KEY_PAD, np.int64)
    ckeys[:len(u)] = u
    nc = len(u)
    # coarse coords by unpacking? reuse the fine coords trick instead:
    # recover coords via matching one representative — simplest: unpack.
    from occuseg_tpu.core import coords as C
    import jax.numpy as jnp
    ccoords = np.asarray(C.unpack(jnp.asarray(ckeys)))

    offs = _even_offsets_np(size)
    K = offs.shape[0]
    child = np.full((cap_c, K), -1, np.int32)
    up = np.full((coords.shape[0], K), -1, np.int32)
    cvalid = ccoords[:, 0] >= 0
    for k, off in enumerate(offs):
        tgt = np.concatenate(
            [ccoords[:, :1], ccoords[:, 1:] * stride + off], axis=1)
        tgt[~cvalid] = -1
        child[:, k] = _lookup_np(keys, _pack_np(tgt))
        num = sp - off
        div = valid & (num >= 0).all(1) & (num % stride == 0).all(1)
        j = np.concatenate([coords[:, :1], num // stride], axis=1)
        j[~div] = -1
        up[:, k] = _lookup_np(ckeys, _pack_np(j))
    return ckeys, ccoords, np.int32(nc), child, up


def _orient_class(normals: np.ndarray) -> np.ndarray:
    """Dominant-axis orientation class {0,2,4} (x/y/z), exactly matching
    ops/normal_guide.oriented_filter (reference OrientedFilter,
    `RectangularRegions.h:12-31`)."""
    a = np.abs(normals)
    x, y, z = a[:, 0], a[:, 1], a[:, 2]
    return np.where((x >= y) & (x >= z), 0,
                    np.where((y >= x) & (y >= z), 2, 4)).astype(np.int32)


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=1, keepdims=True)
    return v / np.maximum(n, 1e-8)


def build_plan_host(point_coords: np.ndarray, spec: PlanSpec,
                    point_normals: Optional[np.ndarray] = None
                    ) -> Optional[Topology]:
    """NumPy-array Topology (device placement happens at jit call time).
    Returns None if the native library is unavailable.

    point_normals [P,3] (x,y,z) enable normal-guided filters: voxel
    normals are point means, carried down-scale by child averaging —
    the same math as the jitted builder (`core/topology.build_plan`),
    reference per-scale normals at `Metadata.h:220-223`."""
    lib = _load()
    if lib is None:
        return None
    if spec.nn_search or spec.lattice != "cubic":
        # dilated NN-search / permutohedral rulebooks are in-jit only;
        # fall back gracefully rather than assert
        return None
    fast_down = spec.down_size == 2 and spec.down_stride == 2
    pts = np.ascontiguousarray(point_coords, np.int32)
    P = pts.shape[0]
    offs = np.ascontiguousarray(_offsets(spec.kernel, spec.dilation))
    K = offs.shape[0]

    cap0 = spec.caps[0]
    keys = np.empty(cap0, np.int64)
    coords = np.empty((cap0, 4), np.int32)
    p2v = np.empty(P, np.int32)
    n0 = lib.plan_voxelize(_ptr(pts, ctypes.c_int32), P, cap0,
                           _ptr(keys, ctypes.c_int64),
                           _ptr(coords, ctypes.c_int32),
                           _ptr(p2v, ctypes.c_int32))

    # level-0 voxel normals: mean of the voxel's point normals (the jitted
    # builder's segment_sum / normalize, `core/topology.build_plan`)
    normals = None
    if point_normals is not None:
        pn = np.asarray(point_normals, np.float32)
        acc = np.zeros((cap0, 3), np.float32)
        valid = p2v >= 0
        np.add.at(acc, p2v[valid], pn[valid])
        normals = _normalize(acc)

    # Phase 1: the full downsample chain (keys/coords/transitions/normals
    # for every level). Neighbor maps come AFTER, coarse->fine, so each
    # fine level can derive its map from the parent's (plan_neighbor_map_
    # derived: two cached loads per query instead of a hash-probe chain).
    lvl_data = []  # (keys, coords, n, normals-or-None) per level
    transitions = []
    cur_keys, cur_coords, cur_n = keys, coords, n0
    for li, cap in enumerate(spec.caps):
        lvl_data.append((cur_keys, cur_coords, cur_n, normals))
        if li + 1 < len(spec.caps):
            cap_c = spec.caps[li + 1]
            if fast_down:
                ckeys = np.empty(cap_c, np.int64)
                ccoords = np.empty((cap_c, 4), np.int32)
                child = np.empty((cap_c, 8), np.int32)
                up = np.empty((cap, 8), np.int32)
                nc = lib.plan_downsample(
                    _ptr(cur_keys, ctypes.c_int64),
                    _ptr(cur_coords, ctypes.c_int32), cap, cur_n, cap_c,
                    _ptr(ckeys, ctypes.c_int64),
                    _ptr(ccoords, ctypes.c_int32),
                    _ptr(child, ctypes.c_int32), _ptr(up, ctypes.c_int32))
            else:
                # general size != stride path (VGG 'Plus' down_size=3 etc.)
                ckeys, ccoords, nc, child, up = _general_downsample_np(
                    cur_keys, cur_coords, cap_c, spec.down_size,
                    spec.down_stride)
            transitions.append(LevelTransition(
                child=child, up=up, size=spec.down_size,
                stride=spec.down_stride))
            if normals is not None and (spec.guide_levels is not None
                                        and li + 1 >= spec.guide_levels):
                # reference cutoff (`ConvolutionRules.h:774`): below the
                # guide scale the non-normal downsample runs, so coarser
                # levels keep identity orientation
                normals = None
            if normals is not None:
                # coarse normal = normalized sum of child normals (jitted
                # builder's child-gather averaging)
                gathered = np.where((child >= 0)[..., None],
                                    normals[np.clip(child, 0, None)], 0.0)
                normals = _normalize(gathered.sum(axis=1))
            cur_keys, cur_coords, cur_n = ckeys, ccoords, nc

    # Phase 2: neighbor maps, coarsest first. A fine level uses the
    # derived path only when it is bit-identical to the probe path by
    # construction: 3^3 dilation-1 kernel, stride-2 transition, and the
    # coarse level did NOT hit its cap (a truncated parent would hide
    # fine neighbors the hash probe still finds).
    small3 = K == 27 and bool((np.abs(offs) <= 1).all())
    nbrs = [None] * len(spec.caps)
    for li in reversed(range(len(spec.caps))):
        lk, lc, ln, _ = lvl_data[li]
        cap = spec.caps[li]
        nbr = np.empty((cap, K), np.int32)
        derived = -1
        if (small3 and fast_down and li + 1 < len(spec.caps)
                and lvl_data[li + 1][2] < spec.caps[li + 1]):
            tr = transitions[li]
            derived = lib.plan_neighbor_map_derived(
                _ptr(lc, ctypes.c_int32), cap, ln,
                _ptr(offs, ctypes.c_int32), K,
                _ptr(tr.up, ctypes.c_int32),
                _ptr(tr.child, ctypes.c_int32),
                _ptr(nbrs[li + 1], ctypes.c_int32), K,
                _ptr(nbr, ctypes.c_int32))
        if derived != 0:
            lib.plan_neighbor_map(_ptr(lk, ctypes.c_int64),
                                  _ptr(lc, ctypes.c_int32), cap,
                                  ln, _ptr(offs, ctypes.c_int32), K,
                                  _ptr(nbr, ctypes.c_int32))
        nbrs[li] = nbr

    levels = []
    for li, (lk, lc, ln, lnormals) in enumerate(lvl_data):
        levels.append(LevelTopology(
            keys=lk, coords=lc, num_active=np.int32(ln), nbr=nbrs[li],
            orient=(_orient_class(lnormals) if lnormals is not None
                    else np.zeros(spec.caps[li], np.int32))))

    num_points = np.int64(int((p2v >= 0).sum()))
    return Topology(levels=tuple(levels), transitions=tuple(transitions),
                    p2v=p2v, num_points=num_points)
