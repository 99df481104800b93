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


def build_plan_host(point_coords: np.ndarray, spec: PlanSpec
                    ) -> Optional[Topology]:
    """NumPy-array Topology (device placement happens at jit call time).
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert spec.down_size == 2 and spec.down_stride == 2, (
        "host plan builder supports the stride-2 UNet path")
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

    levels = []
    transitions = []
    cur_keys, cur_coords, cur_n = keys, coords, n0
    for li, cap in enumerate(spec.caps):
        nbr = np.empty((cap, K), np.int32)
        lib.plan_neighbor_map(_ptr(cur_keys, ctypes.c_int64),
                              _ptr(cur_coords, ctypes.c_int32), cap,
                              cur_n, _ptr(offs, ctypes.c_int32), K,
                              _ptr(nbr, ctypes.c_int32))
        levels.append(LevelTopology(
            keys=cur_keys, coords=cur_coords,
            num_active=np.int32(cur_n), nbr=nbr,
            orient=np.zeros(cap, np.int32)))
        if li + 1 < len(spec.caps):
            cap_c = spec.caps[li + 1]
            ckeys = np.empty(cap_c, np.int64)
            ccoords = np.empty((cap_c, 4), np.int32)
            child = np.empty((cap_c, 8), np.int32)
            up = np.empty((cap, 8), np.int32)
            nc = lib.plan_downsample(
                _ptr(cur_keys, ctypes.c_int64),
                _ptr(cur_coords, ctypes.c_int32), cap, cur_n, cap_c,
                _ptr(ckeys, ctypes.c_int64), _ptr(ccoords, ctypes.c_int32),
                _ptr(child, ctypes.c_int32), _ptr(up, ctypes.c_int32))
            transitions.append(LevelTransition(child=child, up=up,
                                               size=2, stride=2))
            cur_keys, cur_coords, cur_n = ckeys, ccoords, nc

    num_points = np.int64(int((p2v >= 0).sum()))
    return Topology(levels=tuple(levels), transitions=tuple(transitions),
                    p2v=p2v, num_points=num_points)
