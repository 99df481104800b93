"""Round-5 sitting 3: fine-grained host-planner breakdown.

Times each native call inside build_plan_host (voxelize, per-level
neighbor maps, downsamples) and each level's plan_chunks, plus numpy
microbenches of the apply_point_layout gathers. CPU only:
  python experiments/r5_planner_fine.py
"""

from __future__ import annotations

import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from occuseg_tpu.core.topology import PlanSpec, _offsets  # noqa: E402
from occuseg_tpu.data.synthetic import SceneConfig, make_batch  # noqa: E402
from occuseg_tpu.native import _load, plan_chunks_native  # noqa: E402
from occuseg_tpu.native.plan import build_plan_host, _ptr  # noqa: E402

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def t(label, fn, *a, n=5, **kw):
    best = None
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:46s} {best * 1e3:8.2f} ms")
    return out


def main():
    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64,
                       seed=0)
    lib = _load()
    pts = np.ascontiguousarray(batch["coords"], np.int32)
    P = pts.shape[0]
    offs = np.ascontiguousarray(_offsets(spec.kernel, spec.dilation))
    K = offs.shape[0]

    cap0 = CAPS[0]
    keys = np.empty(cap0, np.int64)
    coords = np.empty((cap0, 4), np.int32)
    p2v = np.empty(P, np.int32)

    def vox():
        return lib.plan_voxelize(_ptr(pts, ctypes.c_int32), P, cap0,
                                 _ptr(keys, ctypes.c_int64),
                                 _ptr(coords, ctypes.c_int32),
                                 _ptr(p2v, ctypes.c_int32))
    n0 = t("plan_voxelize", vox)

    plan = build_plan_host(batch["coords"], spec)
    for li, lev in enumerate(plan.levels):
        nbr = np.empty((lev.cap, K), np.int32)
        lk = np.ascontiguousarray(np.asarray(lev.keys))
        lc = np.ascontiguousarray(np.asarray(lev.coords))
        na = int(lev.num_active)

        def nm():
            lib.plan_neighbor_map(_ptr(lk, ctypes.c_int64),
                                  _ptr(lc, ctypes.c_int32), lev.cap, na,
                                  _ptr(offs, ctypes.c_int32), K,
                                  _ptr(nbr, ctypes.c_int32))
        t(f"neighbor_map L{li} (n={na})", nm)

    for li, lev in enumerate(plan.levels):
        nbr = np.ascontiguousarray(np.asarray(lev.nbr))
        t(f"plan_chunks L{li} nbr", plan_chunks_native, nbr, 64, 512,
          0)
    for ti, tr in enumerate(plan.transitions):
        ch = np.ascontiguousarray(np.asarray(tr.child))
        up = np.ascontiguousarray(np.asarray(tr.up))
        t(f"plan_chunks T{ti} child", plan_chunks_native, ch, 64, 256, 0)
        t(f"plan_chunks T{ti} up", plan_chunks_native, up, 64, 256, 0)

    # apply_point_layout microbench: the big per-point gathers
    perm = np.random.permutation(P).astype(np.int64)
    for name, arr in [("features [P,3]f32", np.zeros((P, 3), np.float32)),
                      ("coords [P,4]i32", np.zeros((P, 4), np.int32)),
                      ("labels [P]i32", np.zeros(P, np.int32))]:
        t(f"np gather {name}", lambda a=arr: a[perm])


if __name__ == "__main__":
    main()
