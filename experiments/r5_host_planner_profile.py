"""Round-5: where does the 1732 ms host plan wall go? (VERDICT r4 item 3)

Times each host-side phase at the bench shapes (182k-voxel scene,
caps 196k..1k) on this 1-core host:
  * native/plan.py build_plan_host (C++ voxelize + neighbor maps + downsample)
  * ops/pallas/chunk_conv.augment_plan_with_chunks (chunk rulebooks)
  * core/point_layout.augment_plan_with_point_layout (sorted point layout)
  * core/point_layout.apply_point_layout (batch permutation)
plus per-level breakdowns where cheap to get. Run standalone (CPU only):
  python experiments/r5_host_planner_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from occuseg_tpu.core.topology import PlanSpec  # noqa: E402
from occuseg_tpu.data.synthetic import SceneConfig, make_batch  # noqa: E402

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def t(label, fn, *a, n=3, **kw):
    best = None
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:42s} {best * 1e3:8.1f} ms")
    return out


def main():
    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64,
                       seed=0)

    from occuseg_tpu.native.plan import build_plan_host
    plan = t("build_plan_host (C++)", build_plan_host, batch["coords"],
             spec)

    from occuseg_tpu.ops.pallas import chunk_conv
    plan_c = t("augment_plan_with_chunks", chunk_conv.
               augment_plan_with_chunks, plan)

    from occuseg_tpu.core.point_layout import (
        apply_point_layout, augment_plan_with_point_layout,
    )
    plan_l = t("augment_plan_with_point_layout",
               augment_plan_with_point_layout, plan_c)
    t("apply_point_layout", apply_point_layout, batch, plan_l,
      num_scenes=1)

    # the end-to-end wall the bench reports
    def full():
        p = build_plan_host(batch["coords"], spec)
        p = chunk_conv.augment_plan_with_chunks(p)
        p = augment_plan_with_point_layout(p)
        apply_point_layout(batch, p, num_scenes=1)

    t("FULL pipeline (bench t_plan)", full, n=2)


if __name__ == "__main__":
    main()
