"""Round-4 experiment A: op-level profile of the FLAGSHIP train step at
batch 1 vs batch 4 (VERDICT r3 task 5: find where the 1.9x-per-voxel
batch-4 degradation actually goes), plus a fresh batch-1 lever ranking
(task 3). Same manual-xplane recipe as exp_r3_b.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_r3_b_profile import parse_xplane, report  # noqa: E402

N_PLANES = (64, 128, 192, 256, 320, 384)
TRACE_DIR = "/tmp/occuseg_trace_r4a"
BASE_CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def run_case(num_scenes: int):
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.core.point_layout import (
        apply_point_layout,
        augment_plan_with_point_layout,
    )
    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.models import LearningBWDenseUNet
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks
    from occuseg_tpu.train.state import create_train_state, make_train_step

    caps = tuple(c * num_scenes for c in BASE_CAPS)
    spec = PlanSpec(caps=caps)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=num_scenes, p_cap=262_144 * num_scenes,
                       num_instances=64, seed=0)
    host_plan = build_plan_host(batch["coords"], spec)
    host_plan = augment_plan_with_chunks(
        host_plan, u_bump=32 if num_scenes > 1 else 0)
    host_plan = augment_plan_with_point_layout(host_plan)
    batch = apply_point_layout(batch, host_plan, num_scenes=num_scenes)
    plan = jax.tree.map(jnp.asarray, host_plan)
    nv = int(plan.levels[0].num_active)
    print(f"[b{num_scenes}] {nv} voxels", flush=True)

    flagship = LearningBWDenseUNet(n_planes=N_PLANES, num_classes=20,
                                   compute_dtype=jnp.bfloat16)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(flagship, jax.random.PRNGKey(0), batch_j,
                               spec)
    step = jax.jit(make_train_step(flagship, spec, num_scenes=num_scenes,
                                   num_instances=64))
    state, parts = step(state, batch_j, plan)
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    for _ in range(5):
        state, parts = step(state, batch_j, plan)
    jax.block_until_ready(parts)
    dt = (time.perf_counter() - t0) / 5
    print(f"[b{num_scenes}] flagship step {dt * 1e3:.1f} ms = "
          f"{nv / dt:,.0f} voxels/s", flush=True)

    n_steps = 4
    os.system(f"rm -rf {TRACE_DIR}")
    import jax.profiler
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n_steps):
            state, parts = step(state, batch_j, plan)
        jax.block_until_ready(parts)
    report(parse_xplane(TRACE_DIR), n_steps, f"flagship batch-{num_scenes}")


if __name__ == "__main__":
    for ns in (int(x) for x in
               os.environ.get("OCC_PROF_SCENES", "1,4").split(",")):
        run_case(ns)
