"""Worker process for tests/test_multihost.py: one of N processes of a
multi-host (DCN-analog) DP train step on the CPU backend.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <ldev>

Prints "MULTIHOST_LOSS <float>" on success. NB: JAX_PLATFORMS=cpu as an
env var conflicts with the container's sitecustomize (CLAUDE.md) — the
platform is forced via jax.config.update post-import instead."""

from __future__ import annotations

import os
import sys


def main() -> None:
    coordinator, n_procs, pid, ldev = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={ldev}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from occuseg_tpu.parallel.multihost import (
        global_dp_batch,
        global_dp_plans,
        global_mesh,
        init_multihost,
    )

    init_multihost(coordinator_address=coordinator, num_processes=n_procs,
                   process_id=pid)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == n_procs * ldev

    import numpy as np
    import jax.numpy as jnp

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.models import LearningBWDenseUNet
    from occuseg_tpu.parallel.data_parallel import (
        make_dp_train_step,
        replicate_state,
    )
    from occuseg_tpu.train.loop import _host_plan_any
    from occuseg_tpu.train.state import create_train_state

    spec = PlanSpec(caps=(512, 256, 128, 64))
    scene = SceneConfig(num_points=400, extent=32, num_objects=4)
    model = LearningBWDenseUNet(n_planes=(8, 16, 24, 32), num_classes=20)
    i_cap = 8

    # this process loads + plans ONLY its own devices' scenes (global
    # scene d lives on global device d)
    my = range(pid * ldev, (pid + 1) * ldev)
    per_dev = [make_batch(scene, 1, 512, i_cap, seed=d) for d in my]
    local = {k: np.stack([b[k] for b in per_dev]) for k in per_dev[0]}
    plans = [_host_plan_any(b["coords"], spec) for b in per_dev]

    mesh = global_mesh()
    batch = global_dp_batch(local, mesh)
    gplans = global_dp_plans(plans, mesh)

    state0 = create_train_state(
        model, jax.random.PRNGKey(0),
        {k: jnp.asarray(v[0]) for k, v in local.items()}, spec)
    state = replicate_state(state0, mesh)
    dp_step = make_dp_train_step(model, spec, mesh, num_scenes=1,
                                 num_instances=i_cap)
    state, parts = dp_step(state, batch, gplans)
    # the loss parts are pmean'd -> fully replicated; every process reads
    # the same scalar
    total = float(parts["total"])
    print(f"MULTIHOST_LOSS {total:.6f}", flush=True)


if __name__ == "__main__":
    main()
