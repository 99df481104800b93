"""Benchmark harness: voxels/sec/chip for UNet m=64 forward+backward.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's throughput proxy (per-scene MulAdd counters
+ epoch wall time, `train_instance.py:459-462`): a synthetic ScanNet-like
scene is voxelized, and we time jitted fwd+bwd steps of the m=64 UNet
backbone (widths [64..384], residual blocks — `config.py:92`,
`training_script/train_instance.sh`), measuring active voxels processed per
second on one chip.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). We use
an estimated GV100 throughput of 1.0e6 voxels/s (fwd+bwd): a ScanNet epoch
(1201 scenes, ~250k active voxels each at scale=50) in the ~5 min/epoch
regime typical for SparseConvNet-UNet training on Volta-class GPUs. This
constant is an estimate, clearly marked; raise/lower it as real reference
timings become available.
"""

from __future__ import annotations

import json
import time

GV100_EST_VOXELS_PER_SEC = 1.0e6

# Topology/batch sizing: one ~180k-voxel scene (typical 2cm ScanNet room is
# 100k-300k voxels; SURVEY.md §5.7).
P_CAP = 262_144
CAPS = (262_144, 223_232, 144_384, 78_848, 47_104, 31_744)
N_PLANES = (64, 128, 192, 256, 320, 384)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occuseg_tpu.core.topology import PlanSpec, build_plan
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.losses.instance import semantic_cross_entropy
    from occuseg_tpu.models.occuseg import _Backbone

    import flax.linen as nn

    spec = PlanSpec(caps=CAPS)
    scene = SceneConfig(num_points=200_000, extent=512, num_objects=24)
    batch = make_batch(scene, num_scenes=1, p_cap=P_CAP, num_instances=64,
                       seed=0)

    class SemModel(nn.Module):
        @nn.compact
        def __call__(self, feats, plan, train=False):
            f = _Backbone(N_PLANES, block_reps=1, residual_blocks=True,
                          compute_dtype=jnp.bfloat16,  # TPU mixed precision
                          name="backbone")(feats, plan, train)
            return nn.Dense(20, name="linear")(f)

    model = SemModel()
    coords = jnp.asarray(batch["coords"])
    feats = jnp.asarray(batch["features"])
    labels = jnp.asarray(batch["labels"])

    plan = jax.jit(lambda c: build_plan(c, spec))(coords)
    num_voxels = int(plan.levels[0].num_active)

    init_fn = jax.jit(
        lambda r, f, c: model.init(r, f, build_plan(c, spec), False))
    variables = init_fn(jax.random.PRNGKey(0), feats, coords)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(params, batch_stats, feats, coords, labels):
        plan = build_plan(coords, spec)
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, feats, plan,
            True, mutable=["batch_stats"])
        return semantic_cross_entropy(logits, labels), mutated["batch_stats"]

    @jax.jit
    def fwd_bwd(params, batch_stats, feats, coords, labels):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, feats, coords, labels)
        return loss, new_stats, grads

    # warmup / compile
    loss, batch_stats, grads = fwd_bwd(params, batch_stats, feats, coords,
                                       labels)
    jax.block_until_ready(grads)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        loss, batch_stats, grads = fwd_bwd(params, batch_stats, feats,
                                           coords, labels)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / n_iters

    voxels_per_sec = num_voxels / dt
    print(json.dumps({
        "metric": "unet_m64_fwd_bwd_voxels_per_sec_per_chip",
        "value": round(voxels_per_sec, 1),
        "unit": "voxels/s",
        "vs_baseline": round(voxels_per_sec / GV100_EST_VOXELS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
