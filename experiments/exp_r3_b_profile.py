"""Round-3 experiment B: fresh op-level profile of the bench fwd+bwd AND
the flagship train step, with the manual xplane parse (the
tensorboard_plugin_profile converter is broken against installed TF).

Aggregates the device plane's 'XLA Ops' line into per-op totals and prints
the top entries plus bucketed sums (conv kernels / staging gathers / BN /
IO / loss / other) so round-3 levers can be ranked.
"""

from __future__ import annotations

import glob
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
N_PLANES = (64, 128, 192, 256, 320, 384)
TRACE_DIR = "/tmp/occuseg_trace_r3"


def parse_xplane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane files", flush=True)
        return {}
    space = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        space.ParseFromString(f.read())
    totals = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9  # ms
    return dict(totals)


def bucket(name):
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n:
        return "pallas_kernel"
    if "gather" in n:
        return "gather"
    if "scatter" in n:
        return "scatter"
    if "fusion" in n:
        return "fusion"
    if "convert" in n or "copy" in n or "transpose" in n or "reshape" in n:
        return "layout"
    if "dot" in n or "convolution" in n:
        return "matmul"
    if "reduce" in n:
        return "reduce"
    if "sort" in n:
        return "sort"
    return "other"


def report(totals, n_steps, label):
    print(f"\n=== {label}: per-step op totals (÷{n_steps} steps) ===",
          flush=True)
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    bsum = defaultdict(float)
    for name, ms in items:
        bsum[bucket(name)] += ms / n_steps
    print("buckets:", {k: round(v, 2) for k, v in
                       sorted(bsum.items(), key=lambda kv: -kv[1])},
          flush=True)
    top = int(os.environ.get("OCC_PROF_TOP", 45))
    for name, ms in items[:top]:
        print(f"  {ms / n_steps:8.3f} ms  {name[:140]}", flush=True)
    # per-bucket top ops (the overall top-N is all conv kernels; lever
    # ranking needs to see inside the fusion/layout buckets too)
    per = int(os.environ.get("OCC_PROF_PER_BUCKET", 10))
    for b in sorted(bsum, key=lambda k: -bsum[k]):
        if b == "pallas_kernel":
            continue
        print(f"-- {b} ({bsum[b]:.2f} ms) --", flush=True)
        for name, ms in [kv for kv in items if bucket(kv[0]) == b][:per]:
            print(f"  {ms / n_steps:8.3f} ms  {name[:140]}", flush=True)
    print(f"total busy: {sum(totals.values()) / n_steps:.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.losses.instance import semantic_cross_entropy
    from occuseg_tpu.models.occuseg import _Backbone
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    from occuseg_tpu.core.point_layout import (
        apply_point_layout, augment_plan_with_point_layout,
    )
    host_plan = augment_plan_with_chunks(
        build_plan_host(batch["coords"], spec))
    host_plan = augment_plan_with_point_layout(host_plan)
    batch = apply_point_layout(batch, host_plan, num_scenes=1)
    plan = jax.tree.map(jnp.asarray, host_plan)

    class SemModel(nn.Module):
        @nn.compact
        def __call__(self, feats, plan, train=False):
            f = _Backbone(N_PLANES, block_reps=1, residual_blocks=True,
                          compute_dtype=jnp.bfloat16,
                          name="backbone")(feats, plan, train)
            return nn.Dense(20, name="linear")(f)

    model = SemModel()
    feats = jnp.asarray(batch["features"])
    labels = jnp.asarray(batch["labels"])
    init_fn = jax.jit(lambda r, f, p: model.init(r, f, p, False))
    variables = init_fn(jax.random.PRNGKey(0), feats, plan)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(params, batch_stats, feats, plan, labels):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, feats, plan,
            True, mutable=["batch_stats"])
        return semantic_cross_entropy(logits, labels), mutated["batch_stats"]

    @jax.jit
    def fwd_bwd(params, batch_stats, feats, plan, labels):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, feats, plan, labels)
        return loss, new_stats, grads

    out = fwd_bwd(params, batch_stats, feats, plan, labels)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fwd_bwd(params, batch_stats, feats, plan, labels)
    jax.block_until_ready(out)
    print(f"backbone fwd+bwd step: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
          flush=True)

    n_steps = 4
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n_steps):
            out = fwd_bwd(params, batch_stats, feats, plan, labels)
        jax.block_until_ready(out)
    report(parse_xplane(TRACE_DIR), n_steps, "backbone fwd+bwd")

    # ---- flagship train step ----
    from occuseg_tpu.models import LearningBWDenseUNet
    from occuseg_tpu.train.state import create_train_state, make_train_step

    flagship = LearningBWDenseUNet(n_planes=N_PLANES, num_classes=20,
                                   compute_dtype=jnp.bfloat16)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(flagship, jax.random.PRNGKey(0), batch_j, spec)
    step = jax.jit(make_train_step(flagship, spec, num_scenes=1,
                                   num_instances=64))
    state, parts = step(state, batch_j, plan)
    jax.block_until_ready(parts)
    t0 = time.perf_counter()
    for _ in range(5):
        state, parts = step(state, batch_j, plan)
    jax.block_until_ready(parts)
    print(f"flagship train step: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
          flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n_steps):
            state, parts = step(state, batch_j, plan)
        jax.block_until_ready(parts)
    report(parse_xplane(TRACE_DIR), n_steps, "flagship train step")


if __name__ == "__main__":
    main()
