"""Round-4 experiment E: op-level profiles after the blocked-batch layout
and the scan timing harness landed.

Cases (each = ONE scan dispatch traced, per-op times ÷ N steps):
  * batch-1 flagship train step (0.993 vs baseline — find the last 1.4 ms)
  * batch-4 BLOCKED backbone fwd+bwd (1.47x per-voxel vs batch-1 — where
    does the remaining degradation live now that staging gathers window?)
  * batch-4 BLOCKED flagship step

Uses the bench.py scan construction (token chains features; grads feed
the token) so the traced programs match the benchmarked ones.
Run: `python experiments/exp_r4_e_blocked_profile.py` (serialized — no
other TPU or CPU jobs, CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_r3_b_profile import parse_xplane, report  # noqa: E402

N_PLANES = (64, 128, 192, 256, 320, 384)
BASE_CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
TRACE_DIR = "/tmp/occuseg_trace_r4e"
N_SCAN = 8


def prepare(ns: int):
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.core.point_layout import (
        apply_point_layout,
        augment_plan_with_point_layout,
    )
    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.blocked import build_plan_host_blocked
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    spec = PlanSpec(caps=tuple(c * ns for c in BASE_CAPS))
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=ns, p_cap=262_144 * ns,
                       num_instances=64, seed=0)
    if ns > 1:
        host_plan = build_plan_host_blocked(batch["coords"], spec, ns)
    else:
        host_plan = build_plan_host(batch["coords"], spec)
    host_plan = augment_plan_with_chunks(host_plan)
    host_plan = augment_plan_with_point_layout(host_plan)
    batch = apply_point_layout(batch, host_plan, num_scenes=ns)
    plan = jax.tree.map(jnp.asarray, host_plan)
    import numpy as np
    nv = int(np.sum(host_plan.levels[0].num_active))
    print(f"[b{ns}] {nv} voxels", flush=True)
    return spec, batch, plan, nv


def trace_one(scan_fn, args, warm_args, nv, label):
    import jax

    _, wtok = scan_fn(*warm_args)
    float(wtok)
    t0 = time.perf_counter()
    _, tok = scan_fn(*args)
    float(tok)
    dt = (time.perf_counter() - t0) / N_SCAN
    print(f"[{label}] {dt * 1e3:.1f} ms/step = {nv / dt:,.0f} voxels/s",
          flush=True)
    os.system(f"rm -rf {TRACE_DIR}")
    import jax.profiler
    with jax.profiler.trace(TRACE_DIR):
        _, tok = scan_fn(*warm_args)   # differs from previous dispatch
        float(tok)
    report(parse_xplane(TRACE_DIR), N_SCAN, label)


def run_backbone(ns: int):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.losses.instance import semantic_cross_entropy
    from occuseg_tpu.models.occuseg import _Backbone

    spec, batch, plan, nv = prepare(ns)

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
    variables = jax.jit(lambda r, f, p: model.init(r, f, p, False))(
        jax.random.PRNGKey(0), feats, plan)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(params, batch_stats, feats, plan, labels):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, feats, plan,
            True, mutable=["batch_stats"])
        return (semantic_cross_entropy(logits, labels),
                mutated["batch_stats"])

    # plan/labels passed as ARGS (closed-over arrays embed as HLO literal
    # constants; at batch 4 that blew the remote compiler's request size
    # limit — HTTP 413)
    @jax.jit
    def scan(batch_stats, feats, plan, labels):
        def body(carry, _):
            bs, tok = carry
            f = feats + tok * 0
            (loss, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, f, plan, labels)
            g0 = sum(g.ravel()[0].astype(jnp.float32)
                     for g in jax.tree.leaves(grads))
            return (bs2, loss.astype(jnp.float32) + g0 * 0), None

        (bs, tok), _ = jax.lax.scan(
            body, (batch_stats, jnp.float32(0)), None, length=N_SCAN)
        return bs, tok

    trace_one(scan, (batch_stats, feats, plan, labels),
              (batch_stats, feats + 1e-3, plan, labels), nv,
              f"backbone b{ns}")


def run_flagship(ns: int):
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.models import LearningBWDenseUNet
    from occuseg_tpu.train.state import create_train_state, make_train_step

    spec, batch, plan, nv = prepare(ns)
    flagship = LearningBWDenseUNet(n_planes=N_PLANES, num_classes=20,
                                   compute_dtype=jnp.bfloat16)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(flagship, jax.random.PRNGKey(0), batch_j,
                               spec)
    raw_step = make_train_step(flagship, spec, num_scenes=ns,
                               num_instances=64)

    @jax.jit
    def scan(state, feats, batch_j, plan):
        def body(carry, _):
            st, tok = carry
            b = dict(batch_j)
            b["features"] = feats + tok * 0
            st2, parts = raw_step(st, b, plan)
            return (st2, parts["total"].astype(jnp.float32)), None

        (st, tok), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), None, length=N_SCAN)
        return st, tok

    f = batch_j["features"]
    trace_one(scan, (state, f, batch_j, plan),
              (state, f + 1e-3, batch_j, plan), nv, f"flagship b{ns}")


if __name__ == "__main__":
    for case in os.environ.get(
            "OCC_PROF_CASES", "flagship:1,backbone:4,flagship:4").split(","):
        which, ns = case.split(":")
        (run_flagship if which == "flagship" else run_backbone)(int(ns))
