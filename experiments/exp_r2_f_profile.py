"""Round-2 experiment F: op-level profile of the chunked bench step.

Runs the exact bench.py fwd+bwd under jax.profiler.trace and parses the
xplane with tensorboard_plugin_profile into per-op device times.
"""

from __future__ import annotations

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
N_PLANES = (64, 128, 192, 256, 320, 384)
TRACE_DIR = "/tmp/occuseg_trace"


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
    host_plan = augment_plan_with_chunks(
        build_plan_host(batch["coords"], spec))
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
    out = fwd_bwd(params, batch_stats, feats, plan, labels)
    jax.block_until_ready(out)
    print(f"step: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = fwd_bwd(params, batch_stats, feats, plan, labels)
        jax.block_until_ready(out)

    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    for tool in ("framework_op_stats^", "hlo_stats^", "op_profile^"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {})
            fn = f"/tmp/occuseg_prof_{tool.strip('^')}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fn, mode) as f:
                f.write(data)
            print(f"[OK] {tool} -> {fn} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"[FAIL] {tool}: {e!r}", flush=True)


if __name__ == "__main__":
    main()
