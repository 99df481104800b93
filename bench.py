"""Benchmark harness: voxels/sec/chip for UNet m=64 forward+backward.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's throughput proxy (per-scene MulAdd counters
+ epoch wall time, `train_instance.py:459-462`): a synthetic ScanNet-like
scene is voxelized; we time jitted fwd+bwd steps of the m=64 UNet backbone
(widths [64..384], residual blocks — `config.py:92`,
`training_script/train_instance.sh`), measuring active voxels processed per
second on one chip.

Timing protocol: N steps run inside ONE jitted `lax.scan` dispatch, state
(BN stats / TrainState) carried step to step and a 0-scaled loss token
chained into the features so every iteration executes fully (no LICM
hoisting, no backward DCE — the token is value-identical since f32 x*0 is
not folded). One dispatch amortizes the dev tunnel's ~6 ms/dispatch RPC
latency to <1 ms/step; the result matches the xplane device-busy time, and
a production host drives per-step dispatches at <0.1 ms anyway.

The topology plan is built by the C++ host runtime (native/plan.py) and
passed to the step as data — in a training pipeline it is produced by the
loader and overlaps device compute, exactly as the reference's host-side
rulebook construction overlaps via DataLoader workers. Host plan build time
is reported on stderr for transparency.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). We use
an estimated GV100 throughput of 1.0e6 voxels/s (fwd+bwd): a ScanNet epoch
(1201 scenes, ~250k active voxels each at scale=50) in the ~5 min/epoch
regime typical for SparseConvNet-UNet training on Volta-class GPUs. This
constant is an estimate, clearly marked; adjust as real reference timings
become available.
"""

from __future__ import annotations

import json
import sys
import time

GV100_EST_VOXELS_PER_SEC = 1.0e6

# One ~180k-voxel scene per step (typical 2cm ScanNet room is 100k-300k
# voxels, SURVEY.md §5.7). Caps sized snugly to the scene's measured
# per-level actives — padded rows are pure overhead, and a bucketing loader
# sizes caps per batch the same way. NB: larger batches currently scale
# SUBLINEARLY (XLA's gather slows superlinearly with table size; batch-4
# measured 4.3x slower per voxel) — single-scene steps are the fast point.
import os as _os

NUM_SCENES = int(_os.environ.get("OCC_SCENES", 1))
P_CAP = 262_144 * NUM_SCENES
CAPS = tuple(c * NUM_SCENES
             for c in (196_608, 139_264, 63_488, 17_408, 4_096, 1_024))
N_PLANES = (64, 128, 192, 256, 320, 384)


def _prepare(seed: int):
    """Build the synthetic batch + host plan (+chunk rulebooks, point
    layout) for one scene seed. Shapes are cap-static, so every seed reuses
    the same jitted executables (a looser U tier adds at most one compile
    per tier)."""
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.core.topology import PlanSpec, build_plan
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host

    spec = PlanSpec(caps=CAPS)
    scene = SceneConfig(num_points=200_000, extent=512, num_objects=24)
    batch = make_batch(scene, num_scenes=NUM_SCENES, p_cap=P_CAP,
                       num_instances=64, seed=seed)

    # multi-scene batches default to the BLOCKED per-scene row layout
    # (native/blocked.py): staging gathers stay at single-scene table
    # footprints (XLA row gather collapses ~12.9x past ~100 MB source
    # tables — PERF.md batch-4). OCC_BLOCKED=0 reverts to the
    # concatenated layout (+u_bump boundary margin) for A/Bs.
    blocked = NUM_SCENES > 1 and _os.environ.get("OCC_BLOCKED", "1") != "0"
    t0 = time.perf_counter()
    if blocked:
        from occuseg_tpu.native.blocked import build_plan_host_blocked
        host_plan = build_plan_host_blocked(batch["coords"], spec,
                                            NUM_SCENES)
    else:
        host_plan = build_plan_host(batch["coords"], spec)
    tier = 1.0
    if host_plan is not None:
        # chunk rulebooks for the fused Pallas conv kernel; geometry
        # overridable for sweeps (OCC_CHUNK_M=128 OCC_CHUNK_U=240,320,...)
        import os
        from occuseg_tpu.ops.pallas import chunk_conv
        m_env = int(os.environ.get("OCC_CHUNK_M", 0) or 0)
        u_env = os.environ.get("OCC_CHUNK_U")
        kw = {}
        if m_env:
            kw["M"] = m_env
        if u_env:
            kw["U"] = tuple(int(x) for x in u_env.split(","))
        g_env = os.environ.get("OCC_GRANULE", "")
        if g_env:
            # int (all levels) or comma list (per level, e.g. "2,2,1,1,1,1")
            g = tuple(int(x) for x in g_env.split(","))
            kw["granule"] = g[0] if len(g) == 1 else g
        if NUM_SCENES > 1 and not blocked:
            kw["u_bump"] = 32  # scene-boundary chunks (concat layout only)
        host_plan = chunk_conv.augment_plan_with_chunks(host_plan, **kw)
        tier = chunk_conv.LAST_TIER
        n_chunked = sum(l.chunks is not None for l in host_plan.levels)
        print(f"seed {seed}: chunked levels "
              f"{n_chunked}/{len(host_plan.levels)}, U tier {tier}",
              file=sys.stderr)
        # sorted point layout: scatter-free voxelize/devoxelize kernels
        from occuseg_tpu.core.point_layout import (
            apply_point_layout, augment_plan_with_point_layout,
        )
        host_plan = augment_plan_with_point_layout(host_plan)
        batch = apply_point_layout(batch, host_plan,
                                   num_scenes=NUM_SCENES)
    t_plan = time.perf_counter() - t0
    if host_plan is None:  # no C++ toolchain: build on device
        host_plan = jax.jit(
            lambda c: build_plan(c, spec))(jnp.asarray(batch["coords"]))
    plan = jax.tree.map(jnp.asarray, host_plan)
    import numpy as _np
    num_voxels = int(_np.sum(host_plan.levels[0].num_active))
    print(f"seed {seed}: host plan build {t_plan * 1e3:.1f} ms, "
          f"{num_voxels} active voxels", file=sys.stderr)
    return batch, plan, num_voxels, tier


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.losses.instance import semantic_cross_entropy
    from occuseg_tpu.models.occuseg import _Backbone

    import flax.linen as nn

    spec = PlanSpec(caps=CAPS)
    # OCC_SEEDS="0,1,2,3,4,5" sweeps scene seeds through the SAME jitted
    # step (headline metrics always from the first seed); proves the chunk-U
    # tables + tier escalation hold off-tuning-scene (VERDICT r3 task 2).
    seeds = [int(s) for s in
             _os.environ.get("OCC_SEEDS", "0").split(",") if s.strip()]
    batch, plan, num_voxels, _ = _prepare(seeds[0])

    class SemModel(nn.Module):
        @nn.compact
        def __call__(self, feats, plan, train=False):
            f = _Backbone(N_PLANES, block_reps=1, residual_blocks=True,
                          compute_dtype=jnp.bfloat16,  # TPU mixed precision
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

    # ---- timing harness: N steps inside ONE jitted lax.scan ----
    # The dev tunnel adds ~6 ms of RPC latency per dispatch (CLAUDE.md);
    # a production host drives steps at <0.1 ms, so the per-dispatch loop
    # under-reports the chip. One scan dispatch amortizes the tunnel to
    # <0.5 ms/step and matches the xplane device-busy time (the ground
    # truth). Traps handled per CLAUDE.md: the carry token perturbs feats
    # (0-scaled, value-identical — f32 x*0 is not folded) so XLA cannot
    # hoist loop-invariant work (LICM); grads feed the token so the
    # backward is not DCE'd; warmup uses PERTURBED feats (byte-identical
    # re-dispatches get deduped by the tunnel); the sync is a host
    # materialization of the token (block_until_ready is not reliable).
    N_TIMED = 20

    @jax.jit
    def fwd_bwd_scan(batch_stats, feats, plan, labels):
        def body(carry, _):
            bs, tok = carry
            f = feats + tok * 0  # chain: defeats LICM across iterations
            (loss, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, f, plan, labels)
            g0 = sum(g.ravel()[0].astype(jnp.float32)
                     for g in jax.tree.leaves(grads))
            return (bs2, loss.astype(jnp.float32) + g0 * 0), None

        (bs, tok), _ = jax.lax.scan(
            body, (batch_stats, jnp.float32(0)), None, length=N_TIMED)
        return bs, tok

    def time_fwd_bwd(batch_stats, feats, plan, labels):
        """(new_batch_stats, seconds/step) — one timed scan dispatch,
        warmed with perturbed feats (tunnel dedup trap), synced by host
        materialization of the chained token."""
        _, warm_tok = fwd_bwd_scan(batch_stats, feats + 1e-3, plan, labels)
        float(warm_tok)  # host sync
        t0 = time.perf_counter()
        bs, tok = fwd_bwd_scan(batch_stats, feats, plan, labels)
        float(tok)  # host materialization = the only reliable tunnel sync
        return bs, (time.perf_counter() - t0) / N_TIMED

    batch_stats, dt = time_fwd_bwd(batch_stats, feats, plan, labels)
    print(f"fwd+bwd step: {dt * 1e3:.1f} ms "
          f"({N_TIMED} steps / 1 dispatch)", file=sys.stderr)

    voxels_per_sec = num_voxels / dt

    if len(seeds) > 1:
        # seed sweep: same jitted step, fresh scene+plan per seed. The
        # batch_stats carry chains iterations (tunnel dedup trap, CLAUDE.md)
        sweep = {seeds[0]: round(voxels_per_sec, 1)}
        tiers_used = {}
        for seed in seeds[1:]:
            b, p, nv, tier = _prepare(seed)
            f, lb = jnp.asarray(b["features"]), jnp.asarray(b["labels"])
            # same cap-static shapes -> the scan program is reused (a
            # looser U tier adds at most one compile)
            batch_stats, dts = time_fwd_bwd(batch_stats, f, p, lb)
            sweep[seed] = round(nv / dts, 1)
            tiers_used[seed] = tier
            print(f"seed {seed}: fwd+bwd {dts * 1e3:.1f} ms "
                  f"({nv / dts:,.0f} voxels/s)", file=sys.stderr)
        vals = list(sweep.values())
        print(json.dumps({
            "metric": "unet_m64_seed_sweep_min_over_max",
            "value": round(min(vals) / max(vals), 3),
            "unit": "ratio",
            "per_seed_voxels_per_sec": sweep,
            "u_tiers": tiers_used,
            "vs_baseline": round(min(vals) / GV100_EST_VOXELS_PER_SEC, 3),
        }))

    # ---- secondary line: the FULL flagship training step (the reference
    # workload: LearningBWDenseUNet + 6-term loss + Adam update), so the
    # recorded context matches train_instance.sh, not just the backbone ----
    try:
        from occuseg_tpu.models import LearningBWDenseUNet
        from occuseg_tpu.train.state import create_train_state, \
            make_train_step

        flagship = LearningBWDenseUNet(
            n_planes=N_PLANES, num_classes=20,
            compute_dtype=jnp.bfloat16)
        batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
        state = create_train_state(flagship, jax.random.PRNGKey(0), batch_j,
                                   spec)
        # same scan harness as the backbone: N steps / 1 dispatch (the
        # token chains state->features so no iteration work is hoisted or
        # DCE'd; the state carry itself chains the grads/Adam update)
        N_FULL = 20
        raw_step = make_train_step(flagship, spec, num_scenes=NUM_SCENES,
                                   num_instances=64)

        @jax.jit
        def flagship_scan(state, batch, plan):
            def body(carry, _):
                st, tok = carry
                b = dict(batch)
                b["features"] = batch["features"] + tok * 0
                st2, parts = raw_step(st, b, plan)
                return (st2, parts["total"].astype(jnp.float32)), None

            (st, tok), _ = jax.lax.scan(
                body, (state, jnp.float32(0)), None, length=N_FULL)
            return st, tok

        warm_batch = dict(batch_j)
        warm_batch["features"] = batch_j["features"] + 1e-3
        _, wtok = flagship_scan(state, warm_batch, plan)  # compile/warm
        float(wtok)  # host sync (dedup trap: warm args differ from timed)
        t0 = time.perf_counter()
        state, tok = flagship_scan(state, batch_j, plan)
        total = float(tok)  # host materialization = the reliable sync
        dt_full = (time.perf_counter() - t0) / N_FULL
        print(f"flagship train step: {dt_full * 1e3:.1f} ms "
              f"({N_FULL} steps / 1 dispatch, last total={total:.3f})",
              file=sys.stderr)
        print(json.dumps({
            "metric": "flagship_train_step_voxels_per_sec_per_chip",
            "value": round(num_voxels / dt_full, 1),
            "unit": "voxels/s",
            "vs_baseline": round(num_voxels / dt_full
                                 / GV100_EST_VOXELS_PER_SEC, 3),
        }))
    except Exception as e:  # never lose the headline metric
        print(f"flagship step bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "unet_m64_fwd_bwd_voxels_per_sec_per_chip",
        "value": round(voxels_per_sec, 1),
        "unit": "voxels/s",
        "vs_baseline": round(voxels_per_sec / GV100_EST_VOXELS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
