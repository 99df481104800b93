"""Round-5 AP-gate calibration on the touching-triples scene family
(VERDICT r4 item 5).

Finding 1 (this script, train-scene eval): on an OVERFIT soak the
embedding head memorizes the scene, so even face-sharing same-class
triples separate by embedding alone — baseline AND disp-zeroed both
reach AP@0.5 = 1.000 at 300+ steps. No train-scene mutation test can
make displacement load-bearing.

Finding 2 (held-out eval): train on triples seeds {7, 8}, evaluate AP
on UNSEEN seed 9 — NEGATIVE as a gate: the tiny gate-sized model does
not generalize across scenes AT ALL (baseline valAP 0.000 at every
checkpoint, as do all mutations), so held-out AP cannot separate a
broken displacement head from the baseline either.

Conclusion (r5): no AP-collapse formulation makes displacement
load-bearing at gate scale. The displacement head is gated DIRECTLY
instead: tests/test_accuracy_ap_gate.py asserts the per-instance
contraction ratio of regressed poses (pose - displacement) on the soak
scene — a disp-zeroed model leaves poses uncontracted (ratio ~1) while
the trained head contracts them (calibrated in /tmp/r5_ap_floor_calib
runs; see the test docstring for the numbers). This checks the same
property the reference relies on for adjacent same-class furniture
(train_instance.py:217-236).

Usage: python experiments/r5_ap_triples_calib.py [mutations...]
  mutations: none disp occ emb   (default: none disp)
Env: OCC_AP_STEPS=600, OCC_AP_VAL_SEED=9, OCC_AP_TRAIN_SEEDS=7,8
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.models import LearningBWDenseUNet
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.train.state import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

from r4_ap_gate_calib import eval_ap  # noqa: E402  (same cascade + SPEC)

SPEC = PlanSpec(caps=(2048, 1024, 512))
N_STEPS = int(os.environ.get("OCC_AP_STEPS", 600))
CHECKPOINTS = tuple(n for n in (200, 300, 400, 600, 900)
                    if n <= N_STEPS)
TRAIN_SEEDS = tuple(int(s) for s in
                    os.environ.get("OCC_AP_TRAIN_SEEDS", "7,8").split(","))
VAL_SEED = int(os.environ.get("OCC_AP_VAL_SEED", 9))


def triples_batch(seed):
    cfg = SceneConfig(num_points=2500, extent=48, num_objects=6,
                      touching_triples=2)
    return make_batch(cfg, num_scenes=1, p_cap=4096, num_instances=16,
                      seed=seed)


def scene_setup(seed):
    batch = triples_batch(seed)
    plan = build_plan_host(batch["coords"], SPEC)
    plan_j = jax.tree.map(jnp.asarray, plan)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    valid = np.asarray(batch["labels"]) >= 0
    iid = np.asarray(batch["instance_id"])
    cell = (batch["coords"][:, 1:] // 8).astype(np.int64)
    key = (iid.astype(np.int64) + 1) * 1_000_000 + (
        cell[:, 0] * 10_000 + cell[:, 1] * 100 + cell[:, 2])
    _, region = np.unique(key, return_inverse=True)
    region = np.where(valid, region, -1).astype(np.int32)
    return batch, plan_j, batch_j, valid, region


def soak(tag, mutation="none"):
    train = [scene_setup(s) for s in TRAIN_SEEDS]
    val = scene_setup(VAL_SEED)

    import occuseg_tpu.losses.instance as LI
    orig_cl = LI._cluster_losses
    orig_disc = LI.discriminative_loss
    if mutation == "disp":
        def patched(disp_err, occ_err, *a, **k):
            return orig_cl(jnp.zeros_like(disp_err), occ_err, *a, **k)
        LI._cluster_losses = patched
    elif mutation == "occ":
        def patched(disp_err, occ_err, *a, **k):
            return orig_cl(disp_err, jnp.zeros_like(occ_err), *a, **k)
        LI._cluster_losses = patched
    elif mutation == "emb":
        def patched(embedding, *a, **k):
            return jnp.sum(embedding) * 0.0
        LI.discriminative_loss = patched
    elif mutation != "none":
        raise SystemExit(f"unknown mutation {mutation}")
    try:
        model = LearningBWDenseUNet(n_planes=(8, 16, 24), num_classes=20,
                                    block_reps=1, residual_blocks=True)
        cfg = TrainConfig(lr=1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   train[0][2], SPEC, cfg)
        step = jax.jit(make_train_step(model, SPEC, cfg, num_instances=16))
        t0 = time.time()
        done = 0
        parts = None
        for n in CHECKPOINTS:
            while done < n:
                _, plan_j, batch_j, _, _ = train[done % len(train)]
                state, parts = step(state, batch_j, plan_j)
                done += 1
            batch_v, plan_v, _, valid_v, region_v = val
            ap = eval_ap(model, state, batch_v, plan_v, region_v, valid_v)
            print(f"[{tag}] step {n}: total={float(parts['total']):.2f} "
                  f"iou={float(parts['instance_iou']):.3f} "
                  f"valAP@0.5={ap:.3f} ({time.time() - t0:.0f}s)",
                  flush=True)
    finally:
        LI._cluster_losses = orig_cl
        LI.discriminative_loss = orig_disc


if __name__ == "__main__":
    muts = sys.argv[1:] or ["none", "disp"]
    for m in muts:
        soak("baseline" if m == "none" else f"{m}_zeroed", mutation=m)
