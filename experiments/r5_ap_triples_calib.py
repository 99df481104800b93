"""Round-5 AP-gate calibration on the touching-triples scene family
(VERDICT r4 item 5).

The r4 calibration showed disp-zeroing does NOT collapse AP on the
free-floating-furniture scenes (0.833 — embeddings separate instances
alone). The touching-triples family (data/synthetic.py) places three
same-class face-sharing boxes per row: spatial clustering merges a
triple (IoU 1/3 < 0.5 per member), so separation must come from the
displacement field — the mutation the gate must catch, mirroring the
reference's adjacent-furniture drift motivation
(train_instance.py:217-236).

Also sweeps seeds for the baseline (the floor must hold across seeds).

Usage: python experiments/r5_ap_triples_calib.py [mutations...]
  mutations: none disp occ emb   (default: none disp)
Env: OCC_AP_SEEDS="7,8,9" (baseline seeds), OCC_AP_STEPS=400
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.models import LearningBWDenseUNet
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.train.state import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

from r4_ap_gate_calib import eval_ap  # noqa: E402  (same cascade)

SPEC = PlanSpec(caps=(2048, 1024, 512))
N_STEPS = int(os.environ.get("OCC_AP_STEPS", 400))
CHECKPOINTS = tuple(n for n in (200, 300, 400, 600) if n <= N_STEPS)


def triples_batch(seed):
    cfg = SceneConfig(num_points=2500, extent=48, num_objects=6,
                      touching_triples=2)
    return make_batch(cfg, num_scenes=1, p_cap=4096, num_instances=16,
                      seed=seed)


def soak(tag, mutation="none", seed=7):
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
        state = create_train_state(model, jax.random.PRNGKey(0), batch_j,
                                   SPEC, cfg)
        step = jax.jit(make_train_step(model, SPEC, cfg, num_instances=16))
        t0 = time.time()
        done = 0
        parts = None
        for n in CHECKPOINTS:
            while done < n:
                state, parts = step(state, batch_j, plan_j)
                done += 1
            ap = eval_ap(model, state, batch, plan_j, region, valid)
            print(f"[{tag}] step {n}: total={float(parts['total']):.2f} "
                  f"iou={float(parts['instance_iou']):.3f} "
                  f"AP@0.5={ap:.3f} ({time.time() - t0:.0f}s)", flush=True)
    finally:
        LI._cluster_losses = orig_cl
        LI.discriminative_loss = orig_disc


if __name__ == "__main__":
    muts = sys.argv[1:] or ["none", "disp"]
    seeds = [int(s) for s in
             os.environ.get("OCC_AP_SEEDS", "7").split(",")]
    for m in muts:
        for seed in (seeds if m == "none" else seeds[:1]):
            soak(("baseline" if m == "none" else f"{m}_zeroed")
                 + f" seed{seed}", mutation=m, seed=seed)
