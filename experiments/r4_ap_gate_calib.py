"""Calibrate the instance-AP accuracy gate (VERDICT r3 task 8).

Runs the synthetic overfit soak, evaluates instance AP@0.5 through the
REAL clustering pipeline (aggregate_regions -> meanshift -> merge ->
filter_proposals -> AP) at several step counts, then repeats with a
quality-relevant loss term ZEROED (the mutation the gate must catch).

First calibration run (round 4): disp_zeroed did NOT collapse AP on the
synthetic scene (0.833 vs baseline 0.583 at 300 steps — synthetic
instances are separable by embedding alone). The gate mutation must be
one the cascade actually depends on here: occupancy (drives the
filter_proposals size ratio and the merge) or embedding (drives
mean-shift).

Usage: python experiments/r4_ap_gate_calib.py [mutations...]
  mutations: none disp occ emb   (default: none occ emb)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from occuseg_tpu.cluster import (
    aggregate_regions,
    filter_proposals,
    meanshift_cluster,
    occupancy_merge,
)
from occuseg_tpu.cluster.evaluator import (
    gt_instances,
    instance_average_precision,
)
from occuseg_tpu.cluster.meanshift import labels_to_points
from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.losses.instance import LossConfig
from occuseg_tpu.models import LearningBWDenseUNet
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.train.state import (
    TrainConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)

SPEC = PlanSpec(caps=(2048, 1024, 512))
CHECKPOINTS = (100, 200, 300)
R_CAP = 256
# synthetic objects are ~260 points; the reference class-size filter is
# scaled for real ScanNet rooms
CLASS_SIZES = np.full(20, 100.0, np.float32)


def eval_ap(model, state, batch, plan_j, region, valid):
    """Instance AP@0.5 via the production clustering cascade."""
    ev = jax.jit(make_eval_step(model, SPEC))
    out = ev(state, {k: jnp.asarray(v) for k, v in batch.items()}, plan_j)
    sem_pred = np.asarray(jnp.argmax(out.semantics, -1))

    region_j = jnp.asarray(region)
    regions = aggregate_regions(
        out.embedding.astype(jnp.float32),
        out.displacement.astype(jnp.float32),
        jnp.asarray(batch["pose"], jnp.float32),
        out.bw.astype(jnp.float32),
        out.offset.astype(jnp.float32).reshape(-1),
        jnp.asarray(sem_pred),
        out.occupancy.astype(jnp.float32).reshape(-1),
        region_j, R_CAP)
    labels, _ = meanshift_cluster(regions)
    labels_np = occupancy_merge(
        np.asarray(labels), np.asarray(regions.embedding),
        np.asarray(regions.pose_embedding), np.asarray(regions.bw),
        np.asarray(regions.count), np.asarray(regions.occupancy))
    pts = np.asarray(labels_to_points(jnp.asarray(labels_np), region_j))
    props = filter_proposals(
        pts[valid], sem_pred[valid],
        np.asarray(out.occupancy).reshape(-1)[valid],
        class_sizes=CLASS_SIZES, occupancy_lo=0.1, occupancy_hi=10.0)
    gts = gt_instances(batch["instance_id"][valid].astype(np.int64),
                       batch["labels"][valid].astype(np.int64))
    r = instance_average_precision([props], [gts], iou_threshold=0.5)
    return r["mAP"]


def soak(tag, mutation="none", n_steps=300, seed=7):
    batch = make_batch(SceneConfig(num_points=2500, extent=40,
                                   num_objects=6),
                       num_scenes=1, p_cap=4096, num_instances=16,
                       seed=seed)
    plan = build_plan_host(batch["coords"], SPEC)
    plan_j = jax.tree.map(jnp.asarray, plan)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    valid = np.asarray(batch["labels"]) >= 0
    # GT-derived supervoxels: spatial subgroups within each instance
    # (held constant across code changes; the gate tests model+loss+cluster)
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
            if n > n_steps:
                break
            while done < n:
                state, parts = step(state, batch_j, plan_j)
                done += 1
            ap = eval_ap(model, state, batch, plan_j, region, valid)
            print(f"[{tag}] step {n}: total={float(parts['total']):.2f} "
                  f"iou={float(parts['instance_iou']):.3f} AP@0.5={ap:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    finally:
        LI._cluster_losses = orig_cl
        LI.discriminative_loss = orig_disc


if __name__ == "__main__":
    muts = sys.argv[1:] or ["none", "occ", "emb"]
    for m in muts:
        soak("baseline" if m == "none" else f"{m}_zeroed", mutation=m)
