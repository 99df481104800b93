"""Instance-AP accuracy gate (VERDICT r3 task 8).

A deterministic synthetic overfit soak must reach an instance AP@0.5
floor through the REAL clustering cascade (aggregate_regions ->
mean-shift -> occupancy merge -> filter_proposals -> benchmark AP) — so
a quality regression anywhere in the model, losses, GT plumbing, or the
cluster cascade fails CI even when losses still look plausible.

Mutation evidence (experiments/r4_ap_gate_calib.py, run once on the
round-4 tree, seed 7, 300 steps, deterministic):

  baseline     total 3.33, iou 0.967, AP@0.5 = 0.583  (passes floor 0.5)
  occ_zeroed   total 2.45, iou 0.973, AP@0.5 = 0.000  (FAILS the gate)
  emb_zeroed   total 3.04, iou 0.971, AP@0.5 = 0.417  (FAILS the gate)
  disp_zeroed  total 3.13, iou 0.965, AP@0.5 = 0.833  (synthetic scenes
               are embedding-separable; displacement is not load-bearing
               here — that mutation does NOT validate the gate)

The occupancy mutation is the canonical regression the old loss-only
gate cannot see: the total loss still FALLS (other terms dominate) and
the instance soft-IoU looks healthy, but the untrained occupancy head
breaks filter_proposals' size-ratio filter and occupancy_merge, so
AP@0.5 collapses to zero.
"""

import numpy as np

import jax
import jax.numpy as jnp

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
from occuseg_tpu.models import LearningBWDenseUNet
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.train.state import (
    TrainConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)

SPEC = PlanSpec(caps=(2048, 1024, 512))
N_STEPS = 300
R_CAP = 256
# synthetic objects are ~260 points; the reference class-size filter
# (DEFAULT_CLASS_SIZES) is scaled for real ScanNet rooms
CLASS_SIZES = np.full(20, 100.0, np.float32)


def _gt_regions(batch, valid):
    """GT-derived supervoxels: spatial subgroups within each instance.

    Held constant across code changes — the gate tests the model + losses
    + cluster cascade, not supervoxel generation (covered by
    test_data_native.py)."""
    iid = np.asarray(batch["instance_id"])
    cell = (batch["coords"][:, 1:] // 8).astype(np.int64)
    key = (iid.astype(np.int64) + 1) * 1_000_000 + (
        cell[:, 0] * 10_000 + cell[:, 1] * 100 + cell[:, 2])
    _, region = np.unique(key, return_inverse=True)
    return np.where(valid, region, -1).astype(np.int32)


def _instance_ap(model, state, batch, plan_j, region, valid):
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
    return instance_average_precision([props], [gts],
                                      iou_threshold=0.5)["mAP"]


def test_soak_reaches_instance_ap_floor():
    batch = make_batch(SceneConfig(num_points=2500, extent=40,
                                   num_objects=6),
                       num_scenes=1, p_cap=4096, num_instances=16, seed=7)
    plan = build_plan_host(batch["coords"], SPEC)
    plan_j = (jax.tree.map(jnp.asarray, plan) if plan is not None else None)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    valid = np.asarray(batch["labels"]) >= 0
    region = _gt_regions(batch, valid)

    model = LearningBWDenseUNet(n_planes=(8, 16, 24), num_classes=20,
                                block_reps=1, residual_blocks=True)
    cfg = TrainConfig(lr=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), batch_j, SPEC,
                               cfg)
    step = jax.jit(make_train_step(model, SPEC, cfg, num_instances=16))
    parts = None
    for _ in range(N_STEPS):
        state, parts = step(state, batch_j, plan_j)

    assert np.isfinite(float(parts["total"])), parts
    ap = _instance_ap(model, state, batch, plan_j, region, valid)
    # calibration (experiments/r4_ap_gate_calib.py, round-4 tree, seed 7):
    # baseline AP@0.5 = 0.583 at 300 steps; occupancy loss zeroed -> 0.000
    # and embedding loss zeroed -> 0.417, both while the total loss still
    # falls — the mutations the loss-only floor cannot see fail this gate.
    assert ap > 0.5, f"instance AP@0.5 regressed: {ap:.3f}"
