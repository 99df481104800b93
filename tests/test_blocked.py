"""Blocked multi-scene batch layout (native/blocked.py).

Verifies the per-scene sub-cap row layout against the concatenated plan:
same topology per scene, same model outputs per POINT (point order is
layout-invariant), chunk kernels equal to the XLA path on blocked plans,
and the train-step losses match the concatenated layout. The layout
exists for batch>1 gather bandwidth on TPU (PERF.md batch-4 breakdown);
these tests pin the semantics on CPU.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.native import _load
from occuseg_tpu.native.blocked import (
    blocked_scene_caps,
    build_plan_host_blocked,
)
from occuseg_tpu.native.plan import build_plan_host

pytestmark = pytest.mark.skipif(_load() is None,
                                reason="native library unavailable")

NS = 2
P_CAP = 4096
I_CAP = 16
CAPS = (2304, 2304, 1536, 1152)


def _batch(seed=7):
    # sparse enough that no level truncates in EITHER layout (truncation
    # points differ between the layouts by construction)
    cfg = SceneConfig(num_points=900, extent=64, num_objects=6)
    return make_batch(cfg, NS, P_CAP, I_CAP, seed=seed)


def _plans(batch):
    spec = PlanSpec(caps=CAPS)
    blocked = build_plan_host_blocked(batch["coords"], spec, NS)
    concat = build_plan_host(batch["coords"], spec)
    assert blocked is not None and concat is not None
    return blocked, concat


def test_scene_caps_alignment():
    assert blocked_scene_caps((2304, 1000), 2) == (1152, 768)
    assert blocked_scene_caps((384,), 4) == (384,)
    for c in blocked_scene_caps((786432, 300000, 100000), 4):
        assert c % 384 == 0


def test_blocked_plan_invariants():
    batch = _batch()
    blocked, concat = _plans(batch)
    scaps = blocked_scene_caps(CAPS, NS)
    coords = batch["coords"]
    # num_active: [ns] vector whose sum matches the concatenated count
    for li, lvl in enumerate(blocked.levels):
        n = np.asarray(lvl.num_active)
        assert n.shape == (NS,)
        assert int(n.sum()) == int(concat.levels[li].num_active)
        assert lvl.keys.shape[0] == NS * scaps[li]
    # p2v points at rows whose stored coords equal the point's voxel
    p2v = np.asarray(blocked.p2v)
    vc = np.asarray(blocked.levels[0].coords)
    valid = p2v >= 0
    np.testing.assert_array_equal(vc[p2v[valid]], coords[valid])
    # every real point of a real scene is mapped (caps are ample here)
    real = coords[:, 0] >= 0
    assert valid[real].all()
    # neighbor maps stay scene-pure: values of scene s's rows lie in
    # scene s's block (or -1)
    for li, lvl in enumerate(blocked.levels):
        nbr = np.asarray(lvl.nbr)
        sc = scaps[li]
        for s in range(NS):
            blk = nbr[s * sc:(s + 1) * sc]
            hit = blk >= 0
            assert ((blk[hit] >= s * sc) & (blk[hit] < (s + 1) * sc)).all()


def test_blocked_plan_validates():
    """validate_plan's invariant checks hold on the blocked layout."""
    from occuseg_tpu.core.topology import validate_plan

    batch = _batch(12)
    blocked, concat = _plans(batch)
    for plan in (blocked, concat):
        report = validate_plan(plan)
        assert all(v == 0 for v in report.values()), report


def test_blocked_forward_matches_concat():
    """Per-point eval outputs are layout-invariant (XLA conv path)."""
    from occuseg_tpu.models import InstanceDenseUNet

    batch = _batch(8)
    blocked, concat = _plans(batch)
    feats = jnp.asarray(batch["features"])
    model = InstanceDenseUNet(n_planes=(8, 16, 24, 32), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), feats, concat, False)
    out_c = model.apply(variables, feats, concat, False)
    out_b = model.apply(variables, feats, blocked, False)
    np.testing.assert_allclose(np.asarray(out_b.semantics),
                               np.asarray(out_c.semantics),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b.embedding),
                               np.asarray(out_c.embedding),
                               rtol=1e-5, atol=1e-5)


def test_blocked_chunks_scene_local():
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    batch = _batch(9)
    blocked, _ = _plans(batch)
    aug = augment_plan_with_chunks(blocked)
    scaps = blocked_scene_caps(CAPS, NS)
    for li, lvl in enumerate(aug.levels):
        assert lvl.chunks is not None, f"level {li} chunk overflow"
        assert lvl.chunks.ns == NS
        # in_idx values are scene-LOCAL (within the sub-cap)
        ii = np.asarray(lvl.chunks.in_idx)
        assert ii.max() < scaps[li]
    for tr in aug.transitions:
        assert tr.child_chunks is not None and tr.up_chunks is not None
        assert tr.child_chunks.ns == NS


def test_blocked_chunk_conv_matches_xla():
    """Fused chunk kernels on a blocked plan == XLA gather path."""
    from occuseg_tpu.models import InstanceDenseUNet
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    batch = _batch(10)
    blocked, _ = _plans(batch)
    aug = augment_plan_with_chunks(blocked)
    feats = jnp.asarray(batch["features"])
    model = InstanceDenseUNet(n_planes=(8, 16, 24, 32), num_classes=20)
    variables = model.init(jax.random.PRNGKey(1), feats, blocked, False)
    out_x = model.apply(variables, feats, blocked, False)
    out_k = model.apply(variables, feats, aug, False)
    np.testing.assert_allclose(np.asarray(out_k.semantics),
                               np.asarray(out_x.semantics),
                               rtol=2e-4, atol=2e-4)


def test_blocked_train_step_matches_concat():
    """Full train step (6-term loss + Adam) gives the same losses on the
    blocked and concatenated layouts (BN reduction order differs -> tol)."""
    from occuseg_tpu.models import LearningBWDenseUNet
    from occuseg_tpu.train.state import (
        TrainConfig, create_train_state, make_train_step,
    )

    batch = _batch(11)
    blocked, concat = _plans(batch)
    spec = PlanSpec(caps=CAPS)
    model = LearningBWDenseUNet(n_planes=(8, 16, 24, 32), num_classes=20)
    bj = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(model, jax.random.PRNGKey(0), bj, spec,
                               TrainConfig())
    step = jax.jit(make_train_step(model, spec, num_scenes=NS,
                                   num_instances=I_CAP))
    _, parts_c = step(state, bj, jax.tree.map(jnp.asarray, concat))
    _, parts_b = step(state, bj, jax.tree.map(jnp.asarray, blocked))
    for k in parts_c:
        np.testing.assert_allclose(float(parts_b[k]), float(parts_c[k]),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"loss part {k}")


def test_blocked_point_gather_matches_global():
    """Per-scene windowed point IO (`pool._point_gather`, ns>1 + sorted
    layout) equals the global gather, forward and backward — the blocked
    devoxelize/voxelize path (r5: XLA row gathers from multi-scene tables
    run ~10x slower than per-scene window gathers, PERF.md batch-4)."""
    from occuseg_tpu.core.point_layout import (
        augment_plan_with_point_layout,
    )
    from occuseg_tpu.ops import pool as pool_ops
    from occuseg_tpu.ops.gather import gather_rows

    batch = _batch(13)
    blocked, _ = _plans(batch)
    plan = augment_plan_with_point_layout(blocked)
    assert plan.vox_seg is not None, "layout must fit for this test"
    p2v = jnp.asarray(plan.p2v)
    vox_seg = jnp.asarray(plan.vox_seg)
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.normal(size=(CAPS[0], 8)).astype(np.float32))

    out_w = pool_ops._point_gather(vox, p2v, vox_seg, NS)
    out_g = gather_rows(vox, p2v)
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(out_g))

    # full devoxelize custom_vjp: forward + backward vs the plain path
    f_w = lambda v: pool_ops.devoxelize_features(v, p2v, vox_seg, ns=NS).sum()
    f_g = lambda v: gather_rows(v, p2v).sum()
    np.testing.assert_allclose(np.asarray(jax.grad(f_w)(vox)),
                               np.asarray(jax.grad(f_g)(vox)),
                               rtol=1e-6, atol=1e-6)

    # voxelize backward is the windowed gather of the cotangent
    pts = jnp.asarray(rng.normal(size=(p2v.shape[0], 8)).astype(np.float32))
    g_w = jax.grad(lambda x: pool_ops.voxelize_features(
        x, p2v, CAPS[0], mode="sum", vox_seg=vox_seg,
        vox_counts=jnp.asarray(plan.vox_counts), ns=NS).sum())(pts)
    g_g = jax.grad(lambda x: pool_ops.voxelize_features(
        x, p2v, CAPS[0], mode="sum", vox_seg=vox_seg,
        vox_counts=jnp.asarray(plan.vox_counts)).sum())(pts)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_g),
                               rtol=1e-6, atol=1e-6)


def test_scene_split_matches_merged(monkeypatch):
    """OCC_SCENE_SPLIT=1 (per-scene staging+kernel dispatches) is
    numerically identical to the merged ns-scene dispatch, values and
    grads, for submanifold convs AND transitions."""
    from occuseg_tpu.models import InstanceDenseUNet
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    batch = _batch(14)
    blocked, _ = _plans(batch)
    aug = augment_plan_with_chunks(blocked)
    feats = jnp.asarray(batch["features"])
    model = InstanceDenseUNet(n_planes=(8, 16, 24, 32), num_classes=20)
    variables = model.init(jax.random.PRNGKey(2), feats, aug, False)

    def loss(v, f):
        out = model.apply(v, f, aug, False)
        return (jnp.sum(out.semantics ** 2)
                + jnp.sum(out.embedding ** 2)).astype(jnp.float32)

    monkeypatch.setenv("OCC_SCENE_SPLIT", "0")
    l0, g0 = jax.value_and_grad(loss)(variables, feats)
    monkeypatch.setenv("OCC_SCENE_SPLIT", "1")
    l1, g1 = jax.value_and_grad(loss)(variables, feats)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    jax.tree.map(lambda a0, a1: np.testing.assert_allclose(
        np.asarray(a1), np.asarray(a0), rtol=1e-5, atol=1e-6), g0, g1)
