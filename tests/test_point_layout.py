"""Sorted point layout + blocked segment-sum kernel (ops/pallas/segsum.py).

The layout must be a pure permutation of the batch (training semantics are
order-invariant), and the scatter-free voxelize/devoxelize must equal the
XLA segment ops bit-for-bit in f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occuseg_tpu.core.point_layout import (
    apply_point_layout, augment_plan_with_point_layout, build_point_layout,
)
from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.ops import pool as pool_ops
from occuseg_tpu.ops.pallas.segsum import sorted_segment_sum

CAPS = (12_288, 8_192, 4_096, 2_048, 1_024, 512)
P_CAP = 24_576


@pytest.fixture(scope="module")
def setup():
    batch = make_batch(SceneConfig(num_points=12_000, extent=128,
                                   num_objects=8),
                       num_scenes=1, p_cap=P_CAP, num_instances=16, seed=3)
    plan = build_plan_host(batch["coords"], PlanSpec(caps=CAPS))
    if plan is None:
        pytest.skip("native plan builder unavailable")
    return batch, plan


def test_layout_invariants(setup):
    batch, plan = setup
    p2v = np.asarray(plan.p2v)
    lay = build_point_layout(p2v, CAPS[0], w=64, r=112)
    assert lay is not None
    perm, vox_seg = lay["perm"], lay["vox_seg"]
    B, _, R = vox_seg.shape
    # a permutation: every valid point appears exactly once
    valid = np.nonzero(p2v >= 0)[0]
    assert sorted(perm[perm >= 0]) == sorted(valid)
    # slot seg ids match the permuted p2v, relative to the block base
    flat = vox_seg.reshape(-1)
    main_p2v = lay["p2v"][:B * R]
    blk = np.repeat(np.arange(B), R) * 64
    ok = flat >= 0
    assert np.array_equal(main_p2v[ok], flat[ok] + blk[ok])
    assert np.all(main_p2v[~ok] == -1)
    # counts match a bincount of the original p2v
    ref = np.bincount(p2v[valid], minlength=CAPS[0])[:CAPS[0]]
    assert np.array_equal(lay["counts"], ref.astype(np.float32))


def test_kernel_equals_segment_sum(setup):
    batch, plan = setup
    lay = build_point_layout(np.asarray(plan.p2v), CAPS[0], w=64, r=112)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((P_CAP, 64)).astype(np.float32)
    got = np.asarray(sorted_segment_sum(
        jnp.asarray(x), jnp.asarray(lay["p2v"]), jnp.asarray(lay["vox_seg"]),
        CAPS[0]))
    p2v = lay["p2v"]
    seg = np.where(p2v >= 0, p2v, CAPS[0])
    ref = np.zeros((CAPS[0] + 1, 64), np.float32)
    np.add.at(ref, seg, x)
    np.testing.assert_allclose(got, ref[:CAPS[0]], rtol=1e-5, atol=1e-5)


def test_module_paths_agree(setup):
    """voxelize/devoxelize (values AND gradients) agree between the XLA
    scatter path and the sorted-layout kernel path."""
    batch, plan = setup
    plan2 = augment_plan_with_point_layout(plan, w=64, r=112)
    assert plan2.vox_seg is not None
    batch2 = apply_point_layout(batch, plan2)

    feats = jnp.asarray(batch["features"])
    feats2 = jnp.asarray(batch2["features"])

    def vox(f, p2v, vs, vc):
        return pool_ops.voxelize_features(f, p2v, CAPS[0], mode="mean",
                                          vox_seg=vs, vox_counts=vc)

    v_ref = vox(feats, jnp.asarray(plan.p2v), None, None)
    v_new = vox(feats2, jnp.asarray(plan2.p2v),
                jnp.asarray(plan2.vox_seg), jnp.asarray(plan2.vox_counts))
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)

    # devoxelize gradient: d_voxels must match the scatter-add of d_points
    vfeats = jnp.asarray(
        np.random.default_rng(1).standard_normal((CAPS[0], 32)), jnp.float32)

    def loss_new(v):
        pts = pool_ops.devoxelize_features(
            v, jnp.asarray(plan2.p2v), vox_seg=jnp.asarray(plan2.vox_seg))
        w = jnp.asarray(batch2["features"][:, :1])
        return jnp.sum(pts * pts * w)

    def loss_ref(v):
        pts = pool_ops.devoxelize_features(v, jnp.asarray(plan.p2v))
        w = jnp.asarray(batch["features"][:, :1])
        return jnp.sum(pts * pts * w)

    g_new = jax.grad(loss_new)(vfeats)
    g_ref = jax.grad(loss_ref)(vfeats)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_losses_order_invariant(setup):
    """The 6-term loss is identical on the permuted batch (the layout is a
    pure relabeling of point rows; every term is a segment reduction)."""
    import types

    from occuseg_tpu.losses.instance import occuseg_total_loss

    batch, plan = setup
    plan2 = augment_plan_with_point_layout(plan, w=64, r=112)
    batch2 = apply_point_layout(batch, plan2)
    perm = np.asarray(plan2.point_perm)
    rng = np.random.default_rng(7)
    P = P_CAP

    def head(shape):
        return rng.standard_normal(shape).astype(np.float32)

    outs = dict(semantics=head((P, 20)), embedding=head((P, 8)),
                offset=head((P, 1)), displacement=head((P, 3)),
                occupancy=head((P, 1)), bw=head((P, 2)))

    def permuted(a):
        pad = perm < 0
        out = a[np.maximum(perm, 0)]
        out[pad] = 0
        return out

    o1 = types.SimpleNamespace(**{k: jnp.asarray(v)
                                  for k, v in outs.items()})
    o2 = types.SimpleNamespace(**{k: jnp.asarray(permuted(v))
                                  for k, v in outs.items()})
    b1 = {k: jnp.asarray(v) for k, v in batch.items()}
    b2 = {k: jnp.asarray(v) for k, v in batch2.items()}
    l1, parts1 = occuseg_total_loss(o1, b1, 1, 16)
    l2, parts2 = occuseg_total_loss(o2, b2, 1, 16)
    for k in parts1:
        np.testing.assert_allclose(np.asarray(parts2[k]),
                                   np.asarray(parts1[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)


def test_no_fit_fallback():
    # all 16 points in one voxel, zero tail slack -> overflow can't fit
    p2v = np.zeros(16, np.int32)
    assert build_point_layout(p2v, 16, w=8, r=8) is None
    # w not dividing cap0
    assert build_point_layout(p2v, 12, w=8, r=8) is None
