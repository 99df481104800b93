"""Loss library: finiteness, gradient flow, and directional sanity checks."""

import numpy as np

import jax
import jax.numpy as jnp

from occuseg_tpu.losses import (
    LossConfig,
    classification_loss,
    discriminative_loss,
    occuseg_total_loss,
    semantic_cross_entropy,
)
from occuseg_tpu.models.occuseg import OccuSegOutputs

P, I, S, E = 400, 16, 2, 8


def _batch(seed=0, n_valid=350):
    rng = np.random.default_rng(seed)
    iid = rng.integers(0, I, P).astype(np.int32)
    scene = (np.arange(P) * S // P).astype(np.int32)
    # make instances scene-consistent: instance k lives in scene k % S
    iid = np.where(scene == (iid % S), iid, (iid // S) * S + scene).astype(np.int32)
    labels = (iid % 18 + 2).astype(np.int32)  # all foreground
    iid[n_valid:] = -1
    labels[n_valid:] = -1
    pose = rng.standard_normal((P, 3)).astype(np.float32)
    batch = dict(
        labels=jnp.asarray(labels),
        instance_id=jnp.asarray(iid),
        point_scene=jnp.asarray(scene),
        pose=jnp.asarray(pose),
        offsets=jnp.asarray(rng.uniform(0, 1, (P, 1)).astype(np.float32)),
        displacements=jnp.asarray(
            rng.standard_normal((P, 3)).astype(np.float32) * 0.1),
        # per-instance-constant log-size, like the real GT (scannet.py:247)
        occupancy=jnp.asarray(
            np.log(np.maximum(np.bincount(np.maximum(iid, 0), minlength=I)[
                np.clip(iid, 0, I - 1)], 1)).astype(np.float32)[:, None]),
    )
    return rng, batch, iid, scene


def _outputs(rng, embedding=None):
    emb = (embedding if embedding is not None
           else rng.standard_normal((P, E)).astype(np.float32))
    return OccuSegOutputs(
        semantics=jnp.asarray(rng.standard_normal((P, 20)).astype(np.float32)),
        features=jnp.asarray(emb),
        embedding=jnp.asarray(emb),
        offset=jnp.asarray(rng.uniform(0, 1, (P, 1)).astype(np.float32)),
        displacement=jnp.asarray(
            rng.standard_normal((P, 3)).astype(np.float32) * 0.1),
        bw=jnp.asarray(rng.uniform(0.5, 2, (P, 2)).astype(np.float32)),
        occupancy=jnp.asarray(rng.uniform(1, 5, (P, 1)).astype(np.float32)),
    )


def test_semantic_ce_ignores_invalid():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((10, 5)).astype(np.float32))
    labels = jnp.asarray(np.array([0, 1, 2, 3, 4, -1, -1, -1, -1, -1],
                                  np.int32))
    l1 = semantic_cross_entropy(logits, labels)
    l2 = semantic_cross_entropy(logits[:5], labels[:5])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_discriminative_prefers_clustered_embeddings():
    rng, batch, iid, scene = _batch()
    centers = np.random.default_rng(9).standard_normal((I, E)) * 10
    clustered = np.where(
        (iid >= 0)[:, None],
        centers[np.clip(iid, 0, I - 1)]
        + 0.01 * rng.standard_normal((P, E)), 0).astype(np.float32)
    l_good = discriminative_loss(jnp.asarray(clustered),
                                 batch["instance_id"], batch["point_scene"],
                                 S, I)
    random = rng.standard_normal((P, E)).astype(np.float32) * 0.05
    l_bad = discriminative_loss(jnp.asarray(random), batch["instance_id"],
                                batch["point_scene"], S, I)
    assert float(l_good) < float(l_bad)
    assert np.isfinite(float(l_good)) and np.isfinite(float(l_bad))


def test_classification_loss_finite_and_iou_range():
    rng, batch, iid, scene = _batch(2)
    out = _outputs(rng)
    loss, miou = classification_loss(
        out.embedding, out.bw, batch["pose"] - out.displacement,
        batch["pose"], batch["instance_id"], batch["point_scene"],
        batch["labels"], S, I)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(miou) <= 1.0


def test_total_loss_and_gradients():
    rng, batch, iid, scene = _batch(3)
    out = _outputs(rng)

    def f(emb):
        o = out._replace(embedding=emb)
        total, parts = occuseg_total_loss(o, batch, S, I)
        return total

    total, parts = occuseg_total_loss(out, batch, S, I)
    for k, v in parts.items():
        assert np.isfinite(float(v)), k
    assert float(parts["semantic_loss"]) > 0
    g = jax.grad(f)(out.embedding)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # no gradient to padding rows
    assert np.all(np.asarray(g)[350:] == 0)


def test_loss_flag_selects_semantic_term():
    """--loss lovasz/focal/weighted changes the semantic term (values
    differ from CE) and gradients stay finite (VERDICT r2 #5; reference
    `train_instance.py:354-365`)."""
    rng, batch, iid, scene = _batch(11)
    out = _outputs(rng)
    base, _ = occuseg_total_loss(out, batch, S, I)
    vals = {}
    for kind in ("cross_entropy", "lovasz", "focal",
                 "weighted_cross_entropy"):
        cfg = LossConfig(semantic_loss=kind)
        total, parts = occuseg_total_loss(out, batch, S, I, cfg)
        vals[kind] = float(parts["semantic_loss"])
        assert np.isfinite(vals[kind]), kind

        def f(logits):
            o = out._replace(semantics=logits)
            t, _ = occuseg_total_loss(o, batch, S, I, cfg)
            return t

        g = jax.grad(f)(out.semantics)
        assert np.isfinite(np.asarray(g)).all(), kind
        assert float(jnp.abs(g).sum()) > 0, kind
    ce = vals.pop("cross_entropy")
    for kind, v in vals.items():
        assert abs(v - ce) > 1e-6, f"{kind} identical to CE"


def test_drift_weight_adds_term():
    """drift_weight > 0 adds a finite drift term to the total (reference
    `train_instance.py:240`, DriftLoss coefficient 50)."""
    rng, batch, iid, scene = _batch(12)
    out = _outputs(rng)
    t0, p0 = occuseg_total_loss(out, batch, S, I)
    assert "drift_loss" not in p0
    cfg = LossConfig(drift_weight=50.0)
    t1, p1 = occuseg_total_loss(out, batch, S, I, cfg)
    assert "drift_loss" in p1 and np.isfinite(float(p1["drift_loss"]))
    np.testing.assert_allclose(float(t1),
                               float(t0) + float(p1["drift_loss"]),
                               rtol=1e-5)

    def f(emb):
        o = out._replace(embedding=emb)
        t, _ = occuseg_total_loss(o, batch, S, I, cfg)
        return t

    g = jax.grad(f)(out.embedding)
    assert np.isfinite(np.asarray(g)).all()


def test_total_loss_point_sharded_matches_unsharded():
    """With points sharded over a mesh axis and axis_name set, every loss
    term (and its gradient path) must equal the unsharded computation —
    the spatial-training loss contract (VERDICT r2 #2: shard the losses)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as Pspec
    import numpy as np

    rng, batch, iid, scene = _batch(21)
    out = _outputs(rng)
    t_ref, p_ref = occuseg_total_loss(out, batch, S, I)

    D = 4
    perm = np.random.default_rng(0).permutation(P)
    mesh = Mesh(np.asarray(jax.devices()[:D]), ("space",))
    shard = lambda a: jnp.asarray(np.asarray(a)[perm]).reshape(
        (D, P // D) + a.shape[1:])
    out_sh = jax.tree.map(shard, out)
    batch_sh = {k: shard(v) for k, v in batch.items()}

    def shard_fn(o_sh, b_sh):
        o = jax.tree.map(lambda a: a[0], o_sh)
        b = {k: v[0] for k, v in b_sh.items()}
        return occuseg_total_loss(o, b, S, I, LossConfig(),
                                  axis_name="space")

    t, parts = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: Pspec("space"), out_sh),
                  {k: Pspec("space") for k in batch_sh}),
        out_specs=(Pspec(), jax.tree.map(lambda _: Pspec(), p_ref)),
    ))(out_sh, batch_sh)

    np.testing.assert_allclose(float(t), float(t_ref), rtol=2e-4)
    for k in p_ref:
        np.testing.assert_allclose(float(parts[k]), float(p_ref[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_perfect_occupancy_gives_zero_loss():
    rng, batch, iid, scene = _batch(4)
    out = _outputs(rng)._replace(occupancy=batch["occupancy"])
    _, parts = occuseg_total_loss(out, batch, S, I)
    assert float(parts["occupancy_loss"]) < 1e-5


def test_classification_bce_s_space_matches_prob_space():
    """The s-space BCE (two transcendental passes) must equal the original
    prob-space exp/clip/log/log1p chain."""
    rng = np.random.default_rng(0)
    s_raw = jnp.asarray(rng.uniform(0, 25, (1000,)), jnp.float32)
    member = jnp.asarray(rng.random(1000) < 0.3)

    prob = jnp.clip(jnp.exp(-s_raw), 1e-7, 1 - 1e-7)
    old = -(member * jnp.log(prob) + (~member) * jnp.log1p(-prob))

    s = jnp.clip(s_raw, 1.0000001e-7, 16.11809565095832)
    new = jnp.where(member, s, -jnp.log(-jnp.expm1(-s)))
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=1e-5, atol=1e-6)
    # decision boundary identical
    np.testing.assert_array_equal(
        np.asarray(jnp.exp(-s_raw) > 0.5),
        np.asarray(s_raw < 0.6931471805599453))


def test_onehot_segment_ops_match_scatter():
    """_seg_sum/_seg_max one-hot forms (num <= 128, the MXU path) equal
    jax.ops scatter forms."""
    from occuseg_tpu.losses.instance import _seg_max, _seg_sum

    rng = np.random.default_rng(3)
    P, num = 5000, 65
    seg = jnp.asarray(rng.integers(0, num, P).astype(np.int32))
    x2 = jnp.asarray(rng.standard_normal((P, 7)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal(P), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_seg_sum(x2, seg, num)),
        np.asarray(jax.ops.segment_sum(x2, seg, num_segments=num)),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(_seg_sum(x1, seg, num)),
        np.asarray(jax.ops.segment_sum(x1, seg, num_segments=num)),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(_seg_max(x1, seg, num, -1e30)),
        np.asarray(jax.ops.segment_max(x1, seg, num_segments=num)),
        rtol=1e-6)
