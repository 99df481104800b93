"""Pallas fused BCE-membership kernel vs the pure-XLA [P, I] chain.

The kernel (ops/pallas/bce_loss.py) replaces the classification loss's
distance/BCE chain (reference `discriminative.py:40-117`); these tests
pin value- and gradient-equality against the XLA formulation on CPU
interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occuseg_tpu.losses.instance import LossConfig, classification_loss

P, I, E, S = 512, 16, 16, 2


def _data(seed=0, empty_instances=(3, 7), invalid_frac=0.2):
    rng = np.random.default_rng(seed)
    iid = rng.integers(0, I, P).astype(np.int32)
    for em in empty_instances:
        iid[iid == em] = (em + 1) % I
    iid[rng.random(P) < invalid_frac] = -1
    scene = (np.arange(P) // (P // S)).astype(np.int32)
    centers = rng.normal(0, 4.0, (I, 3))
    pose = (centers[np.clip(iid, 0, I - 1)]
            + rng.normal(0, 0.7, (P, 3))).astype(np.float32)
    labels = rng.integers(0, 20, P).astype(np.int32)
    e = rng.normal(0, 1.0, (P, E)).astype(np.float32)
    bw = rng.normal(0.5, 0.2, (P, 2)).astype(np.float32)
    disp = rng.normal(0, 0.3, (P, 3)).astype(np.float32)
    return (jnp.asarray(e), jnp.asarray(bw), jnp.asarray(pose),
            jnp.asarray(disp), jnp.asarray(iid), jnp.asarray(scene),
            jnp.asarray(labels))


def _run(e, bw, pose, disp, iid, scene, labels):
    cfg = LossConfig(min_instance_points=3)
    return classification_loss(e, bw, pose - disp, pose, iid, scene,
                               labels, S, I, cfg)


def _both_paths(fn, monkeypatch):
    monkeypatch.setenv("OCC_PALLAS_BCE", "1")
    a = fn()
    monkeypatch.setenv("OCC_PALLAS_BCE", "0")
    b = fn()
    return a, b


def test_kernel_dispatch_is_active(monkeypatch):
    from occuseg_tpu.ops.pallas import bce_loss
    monkeypatch.setenv("OCC_PALLAS_BCE", "1")
    assert bce_loss.supported(P, I, E)
    monkeypatch.setenv("OCC_PALLAS_BCE", "0")
    assert not bce_loss.supported(P, I, E)


def test_forward_matches_xla(monkeypatch):
    data = _data(1)
    (la, ma), (lb, mb) = _both_paths(lambda: _run(*data), monkeypatch)
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-5)
    np.testing.assert_allclose(float(ma), float(mb), rtol=2e-5)
    assert float(la) > 0


def test_gradients_match_xla(monkeypatch):
    e, bw, pose, disp, iid, scene, labels = _data(2)

    def loss_of(args):
        e_, bw_, disp_ = args
        l, _ = _run(e_, bw_, pose, disp_, iid, scene, labels)
        return l

    def grads():
        return jax.grad(loss_of)((e, bw, disp))

    (ga), (gb) = _both_paths(grads, monkeypatch)
    for a, b, name in zip(ga, gb, ("emb", "bw", "disp")):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=3e-5 * scale, rtol=2e-4,
                                   err_msg=name)
    assert np.abs(np.asarray(ga[0])).sum() > 0


def test_all_invalid_points(monkeypatch):
    e, bw, pose, disp, iid, scene, labels = _data(3)
    iid = jnp.full_like(iid, -1)
    (la, ma), (lb, mb) = _both_paths(
        lambda: _run(e, bw, pose, disp, iid, scene, labels), monkeypatch)
    assert np.isfinite(float(la)) and np.isfinite(float(lb))
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)


def test_unsupported_shapes_fall_back(monkeypatch):
    """P not a multiple of 128 silently uses the XLA chain."""
    monkeypatch.setenv("OCC_PALLAS_BCE", "1")
    e, bw, pose, disp, iid, scene, labels = _data(4)
    n = 300
    l, m = _run(e[:n], bw[:n], pose[:n], disp[:n], iid[:n], scene[:n],
                labels[:n])
    assert np.isfinite(float(l))
