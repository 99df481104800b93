"""sparseconvnet-compatible shim: the reference docstring example ports."""

import numpy as np

import jax
import jax.numpy as jnp

import occuseg_tpu.legacy as scn
from occuseg_tpu.core import topology as T
from occuseg_tpu.core.sparse_tensor import SparseTensor

from tests.utils import random_points


def test_reference_docstring_example():
    """Model from the reference UNet docstring
    (`networkArchitectures.py:207-213`), built with scn-style calls."""
    rng = np.random.default_rng(0)
    pts = random_points(rng, 500, extent=32, batch_size=2, pad_to=1024)
    spec = T.PlanSpec(caps=(1024, 1024, 512, 256))
    plan = T.build_plan(jnp.asarray(pts), spec)
    n = int(plan.levels[0].num_active)

    model = scn.Sequential().add(
        scn.SubmanifoldConvolution(3, 3, 8, 3, False)).add(
        scn.UNet(3, 1, [8, 16, 24, 32], residual_blocks=True)).add(
        scn.BatchNormReLU(8))

    f = np.zeros((1024, 3), np.float32)
    f[:n] = rng.standard_normal((n, 3), dtype=np.float32)
    x = SparseTensor(features=jnp.asarray(f),
                     num_active=plan.levels[0].num_active, level=0)
    variables = model.init(jax.random.PRNGKey(0), x, plan, False)
    out = model.apply(variables, x, plan, False)
    assert out.features.shape == (1024, 8)
    assert np.isfinite(np.asarray(out.features)).all()


def test_tables():
    rng = np.random.default_rng(1)
    pts = random_points(rng, 300, extent=16, batch_size=1, pad_to=512)
    spec = T.PlanSpec(caps=(512, 256))
    plan = T.build_plan(jnp.asarray(pts), spec)
    x = SparseTensor(features=jnp.asarray(
        rng.standard_normal((512, 4)).astype(np.float32)),
        num_active=plan.levels[0].num_active, level=0)

    ct = scn.ConcatTable().add(scn.Identity()).add(
        scn.NetworkInNetwork(4, 4, False))
    model = scn.Sequential().add(ct).add(scn.AddTable())
    variables = model.init(jax.random.PRNGKey(0), x, plan, False)
    out = model.apply(variables, x, plan, False)
    assert out.features.shape == (512, 4)

    model2 = scn.Sequential().add(ct).add(scn.JoinTable())
    v2 = model2.init(jax.random.PRNGKey(0), x, plan, False)
    out2 = model2.apply(v2, x, plan, False)
    assert out2.features.shape == (512, 8)
