"""Spatially-sharded flagship-model inference vs the unsharded apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.models import LearningBWDenseUNet
from occuseg_tpu.native import have_native
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.parallel.spatial import SPACE_AXIS
from occuseg_tpu.parallel.spatial_model import sharded_occuseg_infer

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="needs the C++ host plan builder")

D = 8
CAPS = (2048, 1024, 512)
PLANES = (8, 16, 24)


def test_sharded_infer_matches_unsharded():
    batch = make_batch(SceneConfig(num_points=2500, extent=40,
                                   num_objects=6), 1, 4096, 16, seed=0)
    plan = build_plan_host(batch["coords"], PlanSpec(caps=CAPS))
    plan_j = jax.tree.map(jnp.asarray, plan)
    pf = jnp.asarray(batch["features"])

    model = LearningBWDenseUNet(n_planes=PLANES, num_classes=20,
                                block_reps=1, residual_blocks=True)
    variables = model.init(jax.random.PRNGKey(0), pf, plan_j, False)
    # perturb running stats so eval-BN is a real affine, not near-identity
    rng = np.random.default_rng(1)
    variables = jax.tree.map(lambda a: a, variables)  # to mutable dicts

    def perturb(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = perturb(v)
            elif k == "running_mean":
                out[k] = jnp.asarray(
                    rng.standard_normal(v.shape).astype(np.float32) * 0.3)
            else:
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
        return out

    variables = {"params": variables["params"],
                 "batch_stats": perturb(variables["batch_stats"])}

    ref = model.apply(variables, pf, plan_j, False)

    mesh = Mesh(np.asarray(jax.devices()[:D]), (SPACE_AXIS,))
    got = sharded_occuseg_infer(variables, plan, pf, mesh, PLANES,
                                halo=256, pool=256)

    valid = np.asarray(plan.p2v) >= 0
    assert valid.sum() > 2000
    for name in ("features", "semantics", "embedding", "offset",
                 "displacement", "bw", "occupancy"):
        a = np.asarray(getattr(ref, name))[valid]
        b = np.asarray(getattr(got, name))[valid]
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-4,
                                   err_msg=name)
