"""C++ host plan builder: bit-exact equality with the jitted plan, and the
train step consuming a precomputed plan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occuseg_tpu.core.topology import PlanSpec, build_plan, validate_plan
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.models import LearningBWDenseUNet
from occuseg_tpu.native import have_native
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.train.state import create_train_state, make_train_step

from tests.utils import random_points

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="C++ native library unavailable")


def test_host_plan_equals_device_plan():
    rng = np.random.default_rng(0)
    pts = random_points(rng, 3000, extent=48, batch_size=2, pad_to=4096)
    spec = PlanSpec(caps=(4096, 4096, 2048, 1024))
    hp = build_plan_host(pts, spec)
    dp = build_plan(jnp.asarray(pts), spec)
    for li, (h, d) in enumerate(zip(hp.levels, dp.levels)):
        np.testing.assert_array_equal(h.keys, np.asarray(d.keys),
                                      err_msg=f"keys L{li}")
        np.testing.assert_array_equal(h.coords, np.asarray(d.coords),
                                      err_msg=f"coords L{li}")
        assert int(h.num_active) == int(d.num_active)
        np.testing.assert_array_equal(h.nbr, np.asarray(d.nbr),
                                      err_msg=f"nbr L{li}")
    for ti, (h, d) in enumerate(zip(hp.transitions, dp.transitions)):
        np.testing.assert_array_equal(h.child, np.asarray(d.child),
                                      err_msg=f"child {ti}")
        np.testing.assert_array_equal(h.up, np.asarray(d.up),
                                      err_msg=f"up {ti}")
    np.testing.assert_array_equal(hp.p2v, np.asarray(dp.p2v))
    rep = validate_plan(hp)
    assert all(v == 0 for v in rep.values()), rep


def test_train_step_with_host_plan():
    spec = PlanSpec(caps=(2048, 2048, 1024, 512))
    scene = SceneConfig(num_points=1200, extent=40, num_objects=5)
    batch_np = make_batch(scene, 1, 2048, 16, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = LearningBWDenseUNet(n_planes=(8, 16, 24, 32))
    state = create_train_state(model, jax.random.PRNGKey(0), batch, spec)
    step = jax.jit(make_train_step(model, spec, num_scenes=1,
                                   num_instances=16))
    hp = build_plan_host(batch_np["coords"], spec)
    plan = jax.tree.map(jnp.asarray, hp)
    s1, parts_host = step(state, batch, plan)
    s2, parts_dev = step(state, batch)  # in-jit plan
    np.testing.assert_allclose(float(parts_host["total"]),
                               float(parts_dev["total"]), rtol=1e-5)
