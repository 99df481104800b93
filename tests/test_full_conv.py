"""True FullConvolution: active-set growth + values vs a dense oracle
(reference `FullConvolutionRules.h:11-56`, `fullConvolution.py:48-65`;
VERDICT r1 missing #3)."""

import numpy as np

import jax
import jax.numpy as jnp

from occuseg_tpu.core import coords as C
from occuseg_tpu.core.topology import (
    PlanSpec,
    build_plan,
    full_conv_plan,
    grow_keys,
)
from occuseg_tpu.core.sparse_tensor import SparseTensor
from occuseg_tpu.nn.modules import FullConvolution, SubmanifoldConvolution

from tests.utils import random_points

SIZE, STRIDE = 2, 2


def _level(seed=0, n=200, extent=12, cap=512):
    rng = np.random.default_rng(seed)
    pts = random_points(rng, n, extent=extent, batch_size=1, pad_to=cap)
    plan = build_plan(jnp.asarray(pts), PlanSpec(caps=(cap,)))
    return plan, rng


def test_grown_keys_match_numpy():
    plan, _ = _level()
    lvl = plan.levels[0]
    cap_out = lvl.cap * SIZE ** 3
    out_keys = np.asarray(grow_keys(lvl, SIZE, STRIDE, cap_out))
    coords = np.asarray(lvl.coords)
    n = int(lvl.num_active)
    expect = set()
    for i in range(n):
        b, z, y, x = coords[i]
        for dz in range(SIZE):
            for dy in range(SIZE):
                for dx in range(SIZE):
                    expect.add((b, z * STRIDE + dz, y * STRIDE + dy,
                                x * STRIDE + dx))
    got_coords = np.asarray(C.unpack(jnp.asarray(out_keys)))
    got = {tuple(c) for c in got_coords if c[0] >= 0}
    assert got == expect
    # sorted, deduped
    ok = out_keys[out_keys < np.iinfo(np.int64).max // 2]
    kvalid = out_keys[:len(got)]
    assert (np.diff(kvalid.astype(np.int64)) > 0).all()


def test_full_conv_matches_dense_transposed_conv():
    plan, rng = _level(seed=1)
    lvl = plan.levels[0]
    cin, cout = 6, 5
    n = int(lvl.num_active)
    feats = jnp.asarray(rng.standard_normal((lvl.cap, cin)), jnp.float32)
    mod = FullConvolution(out_features=cout, size=SIZE, stride=STRIDE,
                          build_nbr=False)
    x = SparseTensor(features=feats, num_active=lvl.num_active, level=0)
    vars_ = mod.init(jax.random.PRNGKey(0), x, plan)
    (out, new_plan) = mod.apply(vars_, x, plan)
    w = np.asarray(vars_["params"]["weight"])  # [8, cin, cout]

    # dense oracle
    coords = np.asarray(lvl.coords)[:n]
    f_np = np.asarray(feats)[:n]
    dense = {}
    k = 0
    for dz in range(SIZE):
        for dy in range(SIZE):
            for dx in range(SIZE):
                for i in range(n):
                    b, z, y, x_ = coords[i]
                    key = (b, z * STRIDE + dz, y * STRIDE + dy,
                           x_ * STRIDE + dx)
                    dense[key] = dense.get(key, 0) + f_np[i] @ w[k]
                k += 1
    out_coords = np.asarray(new_plan.levels[0].coords)
    out_np = np.asarray(out.features)
    n_out = int(new_plan.levels[0].num_active)
    assert n_out == len(dense)
    for j in range(n_out):
        key = tuple(out_coords[j])
        np.testing.assert_allclose(out_np[j], dense[key], rtol=1e-5,
                                   atol=1e-5)
    # padded rows are zero
    assert np.abs(out_np[n_out:]).max() == 0


def test_full_conv_gradients_flow_and_chainable():
    plan, rng = _level(seed=2)
    lvl = plan.levels[0]
    feats = jnp.asarray(rng.standard_normal((lvl.cap, 4)), jnp.float32)
    x = SparseTensor(features=feats, num_active=lvl.num_active, level=0)

    class Net:
        """FullConvolution then a submanifold conv on the GROWN topology."""

    import flax.linen as nn

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x, plan, train=False):
            y, new_plan = FullConvolution(out_features=8, size=SIZE,
                                          stride=STRIDE, name="full")(
                x, plan, train)
            z = SubmanifoldConvolution(8, name="sub")(y, new_plan, train)
            return z

    mod = Chain()
    vars_ = mod.init(jax.random.PRNGKey(1), x, plan)

    def loss(params, f):
        z = mod.apply(params, x.with_features(f), plan)
        return jnp.sum(z.features ** 2)

    val, g = jax.value_and_grad(loss, argnums=1)(vars_, feats)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
