"""Transition chunk geometry (M_trans) parity.

K=8 transitions do ~4x less per-grid-step work than K=27 submanifold
convs, so at M=128 the per-step overhead dominates them on silicon;
`augment_plan_with_chunks(M_trans=256)` (or OCC_TRANS_M=256) rebuilds
ONLY the child/up chunk tables at a coarser geometry. Values and
gradients must be identical to the M=128 tables and to the dense oracle.
"""

import numpy as np

import jax
import jax.numpy as jnp

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.ops.pallas.chunk_conv import (
    augment_plan_with_chunks,
    chunk_gather_conv_t,
)

CAPS = (8192, 4096, 2048)


def _dense_ref(feats, table, w):
    f, t, w = np.asarray(feats), np.asarray(table), np.asarray(w)
    out = np.zeros((t.shape[0], w.shape[2]), np.float32)
    for k in range(t.shape[1]):
        m = t[:, k] >= 0
        out[m] += f[t[m, k]] @ w[k]
    return out


def test_transition_chunks_match_across_m():
    batch = make_batch(SceneConfig(num_points=6000, extent=96,
                                   num_objects=6),
                       num_scenes=1, p_cap=16384, num_instances=16, seed=0)
    plan = build_plan_host(batch["coords"], PlanSpec(caps=CAPS))
    if plan is None:  # no C++ toolchain
        import pytest
        pytest.skip("native planner unavailable")
    rng = np.random.default_rng(0)

    grads = {}
    for m_t in (128, 256):
        tp = augment_plan_with_chunks(plan, M_trans=m_t)
        for ti, tr in enumerate(tp.transitions):
            cases = (("child", tr.child_chunks, tr.up_chunks,
                      plan.transitions[ti].child, CAPS[ti]),
                     ("up", tr.up_chunks, tr.child_chunks,
                      plan.transitions[ti].up, CAPS[ti + 1]))
            for tag, fc, tc, table, nin in cases:
                assert fc is not None and tc is not None, (ti, tag, m_t)
                K = np.asarray(table).shape[1]
                rr = np.random.default_rng(ti * 10 + (tag == "up"))
                feats = jnp.asarray(rr.standard_normal((nin, 16)),
                                    jnp.float32)
                w = jnp.asarray(rr.standard_normal((K, 16, 32)) * 0.1,
                                jnp.float32)

                def loss(f_, w_, fc=fc, tc=tc):
                    o = chunk_gather_conv_t(
                        f_, jnp.asarray(fc.in_idx), jnp.asarray(fc.lidx),
                        jnp.asarray(tc.in_idx), jnp.asarray(tc.lidx), w_,
                        tmask=jnp.asarray(fc.tmask),
                        t_tmask=jnp.asarray(tc.tmask))
                    return jnp.sum(o.astype(jnp.float32) ** 2), o

                (v, out), g = jax.value_and_grad(
                    loss, argnums=(0, 1), has_aux=True)(feats, w)
                ref = _dense_ref(feats, table, w)
                np.testing.assert_allclose(np.asarray(out), ref,
                                           atol=2e-5, rtol=1e-5)
                key = (ti, tag)
                gf, gw = np.asarray(g[0]), np.asarray(g[1])
                if key in grads:
                    np.testing.assert_allclose(gf, grads[key][0],
                                               atol=2e-4, rtol=1e-4)
                    np.testing.assert_allclose(gw, grads[key][1],
                                               atol=2e-4, rtol=1e-4)
                else:
                    grads[key] = (gf, gw)
