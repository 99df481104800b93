"""Round-3 experiment F: grouped-lane-gather vs one-hot — REAL timings.

Previous timing attempts were invalid: repeated identical dispatches get
deduped by the tunnel (measured 0.03ms for a ~3ms kernel). Here every
iteration is chained through a 0-scaled slice of the previous output
(w_eff = w + prev*0), forcing real sequential executions inside ONE jit.

Levels L0/L1/L2 submanifold shapes, fwd kernels only (staging excluded,
measured separately by the staging line).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.setrecursionlimit(100_000)
    rng = np.random.default_rng(0)

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], spec)
    K, M = 27, 128

    def chain_time(fn, w_like, *args):
        """fn(w_eff, *args) -> out array; chains w_eff on prev output."""
        @jax.jit
        def many(w, *args):
            def body(i, carry):
                out = fn(w + carry, *args)
                return (out.reshape(-1)[0] * 0).astype(w.dtype)
            return jax.lax.fori_loop(0, N_ITERS, body,
                                     jnp.zeros((), w_like.dtype))
        with jax.enable_x64(False):
            jax.block_until_ready(many(w_like, *args))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(many(w_like, *args))
                best = min(best, (time.perf_counter() - t0) / N_ITERS)
        return best * 1e3

    for li, (cap, ch, U) in enumerate(zip(CAPS[:3], (64, 128, 192),
                                          (256, 320, 384))):
        C = cap // M
        NG = U // 128
        nbr = np.asarray(plan.levels[li].nbr)
        arrs = cc.build_chunk_arrays(nbr, M, U)
        if arrs is None:
            print(f"L{li}: overflow", flush=True)
            continue
        in_idx, lidx = map(jnp.asarray, arrs)
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w3 = jnp.asarray(rng.standard_normal((K, ch, ch)) * 0.05,
                         jnp.bfloat16)
        gin = cc._stage(feats, in_idx)
        ginT = jnp.swapaxes(gin, 1, 2)

        def onehot_fn(w_flat, lidx, gin):
            return cc._pallas_fwd(lidx, gin, w_flat, jnp.bfloat16, False)

        w_flat = w3.reshape(K * ch, ch)
        t_oh = chain_time(onehot_fn, w_flat, lidx, gin)

        def lane_kernel(lidx_ref, ginT_ref, w_ref, out_ref):
            ginT_t = ginT_ref[0].astype(jnp.float32)

            def body(k, acc):
                l = lidx_ref[0, k, :]
                lb = jnp.broadcast_to(l[None, :], (ch, M))
                g = jnp.zeros((ch, M), jnp.float32)
                for grp in range(NG):
                    idx = jnp.clip(lb - grp * 128, 0, 127)
                    part = jnp.take_along_axis(
                        ginT_t[:, grp * 128:(grp + 1) * 128], idx, axis=1)
                    g = jnp.where(
                        (lb >= grp * 128) & (lb < grp * 128 + 128), part, g)
                g = jnp.where(lb >= 0, g, 0.0).astype(jnp.bfloat16)
                return acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(0, K, body,
                                    jnp.zeros((M, ch), jnp.float32))
            out_ref[0] = acc.astype(out_ref.dtype)

        def lane_fn(w3_eff, lidx, ginT):
            return pl.pallas_call(
                lane_kernel,
                grid=(C,),
                in_specs=[
                    pl.BlockSpec((1, K, M), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ch, U), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, ch, ch), lambda c: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, M, ch), lambda c: (c, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, M, ch), jnp.bfloat16),
            )(lidx, ginT, w3_eff)

        try:
            with jax.enable_x64(False):
                got = np.asarray(jax.jit(lane_fn)(w3, lidx, ginT),
                                 np.float32)
                ref = np.asarray(jax.jit(onehot_fn)(w_flat, lidx, gin),
                                 np.float32)
            ok = np.allclose(got, ref, rtol=0.1, atol=0.1)
            t_lane = chain_time(lane_fn, w3, lidx, ginT)
            print(f"L{li} ch={ch} U={U} C={C}: one-hot {t_oh:.2f}ms | "
                  f"grouped-lane {t_lane:.2f}ms agree={ok}", flush=True)
        except Exception as e:
            print(f"L{li} lane FAIL: {repr(e)[:250]}", flush=True)

    # staging + transpose cost, chained on the feats input
    cap, ch, U = CAPS[0], 64, 256
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx = jnp.asarray(cc.build_chunk_arrays(nbr, M, U)[0])
    feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)

    def stage_fn(f_eff, in_idx):
        return cc._stage(f_eff, in_idx)

    def stage_t_fn(f_eff, in_idx):
        return jnp.swapaxes(cc._stage(f_eff, in_idx), 1, 2)

    def chain_feats(fn):
        @jax.jit
        def many(f, in_idx):
            def body(i, carry):
                out = fn(f + carry, in_idx)
                return (out.reshape(-1)[0] * 0).astype(f.dtype)
            return jax.lax.fori_loop(0, N_ITERS, body,
                                     jnp.zeros((), feats.dtype))
        with jax.enable_x64(False):
            jax.block_until_ready(many(feats, in_idx))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(many(feats, in_idx))
                best = min(best, (time.perf_counter() - t0) / N_ITERS)
        return best * 1e3

    print(f"L0 staging: {chain_feats(stage_fn):.2f}ms | "
          f"staging+transpose: {chain_feats(stage_t_fn):.2f}ms", flush=True)


if __name__ == "__main__":
    main()
