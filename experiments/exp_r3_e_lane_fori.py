"""Round-3 experiment E: grouped-lane-gather kernel via fori_loop.

exp_r3_d: the unrolled K=27 kernel dies in client-side lowering
(RecursionError) and even K=3 takes ~17 min of server compile. This
variant rolls the offset loop into lax.fori_loop (one body codegen) and
bisects where the compile time goes. Run order: most informative first,
each timed for compile AND run.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def time_jit(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


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
    li, cap, ch, U = 0, CAPS[0], 64, 256
    NG = U // 128
    C = cap // M
    nbr = np.asarray(plan.levels[li].nbr)
    in_idx, lidx = map(jnp.asarray, cc.build_chunk_arrays(nbr, M, U))
    feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((K, ch, ch)) * 0.05, jnp.bfloat16)
    gin = cc._stage(feats, in_idx)
    ginT = jnp.swapaxes(gin, 1, 2)
    w_flat = w3.reshape(K * ch, ch)

    @jax.jit
    def onehot_call(lidx, gin, w_flat):
        with jax.enable_x64(False):
            return cc._pallas_fwd(lidx, gin, w_flat, jnp.bfloat16, False)
    t_oh = time_jit(onehot_call, lidx, gin, w_flat)
    ref = np.asarray(onehot_call(lidx, gin, w_flat), np.float32)
    print(f"one-hot baseline: {t_oh:.2f}ms", flush=True)

    def make_lane_fori(n_k):
        def kernel(lidx_ref, ginT_ref, w_ref, out_ref):
            ginT = ginT_ref[0].astype(jnp.float32)   # [ch, U]

            def body(k, acc):
                l = lidx_ref[0, k, :]                # [M]
                lb = jnp.broadcast_to(l[None, :], (ch, M))
                g = jnp.zeros((ch, M), jnp.float32)
                for grp in range(NG):
                    idx = jnp.clip(lb - grp * 128, 0, 127)
                    part = jnp.take_along_axis(
                        ginT[:, grp * 128:(grp + 1) * 128], idx, axis=1)
                    g = jnp.where(
                        (lb >= grp * 128) & (lb < grp * 128 + 128), part, g)
                g = jnp.where(lb >= 0, g, 0.0).astype(jnp.bfloat16)
                return acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(0, n_k, body,
                                    jnp.zeros((M, ch), jnp.float32))
            out_ref[0] = acc.astype(out_ref.dtype)

        def call(lidx, ginT, w3):
            return pl.pallas_call(
                kernel,
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
            )(lidx, ginT, w3)
        return call

    for n_k, label in ((K, "fori K=27 NG=2"),):
        try:
            t0 = time.perf_counter()
            with jax.enable_x64(False):
                out = jax.block_until_ready(
                    jax.jit(make_lane_fori(n_k))(lidx, ginT, w3))
            t_c = time.perf_counter() - t0
            got = np.asarray(out, np.float32)
            ok = np.allclose(got, ref, rtol=0.1, atol=0.1)
            t_l = time_jit(jax.jit(make_lane_fori(n_k)), lidx, ginT, w3)
            print(f"{label}: compile {t_c:.0f}s run {t_l:.2f}ms agree={ok}",
                  flush=True)
        except Exception as e:
            print(f"{label} FAIL: {repr(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
