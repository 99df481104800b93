"""Round-2 experiment G: batched one-hot build vs per-offset loop.

Hypothesis: the 27 small [M,U]@[U,Cin] matmuls are MXU-latency bound
(~400 cycles each at ~2-3us of compute); batching all offsets' one-hots
into ONE [27M, U] compare + ONE [27M,U]@[U,Cin] matmul plus 27 cheap VMEM
block copies should approach compute-bound.

Uses REAL chunk tables from the bench scene. Times the fwd kernel only.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], spec)
    rng = np.random.default_rng(0)

    def v3_call(lidx, gin, w_flat, M, U, Cin, Cout, C, K):
        def kernel(lidx_ref, gin_ref, w_ref, out_ref, oh_s, gall_s, g_s):
            gin_b = gin_ref[0]
            iota = jax.lax.broadcasted_iota(jnp.int32, (M, U), 1)
            for k in range(K):
                l = lidx_ref[0, k, :]
                oh_s[k * M:(k + 1) * M, :] = (
                    l[:, None] == iota).astype(gin_b.dtype)
            gall_s[:] = jax.lax.dot_general(
                oh_s[:], gin_b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(gall_s.dtype)
            for k in range(K):
                g_s[:, k * Cin:(k + 1) * Cin] = gall_s[k * M:(k + 1) * M, :]
            out_ref[0] = jax.lax.dot_general(
                g_s[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, K, M), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U, Cin), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K * Cin, Cout), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, Cout), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, M, Cout), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((K * M, U), jnp.bfloat16),
                pltpu.VMEM((K * M, Cin), jnp.bfloat16),
                pltpu.VMEM((M, K * Cin), jnp.bfloat16),
            ],
        )(lidx, gin, w_flat)

    for li, (cap, ch, U) in enumerate(
            zip(CAPS[:3], (64, 128, 192), (256, 320, 384))):
        M = 128
        nbr = np.asarray(plan.levels[li].nbr)
        arrs = cc.build_chunk_arrays(nbr, M, U)
        if arrs is None:
            print(f"L{li}: overflow at U={U}", flush=True)
            continue
        in_idx, lidx = map(jnp.asarray, arrs)
        C, K = cap // M, 27
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, ch, ch)) * 0.05,
                        jnp.bfloat16)
        w_flat = w.reshape(K * ch, ch)

        def run_v2(f):
            return cc.chunk_gather_conv(f, in_idx, lidx, w).astype(
                jnp.float32)[0, 0]

        gin = None

        def run_v3(f):
            g = cc._stage(f, in_idx)
            with jax.enable_x64(False):
                o = v3_call(lidx, g, w_flat, M, U, ch, ch, C, K)
            return o.astype(jnp.float32)[0, 0, 0]

        # correctness
        with jax.enable_x64(False):
            o2 = cc.chunk_gather_conv(feats, in_idx, lidx, w)
            g = cc._stage(feats, in_idx)
            o3 = v3_call(lidx, g, w_flat, M, U, ch, ch, C, K)
        err = float(jnp.max(jnp.abs(
            o2.astype(jnp.float32)
            - o3.reshape(-1, ch).astype(jnp.float32))))

        def timed(fn):
            @jax.jit
            def many(f):
                def body(i, a):
                    return a + fn(f)
                return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
            jax.block_until_ready(many(feats))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(many(feats))
                best = min(best, (time.perf_counter() - t0) / 10)
            return best * 1e3

        t2, t3 = timed(run_v2), timed(run_v3)
        print(f"L{li} ch={ch} U={U}: v2 {t2:.2f}ms  v3 {t3:.2f}ms  "
              f"maxerr={err:.3f}", flush=True)


if __name__ == "__main__":
    main()
