"""Round-2 experiment H: int16 one-hot compares.

The per-offset one-hot build (compare [M,U] + cast to bf16) serializes
with the MXU matmuls; 16-bit lanes pack 2x per vreg, so i16 lidx + i16
iota should halve the VPU cost. Isolated fwd-kernel timing with REAL
chunk tables, i32 vs i16.
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

    def make_call(M, U, Cin, Cout, C, K, idt):
        def kernel(lidx_ref, gin_ref, w_ref, out_ref, g_s):
            gin_b = gin_ref[0]
            if idt == jnp.int16:
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (M, U), 1).astype(jnp.int16)
            else:
                iota = jax.lax.broadcasted_iota(jnp.int32, (M, U), 1)
            for k in range(K):
                l = lidx_ref[0, k, :]
                oh = (l[:, None] == iota).astype(gin_b.dtype)
                g = jax.lax.dot_general(
                    oh, gin_b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g_s[:, k * Cin:(k + 1) * Cin] = g.astype(g_s.dtype)
            out_ref[0] = jax.lax.dot_general(
                g_s[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        def call(lidx, gin, w_flat):
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
                scratch_shapes=[pltpu.VMEM((M, K * Cin), jnp.bfloat16)],
            )(lidx, gin, w_flat)
        return call

    for li, (cap, ch, U) in enumerate(
            zip(CAPS[:3], (64, 128, 192), (256, 320, 384))):
        M = 128
        nbr = np.asarray(plan.levels[li].nbr)
        arrs = cc.build_chunk_arrays(nbr, M, U)
        if arrs is None:
            continue
        in_idx, lidx32 = arrs
        C, K = cap // M, 27
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w_flat = jnp.asarray(rng.standard_normal((K * ch, ch)) * 0.05,
                             jnp.bfloat16)
        gin = cc._stage(feats, jnp.asarray(in_idx))

        results = {}
        for name, idt, lx in (("i32", jnp.int32, lidx32),
                              ("i16", jnp.int16,
                               lidx32.astype(np.int16))):
            call = make_call(M, U, ch, ch, C, K, idt)
            lxj = jnp.asarray(lx)

            with jax.enable_x64(False):
                try:
                    out = jax.block_until_ready(
                        jax.jit(call)(lxj, gin, w_flat))
                except Exception as e:
                    print(f"L{li} {name}: FAIL {repr(e)[:160]}", flush=True)
                    continue

                @jax.jit
                def many(a, b, c):
                    def body(i, acc):
                        return acc + call(a, b, c)[0, 0, 0].astype(
                            jnp.float32)
                    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
                jax.block_until_ready(many(lxj, gin, w_flat))
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(many(lxj, gin, w_flat))
                    best = min(best, (time.perf_counter() - t0) / 10)
            results[name] = (best * 1e3, np.asarray(out[0, 0, :4],
                                                    np.float32))
        if "i32" in results and "i16" in results:
            t32, o32 = results["i32"]
            t16, o16 = results["i16"]
            agree = np.allclose(o32, o16, rtol=1e-2, atol=1e-2)
            print(f"L{li} ch={ch}: i32 {t32:.2f}ms  i16 {t16:.2f}ms  "
                  f"agree={agree}", flush=True)


if __name__ == "__main__":
    main()
