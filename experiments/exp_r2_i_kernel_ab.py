"""Round-2 experiment I: careful kernel A/B — scratch-form vs form-A
(per-offset acc += (OH@gin)@W_k), M=128 vs M=256, and bf16 compares where
U <= 256 (exact int representation). Real chunk tables, fwd kernel only,
staging excluded (pre-staged input) to isolate kernel cost.
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

    def make_call(form, M, U, Cin, Cout, C, K, cmp_bf16=False):
        def kernel(lidx_ref, gin_ref, w_ref, out_ref, g_s):
            gin_b = gin_ref[0]
            if cmp_bf16:
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (M, U), 1).astype(jnp.bfloat16)
            else:
                iota = jax.lax.broadcasted_iota(jnp.int32, (M, U), 1)
            if form == "scratch":
                for k in range(K):
                    l = lidx_ref[0, k, :]
                    oh = (l[:, None] == iota).astype(gin_b.dtype)
                    g = jax.lax.dot_general(
                        oh, gin_b,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    g_s[:, k * Cin:(k + 1) * Cin] = g.astype(g_s.dtype)
                out_ref[0] = jax.lax.dot_general(
                    g_s[:], w_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_ref.dtype)
            else:  # form A: per-offset chained dots, no scratch
                acc = jnp.zeros((M, Cout), jnp.float32)
                for k in range(K):
                    l = lidx_ref[0, k, :]
                    oh = (l[:, None] == iota).astype(gin_b.dtype)
                    g = jax.lax.dot_general(
                        oh, gin_b,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(
                        gin_b.dtype)
                    acc = acc + jax.lax.dot_general(
                        g, w_ref[k], dimension_numbers=(((1,), (0,)),
                                                        ((), ())),
                        preferred_element_type=jnp.float32)
                out_ref[0] = acc.astype(out_ref.dtype)

        w_shape = (K * Cin, Cout) if form == "scratch" else (K, Cin, Cout)
        w_index = (lambda c: (0, 0)) if form == "scratch" \
            else (lambda c: (0, 0, 0))
        scratch = [pltpu.VMEM((M, K * Cin), jnp.bfloat16)]

        def call(lidx, gin, w):
            return pl.pallas_call(
                kernel,
                grid=(C,),
                in_specs=[
                    pl.BlockSpec((1, K, M), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, U, Cin), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(w_shape, w_index,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, M, Cout), lambda c: (c, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, M, Cout), jnp.bfloat16),
                scratch_shapes=scratch,
            )(lidx, gin, w)
        return call

    K = 27
    for li, (cap, ch) in enumerate(zip(CAPS[:2], (64, 128))):
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w3 = jnp.asarray(rng.standard_normal((K, ch, ch)) * 0.05,
                         jnp.bfloat16)
        w_flat = w3.reshape(K * ch, ch)
        ref4 = None
        for M, U in ((128, 256 if li == 0 else 320), (256, 512)):
            nbr = np.asarray(plan.levels[li].nbr)
            arrs = cc.build_chunk_arrays(nbr, M, U)
            if arrs is None:
                print(f"L{li} M={M}: overflow", flush=True)
                continue
            in_idx, lidx = map(jnp.asarray, arrs)
            C = cap // M
            gin = cc._stage(feats, in_idx)
            variants = [("scratch", False), ("formA", False)]
            if U <= 256:
                variants.append(("scratch", True))
            for form, cb in variants:
                lx = lidx
                if cb:
                    lx = lidx.astype(jnp.bfloat16)
                call = make_call(form, M, U, ch, ch, C, K, cmp_bf16=cb)
                w_arg = w_flat if form == "scratch" else w3
                with jax.enable_x64(False):
                    try:
                        out = jax.block_until_ready(
                            jax.jit(call)(lx, gin, w_arg))
                    except Exception as e:
                        print(f"L{li} M={M} {form} bf16cmp={cb}: "
                              f"FAIL {repr(e)[:120]}", flush=True)
                        continue

                    @jax.jit
                    def many(a, b, c):
                        def body(i, acc):
                            return acc + call(a, b, c)[0, 0, 0].astype(
                                jnp.float32)
                        return jax.lax.fori_loop(0, 10, body,
                                                 jnp.float32(0))
                    jax.block_until_ready(many(lx, gin, w_arg))
                    best = 1e9
                    for _ in range(3):
                        t0 = time.perf_counter()
                        jax.block_until_ready(many(lx, gin, w_arg))
                        best = min(best, (time.perf_counter() - t0) / 10)
                o4 = np.asarray(out[0, 0, :4], np.float32)
                if ref4 is None:
                    ref4 = o4
                agree = np.allclose(o4, ref4, rtol=0.05, atol=0.05)
                print(f"L{li} ch={ch} M={M} U={U} {form} bf16cmp={cb}: "
                      f"{best*1e3:.2f}ms agree={agree}", flush=True)


if __name__ == "__main__":
    main()
