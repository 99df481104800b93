"""Round-2 experiment B: Mosaic dynamic_gather with BITWIDTH-MATCHED indices.

Experiment A revealed the real constraint: `tpu.dynamic_gather` requires
indices and data of the SAME bitwidth (bf16 data -> 16-bit indices). All
chunk-local indices fit int16 (U <= 32k), so test:
  1. bf16 data + int16 indices (take_along_axis form)
  2. f32 data + int32 indices
  3. chunk conv kernel with real in-VMEM gather (bf16/int16), timed at
     L0-like scale vs the one-hot variant (3.3ms) and XLA (17.2ms).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        log(f"[OK] {name} ({time.time() - t0:.1f}s): {out}")
        return out
    except Exception as e:
        log(f"[FAIL] {name} ({time.time() - t0:.1f}s): {repr(e)[:600]}")
        traceback.print_exc(limit=3)
        return None


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"devices: {jax.devices()}")

    # -------------------------------------------------------------
    # 1/2. minimal same-shape take_along_axis gathers
    # -------------------------------------------------------------
    def make_perm_test(data_dtype, idx_dtype, N=1024, C=128):
        def kernel(idx_ref, x_ref, o_ref):
            idx = idx_ref[:]  # [N, C] already broadcast
            o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)

        def run():
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.standard_normal((N, C)), data_dtype)
            perm = rng.integers(0, N, N).astype(idx_dtype)
            idxb = jnp.asarray(np.broadcast_to(perm[:, None], (N, C)))
            with jax.enable_x64(False):
                out = pl.pallas_call(
                    kernel,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N, C), data_dtype),
                )(idxb, x)
                out = jax.block_until_ready(out)
            ref = np.asarray(x)[perm]
            err = float(np.max(np.abs(np.asarray(out, np.float32)
                                      - ref.astype(np.float32))))
            return f"maxerr={err}"
        return run

    ok16 = step("take_along_axis bf16 data + int16 idx",
                make_perm_test(jnp.bfloat16, np.int16))
    ok32 = step("take_along_axis f32 data + int32 idx",
                make_perm_test(jnp.float32, np.int32))
    step("take_along_axis bf16 data + uint16 idx",
         make_perm_test(jnp.bfloat16, np.uint16))

    # -------------------------------------------------------------
    # 3. chunk conv with real gather: gin [C,U,Cin] staged per chunk,
    #    lidx [C,K,U] int16 (padded from M to U), out [C,M,Cout].
    # -------------------------------------------------------------
    def test_chunk_gather(M, U, Cin, Cout, C, idx_dtype=np.int16,
                          dtype=jnp.bfloat16):
        K = 27

        def kernel(lidx_ref, gin_ref, w_ref, out_ref):
            gin = gin_ref[0]                     # [U, Cin]
            acc = jnp.zeros((M, Cout), jnp.float32)
            for k in range(K):
                idx = lidx_ref[0, k, :]          # [U] (first M real)
                idxb = jnp.broadcast_to(idx[:, None], (U, Cin))
                g = jnp.take_along_axis(gin, idxb, axis=0)  # [U, Cin]
                acc = acc + jax.lax.dot_general(
                    g[:M], w_ref[k],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(dtype)

        rng = np.random.default_rng(1)
        # last staged row (U-1) is reserved as the zero row for missing
        lidx = rng.integers(0, U, (C, K, U)).astype(idx_dtype)
        gin = rng.standard_normal((C, U, Cin)).astype(np.float32)
        gin[:, U - 1] = 0.0
        w = (rng.standard_normal((K, Cin, Cout)) * 0.05).astype(np.float32)
        lidx_j = jnp.asarray(lidx)
        gin_j = jnp.asarray(gin, dtype)
        w_j = jnp.asarray(w, dtype)

        def call(a, b, c):
            return pl.pallas_call(
                kernel,
                grid=(C,),
                in_specs=[
                    pl.BlockSpec((1, K, U), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, U, Cin), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, Cin, Cout), lambda c: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, M, Cout), lambda c: (c, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, M, Cout), dtype),
            )(a, b, c)

        with jax.enable_x64(False):
            fn = jax.jit(call)
            out = jax.block_until_ready(fn(lidx_j, gin_j, w_j))
            ref0 = np.zeros((M, Cout), np.float32)
            gb = gin[0].astype(np.float32)
            for k in range(K):
                ref0 += gb[lidx[0, k, :M].astype(np.int64)] @ w[k]
            got = np.asarray(out[0], np.float32)
            err = float(np.max(np.abs(got - ref0)))
            rel = err / max(1e-6, float(np.max(np.abs(ref0))))

            @jax.jit
            def many(a, b, c):
                def body(i, acc):
                    return acc + call(a, b, c)[0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
            jax.block_until_ready(many(lidx_j, gin_j, w_j))
            t0 = time.time()
            for _ in range(3):
                jax.block_until_ready(many(lidx_j, gin_j, w_j))
            dt = (time.time() - t0) / 30
        return (f"relerr={rel:.4f} t={dt*1e3:.2f}ms "
                f"({C*M/dt/1e6:.1f}M rows/s)")

    if ok16 is not None:
        step("chunk gather conv M=256 U=512 Cin=64 C=768 (L0-like)",
             lambda: test_chunk_gather(256, 512, 64, 64, 768))
        step("chunk gather conv M=512 U=1024 Cin=64 C=384 (L0 big chunks)",
             lambda: test_chunk_gather(512, 1024, 64, 64, 384))
        step("chunk gather conv M=256 U=512 Cin=128 C=544 (L1-like)",
             lambda: test_chunk_gather(256, 512, 128, 128, 544))
        step("chunk gather conv M=256 U=512 Cin=192 Cout=192 C=248 (L2-like)",
             lambda: test_chunk_gather(256, 512, 192, 192, 248))

    # -------------------------------------------------------------
    # 4. whole-level VMEM-resident kernel with int16 idx (levels N<=32k)
    # -------------------------------------------------------------
    def test_level_kernel(N, Cin, Cout):
        K = 27

        def kernel(nbr_ref, feats_ref, w_ref, out_ref):
            feats = feats_ref[:]
            acc = jnp.zeros((N, Cout), jnp.float32)
            for k in range(K):
                idx = nbr_ref[k, :]
                idxb = jnp.broadcast_to(idx[:, None], (N, Cin))
                g = jnp.take_along_axis(feats, idxb, axis=0)
                acc = acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[:] = acc.astype(jnp.bfloat16)

        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((N, Cin)), jnp.bfloat16)
        nbr = rng.integers(0, N, (K, N)).astype(np.int16)
        nbr_j = jnp.asarray(nbr)
        w = jnp.asarray(rng.standard_normal((K, Cin, Cout)) * 0.05,
                        jnp.bfloat16)

        def call(a, b, c):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, Cout), jnp.bfloat16),
            )(a, b, c)

        with jax.enable_x64(False):
            fn = jax.jit(call)
            out = jax.block_until_ready(fn(nbr_j, feats, w))
            f32 = np.asarray(feats, np.float32)
            w32 = np.asarray(w, np.float32)
            ref = np.zeros((N, Cout), np.float32)
            for k in range(K):
                ref += f32[nbr[k].astype(np.int64)] @ w32[k]
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            rel = err / max(1e-6, float(np.max(np.abs(ref))))

            @jax.jit
            def many(a, b, c):
                def body(i, acc):
                    return acc + call(a, b, c)[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
            jax.block_until_ready(many(nbr_j, feats, w))
            t0 = time.time()
            for _ in range(3):
                jax.block_until_ready(many(nbr_j, feats, w))
            dt = (time.time() - t0) / 30
        return f"relerr={rel:.4f} t={dt*1e3:.3f}ms ({N/dt/1e6:.1f}M rows/s)"

    if ok16 is not None:
        step("level kernel N=16384 Cin=256 Cout=256 (L3-like)",
             lambda: test_level_kernel(16384, 256, 256))
        step("level kernel N=4096 Cin=320 Cout=320 (L4-like)",
             lambda: test_level_kernel(4096, 320, 320))


if __name__ == "__main__":
    main()
