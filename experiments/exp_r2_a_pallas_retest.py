"""Round-2 experiment A: can Pallas kernels with in-VMEM gathers compile
on the current toolchain, and how fast are the candidate conv kernels?

Round-1 state (CLAUDE.md): any pallas kernel with lax.gather in the
supported take_along_axis form died server-side in tpu_compile_helper
(AOT). Retest that, and prototype the gather-free fallback: one-hot
matmul permutation within a chunk (reference chunk kernel analog,
`Convolution.cu:1059-1253`).

Run on the axon TPU chip. Each step is independently try/except'd and
logged so a server-side crash doesn't kill the rest.
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
        tb = traceback.format_exc(limit=25)
        log(f"[FAIL] {name} ({time.time() - t0:.1f}s): {e!r}\n{tb}")
        return None


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    # ---------------------------------------------------------------
    # 1. Retest the round-1 repro: VMEM-resident gather conv (AOT).
    # ---------------------------------------------------------------
    def test_gather_kernel():
        from occuseg_tpu.ops.pallas.gather_conv import gather_conv_pallas
        N, Cin, Cout, K = 8192, 128, 128, 27
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((N, Cin)), jnp.bfloat16)
        nbr = rng.integers(0, N, (K, N)).astype(np.int32)
        nbr[:, :16] = -1  # some missing
        nbr_kn = jnp.asarray(nbr)
        w = jnp.asarray(rng.standard_normal((K, Cin, Cout)) * 0.05,
                        jnp.bfloat16)
        out = gather_conv_pallas(feats, nbr_kn, w)
        out = jax.block_until_ready(out)
        # correctness vs XLA
        from occuseg_tpu.ops.conv import gather_conv
        ref = gather_conv(feats, jnp.asarray(nbr.T), w, nbr_t=jnp.asarray(nbr.T))
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        # timing: 20 calls inside one jit
        @jax.jit
        def many(f, n, ww):
            def body(i, acc):
                return acc + gather_conv_pallas(f, n, ww).astype(jnp.float32)
            return jax.lax.fori_loop(0, 10, body,
                                     jnp.zeros((N, Cout), jnp.float32))
        r = jax.block_until_ready(many(feats, nbr_kn, w))
        t0 = time.time()
        for _ in range(3):
            r = jax.block_until_ready(many(feats, nbr_kn, w))
        dt = (time.time() - t0) / 3 / 10
        return f"maxerr={err:.3f} t={dt*1e3:.2f}ms/call"

    gather_ok = step("pallas VMEM gather conv (round-1 repro)",
                     test_gather_kernel)

    # ---------------------------------------------------------------
    # 2. One-hot chunk conv prototype (gather-free, MXU permutation).
    #    Chunk: M output rows, U staged unique input rows, K offsets.
    # ---------------------------------------------------------------
    def make_onehot_kernel(M, U, Cin, Cout, K, dtype):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(lidx_ref, gin_ref, w_ref, out_ref):
            gin = gin_ref[0]
            iota_u = jax.lax.broadcasted_iota(jnp.int32, (M, U), 1)

            acc = jnp.zeros((M, Cout), jnp.float32)
            for k in range(K):  # static unroll: K known at trace time
                idx = lidx_ref[0, k, :]  # [M]
                oh = (idx[:, None] == iota_u).astype(dtype)  # [M, U]
                g = jax.lax.dot_general(
                    oh, gin, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
                acc = acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(dtype)

        def call(lidx, gin, w, C):
            return pl.pallas_call(
                kernel,
                grid=(C,),
                in_specs=[
                    pl.BlockSpec((1, K, M), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, U, Cin), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, Cin, Cout), lambda c: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, M, Cout), lambda c: (c, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, M, Cout), dtype),
            )(lidx, gin, w)
        return call

    def test_onehot(M, U, Cin, Cout, C):
        K = 27
        dtype = jnp.bfloat16
        rng = np.random.default_rng(1)
        lidx = rng.integers(0, U + 1, (C, K, M)).astype(np.int32)  # U==missing
        gin = rng.standard_normal((C, U, Cin)).astype(np.float32)
        w = (rng.standard_normal((K, Cin, Cout)) * 0.05).astype(np.float32)
        lidx_j = jnp.asarray(lidx)
        gin_j = jnp.asarray(gin, dtype)
        w_j = jnp.asarray(w, dtype)
        call = make_onehot_kernel(M, U, Cin, Cout, K, dtype)

        with jax.enable_x64(False):
            fn = jax.jit(lambda a, b, c: call(a, b, c, C))
            out = jax.block_until_ready(fn(lidx_j, gin_j, w_j))
            # oracle on chunk 0
            g0 = np.concatenate([gin[0], np.zeros((1, Cin), np.float32)])
            ref0 = np.zeros((M, Cout), np.float32)
            for k in range(K):
                ref0 += g0[lidx[0, k]].astype(np.float32) @ w[k]
            err = float(np.max(np.abs(
                np.asarray(out[0], np.float32) - ref0)))
            rel = err / max(1e-6, float(np.max(np.abs(ref0))))

            @jax.jit
            def many(a, b, c):
                def body(i, acc):
                    return acc + call(a, b, c, C)[0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
            jax.block_until_ready(many(lidx_j, gin_j, w_j))
            t0 = time.time()
            for _ in range(3):
                jax.block_until_ready(many(lidx_j, gin_j, w_j))
            dt = (time.time() - t0) / 30
        n_rows = C * M
        return (f"relerr={rel:.4f} t={dt*1e3:.2f}ms "
                f"({n_rows/dt/1e6:.1f}M rows/s)")

    # L0-like: Cin=Cout=64, 196k rows
    step("onehot chunk conv M=256 U=512 Cin=64 C=768 (L0-like)",
         lambda: test_onehot(256, 512, 64, 64, 768))
    step("onehot chunk conv M=128 U=256 Cin=64 C=1536 (L0 small chunks)",
         lambda: test_onehot(128, 256, 64, 64, 1536))
    # L1-like: Cin=Cout=128, 139k rows
    step("onehot chunk conv M=256 U=512 Cin=128 C=544 (L1-like)",
         lambda: test_onehot(256, 512, 128, 128, 544))

    # ---------------------------------------------------------------
    # 3. XLA per-scene vmap batch hypothesis: 4 small tables vs 1 big.
    # ---------------------------------------------------------------
    def test_vmap_batch():
        from occuseg_tpu.ops.conv import gather_conv
        Cin = Cout = 64
        K = 27
        rng = np.random.default_rng(2)
        Ns, Nb = 49152, 196608

        def local_nbr(N):
            # Morton-ish local neighbor tables: idx near row (span ~2k)
            base = np.arange(N)[:, None]
            d = rng.integers(-1024, 1024, (N, K))
            idx = np.clip(base + d, 0, N - 1)
            idx[rng.random((N, K)) < 0.55] = -1
            return idx.astype(np.int32)

        w = jnp.asarray(rng.standard_normal((K, Cin, Cout)) * 0.05,
                        jnp.bfloat16)
        f_small = jnp.asarray(
            rng.standard_normal((4, Ns, Cin)), jnp.bfloat16)
        nbr_small = jnp.asarray(np.stack([local_nbr(Ns) for _ in range(4)]))
        f_big = f_small.reshape(4 * Ns, Cin)
        nbr_big_np = np.stack([local_nbr(Ns) for _ in range(4)])
        # offset each scene's table into the big flat array
        nbr_big_np = np.where(nbr_big_np >= 0,
                              nbr_big_np
                              + (np.arange(4) * Ns)[:, None, None], -1)
        nbr_big = jnp.asarray(nbr_big_np.reshape(Nb, K))

        @jax.jit
        def run_vmapped(f, n, ww):
            def body(i, acc):
                o = jax.vmap(lambda ff, nn: gather_conv(ff, nn, ww,
                                                        nbr_t=nn))(f, n)
                return acc + o[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        @jax.jit
        def run_flat(f, n, ww):
            def body(i, acc):
                o = gather_conv(f, n, ww, nbr_t=n)
                return acc + o[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        jax.block_until_ready(run_vmapped(f_small, nbr_small, w))
        jax.block_until_ready(run_flat(f_big, nbr_big, w))
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(run_vmapped(f_small, nbr_small, w))
        t_v = (time.time() - t0) / 30
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(run_flat(f_big, nbr_big, w))
        t_f = (time.time() - t0) / 30
        return f"vmap4x49k={t_v*1e3:.2f}ms flat196k={t_f*1e3:.2f}ms"

    step("XLA batch: per-scene vmap vs flat table", test_vmap_batch)


if __name__ == "__main__":
    main()
