"""Round-3 experiment G: (1) form-A kernel for tiny-Cin convs, (2) manual
async-copy staging.

(1) The first conv (Cin=3 padded to 8) measures 7.5ms fwd — 2.4x its
one-hot roofline. Suspect: 27 lane-misaligned [M, 8] scratch stores per
chunk (g_s[:, k*8:(k+1)*8]). Form A chains (OH @ gin) @ W_k into an f32
accumulator with NO scratch — more MXU tiles but every store aligned.

(2) XLA row staging runs ~22GB/s (row-count bound at 128B rows). A Pallas
kernel issuing pltpu.make_async_copy per row with a deep in-flight window
may fix the latency-boundness without granule dedup inflation.

All timings chained (w + prev*0) — identical dispatches get deduped.
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

    # ---------------- (1) form-A tiny-Cin kernel ----------------
    cap, cin, cout, U = CAPS[0], 8, 64, 256
    C = cap // M
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = map(jnp.asarray, cc.build_chunk_arrays(nbr, M, U))
    feats = jnp.asarray(rng.standard_normal((cap, cin)), jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.1, jnp.bfloat16)
    gin = cc._stage(feats, in_idx)

    def scratch_fn(w_flat, lidx, gin):
        return cc._pallas_fwd(lidx, gin, w_flat, jnp.bfloat16, False)

    t_scr = chain_time(scratch_fn, w3.reshape(K * cin, cout), lidx, gin)

    def forma_kernel(nz_ref, lidx_ref, gin_ref, w_ref, out_ref):
        gin_b = gin_ref[0]
        U_, M_ = gin_b.shape[0], lidx_ref.shape[2]
        iota = jax.lax.broadcasted_iota(jnp.int32, (M_, U_), 1)

        @pl.when(nz_ref[0, 0, 0] > 0)
        def _():
            acc = jnp.zeros((M_, cout), jnp.float32)
            for k in range(K):
                l = lidx_ref[0, k, :]
                oh = (l[:, None] == iota).astype(gin_b.dtype)
                g = jax.lax.dot_general(
                    oh, gin_b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(gin_b.dtype)
                acc = acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)

        @pl.when(nz_ref[0, 0, 0] == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

    def forma_fn(w3_eff, lidx, gin):
        lidx4 = lidx.reshape(C, 1, K, M)
        nz = cc._chunk_nonempty(lidx4, C, 1, K, M)
        return pl.pallas_call(
            forma_kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, M), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U, cin), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, cin, cout), lambda c: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, cout), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, M, cout), jnp.bfloat16),
        )(nz, lidx, gin, w3_eff)

    try:
        with jax.enable_x64(False):
            got = np.asarray(jax.jit(forma_fn)(w3, lidx, gin), np.float32)
            ref = np.asarray(jax.jit(scratch_fn)(
                w3.reshape(K * cin, cout), lidx, gin), np.float32)
        ok = np.allclose(got, ref, rtol=0.1, atol=0.1)
        t_a = chain_time(forma_fn, w3, lidx, gin)
        print(f"first-conv cin=8: scratch {t_scr:.2f}ms | form-A {t_a:.2f}ms "
              f"agree={ok}", flush=True)
    except Exception as e:
        print(f"form-A FAIL: {repr(e)[:250]}", flush=True)

    # also try form-A at cin=64 (L0 main convs) for reference
    cin64 = 64
    feats64 = jnp.asarray(rng.standard_normal((cap, cin64)), jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((K, cin64, cout)) * 0.05,
                      jnp.bfloat16)
    gin64 = cc._stage(feats64, in_idx)

    def scratch64_fn(w_flat, lidx, gin):
        return cc._pallas_fwd(lidx, gin, w_flat, jnp.bfloat16, False)

    t_scr64 = chain_time(scratch64_fn, w64.reshape(K * cin64, cout), lidx,
                         gin64)

    def forma64_kernel(nz_ref, lidx_ref, gin_ref, w_ref, out_ref):
        gin_b = gin_ref[0]
        U_, M_ = gin_b.shape[0], lidx_ref.shape[2]
        iota = jax.lax.broadcasted_iota(jnp.int32, (M_, U_), 1)

        @pl.when(nz_ref[0, 0, 0] > 0)
        def _():
            acc = jnp.zeros((M_, cout), jnp.float32)
            for k in range(K):
                l = lidx_ref[0, k, :]
                oh = (l[:, None] == iota).astype(gin_b.dtype)
                g = jax.lax.dot_general(
                    oh, gin_b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(gin_b.dtype)
                acc = acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)

        @pl.when(nz_ref[0, 0, 0] == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

    def forma64_fn(w_eff, lidx, gin):
        lidx4 = lidx.reshape(C, 1, K, M)
        nz = cc._chunk_nonempty(lidx4, C, 1, K, M)
        return pl.pallas_call(
            forma64_kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, M), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U, cin64), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, cin64, cout), lambda c: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, cout), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, M, cout), jnp.bfloat16),
        )(nz, lidx, gin, w_eff)

    try:
        t_a64 = chain_time(forma64_fn, w64, lidx, gin64)
        print(f"L0 cin=64: scratch {t_scr64:.2f}ms | form-A {t_a64:.2f}ms",
              flush=True)
    except Exception as e:
        print(f"form-A 64 FAIL: {repr(e)[:250]}", flush=True)

    # ---------------- (2) manual-DMA row staging ----------------
    ch = 64
    n_rows = C * U
    flat_idx = jnp.asarray(rng.integers(0, cap, n_rows, dtype=np.int32))
    featsb = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)

    def xla_fn(f_eff, idx):
        return jnp.take(f_eff, idx, axis=0, mode="clip")

    def chain_feats(fn, *args):
        @jax.jit
        def many(f, *args):
            def body(i, carry):
                out = fn(f + carry, *args)
                return (out.reshape(-1)[0] * 0).astype(f.dtype)
            return jax.lax.fori_loop(0, N_ITERS, body,
                                     jnp.zeros((), featsb.dtype))
        with jax.enable_x64(False):
            jax.block_until_ready(many(featsb, *args))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(many(featsb, *args))
                best = min(best, (time.perf_counter() - t0) / N_ITERS)
        return best * 1e3

    gb = n_rows * ch * 2 / 1e9
    t_x = chain_feats(xla_fn, flat_idx)
    print(f"XLA staging {n_rows} rows: {t_x:.2f}ms "
          f"({gb / (t_x / 1e3):.1f} GB/s)", flush=True)

    # manual DMA: grid over row blocks of R rows; each cell issues R
    # per-row copies (HBM src sliced dynamically) into its out block with
    # W semaphores in flight
    R, W = 256, 16

    def dma_kernel(idx_ref, src_ref, out_ref):
        def inner(sems):
            def get(i):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(idx_ref[i], 1), :],
                    out_ref.at[pl.ds(i, 1), :],
                    sems.at[i % W])

            def warm(i, _):
                get(i).start()
                return 0

            jax.lax.fori_loop(0, W, warm, 0)

            def body(i, _):
                get(i - W).wait()

                @pl.when(i < R)
                def _():
                    get(i).start()
                return 0

            jax.lax.fori_loop(W, R + W, body, 0)

        pl.run_scoped(inner, pltpu.SemaphoreType.DMA((W,)))

    def dma_fn(f_eff, idx):
        return pl.pallas_call(
            dma_kernel,
            grid=(n_rows // R,),
            in_specs=[
                pl.BlockSpec((R,), lambda b: (b,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((R, ch), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, ch), jnp.bfloat16),
        )(idx, f_eff)

    try:
        with jax.enable_x64(False):
            got = np.asarray(jax.jit(dma_fn)(featsb, flat_idx))
            want = np.asarray(featsb)[np.asarray(flat_idx)]
        ok = np.array_equal(got, want)
        t_d = chain_feats(dma_fn, flat_idx)
        print(f"manual-DMA staging: {t_d:.2f}ms ({gb / (t_d / 1e3):.1f} "
              f"GB/s) agree={ok}", flush=True)
    except Exception as e:
        print(f"manual-DMA FAIL: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
