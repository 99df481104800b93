"""Round-3 experiment M: manual-DMA row gather — find a form that compiles.

exp_r3_g's per-row async-copy kernel crashed the server compiler
(HTTP 500). Bisect: smaller shapes, different index plumbing
(scalar-prefetch vs SMEM block), copy granularity, semaphore patterns.
Verify numerics at small scale, then time the surviving variant at L0
staging scale vs the XLA take (windowed step timing, first window
dropped).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    N, CH = 4096, 64
    src = jnp.asarray(rng.standard_normal((N, CH)), jnp.bfloat16)
    n_rows, R = 1024, 128
    idx = jnp.asarray(rng.integers(0, N, n_rows, dtype=np.int32))
    want = np.asarray(src)[np.asarray(idx)]

    def check(name, fn):
        try:
            out = jax.block_until_ready(jax.jit(fn)(idx, src))
            ok = np.array_equal(np.asarray(out), want)
            print(f"[{'PASS' if ok else 'WRONG'}] {name}", flush=True)
            return ok
        except Exception as e:
            print(f"[FAIL] {name}: {repr(e)[:200]}", flush=True)
            return False

    # V1: scalar-prefetch indices, per-row copies, W-slot semaphores,
    # wait via a second pass of the same DMA objects
    W = 8

    def v1_kernel(idx_ref, src_ref, out_ref):
        def inner(sems):
            def get(i):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(idx_ref[i], 1), :],
                    out_ref.at[pl.ds(i, 1), :],
                    sems.at[i % W])

            def body(i, _):
                @pl.when(i < R)
                def _():
                    get(i).start()

                @pl.when(i >= W)
                def _():
                    get(i - W).wait()
                return 0

            jax.lax.fori_loop(0, R + W, body, 0)

        pl.run_scoped(inner, pltpu.SemaphoreType.DMA((W,)))

    def v1(idx, src):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((R, CH), lambda b, idx_ref: (b, 0)),
        )

        def kern(idx_ref, src_ref, out_ref):
            base = pl.program_id(0) * R

            def inner(sems):
                def get(i):
                    return pltpu.make_async_copy(
                        src_ref.at[pl.ds(idx_ref[base + i], 1), :],
                        out_ref.at[pl.ds(i, 1), :],
                        sems.at[i % W])

                def body(i, _):
                    @pl.when(i < R)
                    def _():
                        get(i).start()

                    @pl.when(i >= W)
                    def _():
                        get(i - W).wait()
                    return 0

                jax.lax.fori_loop(0, R + W, body, 0)

            pl.run_scoped(inner, pltpu.SemaphoreType.DMA((W,)))

        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, CH), src.dtype))(idx, src)

    ok1 = check("V1 scalar-prefetch + W-slot sems", v1)

    # V2: single grid cell, all rows, one semaphore per copy via start-all
    # waves of W
    def v2(idx, src):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((n_rows, CH), lambda b, idx_ref: (0, 0)),
        )

        def kern(idx_ref, src_ref, out_ref):
            def inner(sem):
                def wave(w, _):
                    def start_one(j, _):
                        i = w * W + j
                        pltpu.make_async_copy(
                            src_ref.at[pl.ds(idx_ref[i], 1), :],
                            out_ref.at[pl.ds(i, 1), :],
                            sem).start()
                        return 0

                    jax.lax.fori_loop(0, W, start_one, 0)

                    def wait_one(j, _):
                        i = w * W + j
                        pltpu.make_async_copy(
                            src_ref.at[pl.ds(idx_ref[i], 1), :],
                            out_ref.at[pl.ds(i, 1), :],
                            sem).wait()
                        return 0

                    jax.lax.fori_loop(0, W, wait_one, 0)
                    return 0

                jax.lax.fori_loop(0, n_rows // W, wave, 0)

            pl.run_scoped(inner, pltpu.SemaphoreType.DMA(()))

        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, CH), src.dtype))(idx, src)

    ok2 = check("V2 single-cell waves, shared sem", v2)

    # V3: copy PAIRS of consecutive out rows per DMA? No — indices are
    # arbitrary. Instead: VMEM dst scratch then block write (maybe the
    # crash was DMA-into-pipelined-out_ref)
    def v3(idx, src):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows // R,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((R, CH), lambda b, idx_ref: (b, 0)),
            scratch_shapes=[pltpu.VMEM((R, CH), src.dtype),
                            pltpu.SemaphoreType.DMA((W,))],
        )

        def kern(idx_ref, src_ref, out_ref, scratch, sems):
            base = pl.program_id(0) * R

            def get(i):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(idx_ref[base + i], 1), :],
                    scratch.at[pl.ds(i, 1), :],
                    sems.at[i % W])

            def body(i, _):
                @pl.when(i < R)
                def _():
                    get(i).start()

                @pl.when(i >= W)
                def _():
                    get(i - W).wait()
                return 0

            jax.lax.fori_loop(0, R + W, body, 0)
            out_ref[:] = scratch[:]

        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, CH), src.dtype))(idx, src)

    ok3 = check("V3 scratch dst + block write", v3)

    winner = v3 if ok3 else (v1 if ok1 else (v2 if ok2 else None))
    if winner is None:
        print("no DMA variant compiles — park", flush=True)
        return

    # ---- L0-scale timing vs XLA take (windowed, drop first window) ----
    capN, ch = 196_608, 64
    nr = 1536 * 256
    big_src = jnp.asarray(rng.standard_normal((capN, ch)), jnp.bfloat16)
    big_idx = jnp.asarray(rng.integers(0, capN, nr, dtype=np.int32))
    gb = nr * ch * 2 / 1e9

    def make_big(fn_form, R_big):
        W_ = 16

        def call(idx, src):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nr // R_big,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((R_big, ch),
                                       lambda b, idx_ref: (b, 0)),
                scratch_shapes=[pltpu.VMEM((R_big, ch), src.dtype),
                                pltpu.SemaphoreType.DMA((W_,))],
            )

            def kern(idx_ref, src_ref, out_ref, scratch, sems):
                base = pl.program_id(0) * R_big

                def get(i):
                    return pltpu.make_async_copy(
                        src_ref.at[pl.ds(idx_ref[base + i], 1), :],
                        scratch.at[pl.ds(i, 1), :],
                        sems.at[i % W_])

                def body(i, _):
                    @pl.when(i < R_big)
                    def _():
                        get(i).start()

                    @pl.when(i >= W_)
                    def _():
                        get(i - W_).wait()
                    return 0

                jax.lax.fori_loop(0, R_big + W_, body, 0)
                out_ref[:] = scratch[:]

            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nr, ch), src.dtype))(idx, src)
        return call

    def windowed(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        times = []
        cur = args[1]
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(args[0], cur)
                cur = args[1] + (out.reshape(-1)[0].astype(jnp.float32)
                                 * 1e-3).astype(args[1].dtype)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / n)
        return min(times[1:]) * 1e3

    @jax.jit
    def xla_take(idx, src):
        return jnp.take(src, idx, axis=0, mode="clip")

    t_x = windowed(xla_take, big_idx, big_src)
    print(f"XLA take: {t_x:.2f}ms ({gb / (t_x / 1e3):.1f} GB/s)", flush=True)
    for R_big in (256, 1024):
        try:
            big = jax.jit(make_big(None, R_big))
            got = np.asarray(jax.block_until_ready(big(big_idx, big_src)))
            ok = np.array_equal(got,
                                np.asarray(big_src)[np.asarray(big_idx)])
            t_d = windowed(big, big_idx, big_src)
            print(f"DMA R={R_big}: {t_d:.2f}ms ({gb / (t_d / 1e3):.1f} GB/s) "
                  f"agree={ok}", flush=True)
        except Exception as e:
            print(f"DMA R={R_big} FAIL: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
