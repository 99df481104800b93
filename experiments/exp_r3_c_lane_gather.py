"""Round-3 experiment C: can a LANE-dim gather replace the one-hot MXU
permutation, and can scalar-prefetch staging replace the XLA row gather?

Background: exp_r3_a found (new this toolchain) that
  * take_along_axis along axis=1 (lanes) lowers and verifies on f32;
  * BlockSpec index_maps reading prefetched scalars (granule block gather)
    lower and verify.
The one-hot permutation costs M*U*Cin MACs per offset vs M*Cin useful
moves — ~4-5x of all kernel FLOPs at L0. A lane gather on a transposed
staged tile ginT [Cin, U] does the same permutation on the VPU.

Probes:
  A. lane gather f32 with U=256/384 lanes (multi-vreg along lanes)
  B. lane gather bf16 / i32
  C. dot_general dnums variants in-kernel (transpose-A, transpose-B)
  D. in-kernel 2D transpose
  E. L0-scale timing: one-hot kernel vs lane-gather kernel (+ the XLA
     transpose of the staged tile, measured separately)
  F. staging via scalar-prefetch block gather at granule 1/2/8 vs XLA take
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def probe(name, fn, check=None):
    import jax
    try:
        out = fn()
        jax.block_until_ready(out)
        ok = True if check is None else check(np.asarray(out))
        print(f"[{'PASS' if ok else 'WRONG'}] {name}", flush=True)
        return ok
    except Exception as e:
        print(f"[FAIL] {name}: {repr(e)[:200]}", flush=True)
        return False


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
    return best * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # ---------- A/B: lane gather shapes/dtypes ----------
    def lane_gather_probe(rows, lanes, dtype):
        def k(d_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

        def t():
            d = jnp.asarray(
                np.arange(rows * lanes).reshape(rows, lanes), dtype)
            perm = np.asarray((np.arange(lanes) * 7 + 3) % lanes, np.int32)
            i = jnp.broadcast_to(jnp.asarray(perm)[None, :], (rows, lanes))
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((rows, lanes), dtype))(d, i)

        def chk(o):
            d = np.arange(rows * lanes).reshape(rows, lanes)
            perm = (np.arange(lanes) * 7 + 3) % lanes
            return np.array_equal(o.astype(np.int64), d[:, perm])
        return probe(f"lane gather {dtype.__name__} [{rows},{lanes}]", t, chk)

    ok_f32_256 = lane_gather_probe(64, 256, jnp.float32)
    lane_gather_probe(64, 384, jnp.float32)
    lane_gather_probe(64, 512, jnp.float32)
    lane_gather_probe(64, 128, jnp.bfloat16)
    lane_gather_probe(64, 256, jnp.int32)

    # ---------- C: dot_general dnums ----------
    def dot_probe(name, dnums, a_shape, b_shape, o_shape):
        def k(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], dimension_numbers=(dnums, ((), ())),
                preferred_element_type=jnp.float32)

        def t():
            a = jnp.asarray(rng.standard_normal(a_shape), jnp.bfloat16)
            b = jnp.asarray(rng.standard_normal(b_shape), jnp.bfloat16)
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(o_shape, jnp.float32))(a, b)
        return probe(name, t)

    # transpose-A: [Cin, M] x [Cin, Cout] -> [M, Cout]
    dot_probe("dot transpose-A ((0,),(0,))", ((0,), (0,)),
              (64, 128), (64, 32), (128, 32))
    # transpose-B: [Cin, M] x [Cout, M] -> [Cin, Cout]
    dot_probe("dot transpose-B ((1,),(1,))", ((1,), (1,)),
              (64, 128), (32, 128), (64, 32))

    # ---------- D: in-kernel transpose ----------
    def tr():
        def k(a_ref, o_ref):
            o_ref[:] = a_ref[:].T

        a = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 64), jnp.float32))(a)
    probe("in-kernel transpose [64,128]->[128,64] f32", tr)

    def trb():
        def k(a_ref, o_ref):
            o_ref[:] = a_ref[:].T

        a = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 64), jnp.bfloat16))(a)
    probe("in-kernel transpose bf16", trb)

    # ---------- E: L0-scale A/B one-hot vs lane-gather ----------
    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], spec)

    K = 27
    for li, (cap, ch, U) in enumerate(
            zip(CAPS[:2], (64, 128), (256, 320))):
        M = 128
        C = cap // M
        nbr = np.asarray(plan.levels[li].nbr)
        arrs = cc.build_chunk_arrays(nbr, M, U)
        if arrs is None:
            print(f"L{li}: chunk overflow at U={U}", flush=True)
            continue
        in_idx, lidx = map(jnp.asarray, arrs)
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w3 = jnp.asarray(rng.standard_normal((K, ch, ch)) * 0.05,
                         jnp.bfloat16)
        gin = cc._stage(feats, in_idx)          # [C, U, ch]

        # --- baseline: existing one-hot fwd kernel ---
        w_flat = w3.reshape(K * ch, ch)

        @jax.jit
        def onehot_call(lidx, gin, w_flat):
            with jax.enable_x64(False):
                return cc._pallas_fwd(lidx, gin, w_flat, jnp.bfloat16, False)
        t_oh = time_jit(onehot_call, lidx, gin, w_flat)

        # --- lane-gather variant ---
        # staged tile transposed [C, ch, U]; lidx padded to U columns
        ginT = jnp.swapaxes(gin, 1, 2)
        t_tr = time_jit(jax.jit(lambda g: jnp.swapaxes(g, 1, 2)), gin)
        lpad = jnp.zeros((C, K, U), jnp.int32)
        lpad = lpad.at[:, :, :M].set(lidx)
        wT = jnp.asarray(np.swapaxes(np.asarray(w3, np.float32), 1, 2),
                         jnp.bfloat16)  # [K, Cout, Cin]

        def lane_kernel(lidx_ref, ginT_ref, wT_ref, outT_ref):
            ginT = ginT_ref[0].astype(jnp.float32)  # [ch, U]
            acc = jnp.zeros((ch, M), jnp.float32)
            for k in range(K):
                l = lidx_ref[0, k, :]                       # [U] padded
                idx = jnp.broadcast_to(jnp.maximum(l, 0)[None, :], (ch, U))
                g = jnp.take_along_axis(ginT, idx, axis=1)  # [ch, U]
                g = g[:, :M]
                g = jnp.where((l[:M] >= 0)[None, :], g, 0.0)
                acc = acc + jax.lax.dot_general(
                    wT_ref[k], g.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            outT_ref[0] = acc.astype(outT_ref.dtype)

        def lane_call_raw(lpad, ginT, wT):
            return pl.pallas_call(
                lane_kernel,
                grid=(C,),
                in_specs=[
                    pl.BlockSpec((1, K, U), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ch, U), lambda c: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, ch, ch), lambda c: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, ch, M), lambda c: (c, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((C, ch, M), jnp.bfloat16),
            )(lpad, ginT, wT)

        try:
            with jax.enable_x64(False):
                outT = jax.jit(lane_call_raw)(lpad, ginT, wT)
                jax.block_until_ready(outT)
            # verify vs baseline
            ref = np.asarray(onehot_call(lidx, gin, w_flat), np.float32)
            got = np.swapaxes(np.asarray(outT, np.float32), 1, 2)
            ok = np.allclose(got, ref, rtol=0.1, atol=0.1)
            mx = np.max(np.abs(got - ref))
            t_lane = time_jit(jax.jit(lane_call_raw), lpad, ginT, wT)
            print(f"L{li} ch={ch} U={U}: one-hot {t_oh:.2f}ms | "
                  f"lane {t_lane:.2f}ms (+tr {t_tr:.2f}ms) "
                  f"agree={ok} maxdiff={mx:.3f}", flush=True)
        except Exception as e:
            print(f"L{li} lane kernel FAIL: {repr(e)[:250]}", flush=True)

    # ---------- F: scalar-prefetch staging throughput ----------
    cap, ch = CAPS[0], 64
    feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
    C, U = cap // 128, 256
    n_rows = C * U

    flat_idx = jnp.asarray(rng.integers(0, cap, n_rows, dtype=np.int32))

    @jax.jit
    def xla_take(feats, idx):
        return jnp.take(feats, idx, axis=0, mode="clip")
    t_xla = time_jit(xla_take, feats, flat_idx)
    gb = n_rows * ch * 2 / 1e9
    print(f"XLA take {n_rows} rows: {t_xla:.2f}ms "
          f"({gb / (t_xla / 1e3):.1f} GB/s)", flush=True)

    for g in (8, 4, 2, 1):
        n_gran = n_rows // g
        gran_idx = jnp.asarray(
            rng.integers(0, cap // g, n_gran, dtype=np.int32))

        def copy_k(idx_ref, d_ref, o_ref):
            o_ref[:] = d_ref[:]

        def sp_call(idx, feats):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_gran,),
                in_specs=[pl.BlockSpec((g, ch),
                                       lambda i, idx_ref: (idx_ref[i], 0))],
                out_specs=pl.BlockSpec((g, ch), lambda i, idx_ref: (i, 0)),
            )
            return pl.pallas_call(
                copy_k, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_rows, ch),
                                               jnp.bfloat16))(idx, feats)
        try:
            t_sp = time_jit(jax.jit(sp_call), gran_idx, feats, iters=10)
            print(f"scalar-prefetch staging g={g}: {t_sp:.2f}ms "
                  f"({gb / (t_sp / 1e3):.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"scalar-prefetch g={g} FAIL: {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
