"""Round-3 experiment D: GROUPED lane-gather permutation kernel.

exp_r3_c found the Mosaic lane gather (take_along_axis axis=1) lowers only
for 32-bit data within a SINGLE vreg of lanes (<=128). The permutation can
still replace the one-hot MXU product by splitting the staged tile into
128-lane groups: per offset, one gather + select per group (VPU), then the
USEFUL weight matmul only — ~5x fewer MXU FLOPs at L0 (one-hot pays
(U+Cout)/Cout).

Probes:
  A. f32 lane gather at [64,128] / [8,128] / [192,128] (sublane counts)
  B. in-kernel transpose [256,64] -> [64,256] (staged-tile transpose)
  C. grouped-lane-gather conv kernel at L0/L1 scale: verify vs the one-hot
     kernel + time both (plus the XLA transpose prep cost)
"""

from __future__ import annotations

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
        print(f"[FAIL] {name}: {repr(e)[:160]}", flush=True)
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
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the 27-offset x NG-group unrolled kernel exceeds the default Python
    # recursion limit during jaxpr lowering
    sys.setrecursionlimit(100_000)
    rng = np.random.default_rng(0)

    # ---------- A: single-vreg lane gathers at various sublane counts ----
    def lg(rows, dtype):
        def k(d_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

        def t():
            d = jnp.asarray(np.arange(rows * 128).reshape(rows, 128), dtype)
            perm = np.asarray((np.arange(128) * 7 + 3) % 128, np.int32)
            i = jnp.broadcast_to(jnp.asarray(perm)[None, :], (rows, 128))
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((rows, 128), dtype))(d, i)

        def chk(o):
            d = np.arange(rows * 128).reshape(rows, 128)
            perm = (np.arange(128) * 7 + 3) % 128
            return np.array_equal(o.astype(np.int64), d[:, perm])
        return probe(f"lane gather {dtype.__name__} [{rows},128]", t, chk)

    lg(64, jnp.float32)
    lg(8, jnp.float32)
    lg(192, jnp.float32)

    # ---------- B: in-kernel transpose of the staged tile ----------
    def trp():
        def k(a_ref, o_ref):
            o_ref[:] = a_ref[:].T

        a = jnp.asarray(rng.standard_normal((256, 64)), jnp.bfloat16)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.bfloat16))(a)
    probe("in-kernel transpose [256,64]->[64,256] bf16", trp)

    # ---------- C: grouped-lane-gather conv kernel ----------
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
    M = 128
    for li, (cap, ch, U) in enumerate(zip(CAPS[:2], (64, 128), (256, 384))):
        C = cap // M
        NG = U // 128
        nbr = np.asarray(plan.levels[li].nbr)
        arrs = cc.build_chunk_arrays(nbr, M, U)
        if arrs is None:
            print(f"L{li}: overflow at U={U}", flush=True)
            continue
        in_idx, lidx = map(jnp.asarray, arrs)
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w3 = jnp.asarray(rng.standard_normal((K, ch, ch)) * 0.05,
                         jnp.bfloat16)
        gin = cc._stage(feats, in_idx)           # [C, U, ch]
        w_flat = w3.reshape(K * ch, ch)

        @jax.jit
        def onehot_call(lidx, gin, w_flat):
            with jax.enable_x64(False):
                return cc._pallas_fwd(lidx, gin, w_flat, jnp.bfloat16, False)
        t_oh = time_jit(onehot_call, lidx, gin, w_flat)

        ginT = jnp.swapaxes(gin, 1, 2)           # [C, ch, U]
        t_tr = time_jit(jax.jit(lambda g: jnp.swapaxes(g, 1, 2)), gin)

        def lane_kernel(lidx_ref, ginT_ref, w_ref, out_ref):
            ginT = ginT_ref[0].astype(jnp.float32)   # [ch, U]
            acc = jnp.zeros((M, ch), jnp.float32)
            for k in range(K):
                l = lidx_ref[0, k, :]                # [M]
                lb = jnp.broadcast_to(l[None, :], (ch, M))
                g = jnp.zeros((ch, M), jnp.float32)
                for grp in range(NG):
                    idx = jnp.clip(lb - grp * 128, 0, 127)
                    part = jnp.take_along_axis(
                        ginT[:, grp * 128:(grp + 1) * 128], idx, axis=1)
                    g = jnp.where((lb >= grp * 128) & (lb < grp * 128 + 128),
                                  part, g)
                g = jnp.where(lb >= 0, g, 0.0).astype(jnp.bfloat16)
                # transpose-A product: [ch, M] x [ch, ch] -> [M, ch]
                acc = acc + jax.lax.dot_general(
                    g, w_ref[k], dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)

        def lane_call(lidx, ginT, w3):
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
            )(lidx, ginT, w3)

        try:
            with jax.enable_x64(False):
                out = jax.jit(lane_call)(lidx, ginT, w3)
                jax.block_until_ready(out)
            ref = np.asarray(onehot_call(lidx, gin, w_flat), np.float32)
            got = np.asarray(out, np.float32)
            ok = np.allclose(got, ref, rtol=0.1, atol=0.1)
            mx = float(np.max(np.abs(got - ref)))
            t_lane = time_jit(jax.jit(lane_call), lidx, ginT, w3)
            print(f"L{li} ch={ch} U={U}: one-hot {t_oh:.2f}ms | grouped-lane "
                  f"{t_lane:.2f}ms (+tr {t_tr:.2f}ms) agree={ok} "
                  f"maxdiff={mx:.3f}", flush=True)
        except Exception as e:
            print(f"L{li} grouped-lane FAIL: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
