"""Round-4 experiment C: BANDED one-hot build.

The fwd kernel's per-offset cost is ~2-3 VPU passes over [M, U] (i32
compare + select/cast) plus the [M,U]@[U,Cin] MXU product; the compare
alone rivals the dot at L0 (U=256, Cin=64). Measured band stats on the
bench plan (this round): per-(chunk, offset) local refs span a
contiguous band of p50 118-180 slots; an 8-aligned W=192 window covers
99.7% / 94.9% / 80% of (c,k) pairs at L0/L1/L2.

Probe, using the PRODUCTION kernel geometry (grid (C, n_co, n_kg),
k-grouping, f32 acc revisits) with only the one-hot build swapped:
  A  full       production _pallas_fwd verbatim
  B  banded     [M,W] compare + [M,W]@[W,Cin] dot via gin_ref[pl.ds]
                (band starts via SMEM; NO fallback — pure upper bound,
                the 0.3% non-fitting pairs compute wrong values)
  C  banded+br  per-offset pl.when(fits) band : full fallback — the
                production shape; measures Mosaic's branch cost

Go/no-go: integrate only if C beats A by >=15% at L0.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
N_ITERS = 20
W = int(os.environ.get("OCC_BAND_W", 192))
LEVEL = int(os.environ.get("OCC_BAND_LEVEL", 0))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.pallas import chunk_conv as cc

    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], PlanSpec(caps=CAPS))
    plan = cc.augment_plan_with_chunks(plan)
    lv = plan.levels[LEVEL]
    lidx_np = np.asarray(lv.chunks.lidx)       # [C, K, M]
    C, K, M = lidx_np.shape
    U = lv.chunks.in_idx.shape[1]
    cin = 64

    valid = lidx_np >= 0
    lo = np.where(valid, lidx_np, 10**6).min(axis=2)
    hi = np.where(valid, lidx_np, -1).max(axis=2)
    has = valid.any(axis=2)
    s = np.clip((lo // 8) * 8, 0, max(U - W, 0)).astype(np.int32)
    fits = (has & (hi - s + 1 <= W)) | ~has
    print(f"L{LEVEL}: C={C} U={U} K={K} W={W} fit rate {fits.mean():.4f}",
          flush=True)

    rng = np.random.default_rng(0)
    gin = jnp.asarray(rng.standard_normal((C, U, cin)), jnp.bfloat16)
    w_flat = jnp.asarray(rng.standard_normal((K * cin, cin)), jnp.bfloat16)
    lidx_j = jnp.asarray(lidx_np)

    co_blk = cc._co_block(cin)
    G = cc._k_grouping(K, M, cin, co_blk, 2, 2)
    n_kg, n_co = K // G, cin // co_blk
    print(f"G={G} n_kg={n_kg} n_co={n_co} co_blk={co_blk}", flush=True)

    def banded_build(lidx_ref, gin_ref, band_ref, fit_ref, kg, g_scratch,
                     with_fallback):
        for k in range(G):
            l = lidx_ref[0, 0, k, :]
            s0 = band_ref[0, kg, k]
            ks = slice(k * cin, (k + 1) * cin)
            if with_fallback:
                ok = fit_ref[0, kg, k] > 0

                @pl.when(ok)
                def _(l=l, s0=s0, ks=ks):
                    iota = s0 + jax.lax.broadcasted_iota(
                        jnp.int32, (M, W), 1)
                    gb = gin_ref[0, pl.ds(s0, W), :]
                    oh = (l[:, None] == iota).astype(gb.dtype)
                    g_scratch[:, ks] = jax.lax.dot_general(
                        oh, gb, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(
                            g_scratch.dtype)

                @pl.when(jnp.logical_not(ok))
                def _(l=l, ks=ks):
                    g = gin_ref[0]
                    iota = jax.lax.broadcasted_iota(jnp.int32, (M, U), 1)
                    oh = (l[:, None] == iota).astype(g.dtype)
                    g_scratch[:, ks] = jax.lax.dot_general(
                        oh, g, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(
                            g_scratch.dtype)
            else:
                iota = s0 + jax.lax.broadcasted_iota(jnp.int32, (M, W), 1)
                gb = gin_ref[0, pl.ds(s0, W), :]
                oh = (l[:, None] == iota).astype(gb.dtype)
                g_scratch[:, ks] = jax.lax.dot_general(
                    oh, gb, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(
                        g_scratch.dtype)

    def make_banded_kernel(with_fallback):
        def kernel(nz_ref, band_ref, fit_ref, lidx_ref, gin_ref, w_ref,
                   out_ref, g_scratch, acc):
            kg = pl.program_id(2)
            nz = nz_ref[0, 0, 0] > 0

            @pl.when(kg == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            @pl.when(nz)
            def _():
                banded_build(lidx_ref, gin_ref, band_ref, fit_ref, kg,
                             g_scratch, with_fallback)
                acc[:] += jax.lax.dot_general(
                    g_scratch[:], w_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(kg == n_kg - 1)
            def _():
                out_ref[0] = acc[:].astype(out_ref.dtype)
        return kernel

    def banded_call(lidx, gin, w_flat, with_fallback):
        lidx4 = lidx.reshape(C, n_kg, G, M)
        nz = cc._chunk_nonempty(lidx4, C, n_kg, G, M)
        band = jnp.asarray(s.reshape(C, n_kg, G))
        fit = jnp.asarray(fits.astype(np.int32).reshape(C, n_kg, G))
        smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
        return pl.pallas_call(
            make_banded_kernel(with_fallback),
            grid=(C, n_co, n_kg),
            in_specs=[
                smem((1, 1, 1), lambda c, co, kg: (c, 0, 0)),
                smem((1, n_kg, G), lambda c, co, kg: (c, 0, 0)),
                smem((1, n_kg, G), lambda c, co, kg: (c, 0, 0)),
                pl.BlockSpec((1, 1, G, M), lambda c, co, kg: (c, kg, 0, 0)),
                pl.BlockSpec((1, U, cin), lambda c, co, kg: (c, 0, 0)),
                pl.BlockSpec((G * cin, co_blk), lambda c, co, kg: (kg, co)),
            ],
            out_specs=pl.BlockSpec((1, M, co_blk),
                                   lambda c, co, kg: (c, 0, co)),
            out_shape=jax.ShapeDtypeStruct((C, M, cin), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, G * cin), jnp.bfloat16),
                            pltpu.VMEM((M, co_blk), jnp.float32)],
        )(nz, band, fit, lidx4, gin, w_flat)

    def run(tag, fn):
        @jax.jit
        def many(g, l, w):
            # the package enables x64 globally; Mosaic rejects i64 scalars
            # ("failed to legalize func.return (i32, i64, i64)") — trace
            # the kernels under x32 exactly like production _fwd_impl does
            with jax.enable_x64(False):
                def body(i, carry):
                    out = fn(l, g + carry, w)
                    return (out.reshape(-1)[0] * 0).astype(g.dtype)
                return jax.lax.fori_loop(0, N_ITERS, body,
                                         jnp.zeros((), g.dtype))
        try:
            t0 = time.time()
            # warmup args must DIFFER from the timed args byte-for-byte:
            # the tunnel dedupes identical dispatches (measured 0.004 ms
            # for a cached kernel when warmup == timed call)
            r = many(gin * jnp.bfloat16(1.0078125), lidx_j, w_flat)
            jax.block_until_ready(r)
            print(f"{tag}: compiled in {time.time() - t0:.0f}s", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:300]}", flush=True)
            return
        t0 = time.perf_counter()
        r = many(gin, lidx_j, w_flat)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / N_ITERS
        print(f"{tag}: {dt * 1e3:8.3f} ms", flush=True)

    run("A full     ",
        lambda l, g, w: cc._pallas_fwd(l, g, w, jnp.bfloat16, False))
    run("B banded   ", lambda l, g, w: banded_call(l, g, w, False))
    run("C banded+br", lambda l, g, w: banded_call(l, g, w, True))

    # numeric check (banded+br vs full) on the fitting rows
    with jax.enable_x64(False):
        a = cc._pallas_fwd(lidx_j, gin, w_flat, jnp.bfloat16, False)
        c = banded_call(lidx_j, gin, w_flat, True)
    d = np.abs(np.asarray(a, np.float32) - np.asarray(c, np.float32))
    print(f"banded+br max |diff| = {d.max():.6f}", flush=True)


if __name__ == "__main__":
    main()
