"""Round-4 experiment B: why do the staging gathers collapse at batch 4?

exp_r4_a measured the L0 staging gather at ~29.5 ms ([1.95M,64] rows out
of a [786k,64] bf16 table, ~8.5 GB/s effective) at batch 4 vs ~0.84 ms
for the per-scene-sized equivalent at batch 1 (~69 GB/s) — a 26x cliff
for 4x the work, and the dominant term of the batch-4 fusion bucket
(538 ms vs 29 ms at batch 1).

Hypotheses:
  H1 source-table size: the gather's HBM access pattern degrades with
     table footprint (row spans grow past some locality threshold).
  H2 emitter switch: XLA picks a different (scalar) gather emitter past
     some row count.

A/B here, all on REAL batch-4 chunk refs (L0, in_idx from the production
chunk planner):
  big      one gather of all refs from the full [786k,64] table
  split4   the same refs split at scene boundaries (chunks are
           scene-local in the Morton layout modulo boundary chunks),
           each gathered from a COPY of that scene's row range — the
           "blocked batch layout" upper bound
  window4  same split, but each part gathers from a dynamic-slice
           window of the ONE big table (no copies) — what a blocked
           layout would do in-graph

If split4/window4 restore per-scene throughput, the batch-4 fix is the
per-scene blocked layout (static per-scene caps); if they do not, the
wall is the gather row count itself.

Timings chained with a data dependence (identical dispatches get deduped
by the tunnel — CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
N_ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    ns = int(os.environ.get("OCC_SCENES", 4))
    caps = tuple(c * ns for c in BASE_CAPS)
    spec = PlanSpec(caps=caps)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=ns, p_cap=262_144 * ns,
                       num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], spec)
    plan = augment_plan_with_chunks(plan, u_bump=32 if ns > 1 else 0)

    l0 = plan.levels[0]
    refs = np.asarray(l0.chunks.in_idx)          # [C, U] int32, -1 pad
    C, U = refs.shape
    M = 128
    n_rows = int(l0.num_active)
    print(f"batch-{ns}: C={C} U={U} rows={n_rows}", flush=True)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((caps[0], 64)).astype(np.float32)
    feats = jnp.asarray(feats, jnp.bfloat16)

    # scene of each chunk = scene of its first row (chunks are contiguous
    # row ranges; boundary chunks assigned to the earlier scene)
    scene_of_row = np.asarray(l0.coords)[:, 0]
    scene_of_row = np.where(scene_of_row < 0, ns - 1, scene_of_row)
    chunk_scene = scene_of_row[np.arange(C) * M]

    safe = np.where(refs >= 0, refs, 0).astype(np.int32)

    def chain_time(tag, fn, *args):
        @jax.jit
        def many(f, *a):
            def body(i, carry):
                out = fn(f + carry, *a)
                return (out.reshape(-1)[0] * 0).astype(f.dtype)
            return jax.lax.fori_loop(0, N_ITERS, body,
                                     jnp.zeros((), f.dtype))
        # warmup with PERTURBED input — identical dispatches get deduped
        r = many(feats * jnp.bfloat16(1.0078125), *args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = many(feats, *args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / N_ITERS
        gb = safe.size * 64 * 2 / 1e9
        print(f"{tag:10s} {dt * 1e3:8.2f} ms  ({gb / dt:6.1f} GB/s eff)",
              flush=True)
        return dt

    # --- big: one gather ---
    idx_big = jnp.asarray(safe.reshape(-1))

    def big(f, idx):
        return jnp.take(f, idx, axis=0, mode="clip")

    chain_time("big", big, idx_big)

    # --- split4: per-scene tables (host-split; upper bound) ---
    starts = np.searchsorted(scene_of_row[:n_rows], np.arange(ns))
    starts = np.concatenate([starts, [n_rows]])
    parts, tables = [], []
    base = BASE_CAPS[0]
    for s in range(ns):
        sel = safe[chunk_scene == s].reshape(-1)
        local = np.clip(sel - starts[s], 0, base - 1).astype(np.int32)
        # boundary-chunk refs may reach past the scene window; clip for the
        # bandwidth experiment (production blocked layout has none)
        parts.append(jnp.asarray(local))
        tables.append(feats[starts[s]:starts[s] + base]
                      if starts[s] + base <= caps[0]
                      else jnp.pad(feats[starts[s]:],
                                   ((0, starts[s] + base - caps[0]),
                                    (0, 0))))
    tables = [jnp.asarray(np.asarray(t)) for t in tables]

    def split4(f, *pt):
        idxs, tabs = pt[:ns], pt[ns:]
        outs = [jnp.take(tabs[s] + f[0, 0] * 0, idxs[s], axis=0,
                         mode="clip") for s in range(ns)]
        return jnp.concatenate(outs, axis=0)

    chain_time("split4", split4, *(parts + tables))

    # --- window4: dynamic-slice windows of the one big table ---
    win_starts = jnp.asarray(starts[:ns], jnp.int32)

    def window4(f, ws, *idxs):
        outs = []
        zero = jnp.zeros((), ws.dtype)
        for s in range(ns):
            w = jax.lax.dynamic_slice(f, (ws[s], zero), (base, 64))
            outs.append(jnp.take(w, idxs[s], axis=0, mode="clip"))
        return jnp.concatenate(outs, axis=0)

    chain_time("window4", window4, win_starts, *parts)

    # --- synthetic sweep: same refs density, growing table ---
    for mult in (1, 2, 4):
        n = base * mult
        tab = feats[:n]
        k = (np.asarray(safe.reshape(-1)) % max(n_rows, 1))[
            : base // 64 * 64 * mult * 3]  # ~3x duplication like staging
        idx = jnp.asarray(np.clip(k, 0, n - 1).astype(np.int32))

        def g(f, i, tab=tab):
            return jnp.take(tab + f[0, 0] * 0, i, axis=0, mode="clip")

        @jax.jit
        def many(f, i):
            def body(_, carry):
                out = g(f + carry, i)
                return (out.reshape(-1)[0] * 0).astype(f.dtype)
            return jax.lax.fori_loop(0, N_ITERS, body,
                                     jnp.zeros((), f.dtype))
        r = many(feats, idx)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = many(feats, idx)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / N_ITERS
        gb = idx.size * 64 * 2 / 1e9
        print(f"sweep x{mult}: rows={idx.size} table={n} "
              f"{dt * 1e3:8.2f} ms ({gb / dt:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
