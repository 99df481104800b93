"""Round-2 experiment D: where do the 317ms go?

Ablation timings on the real TPU with REAL plan tables from the bench
scene: full step, fwd-only, per-level chunk convs in isolation, XLA
transition convs (child/up, still unchunked), and kernel-geometry sweeps
(U, M) to size the next optimization.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
PLANES = (64, 128, 192, 256, 320, 384)


def timed(fn, *args, n=10, reps=3):
    import jax
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jax.block_until_ready(fn(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.conv import gather_conv
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], spec)
    rng = np.random.default_rng(0)

    # ---- per-level submanifold conv: chunk kernel vs XLA, fwd and f+b ----
    for li, (cap, ch) in enumerate(zip(CAPS, PLANES)):
        nbr = np.asarray(plan.levels[li].nbr)
        feats = jnp.asarray(rng.standard_normal((cap, ch)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((27, ch, ch)) * 0.05,
                        jnp.bfloat16)
        nbr_j = jnp.asarray(nbr)

        def xla_fwd(f, ww):
            return gather_conv(f, nbr_j, ww).astype(jnp.float32).sum()

        t_x = timed(jax.jit(xla_fwd), feats, w, n=5)
        t_xb = timed(jax.jit(jax.grad(xla_fwd, argnums=(0, 1))), feats, w,
                     n=5)

        for M, U in ((256, 512), (256, 640), (512, 1024), (128, 384)):
            arrs = cc.build_chunk_arrays(nbr, M, U)
            if arrs is None:
                print(f"L{li} M={M} U={U}: overflow", flush=True)
                continue
            in_idx = jnp.asarray(arrs[0])
            lidx = jnp.asarray(arrs[1])

            def ck_fwd(f, ww):
                return cc.chunk_gather_conv(f, in_idx, lidx,
                                            ww).astype(jnp.float32).sum()

            t_c = timed(jax.jit(ck_fwd), feats, w, n=5)
            t_cb = timed(jax.jit(jax.grad(ck_fwd, argnums=(0, 1))), feats,
                         w, n=5)
            print(f"L{li} ch={ch} cap={cap}: XLA fwd {t_x:.2f} f+b {t_xb:.2f}"
                  f" | chunk(M={M},U={U}) fwd {t_c:.2f} f+b {t_cb:.2f} ms",
                  flush=True)

    # ---- transition convs (XLA path today) ----
    for ti in range(len(CAPS) - 1):
        tr = plan.transitions[ti]
        cin, cout = PLANES[ti], PLANES[ti + 1]
        nf, nc = CAPS[ti], CAPS[ti + 1]
        feats = jnp.asarray(rng.standard_normal((nf, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((8, cin, cout)) * 0.05,
                        jnp.bfloat16)
        child = jnp.asarray(np.asarray(tr.child))
        up = jnp.asarray(np.asarray(tr.up))

        def down_fwd(f, ww):
            return gather_conv(f, child, ww,
                               nbr_t=up[:, ::-1]).astype(jnp.float32).sum()

        t_d = timed(jax.jit(down_fwd), feats, w, n=5)
        t_db = timed(jax.jit(jax.grad(down_fwd, argnums=(0, 1))), feats, w,
                     n=5)

        featsc = jnp.asarray(rng.standard_normal((nc, cout)), jnp.bfloat16)
        wu = jnp.asarray(rng.standard_normal((8, cout, cin)) * 0.05,
                         jnp.bfloat16)

        def up_fwd(f, ww):
            return gather_conv(f, up, ww,
                               nbr_t=child[:, ::-1]).astype(jnp.float32).sum()

        t_u = timed(jax.jit(up_fwd), featsc, wu, n=5)
        t_ub = timed(jax.jit(jax.grad(up_fwd, argnums=(0, 1))), featsc, wu,
                     n=5)
        print(f"T{ti}: down XLA fwd {t_d:.2f} f+b {t_db:.2f} | "
              f"up XLA fwd {t_u:.2f} f+b {t_ub:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
