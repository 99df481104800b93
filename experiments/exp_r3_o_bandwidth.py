"""Round-3 experiment O: are per-offset lidx values BANDED within chunks?

The chunk kernels' one-hot products cost FLOPs proportional to U (~2.3x M):
out_k = onehot_k [M, U] @ gin [U, Cin]. If, for a fixed offset k, the staged
slots lidx[c, k, :] referenced by a chunk's M outputs span only a narrow
band B << U of the (sorted) staged rows, the product could use a [M, B]
one-hot against a dynamically-based B-row slice of gin — cutting the
dominant FLOP term by U/B.

This measures the band distribution (max-min of valid lidx per (chunk, k),
and per m-sub-block) on the real bench-scene plans, per level. CPU-only.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.ops.pallas.chunk_conv import (
        augment_plan_with_chunks,
    )

    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = augment_plan_with_chunks(build_plan_host(batch["coords"], spec))

    for lvl, level in enumerate(plan.levels):
        cp = getattr(level, "chunks", None)
        if cp is None:
            continue
        lidx = np.asarray(cp.lidx)          # [C, K, M]
        C, K, M = lidx.shape
        U = cp.in_idx.shape[1]
        active = np.asarray(level.num_active) if hasattr(level, "num_active") else None
        valid = lidx >= 0
        lo = np.where(valid, lidx, 2**30).min(axis=2)      # [C, K]
        hi = np.where(valid, lidx, -1).max(axis=2)         # [C, K]
        any_valid = valid.any(axis=2)
        band = np.where(any_valid, hi - lo + 1, 0)         # [C, K]
        # aligned band: base rounded down to 8 (sublane tiling), width up
        base8 = (lo // 8) * 8
        band8 = np.where(any_valid, hi - base8 + 1, 0)
        b = band8[any_valid]
        print(f"L{lvl}: C={C} K={K} M={M} U={U} "
              f"band p50={np.percentile(b, 50):.0f} "
              f"p90={np.percentile(b, 90):.0f} "
              f"p99={np.percentile(b, 99):.0f} max={b.max()}")
        # sub-blocks of 32 outputs
        for sub in (32,):
            G = M // sub
            l4 = lidx.reshape(C, K, G, sub)
            v4 = l4 >= 0
            lo4 = np.where(v4, l4, 2**30).min(axis=3)
            hi4 = np.where(v4, l4, -1).max(axis=3)
            av4 = v4.any(axis=3)
            b4 = (hi4 - (lo4 // 8) * 8 + 1)[av4]
            print(f"    sub{sub}: p50={np.percentile(b4, 50):.0f} "
                  f"p90={np.percentile(b4, 90):.0f} "
                  f"p99={np.percentile(b4, 99):.0f} max={b4.max()}")
        # what fraction of (c,k) would fit B in {128, 192, 256}?
        for B in (128, 192, 256):
            frac = (band8[any_valid] <= B).mean()
            print(f"    whole-chunk B={B}: {frac * 100:.1f}% of (c,k) fit")


if __name__ == "__main__":
    main()
