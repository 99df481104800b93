"""Round-2 experiment C (CPU): chunk-locality statistics of real plans.

For the chunked one-hot conv kernel the key parameter is U (staged input
rows per chunk) vs M (output rows per chunk): one-hot FLOPs scale with U.
Measure, on a realistic synthetic ScanNet-like scene, the distribution of
unique referenced rows per Morton chunk of M rows, for the submanifold nbr
maps of every UNet level (and the transition child/up maps).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.native.plan import build_plan_host

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)


def chunk_stats(nbr: np.ndarray, n: int, M: int):
    """For each chunk of M consecutive output rows, unique refs count and
    external (outside own chunk row range) count."""
    uniq, ext = [], []
    for s in range(0, n, M):
        e = min(s + M, n)
        refs = nbr[s:e].reshape(-1)
        refs = refs[refs >= 0]
        u = np.unique(refs)
        uniq.append(len(u))
        ext.append(int(((u < s) | (u >= e)).sum()))
    return np.asarray(uniq), np.asarray(ext)


def main():
    spec = PlanSpec(caps=CAPS)
    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=262_144, num_instances=64, seed=0)
    plan = build_plan_host(batch["coords"], spec)
    assert plan is not None

    for li, lvl in enumerate(plan.levels):
        n = int(lvl.num_active)
        nbr = np.asarray(lvl.nbr)[:n]
        for M in (128, 256, 512):
            u, e = chunk_stats(nbr, n, M)
            print(f"L{li} n={n} M={M}: uniq p50={np.percentile(u,50):.0f} "
                  f"p90={np.percentile(u,90):.0f} p99={np.percentile(u,99):.0f} "
                  f"max={u.max()} | ext p50={np.percentile(e,50):.0f} "
                  f"p90={np.percentile(e,90):.0f} p99={np.percentile(e,99):.0f} "
                  f"max={e.max()}", flush=True)
    # transitions: child map consumed at coarse level (output rows = coarse)
    for ti, tr in enumerate(plan.transitions):
        nc = int(plan.levels[ti + 1].num_active)
        child = np.asarray(tr.child)[:nc]
        for M in (256,):
            u, e = chunk_stats(child, nc, M)
            print(f"T{ti}.child nc={nc} M={M}: uniq p50={np.percentile(u,50):.0f}"
                  f" p99={np.percentile(u,99):.0f} max={u.max()}", flush=True)
        nf = int(plan.levels[ti].num_active)
        up = np.asarray(tr.up)[:nf]
        for M in (256,):
            u, e = chunk_stats(up, nf, M)
            print(f"T{ti}.up nf={nf} M={M}: uniq p50={np.percentile(u,50):.0f}"
                  f" p99={np.percentile(u,99):.0f} max={u.max()}", flush=True)


if __name__ == "__main__":
    main()
