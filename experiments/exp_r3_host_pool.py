"""Round-3: host plan-building throughput vs worker count (VERDICT r2 #7).

Measures plans/s (full plan + chunk rulebooks, production caps) through
occuseg_tpu.native.pool.PlanPool at 1/2/4 workers, plus the single-thread
baseline. On the 1-core build host the pool cannot scale — this records
the honest bound; re-run on a many-core production host to size
--plan_workers (the reference uses DataLoader num_workers=10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
N_BATCHES = 6


def main():
    from occuseg_tpu.core.topology import PlanSpec
    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.native.plan import build_plan_host
    from occuseg_tpu.native.pool import PlanPool
    from occuseg_tpu.ops.pallas.chunk_conv import augment_plan_with_chunks

    print(f"host cores: {os.cpu_count()}", flush=True)
    spec = PlanSpec(caps=CAPS)
    batches = [make_batch(SceneConfig(num_points=200_000, extent=512,
                                      num_objects=24),
                          num_scenes=1, p_cap=262_144, num_instances=64,
                          seed=s) for s in range(N_BATCHES)]

    # single-thread baseline
    t0 = time.perf_counter()
    for b in batches:
        plan = augment_plan_with_chunks(build_plan_host(b["coords"], spec))
    dt = time.perf_counter() - t0
    print(f"thread baseline: {N_BATCHES / dt:.2f} plans/s "
          f"({dt / N_BATCHES * 1e3:.0f} ms/plan)", flush=True)

    for w in (1, 2, 4):
        with PlanPool(spec, w, chunks=True) as pool:
            # warm the workers (fork + first-call imports)
            next(iter(pool.imap(batches[:1])))
            t0 = time.perf_counter()
            n = 0
            for b, plan, bi in pool.imap(batches):
                assert plan is not None
                assert any(l.chunks is not None for l in plan.levels)
                n += 1
            dt = time.perf_counter() - t0
        print(f"pool workers={w}: {n / dt:.2f} plans/s "
              f"({dt / n * 1e3:.0f} ms/plan)", flush=True)


if __name__ == "__main__":
    main()
