"""Round-3 experiment N: loss-only A/B for the flagship 6-term loss.

The flagship profile (exp_r3_b re-run at HEAD, 189.9 ms busy) shows three
pathological ops in the loss chain:
  * fusion.68  3.06 ms — `own_d = take_along_axis(d_spat, seg)`: per-element
    4-byte gather from the column-major [P, I] matrix
  * fusion.70  2.29 ms — `radius = _seg_max(own_d, seg)`: masked [P, I] max
    built from scratch
  * fusion.71  2.23 ms — scatter-add BACKWARD of the `mu[clip(seg)]` row
    gather in discriminative_loss (fwd one-hot dots were fixed round 2;
    the bwd of a take is still a TPU scatter, which serializes)

This harness times value_and_grad of `occuseg_total_loss` alone (w.r.t. the
model outputs) on the real chip, with the chained-data-dependence +
host-materialization recipe from experiments/timing.py, so loss-chain
reformulations can be A/B'd in ~1 min instead of a full bench.py run.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P_CAP = 262_144
I_CAP = 64
M = 64


def main():
    import jax
    import jax.numpy as jnp

    from occuseg_tpu.data.synthetic import SceneConfig, make_batch
    from occuseg_tpu.losses.instance import LossConfig, occuseg_total_loss
    from occuseg_tpu.models.occuseg import OccuSegOutputs

    batch = make_batch(SceneConfig(num_points=200_000, extent=512,
                                   num_objects=24),
                       num_scenes=1, p_cap=P_CAP, num_instances=I_CAP,
                       seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = np.random.default_rng(0)

    def arr(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                           dtype=dtype)

    outputs = OccuSegOutputs(
        semantics=arr((P_CAP, 20)), features=arr((P_CAP, M)),
        embedding=arr((P_CAP, M)), offset=jax.nn.sigmoid(arr((P_CAP, 1))),
        displacement=arr((P_CAP, 3)),
        bw=jax.nn.softplus(arr((P_CAP, 2))),
        occupancy=jax.nn.softplus(arr((P_CAP, 1))))

    cfg = LossConfig()

    def loss_of(outs):
        total, _ = occuseg_total_loss(outs, batch, 1, I_CAP, cfg)
        return total

    @jax.jit
    def step(outs):
        total, grads = jax.value_and_grad(loss_of)(outs)
        return total, grads

    @jax.jit
    def chain(outs, n):
        # data-dependence chain defeats the tunnel's dispatch dedup
        def body(_, carry):
            outs, acc = carry
            total, grads = jax.value_and_grad(loss_of)(outs)
            # keep EVERY grad leaf alive (first-element probe), or the whole
            # backward is dead-code-eliminated out of the loop
            probe = sum(jnp.sum(g.ravel()[0]).astype(jnp.float32)
                        for g in jax.tree.leaves(grads))
            outs = outs._replace(
                embedding=outs.embedding
                + ((total + probe) * 0).astype(outs.embedding.dtype))
            return outs, acc + total + probe * 0
        return jax.lax.fori_loop(0, n, body, (outs, jnp.float32(0)))

    # warmup / compile
    total, grads = step(outputs)
    print("loss:", float(total), flush=True)

    # timed windows: chained grads, host-materialized sync, first dropped
    N = 20
    times = []
    for w in range(4):
        t0 = time.perf_counter()
        _, acc = chain(outputs, N)
        acc = float(acc)  # host materialization = the only real sync
        dt = (time.perf_counter() - t0) / N * 1e3
        times.append(dt)
        print(f"window {w}: {dt:.3f} ms/iter (acc={acc:.3f})", flush=True)
    print(f"loss value_and_grad: {min(times[1:]):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
