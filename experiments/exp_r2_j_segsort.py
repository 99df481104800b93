"""Round-2 experiment J: does indices_are_sorted speed up TPU scatter?

The IO-boundary segment ops (voxelize fwd, devoxelize bwd) cost ~9ms/step
with unsorted p2v. If XLA's sorted-scatter path is real, storing the point
sort order in the plan pays for itself.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    P, V, C = 262144, 196608, 64
    seg_sorted = np.sort(rng.integers(0, V, P)).astype(np.int32)
    perm = rng.permutation(P)
    seg_unsorted = seg_sorted[perm]
    x = jnp.asarray(rng.standard_normal((P, C)), jnp.bfloat16)
    ss = jnp.asarray(seg_sorted)
    su = jnp.asarray(seg_unsorted)

    def run(seg, sorted_flag):
        @jax.jit
        def many(xx, sg):
            def body(i, acc):
                o = jax.ops.segment_sum(xx, sg, num_segments=V,
                                        indices_are_sorted=sorted_flag)
                return acc + o[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
        jax.block_until_ready(many(x, seg))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(many(x, seg))
            best = min(best, (time.perf_counter() - t0) / 10)
        return best * 1e3

    t_u = run(su, False)
    t_s = run(ss, True)
    t_s_nohint = run(ss, False)
    print(f"unsorted: {t_u:.2f}ms  sorted+hint: {t_s:.2f}ms  "
          f"sorted-nohint: {t_s_nohint:.2f}ms", flush=True)

    # also: cumsum-based sorted segment sum (diff of inclusive cumsum at
    # segment ends) as an alternative formulation
    ends = np.searchsorted(seg_sorted, np.arange(1, V + 1)) - 1
    ends_j = jnp.asarray(np.maximum(ends, 0).astype(np.int32))
    nonempty = jnp.asarray(
        (np.searchsorted(seg_sorted, np.arange(1, V + 1))
         - np.searchsorted(seg_sorted, np.arange(V))) > 0)

    @jax.jit
    def many_cumsum(xx):
        def body(i, acc):
            cs = jnp.cumsum(xx.astype(jnp.float32), axis=0)
            at_end = cs[ends_j]
            o = jnp.diff(at_end, axis=0, prepend=jnp.zeros((1, C)))
            o = jnp.where(nonempty[:, None], o, 0)
            return acc + o[0, 0]
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
    jax.block_until_ready(many_cumsum(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(many_cumsum(x))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"cumsum-form: {best*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
