"""Shared TPU micro-timing harness (round-3).

The axon tunnel DEDUPES identical dispatches — a jitted fn called twice
with the same buffers returns instantly, and in-jit fori timing loops get
LICM-hoisted or constant-folded (0-scaled chains fold; epsilon chains
fold after rounding). The ONLY reliable pattern (the one bench.py uses):
a Python-level loop where each dispatch's ARGS depend lazily on the
previous dispatch's OUTPUT, with one block_until_ready at the end.

    t_ms = chain_time(fn, w, *args)   # fn(w_like, *args) -> array

Validate any new harness against a known quantity (the bench fwd+bwd
step) before trusting numbers from it.
"""

from __future__ import annotations

import time


def chain_time(fn, w, *args, iters: int = 20, reps: int = 3) -> float:
    """Best-of-`reps` mean ms over `iters` chained dispatches of
    fn(w', *args), where w' carries a BF16-VISIBLE bounded perturbation of
    the previous output (w * (1 + frac(prev)*1e-3)). The dedup appears to
    hash buffer CONTENTS, so the perturbation must survive rounding —
    sub-epsilon chains (x*0, +1e-12) measured 0.0ms for multi-ms kernels.
    Validate against a known op before trusting a modified harness."""
    import jax
    import jax.numpy as jnp

    fnj = jax.jit(fn)
    out = fnj(w, *args)
    jax.block_until_ready(out)

    def perturb(out):
        s = out.reshape(-1)[0].astype(jnp.float32)
        return (w.astype(jnp.float32)
                * (1.0 + (s - jnp.floor(s)) * 1e-3)).astype(w.dtype)

    times = []
    w_cur = w
    for r in range(reps + 1):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fnj(w_cur, *args)
            w_cur = perturb(out)
        # block_until_ready alone lets the tunnel pipeline dispatches —
        # a HOST materialization is the only real sync point
        float(out.reshape(-1)[0].astype(jnp.float32))
        times.append((time.perf_counter() - t0) / iters)
    # first window can absorb queued work — drop it
    return min(times[1:]) * 1e3
