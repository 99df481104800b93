"""Round-4 experiment D: which dynamic sublane-slice forms does Mosaic
accept? (feeds the banded one-hot design, exp_r4_c)

The banded build needs gb = gin[s0 : s0+W, :] with s0 a per-(chunk,
offset) SMEM scalar. The straight 3D ref read failed to legalize:
  vector.load memref<1x256x128xbf16> -> vector<1x192x64xbf16>

Forms tried here (tiny shapes, compile + numeric check per form):
  f32_8    f32 ref, 8-aligned start      (f32 sublane tile = 8)
  bf16_16  bf16 ref, 16-aligned start    (bf16 sublane tile = 16)
  bf16_at  bf16, ref.at[0] sub-ref then 2D dynamic read
  bf16_dma async_copy of the dynamic slice into scratch, then read
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

U, W, CIN, M, C = 256, 192, 64, 128, 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((C, U, CIN)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    # per-chunk starts, various alignments
    s8 = jnp.asarray((rng.integers(0, (U - W) // 8, C) * 8)
                     .astype(np.int32).reshape(C, 1, 1))
    s16 = jnp.asarray((rng.integers(0, (U - W) // 16, C) * 16)
                      .astype(np.int32).reshape(C, 1, 1))

    def check(tag, fn, x, s):
        try:
            with jax.enable_x64(False):
                t0 = time.time()
                out = jax.jit(fn)(x, s)
                out = np.asarray(out)
            ref = np.stack([np.asarray(x, np.float32)[
                c, int(s[c, 0, 0]):int(s[c, 0, 0]) + W] for c in range(C)])
            ok = np.allclose(out.astype(np.float32), ref, atol=1e-2)
            print(f"{tag}: OK ({time.time()-t0:.0f}s) match={ok}",
                  flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:200]}", flush=True)

    def make(form, dtype):
        def kernel(s_ref, x_ref, o_ref, *scratch):
            s0 = s_ref[0, 0, 0]
            if form == "3d":
                o_ref[0] = x_ref[0, pl.ds(s0, W), :]
            elif form == "at":
                sub = x_ref.at[0]
                o_ref[0] = sub[pl.ds(s0, W), :]
            elif form == "dma":
                buf, sem = scratch
                cp = pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(s0, W), :], buf, sem)
                cp.start()
                cp.wait()
                o_ref[0] = buf[:]

        scratch = ([pltpu.VMEM((W, CIN), dtype),
                    pltpu.SemaphoreType.DMA] if form == "dma" else [])
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, U, CIN), lambda c: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, W, CIN), lambda c: (c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, W, CIN), dtype),
            scratch_shapes=scratch,
        )

    check("f32 8-al 3d ", lambda x, s: make("3d", jnp.float32)(s, x),
          x32, s8)
    check("bf16 16-al 3d", lambda x, s: make("3d", jnp.bfloat16)(s, x),
          x16, s16)
    check("bf16 8-al 3d ", lambda x, s: make("3d", jnp.bfloat16)(s, x),
          x16, s8)
    check("bf16 16-al at", lambda x, s: make("at", jnp.bfloat16)(s, x),
          x16, s16)
    check("bf16 8-al dma", lambda x, s: make("dma", jnp.bfloat16)(s, x),
          x16, s8)
    check("f32 8-al dma ", lambda x, s: make("dma", jnp.float32)(s, x),
          x32, s8)


if __name__ == "__main__":
    main()
