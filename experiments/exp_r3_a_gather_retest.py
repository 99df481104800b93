"""Round-3 experiment A: re-test Mosaic gather support (per-toolchain-drop
check mandated by the round-2 notes — the failure moved from server crash
to clean NotImplemented messages, i.e. the feature is being worked on).

Probes, each in its own try/except so one failure doesn't hide the rest:
  1. same-shape take_along_axis, f32 data + i32 indices (bitwidth match)
  2. same-shape take_along_axis, bf16 data (bitwidth mismatch — expect fail)
  3. arbitrary row gather jnp.take inside a kernel
  4. tpu.dynamic_gather-style lax.gather on a [256, 128] f32 source
     (multi-vreg along gather dim — the other round-2 blocker)
If (1)+(4) pass, an in-VMEM row permutation can replace the one-hot MXU
product (O(M*Cin) instead of O(M*U*Cin) per offset) — re-architect the
chunk kernel around it.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[PASS] {name}: {np.asarray(out).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = repr(e)[:300].replace("\n", " ")
        print(f"[FAIL] {name}: {msg}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), flush=True)

    # 1. same-shape take_along_axis, f32/i32
    def k1(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)

    def t1():
        d = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
        i = jnp.broadcast_to(
            (jnp.arange(128, dtype=jnp.int32)[::-1])[:, None], (128, 128))
        return pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(d, i)
    probe("take_along_axis f32/i32 same-shape axis0", t1)

    # 2. bf16 data
    def t2():
        d = jnp.arange(128 * 128, dtype=jnp.bfloat16).reshape(128, 128)
        i = jnp.broadcast_to(
            (jnp.arange(128, dtype=jnp.int32)[::-1])[:, None], (128, 128))
        return pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.bfloat16))(d, i)
    probe("take_along_axis bf16/i32 same-shape axis0", t2)

    # 3. arbitrary row gather (output rows != data rows)
    def k3(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(d_ref[:], i_ref[:, 0], axis=0)

    def t3():
        d = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
        i = jnp.broadcast_to(
            (jnp.arange(128, dtype=jnp.int32) * 2)[:, None], (128, 128))
        return pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(d, i)
    probe("jnp.take arbitrary rows 256->128 f32", t3)

    # 4. multi-vreg source along gather dim (256 sublanes), same-shape form
    def t4():
        d = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
        i = jnp.broadcast_to(
            (jnp.arange(256, dtype=jnp.int32) % 200)[:, None], (256, 128))
        return pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32))(d, i)
    probe("take_along_axis f32 256-row (multi-vreg) source", t4)

    # 5. lane-dim gather (axis=1) — sometimes a separate lowering
    def k5(d_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(d_ref[:], i_ref[:], axis=1)

    def t5():
        d = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
        i = jnp.broadcast_to(
            (jnp.arange(128, dtype=jnp.int32)[::-1])[None, :], (128, 128))
        return pl.pallas_call(
            k5, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(d, i)
    probe("take_along_axis f32 axis=1 (lane dim)", t5)

    # 6. scalar-prefetch driven block gather: BlockSpec index_map reading
    # from a prefetched SMEM ref — the sparsecore-style row gather. If this
    # works at granule-8 blocks it can replace the XLA staging gather.
    def k6(idx_ref, d_ref, o_ref):
        o_ref[:] = d_ref[:]

    def t6():
        d = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
        idx = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)  # granule ids
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(8,),
            in_specs=[pl.BlockSpec((8, 128), lambda g, idx_ref: (idx_ref[g], 0))],
            out_specs=pl.BlockSpec((8, 128), lambda g, idx_ref: (g, 0)),
        )
        return pl.pallas_call(
            k6, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(idx, d)
    ok6 = probe("scalar-prefetch block gather (granule-8)", t6)

    if ok6:
        # verify values
        d = np.arange(512 * 128, dtype=np.float32).reshape(512, 128)
        idx = np.asarray([3, 1, 4, 1, 5, 9, 2, 6])
        want = np.concatenate([d[8 * i:8 * i + 8] for i in idx])
        got = np.asarray(t6())
        print("  scalar-prefetch values match:", np.array_equal(got, want),
              flush=True)


if __name__ == "__main__":
    main()
