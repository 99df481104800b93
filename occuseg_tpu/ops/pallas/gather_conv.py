"""Pallas fused gather-matmul submanifold convolution (VMEM-resident).

The XLA path (`ops/conv.py`) materializes each offset's gathered [N,Cin]
block in HBM before its matmul — 3x the minimal traffic. This kernel keeps
the whole level's features in VMEM and performs the K gathers as in-VMEM
row permutations (`take_along_axis` along axis 0, the one gather form
Mosaic lowers natively), feeding the MXU directly:

    grid = (cout_blocks, cin_blocks)           # cin = contraction, fastest
    kernel: for k in K: out += permute(feats_cinblk, nbr[k]) @ w[k, cinblk]

Applicable when one Cin-block of features fits VMEM alongside the gather
temp and accumulator — for the m=64 UNet that is every level with
N <= ~32k (levels 3-5, ~55% of conv FLOPs). `supported()` reports
eligibility; `ops/conv.gather_conv` stays the general path.

This is the TPU analog of the reference's chunk-based shared-memory kernel
(`Convolution.cu:1059-1253`): same idea — stage features once in fast
memory, run all offsets against the staged copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget in bytes we allow the kernel's resident feature block + temps
_VMEM_BUDGET = 12 * 1024 * 1024


def supported(n_rows: int, cin: int, cout: int, K: int,
              dtype=jnp.bfloat16) -> bool:
    esize = jnp.dtype(dtype).itemsize
    cin_b = min(cin, 128)
    cout_b = min(cout, 128)
    usage = (n_rows * cin_b * esize        # resident feats block
             + n_rows * cin_b * esize      # gather temp
             + n_rows * cout_b * 4         # f32 accumulator
             + K * n_rows * 4              # neighbor map
             + K * cin_b * cout_b * esize)
    return usage <= _VMEM_BUDGET and n_rows % 8 == 0 and cin % 128 in (0,) \
        and cout % 128 == 0


_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
    operand_batching_dims=(1,), start_indices_batching_dims=(1,))


def _kernel(nbr_ref, feats_ref, w_ref, out_ref):
    K = nbr_ref.shape[0]
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(k, acc):
        idx = nbr_ref[k, :]
        safe = jnp.where(idx < 0, 0, idx).astype(jnp.int32)
        idxb = jnp.broadcast_to(safe[:, None], feats_ref.shape)
        # lax.gather in the exact batched form Mosaic lowers to
        # tpu.dynamic_gather (take_along_axis would promote indices to
        # int64 under x64 and loop the convert lowering)
        g = jax.lax.gather(
            feats_ref[:], idxb[..., None], _GATHER_DNUMS,
            slice_sizes=(1, 1),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = jnp.where((idx >= 0)[:, None], g, 0)
        return acc + jnp.dot(g, w_ref[k],
                             preferred_element_type=jnp.float32)

    # int32 bounds: under global x64 a Python-int fori_loop counter becomes
    # int64, which Mosaic's convert lowering cannot express (it recurses)
    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(K), body,
                            jnp.zeros(out_ref.shape, jnp.float32))
    out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit,
                   static_argnames=("cin_block", "cout_block", "interpret"))
def gather_conv_pallas(feats: jnp.ndarray, nbr_kn: jnp.ndarray,
                       weight: jnp.ndarray, cin_block: int = 128,
                       cout_block: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """feats [N, Cin] (bf16), nbr_kn [K, N] int32 (transposed layout),
    weight [K, Cin, Cout]. Returns [N, Cout] in feats.dtype."""
    N, Cin = feats.shape
    K = nbr_kn.shape[0]
    Cout = weight.shape[2]
    assert Cin % cin_block == 0 and Cout % cout_block == 0
    w = weight.astype(feats.dtype)

    # Trace the kernel with x64 OFF: the package enables x64 globally (for
    # packed keys) and under x64 some pallas-internal index constants become
    # int64, which Mosaic's convert lowering cannot express (it recurses).
    with jax.enable_x64(False):
        out = _pallas_conv(feats, nbr_kn, w, cin_block, cout_block,
                           interpret)
    return out.astype(feats.dtype)


def _pallas_conv(feats, nbr_kn, w, cin_block, cout_block,
                 interpret=False):
    N, Cin = feats.shape
    K = nbr_kn.shape[0]
    Cout = w.shape[2]
    out = pl.pallas_call(
        _kernel,
        grid=(Cout // cout_block, Cin // cin_block),
        in_specs=[
            pl.BlockSpec((K, N), lambda co, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, cin_block), lambda co, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, cin_block, cout_block),
                         lambda co, ci: (0, ci, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, cout_block), lambda co, ci: (0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Cout), jnp.float32),
        interpret=interpret,
    )(nbr_kn, feats, w)
    return out
