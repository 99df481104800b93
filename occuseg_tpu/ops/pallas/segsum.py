"""Block-aligned sorted segment sum: the TPU-native voxelize scatter.

The reference's InputLayer forward / OutputLayer backward are atomic
scatter-adds over the point->voxel map (`SCN/CUDA/IOLayers.cu`
InputLayer_fp/OutputLayer_bp). XLA lowers `jax.ops.segment_sum` to a TPU
scatter that serializes on duplicate indices — measured 3.4 ms for a
[262k, 64] -> [196k] reduction, with the point-count pass and the
3-channel input voxelize adding another ~5 ms per step.

TPU-native answer: the host loader already Morton-sorts the level-0
voxels; it additionally sorts the POINTS by voxel row and lays them out in
fixed-size runs (`core/point_layout.py`): block b of R point slots holds
exactly the points of voxel block b (W voxels), padded with -1. Each
block's reduction is then a one-hot MXU product — `[W, R] @ [R, C]` — with
no scatter anywhere, the same formulation as the chunked convolution
kernels (`chunk_conv.py`). Points of a block that overflow its R slots
live in the array tail and go through a (tiny, usually empty) XLA
segment-sum sidecar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occuseg_tpu.ops.pallas.chunk_conv import (
    _interpret_default, _match_vma, _sds,
)


def _kernel(seg_ref, x_ref, out_ref, W: int):
    """One voxel block: out[w] = sum over slots r with seg[r] == w of x[r].
    Pad slots (seg == -1) match no output row and contribute nothing."""
    seg = seg_ref[0, 0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, seg.shape[0]), 0)
    oh = (seg[None, :] == iota).astype(x_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        oh, x_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def blocked_segment_sum(x: jnp.ndarray, vox_seg: jnp.ndarray,
                        num_out: int, interpret: bool | None = None
                        ) -> jnp.ndarray:
    """[B*R (+tail), C] rows -> [num_out, C] f32 sums, where vox_seg
    [B, 1, R] holds each slot's voxel id RELATIVE to its block's first
    voxel (-1 = pad slot). num_out must be B * W with W a multiple of 8.
    Rows past B*R (the overflow tail) are ignored — add them via
    `tail_segment_sum`."""
    B, _, R = vox_seg.shape
    C = x.shape[1]
    W = num_out // B
    assert B * W == num_out and W % 8 == 0 and R % 8 == 0, (B, W, R)
    if interpret is None:
        interpret = _interpret_default()
    xm = x[:B * R]
    vox_seg, xm = _match_vma(vox_seg, xm)
    with jax.enable_x64(False):  # Mosaic cannot lower i64 index arithmetic
        return _call(vox_seg, xm, B, R, C, W, num_out, interpret)


def _call(vox_seg, xm, B, R, C, W, num_out, interpret):
    return pl.pallas_call(
        functools.partial(_kernel, W=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, C), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((num_out, C), jnp.float32, xm),
        interpret=interpret,
    )(vox_seg, xm)


def tail_segment_sum(x: jnp.ndarray, p2v: jnp.ndarray, main_rows: int,
                     num_out: int) -> jnp.ndarray:
    """Overflow-tail sidecar: [num_out, C] f32 sums of rows past
    `main_rows`, routed by their (absolute) p2v entries. Static tail
    length; usually every row is -1 padding."""
    xt = x[main_rows:].astype(jnp.float32)
    seg = p2v[main_rows:]
    seg = jnp.where(seg >= 0, seg, num_out).astype(jnp.int32)
    return jax.ops.segment_sum(xt, seg, num_segments=num_out + 1)[:num_out]


def sorted_segment_sum(x: jnp.ndarray, p2v: jnp.ndarray,
                       vox_seg: jnp.ndarray, num_out: int) -> jnp.ndarray:
    """Full points->voxels sum under the sorted point layout: Pallas main
    blocks + XLA overflow tail. x [P, C], returns [num_out, C] f32."""
    B, _, R = vox_seg.shape
    out = blocked_segment_sum(x, vox_seg, num_out)
    if x.shape[0] > B * R:
        out = out + tail_segment_sum(x, p2v, B * R, num_out)
    return out
