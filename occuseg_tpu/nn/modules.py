"""Sparse NN modules (flax.linen) — the reference's Python op library (L4).

Mirrors `sparseconvnet/*.py` module-for-module: SubmanifoldConvolution
(`submanifoldConvolution.py:35-53`), Convolution (`convolution.py`),
Deconvolution (`deconvolution.py`), BatchNorm family
(`batchNormalization.py`), NetworkInNetwork (`networkInNetwork.py`), poolings
(`maxPooling.py` etc.), IO layers (`ioLayers.py`). Weight layout
[K^3, Cin, Cout] and He init std (2 / (Cin * K^3))^0.5 match the reference
(`submanifoldConvolution.py:26-29`) for checkpoint-import parity.

Every module's __call__ signature is `(x: SparseTensor, plan: Topology,
train: bool)`; topology is read from the plan (never mutated), and level
transitions just change the tensor's static `level` index.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax.numpy as jnp

from occuseg_tpu.core.sparse_tensor import SparseTensor
from occuseg_tpu.core.topology import Topology
from occuseg_tpu.ops import conv as conv_ops
from occuseg_tpu.ops import norm as norm_ops
from occuseg_tpu.ops import pool as pool_ops


def _chunk_supported(cap: int, cin: int, cout: int) -> bool:
    from occuseg_tpu.ops.pallas.chunk_conv import supported
    return supported(cap, cin, cout)


def _sharded_conv(feats, map_arr, ex, w, b, chunks, axis_name):
    """Convolution over a spatially sharded map (plan built by
    parallel/spatial_model.build_spatial_topology; runs inside shard_map):
    extend local features with halo/pool rows over ICI, then run the SAME
    kernels as the unsharded path over the extended space — the fused
    Pallas chunk kernels when the per-shard chunk rulebooks are attached
    (VERDICT r2 #2), else the scatter-free XLA gather-conv with the
    extended-space transpose map."""
    import jax as _jax
    from occuseg_tpu.parallel.spatial import extend_features

    ext = extend_features(feats, ex.send_left, ex.send_right, ex.publish,
                          ex.halo, axis_name)
    cin, cout = feats.shape[1], w.shape[2]
    if (chunks is not None and ex.chunks_t is not None
            and _chunk_supported(map_arr.shape[0], cin, cout)):
        from occuseg_tpu.ops.pallas.chunk_conv import chunk_gather_conv_t
        pad = (-cin) % 8
        w_eff = w
        if pad:
            ext = jnp.pad(ext, ((0, 0), (0, pad)))
            w_eff = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
        out = chunk_gather_conv_t(
            ext, chunks.in_idx, chunks.lidx,
            ex.chunks_t.in_idx, ex.chunks_t.lidx, w_eff,
            granule=chunks.granule, t_granule=ex.chunks_t.granule,
            tmask=chunks.tmask, t_tmask=ex.chunks_t.tmask)
    else:
        from occuseg_tpu.ops import conv as conv_ops
        # custom_vjp blocks shard_map's replication inference — lift the
        # replicated weights to varying so the weight cotangent psums
        w_v = _jax.lax.pcast(w, axis_name, to="varying")
        out = conv_ops.gather_conv(ext, map_arr, w_v, None, nbr_t=ex.nbr_t)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _he_conv_init(volume: int):
    def init(key, shape, dtype=jnp.float32):
        cin = shape[1]
        std = (2.0 / (cin * volume)) ** 0.5
        return std * jnp.asarray(
            nn.initializers.normal(1.0)(key, shape, jnp.float32), dtype)
    return init


class SubmanifoldConvolution(nn.Module):
    """Same-topology K^3 convolution (reference `submanifoldConvolution.py`).

    normal_guided=True applies the reference's rotation-invariant filter
    remap (`remap_rules_with_normal`) using the plan's per-site orientation
    classes; requires the plan to have been built with point normals.
    """

    out_features: int
    kernel: int = 3
    use_bias: bool = False
    normal_guided: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        lvl = plan.levels[x.level]
        nbr = lvl.nbr
        K = nbr.shape[1]
        assert K == self.kernel ** 3, (
            f"plan built with kernel {int(round(K ** (1/3)))}, "
            f"module wants {self.kernel}")
        w = self.param("weight", _he_conv_init(K),
                       (K, x.num_channels, self.out_features),
                       self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.out_features,),
                        self.param_dtype) if self.use_bias else None)
        if lvl.halo_ex is not None:
            out = _sharded_conv(x.features, nbr, lvl.halo_ex, w, b,
                                lvl.chunks, plan.axis_name)
        elif self.normal_guided:
            from occuseg_tpu.ops.normal_guide import normal_guided_conv
            out = normal_guided_conv(x.features, nbr, lvl.orient, w, b)
        elif lvl.chunks is not None and _chunk_supported(
                nbr.shape[0], x.num_channels, self.out_features):
            # host-built chunk rulebook present: fused Pallas kernel
            # (ops/pallas/chunk_conv.py — VMEM-staged inputs, one-hot MXU
            # permutation; the reference chunk kernel's TPU analog).
            # Zero-pad tiny Cin (e.g. the first 3->m conv) to a lane-tiled
            # width; padded columns meet zero weights, so out is unchanged.
            # Tiny Cin pads all the way to 64: at Cin=8 the kernel's
            # per-offset [M, 8] scratch stores are lane-misaligned masked
            # writes and the first conv measured 2.4x over its one-hot
            # roofline (7.5ms, exp_r3_b); the one-hot FLOPs don't change
            # (the MXU pads the N dim regardless), only the stores align.
            from occuseg_tpu.ops.pallas.chunk_conv import chunk_gather_conv
            feats = x.features
            c_in = feats.shape[1]
            import os as _os
            tiny_floor = int(_os.environ.get("OCC_TINY_PAD", 64))
            target = max(tiny_floor, c_in + (-c_in) % 8) \
                if c_in < 48 else c_in + (-c_in) % 8
            pad = target - c_in
            w_eff = w
            if pad:
                feats = jnp.pad(feats, ((0, 0), (0, pad)))
                w_eff = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
            out = chunk_gather_conv(feats, lvl.chunks.in_idx,
                                    lvl.chunks.lidx, w_eff,
                                    granule=lvl.chunks.granule,
                                    tmask=lvl.chunks.tmask,
                                    ns=lvl.chunks.ns,
                                    center_k=lvl.chunks.center_k)
            if b is not None:
                out = out + b.astype(out.dtype)
        else:
            out = conv_ops.gather_conv(x.features, nbr, w, b)
        return dataclasses.replace(x, features=out)


class Convolution(nn.Module):
    """Strided convolution to the next-coarser level (reference
    `convolution.py`; rulebook = transition child map)."""

    out_features: int
    size: int = 2
    stride: int = 2
    use_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        tr = plan.transitions[x.level]
        assert tr.size == self.size and tr.stride == self.stride
        K = tr.child.shape[1]
        w = self.param("weight", _he_conv_init(K),
                       (K, x.num_channels, self.out_features),
                       self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.out_features,),
                        self.param_dtype) if self.use_bias else None)
        if tr.child_ex is not None:
            out = _sharded_conv(x.features, tr.child, tr.child_ex, w, b,
                                tr.child_chunks, plan.axis_name)
        elif tr.child_chunks is not None and _chunk_supported(
                tr.child.shape[0], x.num_channels, self.out_features):
            from occuseg_tpu.ops.pallas.chunk_conv import chunk_gather_conv_t
            out = chunk_gather_conv_t(
                x.features, tr.child_chunks.in_idx, tr.child_chunks.lidx,
                tr.up_chunks.in_idx, tr.up_chunks.lidx, w,
                granule=tr.child_chunks.granule,
                t_granule=tr.up_chunks.granule,
                tmask=tr.child_chunks.tmask, t_tmask=tr.up_chunks.tmask,
                ns=tr.child_chunks.ns)
            if b is not None:
                out = out + b.astype(out.dtype)
        else:
            out = conv_ops.gather_conv(x.features, tr.child, w, b,
                                       nbr_t=tr.up[:, ::-1])
        lvl = plan.levels[x.level + 1]
        return SparseTensor(features=out, num_active=lvl.num_active,
                            level=x.level + 1)


class Deconvolution(nn.Module):
    """Transposed strided convolution back to the finer level (reference
    `deconvolution.py`; rulebook = transition up map)."""

    out_features: int
    size: int = 2
    stride: int = 2
    use_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        assert x.level > 0, "Deconvolution needs a finer level to return to"
        tr = plan.transitions[x.level - 1]
        assert tr.size == self.size and tr.stride == self.stride
        K = tr.up.shape[1]
        w = self.param("weight", _he_conv_init(K),
                       (K, x.num_channels, self.out_features),
                       self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.out_features,),
                        self.param_dtype) if self.use_bias else None)
        if tr.up_ex is not None:
            out = _sharded_conv(x.features, tr.up, tr.up_ex, w, b,
                                tr.up_chunks, plan.axis_name)
        elif tr.up_chunks is not None and _chunk_supported(
                tr.up.shape[0], x.num_channels, self.out_features):
            from occuseg_tpu.ops.pallas.chunk_conv import chunk_gather_conv_t
            out = chunk_gather_conv_t(
                x.features, tr.up_chunks.in_idx, tr.up_chunks.lidx,
                tr.child_chunks.in_idx, tr.child_chunks.lidx, w,
                granule=tr.up_chunks.granule,
                t_granule=tr.child_chunks.granule,
                tmask=tr.up_chunks.tmask, t_tmask=tr.child_chunks.tmask,
                ns=tr.up_chunks.ns)
            if b is not None:
                out = out + b.astype(out.dtype)
        else:
            out = conv_ops.gather_conv(x.features, tr.up, w, b,
                                       nbr_t=tr.child[:, ::-1])
        lvl = plan.levels[x.level - 1]
        return SparseTensor(features=out, num_active=lvl.num_active,
                            level=x.level - 1)


class FullConvolution(nn.Module):
    """Active-set-GROWING transposed convolution (reference
    `fullConvolution.py:48-65` / `FullConvolutionRules.h:11-56`): output
    sites are ALL in*stride + [0,size)^3 positions — a fresh topology, not
    a return to an existing finer level (that is `Deconvolution`).

    Returns (SparseTensor at level 0 of a NEW single-level Topology,
    new_plan) — the analog of the reference's fresh Metadata. `cap_out` is
    the static output-site budget (default cap_in * size^3, the exact
    upper bound); `build_nbr=True` also builds the grown level's
    submanifold neighbor map so further same-level convs can follow.
    """

    out_features: int
    size: int = 2
    stride: int = 2
    cap_out: int | None = None
    use_bias: bool = False
    build_nbr: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False):
        from occuseg_tpu.core.topology import full_conv_plan

        lvl = plan.levels[x.level]
        cap_out = self.cap_out or lvl.cap * self.size ** 3
        out_lvl, tr = full_conv_plan(lvl, self.size, self.stride, cap_out,
                                     build_nbr=self.build_nbr)
        K = tr.up.shape[1]
        w = self.param("weight", _he_conv_init(K),
                       (K, x.num_channels, self.out_features),
                       self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.out_features,),
                        self.param_dtype) if self.use_bias else None)
        out = conv_ops.gather_conv(x.features, tr.up, w, b,
                                   nbr_t=tr.child[:, ::-1])
        new_plan = Topology(
            levels=(out_lvl,), transitions=(),
            p2v=jnp.full((1,), -1, jnp.int32),
            num_points=jnp.zeros((), jnp.int32))
        return (SparseTensor(features=out, num_active=out_lvl.num_active,
                             level=0), new_plan)


class TransposeConvolution(FullConvolution):
    """Reference alias (`fullConvolution.py`)."""


class NetworkInNetwork(nn.Module):
    """1x1 convolution = row matmul (reference `networkInNetwork.py`)."""

    out_features: int
    use_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        w = self.param("weight", _he_conv_init(1),
                       (x.num_channels, self.out_features), self.param_dtype)
        b = (self.param("bias", nn.initializers.zeros, (self.out_features,),
                        self.param_dtype) if self.use_bias else None)
        return x.with_features(conv_ops.nin(x.features, w, b))


class BatchNormalization(nn.Module):
    """Masked BN + optional fused leaky activation; reference semantics
    (eps=1e-4, decay-momentum=0.9, leakiness: 0=ReLU, 1=none)."""

    eps: float = 1e-4
    momentum: float = 0.9
    leakiness: float = 1.0

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        c = x.num_channels
        scale = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((c,), jnp.float32))
        state = norm_ops.BNState(ra_mean.value, ra_var.value)
        out, new_state = norm_ops.batch_norm(
            x.features, x.num_active, scale, bias, state,
            eps=self.eps, momentum=self.momentum, leakiness=self.leakiness,
            training=train,
            # spatial sharding: psum batch stats over the mesh axis
            axis_name=getattr(plan, "axis_name", None))
        if train and not self.is_initializing():
            ra_mean.value = new_state.running_mean
            ra_var.value = new_state.running_var
        return x.with_features(out)


class BatchNormReLU(BatchNormalization):
    leakiness: float = 0.0


class BatchNormLeakyReLU(BatchNormalization):
    leakiness: float = 0.333


class MaxPooling(nn.Module):
    """(reference `maxPooling.py`)"""

    size: int = 2
    stride: int = 2

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        tr = plan.transitions[x.level]
        out = pool_ops.max_pool(x.features, tr.child)
        lvl = plan.levels[x.level + 1]
        return SparseTensor(features=out, num_active=lvl.num_active,
                            level=x.level + 1)


class AveragePooling(nn.Module):
    """(reference `averagePooling.py`)"""

    size: int = 2
    stride: int = 2

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        tr = plan.transitions[x.level]
        out = pool_ops.avg_pool(x.features, tr.child)
        lvl = plan.levels[x.level + 1]
        return SparseTensor(features=out, num_active=lvl.num_active,
                            level=x.level + 1)


class UnPooling(nn.Module):
    """(reference `unPooling.py`)"""

    size: int = 2
    stride: int = 2

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> SparseTensor:
        assert x.level > 0
        tr = plan.transitions[x.level - 1]
        out = pool_ops.unpool(x.features, tr.up)
        lvl = plan.levels[x.level - 1]
        return SparseTensor(features=out, num_active=lvl.num_active,
                            level=x.level - 1)


class InputLayer(nn.Module):
    """Point cloud -> level-0 sparse tensor (reference `ioLayers.py:47-63`,
    mode 4 = mean pooling of point features into voxels)."""

    mode: str = "mean"

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, plan: Topology,
                 train: bool = False) -> SparseTensor:
        lvl = plan.levels[0]
        vox = pool_ops.voxelize_features(point_features, plan.p2v, lvl.cap,
                                         mode=self.mode,
                                         vox_seg=plan.vox_seg,
                                         vox_counts=plan.vox_counts,
                                         ns=_plan_ns(plan))
        return SparseTensor(features=vox, num_active=lvl.num_active, level=0)


def _plan_ns(plan) -> int:
    """Scene count of a blocked-layout plan (num_active is an [ns] vector;
    scalar = single scene / concatenated layout). Static: it's a shape."""
    na = plan.levels[0].num_active
    return int(na.shape[0]) if getattr(na, "ndim", 0) == 1 else 1


class OutputLayer(nn.Module):
    """Level-0 sparse tensor -> per-point features (reference
    `ioLayers.py:66-87`)."""

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> jnp.ndarray:
        assert x.level == 0, "OutputLayer expects level-0 features"
        return pool_ops.devoxelize_features(x.features, plan.p2v,
                                            vox_seg=plan.vox_seg,
                                            ns=_plan_ns(plan))


class BLInputLayer(nn.Module):
    """Batch x length point-cloud input (reference `ioLayers.py`
    BLInputLayer / `IOLayersRules.h` blRules): dense [B, L, 4] coords +
    [B, L, C] features -> level-0 sparse tensor. Rows with coords < 0 are
    padding. The plan must have been built from the flattened coords."""

    mode: str = "mean"

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, plan: Topology,
                 train: bool = False) -> SparseTensor:
        B, L, C = point_features.shape
        flat = point_features.reshape(B * L, C)
        lvl = plan.levels[0]
        vox = pool_ops.voxelize_features(flat, plan.p2v, lvl.cap,
                                         mode=self.mode,
                                         vox_seg=plan.vox_seg,
                                         vox_counts=plan.vox_counts)
        return SparseTensor(features=vox, num_active=lvl.num_active, level=0)


class BLOutputLayer(nn.Module):
    """Inverse of BLInputLayer: sparse level-0 features -> [B, L, C]."""

    batch_size: int = 1

    @nn.compact
    def __call__(self, x: SparseTensor, plan: Topology,
                 train: bool = False) -> jnp.ndarray:
        assert x.level == 0
        flat = pool_ops.devoxelize_features(x.features, plan.p2v,
                                            vox_seg=plan.vox_seg)
        L = flat.shape[0] // self.batch_size
        return flat.reshape(self.batch_size, L, -1)


class RandomizedStrideConvolution(Convolution):
    """Strided conv whose train-time windows are jittered (reference
    `randomizedStrideConvolution.py` / `RandomizedStrideRules.h`). The
    jitter lives in the PLAN: feed a `core.randomized.build_randomized_plan`
    topology during training and a regular plan at eval — this module is
    the regular strided conv over whichever transition the plan carries."""


class RandomizedStrideMaxPooling(MaxPooling):
    """Max pool over jittered windows (reference
    `randomizedStrideMaxPooling.py`); see RandomizedStrideConvolution."""
