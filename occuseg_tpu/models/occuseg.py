"""OccuSeg model family (reference `examples/ScanNet/model.py`).

* `ThreeVoxelKernel` (`model.py:748-784`): InputLayer -> SubmanifoldConv ->
  UNet -> BN-ReLU -> OutputLayer backbone + semantic/embedding/offset heads.
* `InstanceDenseUNet` (`model.py:657-691`): same backbone + embedding /
  offset(sigmoid) / displacement heads.
* `LearningBWDenseUNet` (`model.py:693-717`): the full OccuSeg model —
  backbone + per-point bandwidth (2-dim Softplus) and occupancy (1-dim
  Softplus) heads.

Head wiring copies the reference exactly: each head is fc -> linear with NO
intermediate activation (`model.py:687-691`), sigmoid on offset, Softplus on
bw/occupancy.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax.numpy as jnp

from occuseg_tpu.core.topology import Topology
from occuseg_tpu.nn.modules import (
    BatchNormReLU,
    InputLayer,
    OutputLayer,
    SubmanifoldConvolution,
)
from occuseg_tpu.nn.unet import UNet


class OccuSegOutputs(NamedTuple):
    """Per-point predictions, all [P_cap, ...]; padding rows are zero."""

    semantics: jnp.ndarray       # [P, num_classes] logits
    features: jnp.ndarray        # [P, m] backbone features
    embedding: jnp.ndarray       # [P, m]
    offset: jnp.ndarray          # [P, 1] sigmoid centredness
    displacement: jnp.ndarray    # [P, 3] regressed offset to instance center
    bw: jnp.ndarray | None = None         # [P, 2] softplus bandwidths
    occupancy: jnp.ndarray | None = None  # [P, 1] softplus log-occupancy


class _Backbone(nn.Module):
    """InputLayer -> SubConv(in, m) -> UNet -> BN-ReLU -> OutputLayer.

    compute_dtype=bfloat16 runs all conv activations in bf16 (params stay
    f32; BN statistics and matmul accumulation are f32 regardless) — the
    TPU-native mixed-precision recipe. Head features are returned in f32.
    """

    n_planes: Tuple[int, ...]
    block_reps: int = 1
    residual_blocks: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, plan: Topology,
                 train: bool = False) -> jnp.ndarray:
        point_features = point_features.astype(self.compute_dtype)
        x = InputLayer(mode="mean", name="input")(point_features, plan, train)
        x = SubmanifoldConvolution(self.n_planes[0], name="sub")(
            x, plan, train)
        x = UNet(self.block_reps, tuple(self.n_planes),
                 residual_blocks=self.residual_blocks, name="unet")(
            x, plan, train)
        x = BatchNormReLU(name="bn")(x, plan, train)
        out = OutputLayer(name="output")(x, plan, train)
        return out.astype(jnp.float32)


class ThreeVoxelKernel(nn.Module):
    """Semantic + embedding + offset model (reference `model.py:748-784`)."""

    n_planes: Tuple[int, ...]
    num_classes: int = 20
    block_reps: int = 1
    residual_blocks: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, plan: Topology,
                 train: bool = False) -> OccuSegOutputs:
        m = self.n_planes[0]
        feature = _Backbone(tuple(self.n_planes), self.block_reps,
                            self.residual_blocks, self.compute_dtype,
                            name="backbone")(point_features, plan, train)
        y = nn.Dense(self.num_classes, name="linear")(feature)
        embedding = nn.Dense(m, name="linear_embedding")(
            nn.Dense(m, name="fc_embedding")(feature))
        offset = nn.sigmoid(nn.Dense(1, name="linear_regress")(
            nn.Dense(m, name="fc_regress")(feature)))
        return OccuSegOutputs(semantics=y, features=feature,
                              embedding=embedding, offset=offset,
                              displacement=jnp.zeros(
                                  feature.shape[:1] + (3,), feature.dtype))


class InstanceDenseUNet(nn.Module):
    """Backbone + semantic/embedding/offset/displacement heads
    (reference `model.py:657-691`)."""

    n_planes: Tuple[int, ...]
    num_classes: int = 20
    block_reps: int = 1
    residual_blocks: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, plan: Topology,
                 train: bool = False) -> OccuSegOutputs:
        m = self.n_planes[0]
        feature = _Backbone(tuple(self.n_planes), self.block_reps,
                            self.residual_blocks, self.compute_dtype,
                            name="backbone")(point_features, plan, train)
        y = nn.Dense(self.num_classes, name="linear")(feature)
        embedding = nn.Dense(m, name="linear_embedding")(
            nn.Dense(m, name="fc_embedding")(feature))
        offset = nn.sigmoid(nn.Dense(1, name="linear_regress")(
            nn.Dense(m, name="fc_regress")(feature)))
        displacement = nn.Dense(3, name="linear_displacement")(
            nn.Dense(m, name="fc_displacement")(feature))
        return OccuSegOutputs(semantics=y, features=feature,
                              embedding=embedding, offset=offset,
                              displacement=displacement)


class LearningBWDenseUNet(nn.Module):
    """The flagship OccuSeg model (reference `model.py:693-717`)."""

    n_planes: Tuple[int, ...]
    num_classes: int = 20
    block_reps: int = 1
    residual_blocks: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, plan: Topology,
                 train: bool = False) -> OccuSegOutputs:
        m = self.n_planes[0]
        base = InstanceDenseUNet(
            tuple(self.n_planes), self.num_classes, self.block_reps,
            self.residual_blocks, self.compute_dtype, name="backbone")(
            point_features, plan, train)
        bw = nn.softplus(nn.Dense(2, name="linear_bw")(
            nn.Dense(m, name="fc_bw")(base.features)))
        occupancy = nn.softplus(nn.Dense(1, name="linear_occupancy")(
            nn.Dense(m, name="fc_occupancy")(base.features)))
        return base._replace(bw=bw, occupancy=occupancy)


class ClusterSegNet(nn.Module):
    """Supervoxel-cluster semantic classifier (reference `model.py:719-745`):
    point MLP -> per-cluster max-pool -> cluster MLP -> class logits.
    Clusters are given as a per-point segment id (padded, -1 = none)."""

    num_classes: int = 20
    num_clusters: int = 1024

    @nn.compact
    def __call__(self, features: jnp.ndarray, cluster_index: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        import jax

        def bn_relu(x, name):
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-4, name=f"{name}_bn")(x)
            return nn.leaky_relu(h)

        y = nn.Dense(128, name="mlp1")(features)
        y = bn_relu(y, "l1")
        y = nn.Dense(256, name="mlp2")(y)
        y = bn_relu(y, "l2")
        seg = jnp.where(cluster_index >= 0, cluster_index,
                        self.num_clusters).astype(jnp.int32)
        pooled = jax.ops.segment_max(y, seg,
                                     num_segments=self.num_clusters + 1)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0)[:self.num_clusters]
        z = nn.Dense(128, name="mlp3")(pooled)
        z = bn_relu(z, "l3")
        return nn.Dense(self.num_classes, name="mlp4")(z)
