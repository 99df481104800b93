"""Spatially-sharded eval-mode forward of the flagship OccuSeg model.

One oversized scene's voxels are split across the device mesh's 'space'
axis using `shard_plan` (active-balanced Morton layout, ppermute halos +
all-gather pool — zero dropped refs); every convolution of the backbone
(input submanifold conv, the full UNet recursion, the final BN-ReLU) runs
per-shard on its slice with an exchange before each gather. The reference
has no analog — its answer to scenes over memory is cropping
(`scannet.py:129-135`); here a scene too big for one chip runs exactly.

Eval forward (`sharded_occuseg_infer`): BatchNorm applies running
statistics (a pointwise affine, no cross-shard reduction). Train forward
(`sharded_train_forward`): BN batch statistics are psum'd masked sums over
the space axis, so every shard normalizes with the GLOBAL statistics —
differentiable end-to-end (gradients flow through ppermute/all_gather),
ready to wrap in jax.value_and_grad for a sharded training step.

The per-point stages (InputLayer voxelize, OutputLayer devoxelize, the
Dense heads) are O(P*C) elementwise/segment ops, negligible next to the
conv pipeline, and run unsharded.

Validated against the unsharded `model.apply` in
tests/test_spatial_model.py (same params/stats, equal outputs on every
active point).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from occuseg_tpu.models.occuseg import OccuSegOutputs
from occuseg_tpu.ops import pool as pool_ops
from occuseg_tpu.ops.conv import gather_conv_fused
from occuseg_tpu.parallel.spatial import (
    SPACE_AXIS,
    extend_features,
    shard_plan,
)


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _bn_eval(p, s, x, leakiness, eps=1e-4):
    """Eval-mode BN + leaky activation (ops/norm.batch_norm, training
    branch off): pointwise, so it shards with no communication."""
    w = jax.lax.rsqrt(s["running_var"] + eps) * p["weight"]
    b = p["bias"] - s["running_mean"] * w
    y = x * w + b
    return jnp.where(y > 0, y, leakiness * y) if leakiness != 1.0 else y


def _pack_shard_arrays(sp) -> Tuple[list, list]:
    """ShardedPlan -> (levels, transitions) lists of array dicts, every
    array with leading shard axis D. Each map also gets its extended-space
    transpose (`spatial.transpose_ext_map`) so the convs can use the
    scatter-free custom-VJP core — the generic autodiff backward of a
    gathered-block matmul saves the [M, K*Cin] block (GBs at production
    caps) and scatter-adds; the transpose-map backward does neither."""
    from occuseg_tpu.parallel.spatial import transpose_ext_map

    H, D = sp.halo, sp.num_shards

    def ext_of(level):
        S, P_ = level.nbr_local.shape[1], level.publish.shape[1]
        return S + 2 * H + D * P_

    levels = [dict(nbr=l.nbr_local, sl=l.send_left, sr=l.send_right,
                   pub=l.publish,
                   nbr_t=transpose_ext_map(l.nbr_local, ext_of(l)))
              for l in sp.levels]
    trans = []
    for ti, t in enumerate(sp.transitions):
        fine, coarse = sp.levels[ti], sp.levels[ti + 1]
        trans.append(dict(
            child=t["child"], c_sl=t["child_send_left"],
            c_sr=t["child_send_right"], c_pub=t["child_publish"],
            child_t=transpose_ext_map(t["child"], ext_of(fine)),
            up=t["up"], u_sl=t["up_send_left"],
            u_sr=t["up_send_right"], u_pub=t["up_publish"],
            up_t=transpose_ext_map(t["up"], ext_of(coarse))))
    to_j = lambda tree: jax.tree.map(jnp.asarray, tree)
    return to_j(levels), to_j(trans)


def _make_backbone_fn(n_planes, block_reps, residual_blocks, halo,
                      leakiness=0.0):
    """Per-shard _Backbone forward (models/occuseg._Backbone minus the
    IO layers), mirroring nn/unet.UNet's recursion parameter-for-
    parameter so trained variables drop in unchanged."""

    def conv(x, lv, w):
        ext = extend_features(x, lv["sl"], lv["sr"], lv["pub"], halo)
        return gather_conv_fused(ext, lv["nbr"], w)

    def block(p, s, x, lv):
        from occuseg_tpu.ops.conv import nin
        if residual_blocks:
            sc = (nin(x, p["shortcut"]["weight"])
                  if "shortcut" in p else x)
            y = _bn_eval(p["bn1"], s["bn1"], x, leakiness)
            y = conv(y, lv, p["conv1"]["weight"])
            y = _bn_eval(p["bn2"], s["bn2"], y, leakiness)
            y = conv(y, lv, p["conv2"]["weight"])
            return sc + y
        y = _bn_eval(p["bn1"], s["bn1"], x, leakiness)
        return conv(y, lv, p["conv1"]["weight"])

    def unet(p, s, x, levels, trans, li):
        for i in range(block_reps):
            x = block(p[f"enc{i}"], s[f"enc{i}"], x, levels[li])
        if li == len(n_planes) - 1:
            return x
        skip = x
        t = trans[li]
        y = _bn_eval(p["down_bn"], s["down_bn"], x, leakiness)
        ext = extend_features(y, t["c_sl"], t["c_sr"], t["c_pub"], halo)
        y = gather_conv_fused(ext, t["child"], p["down_conv"]["weight"])
        y = unet(p["inner"], s["inner"], y, levels, trans, li + 1)
        y = _bn_eval(p["up_bn"], s["up_bn"], y, leakiness)
        ext = extend_features(y, t["u_sl"], t["u_sr"], t["u_pub"], halo)
        y = gather_conv_fused(ext, t["up"], p["up_conv"]["weight"])
        x = jnp.concatenate([skip, y], axis=-1)
        for i in range(block_reps):
            x = block(p[f"dec{i}"], s[f"dec{i}"], x, levels[li])
        return x

    def backbone(vox, levels, trans, p, s):
        # shard_map hands [1, ...] slices; drop the shard axis
        vox = vox[0]
        levels = jax.tree.map(lambda a: a[0], levels)
        trans = jax.tree.map(lambda a: a[0], trans)
        x = conv(vox, levels[0], p["sub"]["weight"])
        x = unet(p["unet"], s["unet"], x, levels, trans, 0)
        x = _bn_eval(p["bn"], s["bn"], x, leakiness=0.0)
        return x[None]

    return backbone


def sharded_backbone_apply(variables, plan, point_features, mesh: Mesh,
                           n_planes, block_reps: int = 1,
                           residual_blocks: bool = True,
                           halo: int = 512, pool: int = 512,
                           compute_dtype=jnp.float32):
    """Eval _Backbone forward with the voxel pipeline sharded over
    `mesh`'s single 'space' axis. Returns per-point features [P, m],
    bit-comparable to `_Backbone.__call__(..., train=False)`."""
    D = mesh.devices.size
    sp = shard_plan(plan, D, halo, pool=pool)
    assert sp.dropped == 0, (
        f"shard_plan dropped {sp.dropped} refs — raise halo/pool")
    levels, trans = _pack_shard_arrays(sp)

    cap0 = np.asarray(plan.levels[0].nbr).shape[0]
    vox = pool_ops.voxelize_features(
        point_features.astype(compute_dtype), jnp.asarray(plan.p2v),
        cap0, mode="mean")
    new_to_old0, old_to_new0 = sp.layouts[0]
    vox_sh = vox[jnp.asarray(new_to_old0)].reshape(D, cap0 // D, -1)

    # params live under backbone/backbone for the full models, or are
    # passed directly as a _Backbone subtree
    p = variables["params"]
    s = variables["batch_stats"]
    for k in ("backbone", "backbone"):
        if k in p and "sub" not in p:
            p, s = p[k], s[k]

    fn = _make_backbone_fn(tuple(n_planes), block_reps, residual_blocks,
                           halo)
    out = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(SPACE_AXIS),
                  jax.tree.map(lambda _: P(SPACE_AXIS), levels),
                  jax.tree.map(lambda _: P(SPACE_AXIS), trans),
                  jax.tree.map(lambda _: P(), p),
                  jax.tree.map(lambda _: P(), s)),
        out_specs=P(SPACE_AXIS),
    ))(vox_sh, levels, trans, p, s)
    out = out.reshape(cap0, -1)[jnp.asarray(old_to_new0)]
    return pool_ops.devoxelize_features(
        out, jnp.asarray(plan.p2v)).astype(jnp.float32)


def sharded_occuseg_infer(variables, plan, point_features, mesh: Mesh,
                          n_planes, block_reps: int = 1,
                          residual_blocks: bool = True,
                          halo: int = 512, pool: int = 512,
                          compute_dtype=jnp.float32) -> OccuSegOutputs:
    """Full LearningBWDenseUNet eval forward (backbone sharded, heads
    pointwise) — same outputs as `model.apply(variables, ..., False)`."""
    feature = sharded_backbone_apply(variables, plan, point_features, mesh,
                                     n_planes, block_reps, residual_blocks,
                                     halo, pool, compute_dtype)
    top = variables["params"]
    pb = top["backbone"]  # InstanceDenseUNet scope
    y = _dense(pb["linear"], feature)
    emb = _dense(pb["linear_embedding"], _dense(pb["fc_embedding"], feature))
    off = jax.nn.sigmoid(
        _dense(pb["linear_regress"], _dense(pb["fc_regress"], feature)))
    disp = _dense(pb["linear_displacement"],
                  _dense(pb["fc_displacement"], feature))
    bw = jax.nn.softplus(
        _dense(top["linear_bw"], _dense(top["fc_bw"], feature)))
    occ = jax.nn.softplus(
        _dense(top["linear_occupancy"], _dense(top["fc_occupancy"],
                                               feature)))
    return OccuSegOutputs(semantics=y, features=feature, embedding=emb,
                          offset=off, displacement=disp, bw=bw,
                          occupancy=occ)


# ---------------------------------------------------------------------------
# Sharded TRAINING forward: same per-shard pipeline, but BatchNorm batch
# statistics are psum'd masked sums over the space axis — every shard
# normalizes with the GLOBAL batch statistics, exactly matching the
# unsharded ops/norm.batch_norm (same row set, different summation order).


def _bn_train(p, s, x, n_local, leakiness, eps=1e-4, momentum=0.9,
              axis_name=SPACE_AXIS):
    """Train-mode masked BN over sharded rows (ops/norm.batch_norm with the
    sums distributed): per-shard active rows are a prefix of the shard's
    slot range (the active-balanced layout guarantees it)."""
    f = x.astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)[:, 0]
    mask = (rows < n_local)[:, None]
    n = jax.lax.psum(n_local.astype(jnp.float32), axis_name)
    n = jnp.maximum(n, 1.0)
    sum_f = jax.lax.psum(jnp.sum(jnp.where(mask, f, 0), axis=0), axis_name)
    sumsq = jax.lax.psum(jnp.sum(jnp.where(mask, f * f, 0), axis=0),
                         axis_name)
    mean = sum_f / n
    var_b = sumsq / n - mean * mean
    var_u = (sumsq - mean * mean * n) / jnp.maximum(n - 1.0, 1.0)
    inv_std = jax.lax.rsqrt(var_b + eps)
    new_s = dict(
        running_mean=momentum * s["running_mean"]
        + (1 - momentum) * jax.lax.stop_gradient(mean),
        running_var=momentum * s["running_var"]
        + (1 - momentum) * jax.lax.stop_gradient(var_u),
    )
    w = inv_std * p["weight"]
    b = p["bias"] - mean * w
    y = f * w + b
    if leakiness != 1.0:
        y = jnp.where(y > 0, y, leakiness * y)
    y = jnp.where(mask, y, 0).astype(x.dtype)
    return y, new_s


def _make_backbone_train_fn(n_planes, block_reps, residual_blocks, halo,
                            leakiness=0.0):
    """Per-shard train-mode _Backbone forward returning (features,
    new_batch_stats) with the stats tree mirroring the flax modules'.

    Convs use the scatter-free custom-VJP core with the extended-space
    transpose maps; JAX transposes extend_features itself (reverse
    ppermute for the halos, publish-row scatter for the pool)."""
    from occuseg_tpu.ops.conv import _gather_conv_fused_core

    def _core(ext, m, m_t, w):
        # pvary: replicated weights -> varying before the custom_vjp core,
        # so the weight cotangent transposes through a psum (custom_vjp
        # blocks shard_map's automatic replication inference)
        return _gather_conv_fused_core(ext, m, m_t,
                                       jax.lax.pcast(w, SPACE_AXIS,
                                                     to="varying"))

    def conv(x, lv, w):
        ext = extend_features(x, lv["sl"], lv["sr"], lv["pub"], halo)
        return _core(ext, lv["nbr"], lv["nbr_t"], w)

    def block(p, s, x, lv, na):
        from occuseg_tpu.ops.conv import nin
        ns = {}
        if residual_blocks:
            sc = (nin(x, p["shortcut"]["weight"])
                  if "shortcut" in p else x)
            y, ns["bn1"] = _bn_train(p["bn1"], s["bn1"], x, na, leakiness)
            y = conv(y, lv, p["conv1"]["weight"])
            y, ns["bn2"] = _bn_train(p["bn2"], s["bn2"], y, na, leakiness)
            y = conv(y, lv, p["conv2"]["weight"])
            return sc + y, ns
        y, ns["bn1"] = _bn_train(p["bn1"], s["bn1"], x, na, leakiness)
        return conv(y, lv, p["conv1"]["weight"]), ns

    def unet(p, s, x, levels, trans, nact, li):
        ns = {}
        for i in range(block_reps):
            x, ns[f"enc{i}"] = block(p[f"enc{i}"], s[f"enc{i}"], x,
                                     levels[li], nact[li])
        if li == len(n_planes) - 1:
            return x, ns
        skip = x
        t = trans[li]
        y, ns["down_bn"] = _bn_train(p["down_bn"], s["down_bn"], x,
                                     nact[li], leakiness)
        ext = extend_features(y, t["c_sl"], t["c_sr"], t["c_pub"], halo)
        y = _core(ext, t["child"], t["child_t"], p["down_conv"]["weight"])
        y, ns["inner"] = unet(p["inner"], s["inner"], y, levels, trans,
                              nact, li + 1)
        y, ns["up_bn"] = _bn_train(p["up_bn"], s["up_bn"], y, nact[li + 1],
                                   leakiness)
        ext = extend_features(y, t["u_sl"], t["u_sr"], t["u_pub"], halo)
        y = _core(ext, t["up"], t["up_t"], p["up_conv"]["weight"])
        x = jnp.concatenate([skip, y], axis=-1)
        for i in range(block_reps):
            x, ns[f"dec{i}"] = block(p[f"dec{i}"], s[f"dec{i}"], x,
                                     levels[li], nact[li])
        return x, ns

    def backbone(vox, levels, trans, nact, p, s):
        vox = vox[0]
        levels = jax.tree.map(lambda a: a[0], levels)
        trans = jax.tree.map(lambda a: a[0], trans)
        nact = [a[0] for a in nact]
        ns = {}
        x = conv(vox, levels[0], p["sub"]["weight"])
        x, ns["unet"] = unet(p["unet"], s["unet"], x, levels, trans, nact, 0)
        x, ns["bn"] = _bn_train(p["bn"], s["bn"], x, nact[0], 0.0)
        return x[None], ns

    return backbone


def prepare_shard_args(plan, num_shards: int, halo: int = 512,
                       pool: int = 512):
    """Host-side prep for the sharded train/eval step: shard the plan and
    pack everything the jitted step consumes as arrays."""
    sp = shard_plan(plan, num_shards, halo, pool=pool)
    assert sp.dropped == 0, (
        f"shard_plan dropped {sp.dropped} refs — raise halo/pool")
    levels, trans = _pack_shard_arrays(sp)
    # active counts per shard from the balanced layout chunk sizes
    nact = []
    for li in range(len(sp.layouts)):
        n = int(np.asarray(plan.levels[li].num_active))
        counts = [len(c) for c in
                  np.array_split(np.arange(n), sp.num_shards)]
        nact.append(jnp.asarray(np.asarray(counts, np.int32)))
    layouts = [(jnp.asarray(a), jnp.asarray(b)) for a, b in sp.layouts]
    return dict(levels=levels, trans=trans, nact=nact, layouts=layouts,
                halo=halo, p2v=jnp.asarray(plan.p2v))


def sharded_train_forward(variables, shard_args, plan_p2v, point_features,
                          mesh: Mesh, n_planes, block_reps: int = 1,
                          residual_blocks: bool = True,
                          compute_dtype=jnp.float32):
    """Differentiable train-mode forward (backbone sharded over `mesh`,
    per-point IO/heads unsharded — GSPMD places them). Returns
    (OccuSegOutputs, new_batch_stats). Matches the unsharded
    `model.apply(..., train=True, mutable=['batch_stats'])` on active
    rows; BN statistics are global via psum."""
    D = mesh.devices.size
    levels, trans, nact = (shard_args["levels"], shard_args["trans"],
                           shard_args["nact"])
    new_to_old0, old_to_new0 = shard_args["layouts"][0]
    halo = shard_args["halo"]
    cap0 = new_to_old0.shape[0]

    vox = pool_ops.voxelize_features(
        point_features.astype(compute_dtype), plan_p2v, cap0, mode="mean")
    vox_sh = vox[new_to_old0].reshape(D, cap0 // D, -1)

    p = variables["params"]
    s = variables["batch_stats"]
    scopes = []
    while "sub" not in p:
        scopes.append("backbone")
        p, s = p["backbone"], s["backbone"]

    fn = _make_backbone_train_fn(tuple(n_planes), block_reps,
                                 residual_blocks, halo)
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)
    shd = lambda tree: jax.tree.map(lambda _: P(SPACE_AXIS), tree)
    out, new_stats = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(SPACE_AXIS), shd(levels), shd(trans),
                  [P(SPACE_AXIS)] * len(nact), rep(p), rep(s)),
        out_specs=(P(SPACE_AXIS), rep(s)),
    )(vox_sh, levels, trans, [a[:, None] for a in nact], p, s)
    out = out.reshape(cap0, -1)[old_to_new0]
    feature = pool_ops.devoxelize_features(out, plan_p2v).astype(
        jnp.float32)

    for sc in reversed(scopes):
        new_stats = {sc: new_stats}

    top = variables["params"]
    pb = top["backbone"] if "backbone" in top else top
    y = _dense(pb["linear"], feature)
    emb = _dense(pb["linear_embedding"], _dense(pb["fc_embedding"], feature))
    off = jax.nn.sigmoid(
        _dense(pb["linear_regress"], _dense(pb["fc_regress"], feature)))
    disp = _dense(pb["linear_displacement"],
                  _dense(pb["fc_displacement"], feature))
    bw = jax.nn.softplus(
        _dense(top["linear_bw"], _dense(top["fc_bw"], feature)))
    occ = jax.nn.softplus(
        _dense(top["linear_occupancy"], _dense(top["fc_occupancy"],
                                               feature)))
    outputs = OccuSegOutputs(semantics=y, features=feature, embedding=emb,
                             offset=off, displacement=disp, bw=bw,
                             occupancy=occ)
    return outputs, new_stats


def make_spatial_train_step(mesh: Mesh, n_planes, cfg=None, loss_cfg=None,
                            num_scenes: int = 1, num_instances: int = 64,
                            block_reps: int = 1,
                            residual_blocks: bool = True):
    """Full spatially-sharded training step (the CP analog of
    train/state.make_train_step): sharded backbone forward + the 6-term
    OccuSeg loss + optimizer update. Jit by caller; `shard_args` from
    `prepare_shard_args` (host, once per plan/bucket) rides as data.

    step(state, batch, shard_args) -> (state, loss_parts); `batch` is the
    usual padded dict incl. 'coords_p2v' — pass plan.p2v as
    shard_args['p2v'] via prepare_shard_args.
    """
    from occuseg_tpu.losses.instance import LossConfig, occuseg_total_loss
    from occuseg_tpu.train.state import (
        TrainConfig,
        TrainState,
        make_optimizer,
    )
    import optax

    cfg = cfg or TrainConfig()
    loss_cfg = loss_cfg or LossConfig()
    tx = make_optimizer(cfg)

    def loss_fn(params, batch_stats, batch, shard_args):
        outputs, new_stats = sharded_train_forward(
            {"params": params, "batch_stats": batch_stats}, shard_args,
            shard_args["p2v"], batch["features"], mesh, n_planes,
            block_reps, residual_blocks)
        total, parts = occuseg_total_loss(outputs, batch, num_scenes,
                                          num_instances, loss_cfg)
        return total, (parts, new_stats)

    def step(state, batch, shard_args):
        (_, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   shard_args)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1), parts

    return step
