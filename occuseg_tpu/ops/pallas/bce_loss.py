"""Fused soft-membership BCE kernels for the classification loss.

The reference computes its soft-membership BCE with a chain of [P, I]
torch tensors (`examples/ScanNet/discriminative.py:40-117`); the repo's
default is the s-space XLA chain in `losses/instance.classification_loss`.

MEASURED NEGATIVE RESULT (round 3): this kernel is 2.2 ms SLOWER than
that XLA chain on the flagship step (207.1 vs 204.9 ms, one v5e chip),
and a companion XLA-side refactor (squared distances end-to-end, radius
from the in-flight [P, I] matrix, concatenated one-hot segment sums) was
itself 8.5 ms slower than the committed formulation — XLA fuses the
[P, I] transcendental passes tightly enough that saved materializations
do not pay for Pallas grid overhead here. Kept switchable
(OCC_PALLAS_BCE=1) with value/gradient equality tests, per the repo's
negative-result convention.

TPU-native answer: one Pallas sweep over point blocks. Each [Pb] block
computes its three squared-distance tiles as MXU products against the
[I, E] centroid matrices (|a|^2 + |b|^2 - 2ab, exactly the XLA path's
formulation), applies the s-space BCE, and accumulates the five
per-instance reductions (bce sum, sample count, tp/fp/tot) into a
constant-mapped [8, I] output block that is never left — the same
read-modify-write accumulation rule as the chunk-conv dW kernels. The
instance radius is a tiny preliminary sweep of the same shape. The
backward is a custom VJP that recomputes the tiles (nothing [P, I]-sized
is saved) and contracts the BCE gradient against centroids/embeddings on
the MXU, emitting d_e / d_rx per block and accumulating d_mu / d_sig^2
across the grid.

Gradient-free inputs (GT pose x, its per-instance mean/radius, the sample
ball, scene ids, `use`) are baked into a packed [8, I] constants block.
`classification_loss` dispatches here when the static shapes allow it and
falls back to the pure-XLA chain otherwise (tests compare the two).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occuseg_tpu.ops.pallas.chunk_conv import (
    _interpret_default, _match_vma, _sds,
)

S_LO = 1.0000001e-7            # prob in [1e-7, 1 - 1e-7]
S_HI = 16.11809565095832
S_PRED = 0.6931471805599453    # prob = exp(-s) > 0.5
_ROWS = ("mu_sq", "mp_sq", "sig0_sq", "sig1_sq", "radius16", "scene",
         "use")


def enabled() -> bool:
    # default OFF: measured 2.2 ms slower than the s-space XLA chain on
    # the flagship step (207.1 vs 204.9 ms, one v5e chip) — the XLA chain
    # fuses the [P, I] passes well enough that the kernel's saved
    # materializations don't pay for its grid overhead. Kept switchable
    # with equality tests as a documented negative result.
    return os.environ.get("OCC_PALLAS_BCE", "0") == "1"


def supported(P: int, I: int, E: int) -> bool:
    """Static-shape gate: block the kernel rather than mis-tile."""
    return (enabled() and _block(P) > 0 and 8 <= I <= 128 and I % 8 == 0
            and 8 <= E <= 256 and E % 8 == 0)


def _block(P: int, cap: int = 2048) -> int:
    # bwd keeps ~15 live [Pb, I] f32 tiles; Pb=2048 blew the 16M scoped
    # vmem limit (19.8M measured), so the bwd sweep runs at 1024
    for pb in (2048, 1024, 512, 256, 128):
        if pb <= cap and P % pb == 0:
            return pb
    return 0


def _pad8(x):
    """[N, 3] -> [N, 8]: tiny-lane operands padded for clean tiling."""
    return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 8 - x.shape[1])))


def _sq_tile(a, b_ref, a_sq, b_sq_row):
    """maximum(|a|^2 + |b|^2 - 2 a.b, 0) for one block — the same
    MXU formulation as the XLA path's sqdist."""
    d = jax.lax.dot_general(a, b_ref[:],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.maximum(a_sq + b_sq_row - 2.0 * d, 0.0)


def _radius_kernel(x_ref, seg_ref, mp_ref, cons_ref, out_ref, *, I):
    """Per-instance max squared GT-pose distance of its own points."""
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)
    sq = _sq_tile(x, mp_ref, x_sq, cons_ref[1:2, :])
    member = seg_ref[:] == jax.lax.broadcasted_iota(
        jnp.int32, sq.shape, 1)
    masked = jnp.where(member, sq, 0.0)
    out_ref[:] = jnp.maximum(out_ref[:],
                             jnp.max(masked, axis=0, keepdims=True))


def _tiles(e_ref, rx_ref, x_ref, seg_ref, scene_ref, mu_ref, mp_ref,
           cons_ref):
    """Shared forward recompute: (member, sample, s_raw, sq_emb, sq_r)."""
    e = e_ref[:]
    e_sq = jnp.sum(e * e, axis=1, keepdims=True)
    sq_emb = _sq_tile(e, mu_ref, e_sq, cons_ref[0:1, :])
    rx = rx_ref[:]
    rx_sq = jnp.sum(rx * rx, axis=1, keepdims=True)
    sq_r = _sq_tile(rx, mp_ref, rx_sq, cons_ref[1:2, :])
    x = x_ref[:]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)
    sq_x = _sq_tile(x, mp_ref, x_sq, cons_ref[1:2, :])

    member = seg_ref[:] == jax.lax.broadcasted_iota(
        jnp.int32, sq_emb.shape, 1)
    sample = ((sq_x < cons_ref[4:5, :])
              & (scene_ref[:] == cons_ref[5:6, :])
              & (cons_ref[6:7, :] > 0.0))
    s_raw = ((sq_emb + 1e-12) * cons_ref[2:3, :]
             + (sq_r + 1e-12) * cons_ref[3:4, :])
    return e, rx, member, sample, s_raw, sq_emb, sq_r


def _fwd_kernel(e_ref, rx_ref, x_ref, seg_ref, scene_ref, mu_ref, mp_ref,
                cons_ref, out_ref):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    _, _, member, sample, s_raw, _, _ = _tiles(
        e_ref, rx_ref, x_ref, seg_ref, scene_ref, mu_ref, mp_ref, cons_ref)
    s = jnp.clip(s_raw, S_LO, S_HI)
    # -log1p(-exp(-s)): 1-p loses precision only in the clipped corner
    # s ~ 1e-7, where the floor keeps bce finite (<= ~37 vs true 16.1)
    not_mem = -jnp.log(jnp.maximum(1.0 - jnp.exp(-s), 1e-16))
    bce = jnp.where(sample, jnp.where(member, s, not_mem), 0.0)
    samp_f = sample.astype(jnp.float32)
    pred = (s < S_PRED) & sample
    gt = member & sample
    out_ref[0:1, :] += jnp.sum(bce, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(samp_f, axis=0, keepdims=True)
    out_ref[2:3, :] += jnp.sum((pred & gt).astype(jnp.float32), axis=0,
                               keepdims=True)
    out_ref[3:4, :] += jnp.sum((pred & ~gt).astype(jnp.float32), axis=0,
                               keepdims=True)
    out_ref[4:5, :] += jnp.sum(gt.astype(jnp.float32), axis=0,
                               keepdims=True)


def _bwd_kernel(e_ref, rx_ref, x_ref, seg_ref, scene_ref, mu_ref, mp_ref,
                cons_ref, g_ref, de_ref, drx_ref, dmu_ref, dcon_ref):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        dmu_ref[:] = jnp.zeros_like(dmu_ref)
        dcon_ref[:] = jnp.zeros_like(dcon_ref)

    e, rx, member, sample, s_raw, sq_emb, sq_r = _tiles(
        e_ref, rx_ref, x_ref, seg_ref, scene_ref, mu_ref, mp_ref, cons_ref)
    inside = (s_raw > S_LO) & (s_raw < S_HI)
    s = jnp.clip(s_raw, S_LO, S_HI)
    p_ = jnp.exp(-s)
    dbce_ds = jnp.where(member, 1.0, -p_ / jnp.maximum(1.0 - p_, 1e-16))
    g = jnp.where(sample & inside, g_ref[0:1, :] * dbce_ds, 0.0)
    g0 = g * cons_ref[2:3, :]       # d/d sq_emb
    g1 = g * cons_ref[3:4, :]       # d/d sq_spat_r

    de_ref[:] = (2.0 * (jnp.sum(g0, axis=1, keepdims=True) * e
                        - jax.lax.dot_general(
                            g0, mu_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                 ).astype(de_ref.dtype)
    drx_ref[:] = (2.0 * (jnp.sum(g1, axis=1, keepdims=True) * rx
                         - jax.lax.dot_general(
                             g1, mp_ref[:],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32))
                  ).astype(drx_ref.dtype)

    col0 = jnp.sum(g0, axis=0, keepdims=True)            # [1, I]
    g0te = jax.lax.dot_general(g0, e,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dmu_ref[:] += 2.0 * (mu_ref[:] * col0.T - g0te)
    dcon_ref[0:1, :] += jnp.sum(g * (sq_emb + 1e-12), axis=0,
                                keepdims=True)
    dcon_ref[1:2, :] += jnp.sum(g * (sq_r + 1e-12), axis=0, keepdims=True)


def _common_specs(Pb, I, E):
    blk = lambda shape: pl.BlockSpec(shape, lambda p: (p, 0),
                                     memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(shape, lambda p: (0, 0),
                                     memory_space=pltpu.VMEM)
    return [blk((Pb, E)), blk((Pb, 8)), blk((Pb, 8)), blk((Pb, 1)),
            blk((Pb, 1)), cst((I, E)), cst((I, 8)), cst((8, I))]


def radius_sq(x8, seg2, mp8, cons, interpret=None):
    """[1, I] per-instance max squared own-point distance (no gradient)."""
    P, I = x8.shape[0], mp8.shape[0]
    Pb = _block(P)
    if interpret is None:
        interpret = _interpret_default()
    args = _match_vma(x8, seg2, mp8, cons)
    blk = lambda shape: pl.BlockSpec(shape, lambda p: (p, 0),
                                     memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(shape, lambda p: (0, 0),
                                     memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_radius_kernel, I=I),
            grid=(P // Pb,),
            in_specs=[blk((Pb, 8)), blk((Pb, 1)), cst((I, 8)),
                      cst((8, I))],
            out_specs=cst((1, I)),
            out_shape=_sds((1, I), jnp.float32, args[0]),
            interpret=interpret,
        )(*args)


def _pack_cons(cons, sig_sq):
    """sig^2 lives in cons rows 2/3 so the kernels read one constants
    block; it is re-packed from the differentiable `sig_sq` argument here
    (inside the custom-vjp boundary) so there is one source of truth."""
    return (cons.at[2:3, :].set(sig_sq[:, 0][None])
                .at[3:4, :].set(sig_sq[:, 1][None]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _bce_sums(e, rx, sig_sq, mu, mp8, x8, seg2, scene2, cons, interpret):
    """[8, I] rows: bce_sum, n_samp, tp, fp, tot, 0, 0, 0.

    Differentiable in e, rx, sig_sq, mu. mp8 (GT per-instance mean pose)
    and every cons row other than sig^2 are data (zero cotangent)."""
    P, E = e.shape
    I = mu.shape[0]
    Pb = _block(P)
    args = _match_vma(e, rx, x8, seg2, scene2, mu, mp8,
                      _pack_cons(cons, sig_sq))
    with jax.enable_x64(False):
        return pl.pallas_call(
            _fwd_kernel,
            grid=(P // Pb,),
            in_specs=_common_specs(Pb, I, E),
            out_specs=pl.BlockSpec((8, I), lambda p: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=_sds((8, I), jnp.float32, args[0]),
            interpret=interpret,
        )(*args)


def _bce_sums_fwd(e, rx, sig_sq, mu, mp8, x8, seg2, scene2, cons,
                  interpret):
    out = _bce_sums(e, rx, sig_sq, mu, mp8, x8, seg2, scene2, cons,
                    interpret)
    return out, (e, rx, sig_sq, mu, mp8, x8, seg2, scene2, cons)


def _bce_sums_bwd(interpret, res, g):
    e, rx, sig_sq, mu, mp8, x8, seg2, scene2, cons = res
    P, E = e.shape
    I = mu.shape[0]
    Pb = _block(P, cap=1024)
    gvec = g[0:1, :]  # only bce_sum's cotangent flows; counts are steps
    args = _match_vma(e, rx, x8, seg2, scene2, mu, mp8,
                      _pack_cons(cons, sig_sq), gvec)
    blk = lambda shape: pl.BlockSpec(shape, lambda p: (p, 0),
                                     memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(shape, lambda p: (0, 0),
                                     memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        de, drx, dmu, dcon = pl.pallas_call(
            _bwd_kernel,
            grid=(P // Pb,),
            in_specs=_common_specs(Pb, I, E) + [cst((1, I))],
            out_specs=(blk((Pb, E)), blk((Pb, 8)), cst((I, E)),
                       cst((8, I))),
            out_shape=(
                _sds((P, E), e.dtype, args[0]),
                _sds((P, 8), rx.dtype, args[0]),
                _sds((I, E), jnp.float32, args[0]),
                _sds((8, I), jnp.float32, args[0]),
            ),
            interpret=interpret,
        )(*args)
    d_sig_sq = jnp.stack([dcon[0], dcon[1]], axis=1)      # [I, 2]
    zeros = lambda a: jnp.zeros_like(a)
    return (de, drx, d_sig_sq, dmu, zeros(mp8), zeros(x8), zeros(seg2),
            zeros(scene2), zeros(cons))


_bce_sums.defvjp(_bce_sums_fwd, _bce_sums_bwd)


def bce_membership_sums(e, rx, sig, mu, mean_pose, x, instance_id,
                        point_scene, scene_i, use, interpret=None):
    """Drop-in for the XLA [P, I] BCE chain of `classification_loss`.

    Returns (bce_sum, n_samp, tp, fp, tot) each [I] f32 — PARTIAL sums
    over this shard's rows; the caller psums under spatial sharding.
    Gradients flow to e, rx, sig, mu only (x/mean_pose are GT data —
    their true cotangents are discarded upstream anyway)."""
    if interpret is None:
        interpret = _interpret_default()
    I = mu.shape[0]
    e = e.astype(jnp.float32)
    rx8 = _pad8(rx)
    x8 = _pad8(x)
    mp8 = _pad8(mean_pose)
    mu = mu.astype(jnp.float32)
    seg2 = instance_id.astype(jnp.int32)[:, None]
    scene2 = point_scene.astype(jnp.float32)[:, None]
    mu_sq = jnp.sum(mu * mu, axis=1)[None]
    mp_sq = jnp.sum(mp8 * mp8, axis=1)[None]
    zero = jnp.zeros((1, I), jnp.float32)
    # every radius input is detached BEFORE the call: a live tangent (even
    # a symbolic zero) would route JAX's jvp rule into the pallas_call
    sg = jax.lax.stop_gradient
    cons_r = sg(jnp.concatenate(
        [zero, mp_sq, zero, zero, zero, zero, zero, zero], axis=0))
    r_sq = radius_sq(sg(x8), seg2, sg(mp8), cons_r, interpret)
    cons = jnp.concatenate(
        [mu_sq, mp_sq, zero, zero, 16.0 * r_sq,
         scene_i.astype(jnp.float32)[None],
         use.astype(jnp.float32)[None], zero], axis=0)
    # mu_sq is a function of mu: its gradient is folded into d_mu by the
    # backward kernel (the 2*mu*colsum term), so cons' zero cotangent is
    # exact. Detach the row to keep autodiff from double-counting.
    cons = jax.lax.stop_gradient(cons)
    sig_sq = sig.astype(jnp.float32) ** 2
    out = _bce_sums(e, rx8, sig_sq, mu, mp8, x8, seg2, scene2, cons,
                    interpret)
    return out[0], out[1], out[2], out[3], out[4]
