"""Chunked one-hot Pallas conv (ops/pallas/chunk_conv.py) vs the XLA path.

Runs the kernel in interpret mode on CPU; the same code compiles on TPU
(Mosaic) — verified on silicon in round 2 (experiments/exp_r2_a/b).
"""

import numpy as np

import jax
import jax.numpy as jnp

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.ops.conv import gather_conv
from occuseg_tpu.ops.pallas.chunk_conv import (
    augment_plan_with_chunks,
    build_chunk_arrays,
    chunk_gather_conv,
)

M, U = 64, 160
CAP = 512
K = 27


def _real_plan():
    spec = PlanSpec(caps=(CAP, 256))
    batch = make_batch(SceneConfig(num_points=1200, extent=48, num_objects=5),
                       num_scenes=1, p_cap=2048, num_instances=8, seed=3)
    plan = build_plan_host(batch["coords"], spec)
    assert plan is not None, "native planner required for this test"
    return plan


def test_chunk_arrays_roundtrip():
    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    arrs = build_chunk_arrays(nbr, M, U)
    assert arrs is not None, "U too small for this scene"
    in_idx, lidx = arrs
    C = CAP // M
    assert in_idx.shape == (C, U) and lidx.shape == (C, K, M)
    # reconstruct nbr from (in_idx, lidx) and compare exactly
    rec = np.full_like(nbr, -1)
    for c in range(C):
        l = lidx[c]  # [K, M]
        hit = l >= 0
        rec_rows = np.where(hit, in_idx[c][np.clip(l, 0, U - 1)], -1)
        rec[c * M:(c + 1) * M] = rec_rows.T
    np.testing.assert_array_equal(rec, nbr)


def test_forward_matches_xla_path():
    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    ref = gather_conv(feats, jnp.asarray(nbr), w)
    out = chunk_gather_conv(feats, jnp.asarray(in_idx), jnp.asarray(lidx), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla_path():
    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((CAP, 8)), jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum((gather_conv(f, jnp.asarray(nbr), ww) - tgt) ** 2)

    def loss_chunk(f, ww):
        o = chunk_gather_conv(f, jnp.asarray(in_idx), jnp.asarray(lidx), ww)
        return jnp.sum((o - tgt) ** 2)

    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf_c, gw_c = jax.grad(loss_chunk, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_augment_plan_and_module_path():
    """Model forward with chunked plan == forward with plain plan."""
    from occuseg_tpu.core.sparse_tensor import SparseTensor
    from occuseg_tpu.nn.modules import SubmanifoldConvolution

    plan = _real_plan()
    aug = augment_plan_with_chunks(plan, M=M, U=U)
    assert aug.levels[0].chunks is not None
    plan_j = jax.tree.map(jnp.asarray, plan)
    aug_j = jax.tree.map(jnp.asarray, aug)

    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
    x = SparseTensor(features=feats,
                     num_active=plan_j.levels[0].num_active, level=0)
    mod = SubmanifoldConvolution(out_features=8)
    vars_ = mod.init(jax.random.PRNGKey(0), x, plan_j)
    ref = mod.apply(vars_, x, plan_j).features
    out = mod.apply(vars_, x, aug_j).features
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_forward_close():
    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    ref = gather_conv(feats, jnp.asarray(nbr), w)
    out = chunk_gather_conv(feats, jnp.asarray(in_idx), jnp.asarray(lidx), w)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_k_grouping_and_cout_blocking_paths(monkeypatch):
    """Force KG>1 and n_co>1 so the grid-accumulation paths are exercised."""
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(7)
    cin, cout = 16, 256  # n_co = 2 at co_blk=128
    feats = jnp.asarray(rng.standard_normal((CAP, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((CAP, cout)), jnp.float32)
    # cell budget that forces G=9 (3 k-groups) at M=64, cin=16, f32
    co_blk = cc._co_block(cout)
    monkeypatch.setattr(cc, "_CELL_BUDGET",
                        M * 9 * cin * 4 + 2 * 9 * cin * co_blk * 4)
    assert cc._k_grouping(K, M, cin, co_blk, 4, 4) == 9

    ref = gather_conv(feats, jnp.asarray(nbr), w)
    out = cc.chunk_gather_conv(feats, jnp.asarray(in_idx),
                               jnp.asarray(lidx), w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_ref(f, ww):
        return jnp.sum((gather_conv(f, jnp.asarray(nbr), ww) - tgt) ** 2)

    def loss_chunk(f, ww):
        o = cc.chunk_gather_conv(f, jnp.asarray(in_idx),
                                 jnp.asarray(lidx), ww)
        return jnp.sum((o - tgt) ** 2)

    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf_c, gw_c = jax.grad(loss_chunk, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_u_tier_escalation():
    """A scene denser than the tight U budgets escalates PER LEVEL first
    (only the overflowing level's U grows 1.3x — a whole-plan bump taxed
    dense seeds ~12%), then falls back to the uniform whole-plan tiers,
    then to the XLA path (round-3: typical scenes overflow the
    seed-0-calibrated tables)."""
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    plan = _real_plan()  # this scene's max uniq at M=64: L0 113, L1 108
    # L0's 96 overflows; per-level 1.3 -> 128 fits, and ONLY level 0 is
    # escalated (level 1's 160 budget is untouched)
    aug = augment_plan_with_chunks(plan, M=M, U=(96, 160), U_child=256,
                                   U_up=128, tiers=(1.0, 2.0))
    assert aug.levels[0].chunks is not None
    assert aug.levels[0].chunks.in_idx.shape[1] == 128
    assert aug.levels[1].chunks.in_idx.shape[1] == 160
    assert cc.LAST_TIER == "L0x1.30"
    # per-level 1.3 insufficient at L0 (64 * 1.3 = 96 < 113) -> uniform
    # whole-plan ladder: tier 2.0 -> (128, 192) fits everywhere
    aug2 = augment_plan_with_chunks(plan, M=M, U=(64, 96), U_child=256,
                                    U_up=128, tiers=(1.0, 2.0))
    assert aug2.levels[0].chunks is not None
    assert aug2.levels[0].chunks.in_idx.shape[1] == 128
    assert cc.LAST_TIER == 2.0
    # exhausted ladder (per-level 1.3 insufficient, no looser uniform
    # tier): L0 falls back to the XLA path, L1 keeps its chunks
    aug1 = augment_plan_with_chunks(plan, M=M, U=(64, 128), U_child=256,
                                    U_up=128, tiers=(1.0,))
    assert aug1.levels[0].chunks is None
    assert aug1.levels[1].chunks is not None


def test_fused_bwd_multiblock_cin_matches_xla():
    """cin=256 (two 128-lane blocks) now takes the FUSED backward (round-3
    eligibility relaxation — the kernel's full-array blocks never needed
    the single-co-block rule); gradients must still match the XLA path."""
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(31)
    cin, cout = 256, 32
    assert cc._bwd_fused_eligible(K, M, cout, cin, cout, 4)
    feats = jnp.asarray(rng.standard_normal((CAP, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.05, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((CAP, cout)), jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum((gather_conv(f, jnp.asarray(nbr), ww) - tgt) ** 2)

    def loss_chunk(f, ww):
        o = chunk_gather_conv(f, jnp.asarray(in_idx), jnp.asarray(lidx), ww)
        return jnp.sum((o - tgt) ** 2)

    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf_c, gw_c = jax.grad(loss_chunk, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


def test_transition_chunk_conv_matches_xla():
    """General-form chunk conv (explicit transpose plan): strided conv
    (child) and deconv (up) match the XLA path incl. gradients."""
    from occuseg_tpu.ops.pallas.chunk_conv import chunk_gather_conv_t

    plan = _real_plan()
    tr = plan.transitions[0]
    child = np.asarray(tr.child)   # [256, 8]
    up = np.asarray(tr.up)         # [512, 8]
    Mc, Uc = 64, 256
    Mu, Uu = 64, 128
    cc_arr = build_chunk_arrays(child, Mc, Uc)
    cu_arr = build_chunk_arrays(up, Mu, Uu)
    assert cc_arr is not None and cu_arr is not None
    ci, cl = map(jnp.asarray, cc_arr)
    ui, ul = map(jnp.asarray, cu_arr)

    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((512, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 16, 24)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((256, 24)), jnp.float32)

    def loss_ref(f, ww):
        o = gather_conv(f, jnp.asarray(child), ww,
                        nbr_t=jnp.asarray(up[:, ::-1]))
        return jnp.sum((o - tgt) ** 2)

    def loss_chunk(f, ww):
        o = chunk_gather_conv_t(f, ci, cl, ui, ul, ww)
        return jnp.sum((o - tgt) ** 2)

    np.testing.assert_allclose(
        np.asarray(chunk_gather_conv_t(feats, ci, cl, ui, ul, w)),
        np.asarray(gather_conv(feats, jnp.asarray(child), w,
                               nbr_t=jnp.asarray(up[:, ::-1]))),
        rtol=1e-5, atol=1e-5)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf_c, gw_c = jax.grad(loss_chunk, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)

    # deconv direction: fwd = up, transpose = child
    featsc = jnp.asarray(rng.standard_normal((256, 24)), jnp.float32)
    wu = jnp.asarray(rng.standard_normal((8, 24, 16)) * 0.1, jnp.float32)
    tgtf = jnp.asarray(rng.standard_normal((512, 16)), jnp.float32)

    def dloss_ref(f, ww):
        o = gather_conv(f, jnp.asarray(up), ww,
                        nbr_t=jnp.asarray(child[:, ::-1]))
        return jnp.sum((o - tgtf) ** 2)

    def dloss_chunk(f, ww):
        o = chunk_gather_conv_t(f, ui, ul, ci, cl, ww)
        return jnp.sum((o - tgtf) ** 2)

    gf_r, gw_r = jax.grad(dloss_ref, argnums=(0, 1))(featsc, wu)
    gf_c, gw_c = jax.grad(dloss_chunk, argnums=(0, 1))(featsc, wu)
    np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_full_model_with_fully_chunked_plan():
    """Flagship forward+grads equal with and without chunk plans attached
    (submanifold + transition convs all chunked)."""
    from occuseg_tpu.models import LearningBWDenseUNet

    plan = _real_plan()
    aug = augment_plan_with_chunks(plan, M=64, U=(192, 192),
                                   U_child=256, U_up=128)
    assert aug.transitions[0].child_chunks is not None
    plan_j = jax.tree.map(jnp.asarray, plan)
    aug_j = jax.tree.map(jnp.asarray, aug)

    rng = np.random.default_rng(13)
    feats = jnp.asarray(rng.standard_normal((2048, 3)), jnp.float32)
    model = LearningBWDenseUNet(n_planes=(8, 16), num_classes=20)
    # note: tiny channels are below the chunk `supported()` floor, so use
    # wider ones for the chunk path to engage
    model = LearningBWDenseUNet(n_planes=(32, 64), num_classes=20)
    variables = model.init(jax.random.PRNGKey(0), feats, plan_j, False)
    out_ref = model.apply(variables, feats, plan_j, False)
    out_chunk = model.apply(variables, feats, aug_j, False)
    np.testing.assert_allclose(np.asarray(out_chunk.semantics),
                               np.asarray(out_ref.semantics),
                               rtol=1e-4, atol=1e-4)


def test_chunk_conv_inside_shard_map():
    """DP-style shard_map over stacked chunk plans: the pallas_call must
    type-check under check_vma (weights replicated, plans varying) and the
    gradients must match the single-device result (the round-3 regression
    seen in the training CLI on the virtual mesh)."""
    from jax.sharding import Mesh, PartitionSpec as P

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(17)
    D = 2
    feats = jnp.asarray(rng.standard_normal((D, CAP, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    ii = jnp.broadcast_to(jnp.asarray(in_idx), (D,) + in_idx.shape)
    ll = jnp.broadcast_to(jnp.asarray(lidx), (D,) + lidx.shape)
    mesh = Mesh(np.asarray(jax.devices()[:D]), ("data",))

    def shard_fn(f, ii, ll, w):
        out = chunk_gather_conv(f[0], ii[0], ll[0], w)
        return jnp.sum(out ** 2)[None]

    def loss(w):
        per = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P()),
            out_specs=P("data"))(feats, ii, ll, w)
        return jnp.sum(per)

    total, gw = jax.value_and_grad(loss)(w)

    def loss_ref(w):
        return sum(jnp.sum(chunk_gather_conv(
            feats[d], jnp.asarray(in_idx), jnp.asarray(lidx), w) ** 2)
            for d in range(D))

    t_ref, gw_ref = jax.value_and_grad(loss_ref)(w)
    np.testing.assert_allclose(float(total), float(t_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_granule_staging_matches_granule1():
    """Granule-2 staging (gather 2-row granules) is numerically identical
    to granule-1 (same conv, bigger staged rows)."""
    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    a1 = build_chunk_arrays(nbr, M, U, granule=1)
    a2 = build_chunk_arrays(nbr, M, U, granule=2)
    assert a1 is not None and a2 is not None
    rng = np.random.default_rng(23)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    o1 = chunk_gather_conv(feats, jnp.asarray(a1[0]), jnp.asarray(a1[1]), w)
    o2 = chunk_gather_conv(feats, jnp.asarray(a2[0]), jnp.asarray(a2[1]), w,
                           granule=2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)

    tgt = jnp.asarray(rng.standard_normal((CAP, 8)), jnp.float32)

    def loss(f, ww, arrs, g):
        o = chunk_gather_conv(f, jnp.asarray(arrs[0]), jnp.asarray(arrs[1]),
                              ww, granule=g)
        return jnp.sum((o - tgt) ** 2)

    g1f, g1w = jax.grad(loss, argnums=(0, 1))(feats, w, a1, 1)
    g2f, g2w = jax.grad(loss, argnums=(0, 1))(feats, w, a2, 2)
    np.testing.assert_allclose(np.asarray(g2f), np.asarray(g1f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2w), np.asarray(g1w),
                               rtol=1e-4, atol=1e-4)


def test_fused_bwd_v2_kgrouped_matches_xla(monkeypatch):
    """Force the k-grouped fused backward (v2: resident full-dW block,
    grid (C, KG)) and check both gradients against the XLA path."""
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    monkeypatch.setattr(cc, "_bwd_fused_eligible",
                        lambda *a, **k: False)
    for G in (9, 27):
        monkeypatch.setattr(cc, "_bwd_fused_v2_grouping",
                            lambda *a, _g=G, **k: _g)
        cc._make_sub_conv.cache_clear()
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((CAP, 8)), jnp.float32)

        def loss_ref(f, ww):
            return jnp.sum((gather_conv(f, jnp.asarray(nbr), ww) - tgt) ** 2)

        def loss_chunk(f, ww):
            o = cc.chunk_gather_conv(f, jnp.asarray(in_idx),
                                     jnp.asarray(lidx), ww)
            return jnp.sum((o - tgt) ** 2)

        gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gf_c, gw_c = jax.grad(loss_chunk, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-4)
    cc._make_sub_conv.cache_clear()


def test_tile_skip_matches_untiled(monkeypatch):
    """Tiled (tmask) kernels == untiled, values AND grads, for the
    submanifold VJP (fwd / fused-bwd / separate-dW) — the mask only skips
    provably-zero one-hot column tiles, so results are bit-identical."""
    from occuseg_tpu.ops.pallas.chunk_conv import tile_mask

    monkeypatch.setenv("OCC_TILE_SKIP", "1")

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    tm = tile_mask(lidx)
    assert tm.shape == (CAP // M, K)
    # the mask must be sparse for the test to mean anything
    n_t = -(-U // 128)
    assert (np.unpackbits(tm.astype(np.uint8)).sum()
            < 0.9 * tm.size * n_t)
    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((CAP, 8)), jnp.float32)

    def loss(f, ww, mask):
        o = chunk_gather_conv(f, jnp.asarray(in_idx), jnp.asarray(lidx),
                              ww, tmask=mask)
        return jnp.sum((o - tgt) ** 2), o

    (l_t, o_t), (gf_t, gw_t) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(feats, w, jnp.asarray(tm))
    (l_u, o_u), (gf_u, gw_u) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(feats, w, None)
    np.testing.assert_array_equal(np.asarray(o_t), np.asarray(o_u))
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_u),
                               rtol=1e-6, atol=1e-6)


def test_tile_skip_transition_matches(monkeypatch):
    """Tiled general-form (transition) kernels == untiled, incl. grads."""
    from occuseg_tpu.ops.pallas.chunk_conv import (
        chunk_gather_conv_t, tile_mask,
    )

    monkeypatch.setenv("OCC_TILE_SKIP", "1")

    plan = _real_plan()
    tr = plan.transitions[0]
    child, up = np.asarray(tr.child), np.asarray(tr.up)
    Mc, Uc = 64, 320
    Mu, Uu = 64, 160
    ca = build_chunk_arrays(child, Mc, Uc)
    ua = build_chunk_arrays(up, Mu, Uu)
    assert ca is not None and ua is not None
    ci, cl = map(jnp.asarray, ca)
    ui, ul = map(jnp.asarray, ua)
    ctm, utm = jnp.asarray(tile_mask(ca[1])), jnp.asarray(tile_mask(ua[1]))
    rng = np.random.default_rng(12)
    feats = jnp.asarray(rng.standard_normal((child.shape[0], 16)),
                        jnp.float32)
    w = jnp.asarray(rng.standard_normal((child.shape[1], 16, 8)) * 0.1,
                    jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((child.shape[0], 8)), jnp.float32)

    def loss(f, ww, masks):
        o = chunk_gather_conv_t(f, ci, cl, ui, ul, ww,
                                tmask=masks[0] if masks else None,
                                t_tmask=masks[1] if masks else None)
        return jnp.sum((o - tgt) ** 2)

    gf_t, gw_t = jax.grad(loss, argnums=(0, 1))(feats, w, (ctm, utm))
    gf_u, gw_u = jax.grad(loss, argnums=(0, 1))(feats, w, None)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_u),
                               rtol=1e-6, atol=1e-6)


def test_identity_center_detection():
    """Submanifold nbr maps expose the identity center (nbr[r, 13] == r);
    transition maps don't. `_chunk_or_none` stamps ChunkPlan.center_k."""
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    assert cc._identity_center(nbr) == K // 2
    child = np.asarray(plan.transitions[0].child)
    assert cc._identity_center(child) == -1

    cp = cc._chunk_or_none(nbr, M, U)
    assert cp is not None and cp.center_k == K // 2
    aug = augment_plan_with_chunks(plan, M=M, U=U)
    assert aug.levels[0].chunks.center_k == K // 2
    for tr in aug.transitions:
        if tr.child_chunks is not None:
            assert tr.child_chunks.center_k == -1


def test_center_tap_bitexact(monkeypatch):
    """The identity-center tap (masked own-rows copy instead of the one-hot
    MXU permutation for k == 13) is bit-identical to the full one-hot path
    — values AND both gradients — across all three backward variants
    (fused v1, k-grouped v2, separate-dW)."""
    import occuseg_tpu.ops.pallas.chunk_conv as cc

    plan = _real_plan()
    nbr = np.asarray(plan.levels[0].nbr)
    in_idx, lidx = build_chunk_arrays(nbr, M, U)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 16, 8)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((CAP, 8)), jnp.float32)

    def run(center_k):
        def loss(f, ww):
            o = cc.chunk_gather_conv(f, jnp.asarray(in_idx),
                                     jnp.asarray(lidx), ww,
                                     center_k=center_k)
            return jnp.sum((o - tgt) ** 2), o

        (_, o), (gf, gw) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(feats, w)
        return np.asarray(o), np.asarray(gf), np.asarray(gw)

    variants = [
        ("fused_v1", {}),
        ("fused_v2", {"_bwd_fused_eligible": lambda *a, **k: False,
                      "_bwd_fused_v2_grouping": lambda *a, **k: 9}),
        ("separate_dw", {"_bwd_fused_eligible": lambda *a, **k: False,
                         "_bwd_fused_v2_grouping": lambda *a, **k: 0}),
        # k-grouped FORWARD (n_kg > 1): the center group is selected by a
        # traced pl.when(kg == center // G) pair
        ("kgrouped_fwd", {"_k_grouping": lambda *a, **k: 9,
                          "_bwd_fused_eligible": lambda *a, **k: False,
                          "_bwd_fused_v2_grouping": lambda *a, **k: 0}),
    ]
    for name, patches in variants:
        for attr, fn in patches.items():
            monkeypatch.setattr(cc, attr, fn)
        cc._make_sub_conv.cache_clear()
        o_c, gf_c, gw_c = run(K // 2)
        o_u, gf_u, gw_u = run(-1)
        np.testing.assert_array_equal(o_c, o_u, err_msg=name)
        np.testing.assert_array_equal(gf_c, gf_u, err_msg=name)
        np.testing.assert_array_equal(gw_c, gw_u, err_msg=name)
        monkeypatch.undo()
    cc._make_sub_conv.cache_clear()
