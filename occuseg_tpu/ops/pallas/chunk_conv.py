"""Chunked one-hot submanifold convolution (Pallas, MXU permutation).

TPU-native analog of the reference's chunk-based shared-memory kernel
(`SCN/CUDA/Convolution.cu:1059-1253`, chunk rulebooks
`SubmanifoldConvolutionRules.h:277-431`): stage each chunk's (deduped)
input rows in fast memory ONCE, then run all K filter offsets against the
staged copy. On GPU the staging is shared memory + per-chunk input-address
lists (MAX_INPUT_ADDRESS, `Metadata.h:47`); here it is a [U, Cin] VMEM
block per chunk of M Morton-consecutive output rows.

Mosaic cannot lower arbitrary row gathers (tpu.dynamic_gather requires
index/data bitwidth match AND single-vreg sources — measured round 2), so
the in-VMEM permutation runs on the MXU instead: a one-hot matrix product

    G_k = onehot(lidx[k]) @ gin        # [M, U] @ [U, Cin]
    out = concat_k(G_k) @ W_flat       # [M, K*Cin] @ [K*Cin, Cout]

Missing neighbors are free: lidx = -1 matches no iota column, so the
one-hot row is all zeros. The one-hot FLOPs are overhead (U/Cout per
offset), but they run on an otherwise-idle MXU while HBM traffic drops to
~one read of the staged inputs + one write of the outputs — measured ~5x
faster than the XLA gather path at L0 shapes (exp_r2_a).

The backward is scatter-free like `ops/conv.py`: d_feats is the SAME
kernel over the transpose map (for submanifold conv, nbr is self-transpose
with reversed offsets) with W'[k] = W[K-1-k]^T, and dW accumulates
G^T @ ct per chunk across the grid.

Morton-chunk locality (182k-voxel ScanNet-like scene) sets the chunk
geometry: at the default M=128, max unique refs per chunk are
231/287/321/325/317/260 for L0..L5 (transition child maps up to 672, up
maps <= 122); per-level U budgets hug these with margin, multi-scene
batches get a +u_bump (boundary chunks mix scenes), and any map that
overflows its budget falls back to the XLA conv path for that batch
(with a logged warning). See PERF.md for the measured design trade-offs
and negative results.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default chunk geometry (see module docstring); U leaves headroom over the
# measured per-level maxima so unseen scenes rarely overflow. Sweep on
# silicon (round 2): M=128 with tight U beat M=256/U=512 by ~2% (241.7 vs
# 247.4 ms full fwd+bwd) — one-hot FLOPs scale with U, and halos shrink
# with M faster than MXU efficiency drops.
DEFAULT_M = 128
DEFAULT_U = 416

# Column-tile width for one-hot TILE SKIPPING: the [M, U] one-hot product
# decomposes into [M, TILE] column tiles, and a tile none of whose slots is
# referenced by offset k in this chunk is skipped via an SMEM bitmask
# (host-computed, `tile_mask`). Staged slots are globally row-sorted while
# each offset's refs advance monotonically through the chunk, so per-(c, k)
# references cluster: measured tile occupancy on the real bench plans is
# 73/50/51/58/65/54% for L0..L5 (exp_r3_o) — a direct cut of the dominant
# one-hot FLOP term. 128 = MXU contraction width; narrower tiles save no
# time (the MXU pads the contraction dim to 128).
#
# MEASURED NEGATIVE ON SILICON (round 4): OCC_TILE_SKIP=1 benched 349 ms
# vs 179 ms backbone fwd+bwd (2x SLOWER) despite the real 27-46% skip
# occupancy — splitting the single [M,U]@[U,Cin] MXU product into 2-3
# conditional per-tile dots adds a zero-fill + accumulate pass through
# g_scratch per offset and an SMEM-scalar branch per (offset, tile),
# which costs far more than the skipped one-hot FLOPs. Kept switchable
# (bit-exact CPU tests) for a future formulation; default stays OFF.
TILE = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """Per-level chunk rulebook (host-built, `build_chunk_arrays`).

    With granule g > 1, in_idx holds GRANULE ids (row // g) and each
    occupies g consecutive staged slots — the staging gather then moves
    g*Cin-byte rows (fewer, bigger rows: XLA row-gathers are row-count
    bound) and lidx indexes the granule-expanded slots."""

    in_idx: jnp.ndarray  # int32 [C, U/g] granule ids staged per chunk, -1 pad
    lidx: jnp.ndarray    # int32 [C, K, M] granule-expanded slot, -1 missing
    granule: int = dataclasses.field(metadata=dict(static=True), default=1)
    # int32 [C, K] one-hot tile-skip bitmask (bit t: offset k references a
    # slot in column tile t), or None for the untiled kernels
    tmask: Optional[jnp.ndarray] = None
    # BLOCKED batch layout (native/blocked.py): ns > 1 means the feature
    # table is ns per-scene blocks of equal sub-cap, chunks are scene-pure
    # and ordered scene-major, and in_idx values are scene-LOCAL rows.
    # _stage then gathers from per-scene static windows — XLA's row gather
    # collapses ~12.9x once the source table passes ~100 MB (PERF.md
    # batch-4 breakdown), so multi-scene batches must never gather from
    # the full table.
    ns: int = dataclasses.field(metadata=dict(static=True), default=1)
    # IDENTITY CENTER TAP: for submanifold maps the center offset is the
    # identity (nbr[r, K//2] == r — verified host-side at plan build), so
    # the kernels replace that offset's one-hot build + [M,U]@[U,Cin] MXU
    # permutation with a masked VMEM copy of the chunk's own rows —
    # bit-identical output, ~1/K of the dominant one-hot FLOPs removed.
    # -1 = no identity center (transition maps, oriented plans that break
    # the property, or detection off).
    center_k: int = dataclasses.field(metadata=dict(static=True),
                                      default=-1)

    @property
    def geometry(self) -> Tuple[int, int, int, int]:
        C, K, M = self.lidx.shape
        return C, K, M, self.in_idx.shape[1] * self.granule


def _interpret_default() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def _sds(shape, dtype, like) -> jax.ShapeDtypeStruct:
    """ShapeDtypeStruct carrying `like`'s varying-mesh-axes set — under
    shard_map (DP / spatial training) pallas_call outputs must declare
    their vma or the check_vma typecheck rejects the call."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _match_vma(*arrays):
    """Lift every operand to the union of the operands' varying-mesh-axes
    (jax.lax.pvary) — under shard_map the plan/feature inputs vary over the
    mesh axis while the weights are replicated, and pallas_call requires
    one consistent vma across its inputs. No-op outside shard_map."""
    vmas = [getattr(jax.typeof(a), "vma", None) or frozenset()
            for a in arrays]
    target = frozenset().union(*vmas)
    if not target:
        return arrays
    return tuple(
        jax.lax.pvary(a, tuple(sorted(target - v))) if target - v else a
        for a, v in zip(arrays, vmas))


def _co_block(cout: int) -> int:
    """Mosaic block dims must divide the array dim AND be lane-aligned
    (multiple of 128) or equal the full dim — so 128 when it divides,
    else the whole Cout (320 etc.)."""
    return 128 if cout % 128 == 0 else cout


# VMEM budget for the per-grid-cell working set (staged-G scratch + the
# double-buffered weight / dW block); above it the K offsets are split into
# grid groups. Decoder levels concat skip features (Cin up to 640) and
# Cout=320 forces full-width co blocks, so without splitting a cell would
# blow the 16MB scoped VMEM (measured: 17.0M / 17.5M OOMs).
_CELL_BUDGET = 8 * 1024 * 1024


def _k_grouping(K: int, M: int, cin: int, co_blk: int, esize: int,
                wblk_esize: int) -> int:
    """Largest divisor G of K whose scratch [M, G*cin] plus (double-
    buffered) [G*cin, co_blk] weight/dW block fit the cell budget."""
    for d in range(K, 0, -1):
        if K % d:
            continue
        cell = M * d * cin * esize + 2 * d * cin * co_blk * wblk_esize
        if cell <= _CELL_BUDGET:
            return d
    return 1


def _lane_pack(cin: int, U: int) -> int:
    """For Cin <= 64 the plain [M,U]@[U,Cin] one-hot product uses at most
    half the MXU's 128 output lanes; viewing gin as [U/r, r*Cin] (a free
    host-side reshape — staged rows are contiguous) fills the lanes and a
    VPU select picks the row within each pair. Same MACs, ~2x MXU
    throughput at L0. (Mosaic cannot shape-cast in-kernel, so the view is
    applied to the gin array before pallas_call.)"""
    # MEASURED ON SILICON: packing r=2 at L0 REGRESSED the full step 242ms
    # -> 328ms — extracting the odd half (g2[:, cin:]) costs a 64-lane
    # rotate per offset that outweighs the MXU lane gain. Disabled; the
    # machinery stays for a future transposed-product formulation.
    return 1


def _tile_stack_ok(M: int, U: int, cin: int, G: int, esize: int) -> bool:
    """Mosaic allocates each per-tile pl.when scope's one-hot temporaries
    (i32 iota + one-hot + f32 product) on the scoped-vmem STACK without
    reuse across scopes (measured on silicon: the [M=128, U=320, Cin=384,
    G=27] tiled fwd kernel requested 20.16M of the 16M scoped limit).
    Keep tiling only where the estimated stack fits with headroom — the
    deep wide convs it excludes have the highest tile occupancy (least
    skip win) anyway."""
    n_tiles = -(-U // TILE)
    per_scope = M * TILE * (4 + esize) + M * cin * 4
    return G * n_tiles * per_scope <= 8 * 1024 * 1024


def _build_g(lidx_ref, gin_ref, g_scratch, cin: int, tm_ref=None,
             tm_kg=0, self_ref=None, c_l: int = -1, c_here=None):
    """Stage G offsets' gathered rows into g_scratch [M, G*cin] via one-hot
    MXU products (lidx == -1 rows come out zero for free).
    lidx_ref block is [1, 1, G, M] (4D so the G dim can be non-8-aligned);
    gin_ref block is [1, U/r, r*cin] (see _lane_pack).

    With tm_ref (SMEM [1, n_kg, G] int32 per-offset tile bitmasks, see
    TILE; the FULL k-group axis rides in the block because Mosaic requires
    the last two block dims to equal the array dims when unaligned —
    `tm_kg` selects the grid's current k-group) the product decomposes
    into TILE-wide column tiles and unreferenced tiles are skipped — each
    output row comes from exactly ONE slot (the one-hot has a single 1 per
    row over the FULL U), so skipped tiles contribute exact zeros and the
    per-tile accumulation is bit-identical to the single [M, U] product.

    IDENTITY CENTER TAP (self_ref [1, M, cin], c_l = center's k WITHIN this
    group, c_here = traced "center group is this grid step" bool or None
    for statically-yes): offset c_l's staged block is the chunk's own rows,
    so it is a masked copy of self_ref instead of a one-hot MXU product —
    the one-hot picks exactly those rows (bit-identical), this just skips
    building it. Masking on lidx >= 0 keeps pad rows zero regardless of
    the (zeroed, but unverified) pad feature contract."""
    G, M = lidx_ref.shape[2], lidx_ref.shape[3]
    Ur, Cr = gin_ref.shape[1], gin_ref.shape[2]
    r = Cr // cin
    gin = gin_ref[0]
    if self_ref is not None:
        assert r == 1, "center tap assumes unpacked lanes"
        assert tm_ref is None, "center tap is disabled under tile skipping"
    if tm_ref is not None:
        assert r == 1, "tile skipping assumes unpacked lanes"
        for k in range(G):
            l = lidx_ref[0, 0, k, :]
            bits = tm_ref[0, tm_kg, k]
            ks = slice(k * cin, (k + 1) * cin)
            g_scratch[:, ks] = jnp.zeros((M, cin), g_scratch.dtype)
            for t in range(-(-Ur // TILE)):
                lo = t * TILE
                w = min(TILE, Ur - lo)

                @pl.when((bits & (1 << t)) > 0)
                def _(l=l, lo=lo, w=w, ks=ks):
                    iota_t = lo + jax.lax.broadcasted_iota(
                        jnp.int32, (M, w), 1)
                    oh = (l[:, None] == iota_t).astype(gin.dtype)
                    g = jax.lax.dot_general(
                        oh, gin[lo:lo + w],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    g_scratch[:, ks] += g.astype(g_scratch.dtype)
        return
    iota = jax.lax.broadcasted_iota(jnp.int32, (M, Ur), 1)
    for k in range(G):
        l = lidx_ref[0, 0, k, :]
        if self_ref is not None and k == c_l:
            ks = slice(k * cin, (k + 1) * cin)

            def _copy(l=l, ks=ks):
                # minor-dim insert on the i32 value, THEN compare — Mosaic
                # cannot insert a minor dim on sub-32-bit (i1) vectors
                g_scratch[:, ks] = jnp.where(
                    l[:, None] >= 0, self_ref[0],
                    jnp.zeros((M, cin), self_ref.dtype)
                ).astype(g_scratch.dtype)

            def _dot(l=l, ks=ks):
                oh = (l[:, None] == iota).astype(gin.dtype)
                g_scratch[:, ks] = jax.lax.dot_general(
                    oh, gin, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).astype(g_scratch.dtype)

            if c_here is None:
                _copy()
            else:
                pl.when(c_here)(_copy)
                pl.when(jnp.logical_not(c_here))(_dot)
            continue
        if r == 1:
            oh = (l[:, None] == iota).astype(gin.dtype)
            g = jax.lax.dot_general(
                oh, gin, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # -1 >> 1 == -1 (arithmetic): missing rows still match nothing
            oh = ((l >> 1)[:, None] == iota).astype(gin.dtype)
            g2 = jax.lax.dot_general(
                oh, gin, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # minor-dim insert must happen on the i32 value (Mosaic cannot
            # insert a minor dim on sub-32-bit types like bool)
            g = jnp.where((l & 1)[:, None] == 0, g2[:, :cin], g2[:, cin:])
        g_scratch[:, k * cin:(k + 1) * cin] = g.astype(g_scratch.dtype)


def _make_fwd_kernel(n_kg: int, n_co: int, cin: int, tiled: bool = False,
                     center: int = -1):
    def kernel(nz_ref, *args):
        """Grid (C, CO, KG), kg fastest: the f32 accumulator spans the
        contiguous kg revisits of one (chunk, Cout-block); out is written
        once at the last kg. All-pad chunks (nz==0, beyond num_active or a
        loose bucket cap) skip the one-hot build and matmuls entirely."""
        tm_ref = args[0] if tiled else None
        centered = center >= 0
        self_ref = args[tiled] if centered else None
        rest = args[tiled + centered:]
        lidx_ref, gin_ref, w_ref, out_ref, g_scratch, acc = rest
        kg = pl.program_id(2)
        nz = nz_ref[0, 0, 0] > 0
        G = lidx_ref.shape[2]
        c_l = center % G if centered else -1
        c_here = None
        if centered and n_kg > 1:
            c_here = kg == center // G

        @pl.when(kg == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        if n_kg == 1 and n_co > 1:
            # single k-group: the staged G is valid for every Cout block
            @pl.when(nz & (pl.program_id(1) == 0))
            def _():
                _build_g(lidx_ref, gin_ref, g_scratch, cin, tm_ref, kg,
                         self_ref, c_l, c_here)
        else:
            @pl.when(nz)
            def _():
                _build_g(lidx_ref, gin_ref, g_scratch, cin, tm_ref, kg,
                         self_ref, c_l, c_here)

        @pl.when(nz)
        def _():
            acc[:] += jax.lax.dot_general(
                g_scratch[:], w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kg == n_kg - 1)
        def _():
            out_ref[0] = acc[:].astype(out_ref.dtype)
    return kernel


def _make_bwd_fused_kernel(n_c: int, cin: int, tiled: bool = False,
                           center: int = -1):
    def kernel(nz_ref, *args):
        """Fused backward (grid (C,)): the staged-Gct scratch serves BOTH
        d_feats (Gct @ W') and dW (feats_c^T @ Gct) — one one-hot build
        instead of two. dW accumulates across the contiguous c revisits;
        all-pad chunks skip everything but zero writes."""
        tm_ref = args[0] if tiled else None
        centered = center >= 0
        self_ref = args[tiled] if centered else None
        (lidx_ref, gct_ref, wt_ref, feats_ref, dfeats_ref, dw_ref,
         g_scratch) = args[tiled + centered:]
        c = pl.program_id(0)
        nz = nz_ref[0, 0, 0] > 0

        @pl.when(c == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        @pl.when(nz)
        def _():
            # single k-group (G == K): the center's in-group index is the
            # global one, statically in this grid step
            _build_g(lidx_ref, gct_ref, g_scratch, cin, tm_ref,
                     self_ref=self_ref, c_l=center)
            dfeats_ref[0] = jax.lax.dot_general(
                g_scratch[:], wt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dfeats_ref.dtype)
            # [Cin, K*Cout]: column block k pairs with Gct_k
            dw_ref[:] += jax.lax.dot_general(
                feats_ref[0], g_scratch[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(jnp.logical_not(nz))
        def _():
            dfeats_ref[0] = jnp.zeros_like(dfeats_ref[0])
    return kernel


def _bwd_fused_eligible(K, M, Ct_in, cin, cout, esize) -> bool:
    """Whole working set in VMEM. Ct_in is the staged (gathered-ct)
    channel count = fwd Cout; cin = d_feats output channels = fwd Cin.

    The fused kernel runs grid (C,) with FULL-array blocks (no k-group /
    cout-block splitting), and every block's minor dims equal the array
    dims, which Mosaic accepts for any channel count — so eligibility is
    purely a VMEM budget: staged-Gct scratch + (double-buffered) W' +
    the f32 dW accumulator + the per-chunk feats/d_feats blocks.
    (Round-2 additionally required cin to be a single 128-lane block —
    needlessly excluding the 2m->m decoder convs (cin=256) and the wide
    deconvolutions, which then paid a second full one-hot pass in the
    separate-dW fallback. OCC_FUSED_BWD_RELAX=0 restores the round-2
    rule for A/B measurements.)"""
    import os
    if os.environ.get("OCC_FUSED_BWD_RELAX", "1") == "0":
        co_blk = _co_block(cin)
        if _k_grouping(K, M, Ct_in, co_blk, esize, esize) != K:
            return False
        if cin % co_blk != 0 or cin // co_blk != 1:
            return False
    scratch = M * K * Ct_in * esize
    wt = 2 * K * Ct_in * cin * esize
    dw = cin * K * Ct_in * 4
    return scratch + wt + dw + M * cin * esize * 3 <= 13 * 1024 * 1024


def _pallas_bwd_fused(t_lidx, gct, w_t, feats_c, out_cin, interpret,
                      tmask=None, self_c=None, center=-1):
    """d_feats [C*M, out_cin] and dW-transposed [out_cin, K*Ct] in one pass.
    t_lidx/gct are the TRANSPOSE-direction chunk plan over d_feats rows;
    feats_c is the forward input chunked the same way [C, M, out_cin].
    self_c [C, M, Ct] = the cotangent's own chunk rows for the identity
    center tap (`center` = global center offset, -1 disables)."""
    C, K, M = t_lidx.shape
    U, Ct = gct.shape[1], gct.shape[2]
    t_lidx = t_lidx.reshape(C, 1, K, M)
    r = _lane_pack(Ct, U)
    gct = gct.reshape(C, U // r, r * Ct)
    nz = _chunk_nonempty(t_lidx, C, 1, K, M)
    tiled = (tmask is not None and r == 1
             and _tile_stack_ok(M, U, Ct, K,
                                jnp.dtype(gct.dtype).itemsize))
    if tiled or r != 1 or self_c is None:
        center = -1
    tm = (tmask.reshape(C, 1, K),) if tiled else ()
    tm_spec = [pl.BlockSpec((1, 1, K), lambda c: (c, 0, 0),
                            memory_space=pltpu.SMEM)] if tiled else []
    sc = (self_c,) if center >= 0 else ()
    sc_spec = [pl.BlockSpec((1, M, Ct), lambda c: (c, 0, 0),
                            memory_space=pltpu.VMEM)] if center >= 0 else []
    nz, t_lidx, gct, w_t, feats_c, *extra = _match_vma(
        nz, t_lidx, gct, w_t, feats_c, *tm, *sc)
    d_feats, dw_t = pl.pallas_call(
        _make_bwd_fused_kernel(C, Ct, tiled, center),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            *tm_spec,
            *sc_spec,
            pl.BlockSpec((1, 1, K, M), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U // r, r * Ct), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Ct, out_cin), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, out_cin), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, M, out_cin), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_cin, K * Ct), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _sds((C, M, out_cin), feats_c.dtype, gct),
            _sds((out_cin, K * Ct), jnp.float32, gct),
        ),
        scratch_shapes=[pltpu.VMEM((M, K * Ct), gct.dtype)],
        interpret=interpret,
    )(nz, *extra, t_lidx, gct, w_t, feats_c)
    return d_feats, dw_t


def _make_bwd_fused_v2_kernel(n_c: int, n_kg: int, ct: int,
                              tiled: bool = False, center: int = -1):
    def kernel(nz_ref, *args):
        """k-grouped fused backward (grid (C, KG), kg fastest) for convs
        whose full weight set exceeds the v1 budget: the dW accumulator
        stays FULLY RESIDENT as one constant-mapped [n_kg, cin, G*Ct] f32
        output block (never left, so read-modify-write across the whole
        grid is legal — same rule as v1's 2D block), indexed dw_ref[kg];
        d_feats accumulates across the contiguous kg revisits in an f32
        scratch like the forward kernel."""
        tm_ref = args[0] if tiled else None
        centered = center >= 0
        self_ref = args[tiled] if centered else None
        (lidx_ref, gct_ref, wt_ref, feats_ref, dfeats_ref, dw_ref,
         g_scratch, acc) = args[tiled + centered:]
        c = pl.program_id(0)
        kg = pl.program_id(1)
        nz = nz_ref[0, 0, 0] > 0
        G = lidx_ref.shape[2]
        c_l = center % G if centered else -1
        c_here = (kg == center // G) if centered and n_kg > 1 else None

        @pl.when(kg == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(c == 0)
        def _():
            dw_ref[kg] = jnp.zeros_like(dw_ref[kg])

        @pl.when(nz)
        def _():
            _build_g(lidx_ref, gct_ref, g_scratch, ct, tm_ref, kg,
                     self_ref, c_l, c_here)
            acc[:] += jax.lax.dot_general(
                g_scratch[:], wt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw_ref[kg] += jax.lax.dot_general(
                feats_ref[0], g_scratch[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(kg == n_kg - 1)
        def _():
            dfeats_ref[0] = acc[:].astype(dfeats_ref.dtype)
    return kernel


def _bwd_fused_v2_grouping(K, M, Ct_in, cin, U, esize) -> int:
    """Largest divisor G of K whose v2 working set fits: the resident
    full-dW f32 block + per-cell staged scratch / weight / gct / feats
    blocks. Returns 0 when even G == 1 does not fit (L3+ decoder concat
    convs) — callers fall back to the separate-dW path."""
    import os
    if os.environ.get("OCC_FUSED_BWD_V2", "1") == "0":
        return 0
    dw = cin * K * Ct_in * 4
    for d in range(K, 0, -1):
        if K % d:
            continue
        cell = (dw
                + M * d * Ct_in * esize        # g_scratch
                + 2 * d * Ct_in * cin * esize  # wt block (double-buffered)
                + 2 * U * Ct_in * esize        # gct block
                + 3 * M * cin * esize          # feats + dfeats blocks
                + M * cin * 4)                 # d_feats accumulator
        if cell <= 13 * 1024 * 1024:
            return d
    return 0


def _pallas_bwd_fused_v2(t_lidx, gct, w_t, feats_c, out_cin, G, interpret,
                         tmask=None, self_c=None, center=-1):
    """Same contract as _pallas_bwd_fused, with K split into groups of G."""
    C, K, M = t_lidx.shape
    U, Ct = gct.shape[1], gct.shape[2]
    n_kg = K // G
    t_lidx = t_lidx.reshape(C, n_kg, G, M)
    nz = _chunk_nonempty(t_lidx, C, n_kg, G, M)
    tiled = (tmask is not None
             and _tile_stack_ok(M, U, Ct, G,
                                jnp.dtype(gct.dtype).itemsize))
    if tiled or self_c is None:
        center = -1
    tm = (tmask.reshape(C, n_kg, G),) if tiled else ()
    tm_spec = [pl.BlockSpec((1, n_kg, G), lambda c, kg: (c, 0, 0),
                            memory_space=pltpu.SMEM)] if tiled else []
    sc = (self_c,) if center >= 0 else ()
    sc_spec = [pl.BlockSpec((1, M, Ct), lambda c, kg: (c, 0, 0),
                            memory_space=pltpu.VMEM)] if center >= 0 else []
    nz, t_lidx, gct, w_t, feats_c, *extra = _match_vma(
        nz, t_lidx, gct, w_t, feats_c, *tm, *sc)
    d_feats, dw_t = pl.pallas_call(
        _make_bwd_fused_v2_kernel(C, n_kg, Ct, tiled, center),
        grid=(C, n_kg),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda c, kg: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            *tm_spec,
            *sc_spec,
            pl.BlockSpec((1, 1, G, M), lambda c, kg: (c, kg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, Ct), lambda c, kg: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Ct, out_cin), lambda c, kg: (kg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, out_cin), lambda c, kg: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, M, out_cin), lambda c, kg: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kg, out_cin, G * Ct), lambda c, kg: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _sds((C, M, out_cin), feats_c.dtype, gct),
            _sds((n_kg, out_cin, G * Ct), jnp.float32, gct),
        ),
        scratch_shapes=[pltpu.VMEM((M, G * Ct), gct.dtype),
                        pltpu.VMEM((M, out_cin), jnp.float32)],
        interpret=interpret,
    )(nz, *extra, t_lidx, gct, w_t, feats_c)
    # [n_kg, cin, G*Ct] -> [cin, K*Ct] with offset blocks in K order
    dw_t = jnp.transpose(dw_t, (1, 0, 2)).reshape(out_cin, K * Ct)
    return d_feats, dw_t


def _make_dw_kernel(n_c: int, cin: int, tiled: bool = False,
                    center: int = -1, n_kg: int = 1):
    def kernel(nz_ref, *args):
        """Grid (KG, CO, C), c fastest: each dW block's chunk revisits are
        contiguous, so read-modify-write accumulation is safe."""
        tm_ref = args[0] if tiled else None
        centered = center >= 0
        self_ref = args[tiled] if centered else None
        lidx_ref, gin_ref, ct_ref, dw_ref, g_scratch = \
            args[tiled + centered:]
        c = pl.program_id(2)
        # read at top level: program_id under a pl.when cond jaxpr is not
        # substituted by the interpret-mode evaluator
        kg = pl.program_id(0)
        G = lidx_ref.shape[2]
        c_l = center % G if centered else -1
        c_here = (kg == center // G) if centered and n_kg > 1 else None

        @pl.when(c == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        @pl.when(nz_ref[0, 0, 0] > 0)
        def _():
            _build_g(lidx_ref, gin_ref, g_scratch, cin, tm_ref, kg,
                     self_ref, c_l, c_here)
            dw_ref[:] += jax.lax.dot_general(
                g_scratch[:], ct_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return kernel


def _chunk_nonempty(lidx4, C, n_kg, G, M) -> jnp.ndarray:
    """[C, 1] int32 flag: does the chunk have ANY real rulebook entry?
    (The center offset makes every active row appear, so all-(-1) means
    the chunk is pure cap padding — or beyond a loose bucket's actives.)"""
    flag = (jnp.max(lidx4.reshape(C, n_kg * G * M), axis=1) >= 0)
    # [C, 1, 1]: the last two block dims must equal the array dims
    return flag.astype(jnp.int32).reshape(C, 1, 1)


def _pallas_fwd(lidx, gin, w_flat, out_dtype, interpret, tmask=None,
                self_c=None, center=-1):
    C, K, M = lidx.shape
    U, Cin = gin.shape[1], gin.shape[2]
    Cout = w_flat.shape[1]
    co_blk = _co_block(Cout)
    esize = jnp.dtype(gin.dtype).itemsize
    G = _k_grouping(K, M, Cin, co_blk, esize, esize)
    n_kg, n_co = K // G, Cout // co_blk
    lidx = lidx.reshape(C, n_kg, G, M)
    r = _lane_pack(Cin, U)
    gin = gin.reshape(C, U // r, r * Cin)
    nz = _chunk_nonempty(lidx, C, n_kg, G, M)
    tiled = (tmask is not None and r == 1
             and _tile_stack_ok(M, U, Cin, G, esize))
    if tiled or r != 1 or self_c is None:
        center = -1
    tm = (tmask.reshape(C, n_kg, G),) if tiled else ()
    tm_spec = [pl.BlockSpec((1, n_kg, G), lambda c, co, kg: (c, 0, 0),
                            memory_space=pltpu.SMEM)] if tiled else []
    sc = (self_c,) if center >= 0 else ()
    sc_spec = [pl.BlockSpec((1, M, Cin), lambda c, co, kg: (c, 0, 0),
                            memory_space=pltpu.VMEM)] if center >= 0 else []
    nz, lidx, gin, w_flat, *extra = _match_vma(nz, lidx, gin, w_flat,
                                               *tm, *sc)
    return pl.pallas_call(
        _make_fwd_kernel(n_kg, n_co, Cin, tiled, center),
        grid=(C, n_co, n_kg),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda c, co, kg: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            *tm_spec,
            *sc_spec,
            pl.BlockSpec((1, 1, G, M), lambda c, co, kg: (c, kg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U // r, r * Cin),
                         lambda c, co, kg: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Cin, co_blk), lambda c, co, kg: (kg, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, co_blk), lambda c, co, kg: (c, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((C, M, Cout), out_dtype, gin),
        scratch_shapes=[pltpu.VMEM((M, G * Cin), gin.dtype),
                        pltpu.VMEM((M, co_blk), jnp.float32)],
        interpret=interpret,
    )(nz, *extra, lidx, gin, w_flat)


def _pallas_dw(lidx, gin, ct_c, interpret, tmask=None, self_c=None,
               center=-1):
    C, K, M = lidx.shape
    U, Cin = gin.shape[1], gin.shape[2]
    Cout = ct_c.shape[2]
    co_blk = _co_block(Cout)
    G = _k_grouping(K, M, Cin, co_blk, jnp.dtype(gin.dtype).itemsize, 4)
    lidx = lidx.reshape(C, K // G, G, M)
    r = _lane_pack(Cin, U)
    gin = gin.reshape(C, U // r, r * Cin)
    nz = _chunk_nonempty(lidx, C, K // G, G, M)
    tiled = (tmask is not None and r == 1
             and _tile_stack_ok(M, U, Cin, G,
                                jnp.dtype(gin.dtype).itemsize))
    if tiled or r != 1 or self_c is None:
        center = -1
    tm = (tmask.reshape(C, K // G, G),) if tiled else ()
    tm_spec = [pl.BlockSpec((1, K // G, G), lambda kg, co, c: (c, 0, 0),
                            memory_space=pltpu.SMEM)] if tiled else []
    sc = (self_c,) if center >= 0 else ()
    sc_spec = [pl.BlockSpec((1, M, Cin), lambda kg, co, c: (c, 0, 0),
                            memory_space=pltpu.VMEM)] if center >= 0 else []
    nz, lidx, gin, ct_c, *extra = _match_vma(nz, lidx, gin, ct_c,
                                             *tm, *sc)
    return pl.pallas_call(
        _make_dw_kernel(C, Cin, tiled, center, K // G),
        grid=(K // G, Cout // co_blk, C),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda kg, co, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            *tm_spec,
            *sc_spec,
            pl.BlockSpec((1, 1, G, M), lambda kg, co, c: (c, kg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U // r, r * Cin), lambda kg, co, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, co_blk), lambda kg, co, c: (c, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * Cin, co_blk),
                               lambda kg, co, c: (kg, co),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((K * Cin, Cout), jnp.float32, gin),
        scratch_shapes=[pltpu.VMEM((M, G * Cin), gin.dtype)],
        interpret=interpret,
    )(nz, *extra, lidx, gin, ct_c)


def _runtime_zero(dtype):
    """A zero the algebraic simplifier cannot see through (an
    optimization_barrier'd scalar): `x + _runtime_zero(dt)` forces an
    elementwise fusion that materializes x as a fresh buffer while the
    scalar itself is loop-hoisted. Value-identical (adding +0.0 is exact
    for every finite float)."""
    return jax.lax.optimization_barrier(jnp.zeros([], dtype))


def _stage(feats, in_idx, granule: int = 1, ns: int = 1):
    """XLA pre-gather of each chunk's deduped input rows: [C, U, Cin].
    One coalesced gather per conv instead of K strided ones.

    Pad entries (in_idx == -1) clamp to row 0 WITHOUT a fill/select pass:
    no lidx ever points at a pad slot (the one-hot guards missing refs),
    so staged garbage there is never read.

    granule g > 1: in_idx holds row//g ids; the gather reads g-row granules
    (g*Cin bytes per row) from feats viewed [N/g, g*Cin] — same bytes in
    fewer, bigger rows.

    ns > 1 (blocked batch layout): feats is ns equal per-scene blocks,
    chunks are scene-major, in_idx is scene-LOCAL — gather each scene's
    chunks from a STATIC slice window of its block. Measured on silicon
    (exp_r4_b): one gather over a 4-scene [786k,64] table runs at
    8.6 GB/s; the same refs through 4 static windows run at 110 GB/s."""
    C, Ug = in_idx.shape
    N, Cin = feats.shape
    fsrc = feats if granule == 1 \
        else feats.reshape(N // granule, granule * Cin)
    if ns == 1:
        safe = jnp.maximum(in_idx.reshape(-1), 0)
        # mode="clip": jnp.take's DEFAULT is "fill", which re-adds the
        # bounds-check select pass (~10 ms/step of broadcast_select
        # fusions) even though `safe` is already in-bounds
        out = jnp.take(fsrc, safe, axis=0, mode="clip",
                       unique_indices=False, indices_are_sorted=False)
        return out.reshape(C, Ug * granule, -1) if granule > 1 \
            else out.reshape(C, Ug, -1)
    Cs = C // ns
    scap = fsrc.shape[0] // ns
    outs = []
    for s in range(ns):
        idx = jnp.maximum(
            jax.lax.slice_in_dim(in_idx, s * Cs, (s + 1) * Cs).reshape(-1),
            0)
        win = jax.lax.slice_in_dim(fsrc, s * scap, (s + 1) * scap)
        # Materialize the window as an ELEMENTWISE FUSION output (add a
        # runtime zero the simplifier cannot fold away). Rationale (r5 b4
        # profile): the same-shape gather runs 0.84 ms at b1 where its
        # source is a fusion-produced single-scene table that memory-space
        # assignment places in VMEM (S(1)), vs 7.97 ms at b4 where the
        # source window reads from the 100 MB merged table. A bare
        # optimization_barrier materialized the window as a `copy` but MSA
        # still left it in HBM — fusion-produced buffers match the b1
        # structure it does promote.
        win = win + _runtime_zero(win.dtype)
        outs.append(jnp.take(win, idx, axis=0, mode="clip",
                             unique_indices=False,
                             indices_are_sorted=False))
    out = jnp.concatenate(outs, axis=0)
    return out.reshape(C, Ug * granule, Cin) if granule > 1 \
        else out.reshape(C, Ug, -1)


def _fwd_impl(feats, in_idx, lidx, weight, granule=1,
              return_gin: bool = False, tmask=None, ns=1, center=-1):
    K, Cin, Cout = weight.shape
    out_dtype = feats.dtype
    gin = _stage(feats, in_idx, granule, ns)
    w_flat = weight.astype(out_dtype).reshape(K * Cin, Cout)
    C, _, M = lidx.shape
    self_c = feats.reshape(C, M, Cin) if center >= 0 else None
    with jax.enable_x64(False):
        out = _pallas_fwd(lidx, gin, w_flat, out_dtype,
                          _interpret_default(), tmask, self_c, center)
    out = out.reshape(-1, Cout)
    return (out, gin) if return_gin else out


@functools.lru_cache(maxsize=None)
def _make_sub_conv(granule: int, ns: int = 1, center: int = -1):
    """custom_vjp instance for a (static) staging granule. `tmask` (an
    array or None) is the one-hot tile-skip bitmask for lidx — the
    submanifold map is self-transpose, so the backward reuses it.
    `center`: identity-center offset index (ChunkPlan.center_k) — the
    center's staged block is the chunk's own rows, copied instead of
    one-hot-built, in forward AND backward (K-1-center == center under
    offset reversal for the cubic kernels this applies to)."""

    @jax.custom_vjp
    def f(feats, in_idx, lidx, tmask, weight):
        return _fwd_impl(feats, in_idx, lidx, weight, granule, tmask=tmask,
                         ns=ns, center=center)

    def fwd(feats, in_idx, lidx, tmask, weight):
        # when the fused backward will NOT apply (decided by STATIC shapes),
        # keep the staged gin as a residual so bwd's dW kernel skips its
        # re-staging gather (staging gathers measured ~25GB/s effective)
        K, Cin, Cout = weight.shape
        C, _, M = lidx.shape
        esize = jnp.dtype(feats.dtype).itemsize
        fused = (_bwd_fused_eligible(K, M, Cout, Cin, Cout, esize)
                 or _bwd_fused_v2_grouping(K, M, Cout, Cin,
                                           in_idx.shape[1], esize) > 0)
        if fused:
            out = _fwd_impl(feats, in_idx, lidx, weight, granule,
                            tmask=tmask, ns=ns, center=center)
            gin = None
        else:
            out, gin = _fwd_impl(feats, in_idx, lidx, weight, granule,
                                 return_gin=True, tmask=tmask, ns=ns,
                                 center=center)
        return out, (feats, in_idx, lidx, tmask, weight, gin)

    def bwd(res, ct):
        feats, in_idx, lidx, tmask, weight, gin_saved = res
        K, Cin, Cout = weight.shape
        ctc = ct.astype(feats.dtype)
        C, _, M = lidx.shape
        interpret = _interpret_default()
        esize = jnp.dtype(feats.dtype).itemsize
        # center tap in the backward: the staged source is ct, so the
        # center's own-rows block is ct chunked. K-1-center == center
        # (odd cubic kernels), so the weight reversal keeps the pairing.
        ct_self = ctc.reshape(C, M, Cout) if center >= 0 else None

        # d_feats[i] = sum_k ct[nbr[i,k]] @ W[K-1-k]^T — the same chunked
        # conv over ct with reversed-transposed weights; and because that
        # kernel already stages Gct_k[m] = ct[nbr[m,k]], dW falls out of
        # the SAME staging: dW[K-1-k] = sum_i feats[i] (x) Gct_k[i]
        # (offset-reversal symmetry nbr[r,k]=i <=> nbr[i,K-1-k]=r). The
        # fused kernel computes both with ONE one-hot build.
        w_rev_t = jnp.transpose(weight[::-1], (0, 2, 1)).astype(feats.dtype)
        gct = _stage(ctc, in_idx, granule, ns)
        if _bwd_fused_eligible(K, M, Cout, Cin, Cout, esize):
            with jax.enable_x64(False):
                d_feats, dw_t = _pallas_bwd_fused(
                    lidx, gct, w_rev_t.reshape(K * Cout, Cin),
                    feats.reshape(C, M, Cin), Cin, interpret, tmask,
                    ct_self, center)
            d_w = jnp.transpose(dw_t.reshape(Cin, K, Cout),
                                (1, 0, 2))[::-1].astype(weight.dtype)
            return (d_feats.reshape(-1, Cin), None, None, None, d_w)

        G2 = _bwd_fused_v2_grouping(K, M, Cout, Cin, in_idx.shape[1],
                                    esize)
        if G2:
            with jax.enable_x64(False):
                d_feats, dw_t = _pallas_bwd_fused_v2(
                    lidx, gct, w_rev_t.reshape(K * Cout, Cin),
                    feats.reshape(C, M, Cin), Cin, G2, interpret, tmask,
                    ct_self, center)
            d_w = jnp.transpose(dw_t.reshape(Cin, K, Cout),
                                (1, 0, 2))[::-1].astype(weight.dtype)
            return (d_feats.reshape(-1, Cin), None, None, None, d_w)

        # fallback: separate dW kernel (gathers feats via the forward map,
        # so no K reversal there)
        gin = gin_saved if gin_saved is not None \
            else _stage(feats, in_idx, granule, ns)
        feat_self = feats.reshape(C, M, Cin) if center >= 0 else None
        with jax.enable_x64(False):
            dw_flat = _pallas_dw(lidx, gin, ctc.reshape(C, M, Cout),
                                 interpret, tmask, feat_self, center)
            d_feats = _pallas_fwd(lidx, gct,
                                  w_rev_t.reshape(K * Cout, Cin),
                                  feats.dtype, interpret, tmask,
                                  ct_self, center)
        d_w = dw_flat.reshape(K, Cin, Cout).astype(weight.dtype)
        return (d_feats.reshape(-1, Cin), None, None, None, d_w)

    f.defvjp(fwd, bwd)
    return f


def _under_shard_map(*arrays) -> bool:
    return any(getattr(jax.typeof(a), "vma", None) for a in arrays)


def _dechunked_conv(feats, in_idx, lidx, weight, granule=1, ns=1):
    """Pure-XLA evaluation of a chunk plan (same math as the kernel),
    differentiable by plain autodiff. Used on CPU inside shard_map, where
    jax's pallas HLO interpreter cannot type-check its internal block
    slicing under check_vma (TEST-ONLY path: CPU runs are interpret-mode
    by definition; on TPU the real kernels lower fine)."""
    C, K, M = lidx.shape
    _, Cin, Cout = weight.shape
    gin = _stage(feats, in_idx, granule, ns)               # [C, U, Cin]
    safe = jnp.maximum(lidx, 0)                            # [C, K, M]
    gin_b = jnp.broadcast_to(gin[:, None],
                             (C, K) + gin.shape[1:])
    g = jnp.take_along_axis(gin_b, safe[..., None], axis=2)
    g = jnp.where((lidx >= 0)[..., None], g, 0)
    out = jnp.einsum("ckmi,kio->cmo", g.astype(jnp.float32),
                     weight.astype(jnp.float32))
    return out.reshape(C * M, Cout).astype(feats.dtype)


def _tiles_enabled() -> bool:
    # default OFF until the nested pl.when lowering is validated on
    # silicon (the tunnel was down when this landed); OCC_TILE_SKIP=1
    # enables the tile-skipping kernels. CPU equality (values and grads,
    # bit-exact) is pinned by tests/test_chunk_conv.py.
    import os
    return os.environ.get("OCC_TILE_SKIP", "0") == "1"


def _center_enabled() -> bool:
    # identity-center tap (ChunkPlan.center_k): default OFF — the r5
    # silicon A/B measured it a REGRESSION (backbone 172.6 -> 169.8 ms,
    # flagship 184.3 -> 181.5 ms with the tap disabled): the masked
    # per-chunk VMEM copy + the pl.when control around the skipped center
    # product cost more than the 1/27 one-hot FLOPs it saves (same
    # pattern as tile-skip, r4). Machinery kept, CPU-pinned bit-exact
    # (tests/test_chunk_conv.py); OCC_CENTER_TAP=1 re-enables for A/Bs.
    import os
    return os.environ.get("OCC_CENTER_TAP", "0") == "1"


def _scene_split_enabled() -> bool:
    # blocked-batch scene split: run staging + kernel once PER SCENE on
    # static slices instead of one ns-scene dispatch. Each scene's
    # slice->stage->kernel chain is then an independent subgraph whose
    # buffers are single-scene-sized — the structure under which XLA's
    # memory-space assignment VMEM-prefetches staging-gather sources at
    # batch 1 (r5 b4 profile: window gathers from the merged program ran
    # 8.7 GB/s with no S(1) placement vs 0.84 ms for the same shape at
    # b1). Default OFF until A/B'd on silicon (OCC_SCENE_SPLIT=1).
    import os
    return os.environ.get("OCC_SCENE_SPLIT", "0") == "1"


def chunk_gather_conv(feats: jnp.ndarray, in_idx: jnp.ndarray,
                      lidx: jnp.ndarray, weight: jnp.ndarray,
                      granule: int = 1, tmask=None,
                      ns: int = 1, center_k: int = -1) -> jnp.ndarray:
    """out[r] = sum_k feats[nbr[r,k]] @ weight[k] via the chunked one-hot
    kernel. SUBMANIFOLD maps only (cap_in == cap_out and nbr self-transpose
    under offset reversal — the property the backward relies on).

    feats [N, Cin] with N == C*M; weight [K, Cin, Cout]. Returns [N, Cout].
    `tmask` [C, K] int32 (see `tile_mask`) enables one-hot tile skipping;
    OCC_TILE_SKIP=0 disables it for A/B runs. `ns` > 1: blocked batch
    layout, scene-local in_idx staged from per-scene windows (`_stage`).
    `center_k` >= 0: the identity-center tap (ChunkPlan.center_k).
    """
    if _interpret_default() and _under_shard_map(feats, in_idx, lidx,
                                                 weight):
        return _dechunked_conv(feats, in_idx, lidx, weight, granule, ns)
    if not _tiles_enabled():
        tmask = None
    else:
        center_k = -1  # mutually exclusive kernel variants
    if not _center_enabled():
        center_k = -1
    if ns > 1 and _scene_split_enabled():
        Cs = lidx.shape[0] // ns
        scap = feats.shape[0] // ns
        inner = _make_sub_conv(granule, 1, center_k)
        outs = []
        for s in range(ns):
            fs = jax.lax.slice_in_dim(feats, s * scap, (s + 1) * scap)
            ii = jax.lax.slice_in_dim(in_idx, s * Cs, (s + 1) * Cs)
            li = jax.lax.slice_in_dim(lidx, s * Cs, (s + 1) * Cs)
            tm = None if tmask is None else jax.lax.slice_in_dim(
                tmask, s * Cs, (s + 1) * Cs)
            outs.append(inner(fs, ii, li, tm, weight))
        return jnp.concatenate(outs, axis=0)
    return _make_sub_conv(granule, ns, center_k)(feats, in_idx, lidx,
                                                 tmask, weight)


@functools.lru_cache(maxsize=None)
def _make_t_conv(granule: int, t_granule: int, ns: int = 1):
    @jax.custom_vjp
    def f(feats, in_idx, lidx, tmask, t_in_idx, t_lidx, t_tmask, weight):
        return _fwd_impl(feats, in_idx, lidx, weight, granule, tmask=tmask,
                         ns=ns)

    def fwd(feats, in_idx, lidx, tmask, t_in_idx, t_lidx, t_tmask, weight):
        K, Cin, Cout = weight.shape
        Ct, _, Mt = t_lidx.shape
        esize = jnp.dtype(feats.dtype).itemsize
        fused = (Ct * Mt == feats.shape[0]
                 and (_bwd_fused_eligible(K, Mt, Cout, Cin, Cout, esize)
                      or _bwd_fused_v2_grouping(
                          K, Mt, Cout, Cin, t_in_idx.shape[1], esize) > 0))
        if fused:
            out = _fwd_impl(feats, in_idx, lidx, weight, granule,
                            tmask=tmask, ns=ns)
            gin = None
        else:
            out, gin = _fwd_impl(feats, in_idx, lidx, weight, granule,
                                 return_gin=True, tmask=tmask, ns=ns)
        return out, (feats, in_idx, lidx, tmask, t_in_idx, t_lidx, t_tmask,
                     weight, gin)

    def bwd(res, ct):
        (feats, in_idx, lidx, tmask, t_in_idx, t_lidx, t_tmask, weight,
         gin_saved) = res
        K, Cin, Cout = weight.shape
        ctc = ct.astype(feats.dtype)
        C, _, M = lidx.shape
        Ct, _, Mt = t_lidx.shape
        interpret = _interpret_default()
        esize = jnp.dtype(feats.dtype).itemsize

        w_t = jnp.transpose(weight, (0, 2, 1)).astype(feats.dtype)
        gct = _stage(ctc, t_in_idx, t_granule, ns)
        # same-k pairing: Gct_k[i] = ct[t_table[i,k]]; dW[k] = sum_i
        # feats[i] (x) Gct_k[i] — fused with d_feats when VMEM allows
        if Ct * Mt == feats.shape[0] and _bwd_fused_eligible(
                K, Mt, Cout, Cin, Cout, esize):
            with jax.enable_x64(False):
                d_feats, dw_t = _pallas_bwd_fused(
                    t_lidx, gct, w_t.reshape(K * Cout, Cin),
                    feats.reshape(Ct, Mt, Cin), Cin, interpret, t_tmask)
            d_w = jnp.transpose(dw_t.reshape(Cin, K, Cout),
                                (1, 0, 2)).astype(weight.dtype)
            return (d_feats.reshape(-1, Cin), None, None, None, None, None,
                    None, d_w)

        if Ct * Mt == feats.shape[0]:
            G2 = _bwd_fused_v2_grouping(K, Mt, Cout, Cin,
                                        t_in_idx.shape[1], esize)
            if G2:
                with jax.enable_x64(False):
                    d_feats, dw_t = _pallas_bwd_fused_v2(
                        t_lidx, gct, w_t.reshape(K * Cout, Cin),
                        feats.reshape(Ct, Mt, Cin), Cin, G2, interpret,
                        t_tmask)
                d_w = jnp.transpose(dw_t.reshape(Cin, K, Cout),
                                    (1, 0, 2)).astype(weight.dtype)
                return (d_feats.reshape(-1, Cin), None, None, None, None,
                        None, None, d_w)

        gin = gin_saved if gin_saved is not None \
            else _stage(feats, in_idx, granule, ns)
        with jax.enable_x64(False):
            dw_flat = _pallas_dw(lidx, gin, ctc.reshape(C, M, Cout),
                                 interpret, tmask)
            d_feats = _pallas_fwd(t_lidx, gct, w_t.reshape(K * Cout, Cin),
                                  feats.dtype, interpret, t_tmask)
        d_w = dw_flat.reshape(K, Cin, Cout).astype(weight.dtype)
        return (d_feats.reshape(-1, Cin), None, None, None, None, None,
                None, d_w)

    f.defvjp(fwd, bwd)
    return f


def chunk_gather_conv_t(feats: jnp.ndarray, in_idx: jnp.ndarray,
                        lidx: jnp.ndarray, t_in_idx: jnp.ndarray,
                        t_lidx: jnp.ndarray, weight: jnp.ndarray,
                        granule: int = 1, t_granule: int = 1,
                        tmask=None, t_tmask=None,
                        ns: int = 1) -> jnp.ndarray:
    """Chunked conv with an EXPLICIT transpose chunk plan — the general
    (non-submanifold) form used by strided convolution (fwd table = child,
    transpose = up) and deconvolution (fwd = up, transpose = child), where
    input and output row spaces differ. Transpose pairing is same-k:
    fwd_table[r,k] == i  <=>  t_table[i,k] == r (the child/up identity), so
    d_feats[i] = sum_k ct[t_table[i,k]] @ W[k]^T with NO offset reversal.
    `tmask`/`t_tmask` are the two plans' tile-skip bitmasks (`tile_mask`).
    """
    if _interpret_default() and _under_shard_map(feats, in_idx, lidx,
                                                 weight):
        return _dechunked_conv(feats, in_idx, lidx, weight, granule, ns)
    if not _tiles_enabled():
        tmask = t_tmask = None
    if ns > 1 and _scene_split_enabled():
        # per-scene split (see chunk_gather_conv): both the forward map
        # (out chunks <- fine rows) and the transpose map slice scene-major
        Cs = lidx.shape[0] // ns
        Cts = t_lidx.shape[0] // ns
        scap = feats.shape[0] // ns
        inner = _make_t_conv(granule, t_granule, 1)

        def sl(a, s, cs):
            return None if a is None else jax.lax.slice_in_dim(
                a, s * cs, (s + 1) * cs)

        outs = []
        for s in range(ns):
            outs.append(inner(
                jax.lax.slice_in_dim(feats, s * scap, (s + 1) * scap),
                sl(in_idx, s, Cs), sl(lidx, s, Cs), sl(tmask, s, Cs),
                sl(t_in_idx, s, Cts), sl(t_lidx, s, Cts),
                sl(t_tmask, s, Cts), weight))
        return jnp.concatenate(outs, axis=0)
    return _make_t_conv(granule, t_granule, ns)(feats, in_idx, lidx, tmask,
                                                t_in_idx, t_lidx, t_tmask,
                                                weight)


def supported(cap: int, cin: int, cout: int, M: int = DEFAULT_M) -> bool:
    """Shape eligibility for the chunked kernel. Small/odd Cin is fine —
    the module zero-pads channels to 8 (the first conv is 3->m and was the
    single most expensive op on the XLA path: ~60ms/step of 316, exp_r2_f).
    """
    return cap % M == 0 and cout % 8 == 0 and cout >= 32


# ---------------------------------------------------------------------------
# Host-side chunk planning (NumPy; runs in the loader thread)
# ---------------------------------------------------------------------------

def build_chunk_arrays(nbr: np.ndarray, M: int = DEFAULT_M,
                       U: int = DEFAULT_U, granule: int = 1,
                       with_mask: bool = False
                       ) -> Optional[Tuple[np.ndarray, ...]]:
    """Per-chunk deduped input lists + local indices for a neighbor map.

    nbr [cap, K] int32 (-1 missing, pad rows all -1). Returns
    (in_idx [C, U] int32, lidx [C, K, M] int32) — plus the tile-skip
    bitmask tmask [C, K] int32 when `with_mask` — or None if any chunk
    references more than U unique rows (caller falls back to the XLA
    path). The GPU analog is the chunk input-address dedup of
    `SubmanifoldRules_cuda.cpp:274+` with its MAX_INPUT_ADDRESS cap.

    Uses the C++ host runtime when available (OpenMP over chunks,
    `csrc/native.cpp::plan_chunks`, which emits the mask in the same
    pass); else a vectorized NumPy path (one row-wise sort + one
    searchsorted over the level) — the naive per-chunk python loop cost
    ~3s/batch at production caps, which would out-run the 0.3s device
    step it feeds.
    """
    cap, K = nbr.shape
    if cap % M != 0:
        return None
    C = cap // M

    if granule == 1:
        from occuseg_tpu.native import plan_chunks_native
        native = plan_chunks_native(nbr, M, U, tile=TILE if with_mask
                                    else 0)
        if native is not None:
            return native if native[0] is not None else None

    # with granule g, dedup over GRANULE ids; each granule takes g staged
    # slots, so capacity is U // g granules
    lg = granule.bit_length() - 1
    assert (1 << lg) == granule, "granule must be a power of two"
    rows3 = np.where(nbr >= 0, nbr >> lg, -1).reshape(C, M, K)

    # per-chunk sorted refs: -1 padding sorts first
    s = np.sort(rows3.reshape(C, M * K), axis=1)
    first_of_run = np.ones((C, M * K), bool)
    first_of_run[:, 1:] = s[:, 1:] != s[:, :-1]
    new = first_of_run & (s >= 0)
    counts = new.sum(axis=1)
    if counts.max(initial=0) > U // granule:
        return None

    # flat (chunk-major) unique ref list; keys c*cap+ref strictly increase
    all_refs = s[new].astype(np.int64)
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    chunk_of = np.repeat(np.arange(C, dtype=np.int64), counts)
    all_keys = chunk_of * cap + all_refs

    in_idx = np.full((C, U // granule), -1, np.int32)
    within = np.arange(all_refs.size, dtype=np.int64) - starts[chunk_of]
    in_idx[chunk_of, within] = all_refs.astype(np.int32)

    valid = rows3 >= 0
    qk = (np.arange(C, dtype=np.int64)[:, None, None] * cap
          + np.where(valid, rows3, 0))
    pos = np.searchsorted(all_keys, qk.reshape(-1)).reshape(C, M, K)
    local = (pos - starts[:C, None, None]) * granule
    if granule > 1:
        local = local + np.where(nbr >= 0, nbr & (granule - 1),
                                 0).reshape(C, M, K)
    lidx = np.where(valid, local, -1).astype(np.int32)
    lidx_km = np.ascontiguousarray(lidx.transpose(0, 2, 1))
    if with_mask:
        return in_idx, lidx_km, tile_mask(lidx_km)
    return in_idx, lidx_km


def tile_mask(lidx: np.ndarray) -> np.ndarray:
    """[C, K] int32 bitmask from a [C, K, M] lidx: bit t set iff offset k
    references any staged slot in column tile [t*TILE, (t+1)*TILE). Host
    NumPy, one vectorized pass (the shift count is bounded by U/TILE <= 8
    for every U table in use, so int32 is ample)."""
    bits = np.where(lidx >= 0,
                    np.int32(1) << (lidx // TILE).astype(np.int32),
                    np.int32(0))
    return np.bitwise_or.reduce(bits, axis=2).astype(np.int32)


def _identity_center(table: np.ndarray) -> int:
    """Offset column that is the identity map (the center of a submanifold
    kernel: nbr[r, K//2] == r), or -1. Only the K//2 column is tested —
    rotations fix the center, so even the normal-guided ORIENT_PERM plans
    keep it there. Rows where the column is -1 are fine either way: the
    kernel's copy path masks on lidx >= 0, matching the one-hot's zero row
    bit-for-bit."""
    cap, K = table.shape
    if K % 2 == 0:
        return -1
    c = K // 2
    col = table[:, c]
    valid = col >= 0
    rows = np.arange(cap, dtype=np.int64)
    return c if bool(np.all(col[valid] == rows[valid])) else -1


def _chunk_or_none(table: np.ndarray, M: int, u: int, granule: int = 1,
                   ns: int = 1, val_scap: int = None):
    """ChunkPlan for a host map, or None on overflow.

    ns > 1 (blocked batch layout): `table` is ns equal row blocks whose
    VALUES index ns equal blocks of `val_scap` rows in the map's source
    space (nbr: val_scap == rows/ns; child: the fine level's per-scene
    cap; up: the coarse level's). Each scene's block is localized
    (values -= s*val_scap) and planned independently at the SAME U so the
    concatenated arrays keep one static shape; in_idx stays scene-local
    for `_stage`'s window gathers."""
    if table.shape[0] % M != 0:
        return None
    center_k = _identity_center(table)
    if ns == 1:
        arrs = build_chunk_arrays(table, M, u, granule, with_mask=True)
        if arrs is None:
            return None
        tm = arrs[2] if len(arrs) > 2 else tile_mask(arrs[1])
        return ChunkPlan(in_idx=arrs[0], lidx=arrs[1], granule=granule,
                         tmask=tm, center_k=center_k)
    rcap = table.shape[0] // ns
    if rcap % M != 0:
        return None
    parts = []
    for s in range(ns):
        sub = table[s * rcap:(s + 1) * rcap]
        sub = np.where(sub >= 0, sub - s * val_scap, -1).astype(np.int32)
        arrs = build_chunk_arrays(sub, M, u, granule, with_mask=True)
        if arrs is None:
            return None
        parts.append(arrs)
    in_idx = np.concatenate([p[0] for p in parts])
    lidx = np.concatenate([p[1] for p in parts])
    tm = np.concatenate([p[2] if len(p) > 2 else tile_mask(p[1])
                         for p in parts])
    return ChunkPlan(in_idx=in_idx, lidx=lidx, granule=granule, tmask=tm,
                     ns=ns, center_k=center_k)


def augment_plan_with_chunks(plan, M: int = DEFAULT_M, U=None,
                             U_child=None, U_up: int = None,
                             granule: int = 1, u_bump: int = 0,
                             tiers=(1.0, 1.3, 1.7), M_trans: int = None):
    """Attach ChunkPlans to every eligible level AND transition of a
    host-built Topology (NumPy leaves). Maps that overflow their U keep
    chunks=None (XLA path).

    `U` may be an int or a per-level sequence. One-hot FLOPs and staging
    traffic both scale with U, so the defaults hug the measured per-level
    maxima (exp_r2_c at M=128: submanifold 231/287/321/325/317/260;
    transition child/up bounded by the M=256 numbers) with ~25% margin.
    A level that overflows its U falls back to the XLA path for that batch
    — safe, just slower. IMPORTANT: U is part of the jitted step's static
    shapes — it must come from these static tables, never from the batch at
    hand, or every batch recompiles.

    Escalation (dense scenes: the tables hug ONE scene's chunk-halo
    maxima; exp_r3_host_pool saw other seeds overflow L0-L2):
    1. PER-LEVEL: a submanifold level that overflows its budget retries
       with ITS U scaled by 1.3, other levels untouched — the one-hot
       FLOPs scale with U, so a whole-plan bump taxed dense seeds ~12%
       while per-level escalation only pays where the scene is dense
       (6-seed sweep: only L0-L2 ever overflow, one or two per seed).
       Each distinct factor combo is one static shape set (jit caches
       one executable each; in practice a handful).
    2. `tiers` fallback when a TRANSITION overflows or per-level 1.3 is
       not enough: uniform (or (f_sub, f_child, f_up) grouped) whole-plan
       scale, last tier warns and leaves overflowing maps on the ~2.5x
       XLA path rather than failing."""
    global LAST_TIER
    import logging
    import os
    logger = logging.getLogger("occuseg_tpu")
    if M_trans is None:
        M_trans = int(os.environ.get("OCC_TRANS_M", 0) or 0) or M

    # per-level escalation over the submanifold tables
    n_lvl = len(plan.levels)
    factors = [1.0] * n_lvl
    for _ in range(n_lvl + 1):
        out, over_l, over_t = _augment_once(
            plan, M, U, U_child, U_up, granule, u_bump,
            (tuple(factors), 1.0, 1.0), warn=False, M_trans=M_trans)
        if out is not None:
            lbl = ",".join(f"L{li}x{f:.2f}" for li, f in enumerate(factors)
                           if f != 1.0)
            LAST_TIER = lbl or 1.0
            if lbl:
                logger.info("chunk plan used per-level U tier %s", lbl)
            return out
        fresh = [li for li in over_l if factors[li] == 1.0]
        if over_t or not fresh:
            break  # a transition overflowed, or 1.3 was not enough
        for li in fresh:
            factors[li] = 1.3

    for f in tiers[1:-1]:
        out, _, _ = _augment_once(plan, M, U, U_child, U_up, granule,
                                  u_bump, f, warn=False, M_trans=M_trans)
        if out is not None:
            LAST_TIER = _tier_label(f)
            logger.info("chunk plan used U tier %s", LAST_TIER)
            return out
    out, _, _ = _augment_once(plan, M, U, U_child, U_up, granule, u_bump,
                              tiers[-1], warn=True, M_trans=M_trans)
    LAST_TIER = _tier_label(tiers[-1])
    logger.info("chunk plan used U tier %s (last)", LAST_TIER)
    return out


# Tier chosen by the most recent augment_plan_with_chunks call (a float,
# or "sub<f>/ch<f>/up<f>" for per-group tiers) — diagnostics only
# (bench/seed-sweep reporting), never read by compute.
LAST_TIER = 1.0


def _tier3(f):
    """Normalize a tier spec (float, or (f_lvl, f_child, f_up))."""
    return (f, f, f) if isinstance(f, (int, float)) else tuple(f)


def _tier_label(f):
    if isinstance(f, (int, float)):
        return float(f)
    return "sub%.2f/ch%.2f/up%.2f" % _tier3(f)


def _scale1(u: int, f: float) -> int:
    return u if f == 1.0 else -(-int(u * f) // 32) * 32


def _scale_u(u, f):
    if isinstance(u, int):
        return _scale1(u, f)
    return tuple(_scale1(x, f) for x in u)


def _augment_once(plan, M, U, U_child, U_up, granule, u_bump, tier_f,
                  warn, M_trans=None):
    """One escalation attempt. tier_f is a float, or a (f_sub, f_child,
    f_up) triple where f_sub may itself be a per-level factor tuple.
    Returns (plan_or_None, overflowed_levels, overflowed_transitions):
    plan is None when an M-aligned map overflowed and warn=False (the
    caller escalates using the overflow sets); with warn=True always
    returns a plan (overflowing maps keep chunks=None -> XLA path).

    M_trans: chunk geometry for the TRANSITION maps only. K=8 transitions
    do ~4x less per-step work than K=27 submanifold convs, so at M=128
    the per-grid-step overhead (~0.7us) dominates them; a larger M_trans
    halves the step count while the one-hot FLOPs stay constant
    (U_child/U_up scale with M)."""
    if M_trans is None:
        M_trans = M
    if U is None:
        # TIGHT: one-hot FLOPs scale with U and dominate the kernels —
        # measured +15% U cost +36 ms/step. Measured maxima at M=128:
        # 231/287/321/325/317/260; a level that overflows just falls back.
        U = ((256, 320, 384, 384, 384, 320) if M == 128
             else (512, 512, 640, 640, 640, 640))
    if U_child is None:
        # measured child maxima at M=128: 346/489/617/672/662
        U_child = ((416, 576, 704, 768, 768) if M_trans == 128
                   else (768, 1152, 1408, 1536, 1408))
    if U_up is None:
        # measured up maxima at M=128: 122/90/55/41/36
        U_up = 160 if M_trans == 128 else 384

    def _bumped(u):
        return u + u_bump if isinstance(u, int) \
            else tuple(x + u_bump for x in u)

    if u_bump:
        # multi-scene batches: chunks spanning scene boundaries mix two
        # scenes' refs (measured +15% max uniq at batch 4 — L0/L1 overflow
        # without this, and an XLA fallback at 4x table size is ruinous)
        U, U_child, U_up = _bumped(U), _bumped(U_child), _bumped(U_up)
    f_lvl, f_child, f_up = _tier3(tier_f)
    U_child, U_up = _scale_u(U_child, f_child), _scale_u(U_up, f_up)
    import logging
    logger = logging.getLogger("occuseg_tpu")
    # blocked batch layout (native/blocked.py): num_active is an [ns]
    # vector of per-scene counts — plan each scene's chunks separately
    # (scene-local in_idx, window staging) at a shared U
    na0 = np.asarray(plan.levels[0].num_active)
    ns = 1 if na0.ndim == 0 else int(na0.shape[0])
    over_l, over_t = [], []
    new_levels = []
    for li, lvl in enumerate(plan.levels):
        u = U if isinstance(U, int) else U[min(li, len(U) - 1)]
        fl = f_lvl if isinstance(f_lvl, (int, float)) \
            else f_lvl[min(li, len(f_lvl) - 1)]
        u = _scale1(u, fl)
        # granule: int (all levels) or per-level sequence — staging
        # gathers read g-row granules (g*Cin*esize bytes per transaction;
        # pays at the narrow shallow levels where rows are 128-256B),
        # while granule dedup inflates per-chunk slots ~25-40% (measured
        # g=2 maxima 288/362/426/424/446/322 vs 231/287/321/325/317/260)
        g = granule if isinstance(granule, int) \
            else granule[min(li, len(granule) - 1)]
        if g > 1:
            u = -(-int(u * 1.3) // g) * g
        nbr = np.asarray(lvl.nbr)
        chunks = _chunk_or_none(nbr, M, u, g, ns,
                                nbr.shape[0] // ns)
        # overflow vs misalignment: only classify as OVERFLOW (retriable
        # with a bigger U) when the geometry was actually eligible — a
        # misaligned cap (incl. the per-scene rcap under the blocked
        # layout) must not burn the escalation ladder
        aligned = (nbr.shape[0] % M == 0
                   and (nbr.shape[0] // ns) % M == 0)
        if chunks is None and aligned:
            over_l.append(li)
            if warn:
                logger.warning(
                    "chunk plan overflow at level %d (U=%d, tier %s) — "
                    "falling back to the XLA conv path for this batch",
                    li, u, _tier_label(tier_f))
        new_levels.append(dataclasses.replace(lvl, chunks=chunks))
    new_transitions = []
    for ti, tr in enumerate(plan.transitions):
        uc = U_child if isinstance(U_child, int) \
            else U_child[min(ti, len(U_child) - 1)]
        fine_scap = np.asarray(tr.up).shape[0] // ns
        coarse_scap = np.asarray(tr.child).shape[0] // ns
        child_chunks = _chunk_or_none(np.asarray(tr.child), M_trans, uc,
                                      1, ns, fine_scap)
        up_chunks = _chunk_or_none(np.asarray(tr.up), M_trans, U_up,
                                   1, ns, coarse_scap)
        # the general-form VJP needs BOTH directions' plans
        if child_chunks is None or up_chunks is None:
            # alignment test at the TRANSITION geometry (M_trans, and the
            # per-scene rcap under the blocked layout): a misaligned table
            # is not an overflow and must not trigger U escalation
            def _al(n):
                return n % M_trans == 0 and (n // ns) % M_trans == 0
            if ((child_chunks is None
                 and _al(np.asarray(tr.child).shape[0]))
                    or (up_chunks is None
                        and _al(np.asarray(tr.up).shape[0]))):
                over_t.append(ti)
            child_chunks = up_chunks = None
        new_transitions.append(dataclasses.replace(
            tr, child_chunks=child_chunks, up_chunks=up_chunks))
    if (over_l or over_t) and not warn:
        return None, over_l, over_t
    return dataclasses.replace(plan, levels=tuple(new_levels),
                               transitions=tuple(new_transitions)), \
        over_l, over_t
