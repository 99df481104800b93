"""Voxel-axis (spatial) sharding with halo exchange — the point-cloud
analog of context/sequence parallelism (SURVEY.md §2.5, §5.7).

One giant scene's voxels, in Morton row order, are split into D contiguous
shards. A submanifold convolution's neighbor rows then fall either in the
local shard or (because Morton keeps spatial neighbors close in row order)
in a bounded HALO of rows adjacent to the shard boundary. The schedule:

  1. plan time (host): for each shard, compute the halo — the set of
     non-local rows referenced by its neighbor map — capped at H rows per
     side, and remap the shard's nbr entries into [local | left-halo |
     right-halo] index space;
  2. step time (device, shard_map over the 'space' axis): `ppermute` the
     boundary feature rows to neighbors, concatenate [feats, halo], run the
     ordinary gather-conv on the extended array.

This keeps one scene's memory and gather work split across chips with only
boundary-row ICI traffic per layer — the reference has no analog (its
answer to oversized scenes is cropping, `scannet.py:129-135`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SPACE_AXIS = "space"


@dataclasses.dataclass(frozen=True)
class ShardedLevel:
    """Per-shard arrays, all with leading shard axis D (host-built).

    nbr_local values index the extended feature array
    [0, S) local | [S, S+H) left halo | [S+H, S+2H) right halo; -1 missing.
    send_left/send_right list local rows each shard ships to its neighbors
    (padded with -1; receivers see them as their right/left halo).
    """

    nbr_local: np.ndarray    # [D, S, K] int32
    send_left: np.ndarray    # [D, H] int32 rows sent to shard d-1
    send_right: np.ndarray   # [D, H] int32 rows sent to shard d+1
    shard_rows: np.ndarray   # [D, S] int32 global row of each local slot
    num_shards: int = 0
    halo: int = 0


def shard_level(nbr: np.ndarray, num_active: int, num_shards: int,
                halo: int) -> ShardedLevel:
    """Host-side shard planner for one level's neighbor map.

    Splits rows [0, cap) into D contiguous chunks of S = cap/D. For each
    shard, neighbor entries pointing into the previous/next shard are
    remapped into halo slots; entries farther than one shard away or beyond
    the halo budget are dropped (counted; enlarge `halo` if nonzero —
    Morton order keeps p99 spans small, see CLAUDE.md).
    """
    cap, K = nbr.shape
    assert cap % num_shards == 0
    S = cap // num_shards
    nbr_local = np.full((num_shards, S, K), -1, np.int32)
    send_left = np.full((num_shards, halo), -1, np.int32)
    send_right = np.full((num_shards, halo), -1, np.int32)
    shard_rows = np.stack([np.arange(S) + d * S
                           for d in range(num_shards)]).astype(np.int32)
    dropped = 0
    for d in range(num_shards):
        lo, hi = d * S, (d + 1) * S
        blk = nbr[lo:hi]
        # left halo: rows this shard needs from shard d-1
        left_need = np.unique(blk[(blk >= 0) & (blk < lo)])
        left_need = left_need[left_need >= lo - S]  # only adjacent shard
        right_need = np.unique(blk[blk >= hi])
        right_need = right_need[right_need < hi + S]
        if left_need.size > halo or right_need.size > halo:
            # keep the rows closest to the boundary
            left_keep = left_need[-halo:] if left_need.size > halo \
                else left_need
            right_keep = right_need[:halo] if right_need.size > halo \
                else right_need
        else:
            left_keep, right_keep = left_need, right_need
        lmap = {int(r): S + i for i, r in enumerate(left_keep)}
        rmap = {int(r): S + halo + i for i, r in enumerate(right_keep)}
        if d > 0:
            send_right[d - 1, :left_keep.size] = left_keep - (lo - S)
        if d + 1 < num_shards:
            send_left[d + 1, :right_keep.size] = right_keep - hi
        out = np.full((S, K), -1, np.int32)
        for s in range(S):
            for k in range(K):
                g = blk[s, k]
                if g < 0:
                    continue
                if lo <= g < hi:
                    out[s, k] = g - lo
                elif g in lmap:
                    out[s, k] = lmap[g]
                elif g in rmap:
                    out[s, k] = rmap[g]
                else:
                    dropped += 1
        nbr_local[d] = out
    if dropped:
        import logging
        logging.getLogger("occuseg_tpu").warning(
            "spatial sharding dropped %d neighbor refs (halo=%d too small "
            "or refs beyond +-1 shard) — increase halo or use fewer shards",
            dropped, halo)
    sh = ShardedLevel(nbr_local=nbr_local, send_left=send_left,
                      send_right=send_right, shard_rows=shard_rows,
                      num_shards=num_shards, halo=halo)
    return sh, dropped


def halo_exchange(feats: jnp.ndarray, send_left: jnp.ndarray,
                  send_right: jnp.ndarray, halo: int,
                  axis_name: str = SPACE_AXIS) -> jnp.ndarray:
    """Inside shard_map: extend local feats [S, C] with left/right halos
    received over ICI. Returns [S + 2H, C]."""
    n = jax.lax.psum(1, axis_name)
    safe_l = jnp.where(send_left < 0, 0, send_left)
    safe_r = jnp.where(send_right < 0, 0, send_right)
    pack_left = jnp.where((send_left >= 0)[:, None], feats[safe_l], 0)
    pack_right = jnp.where((send_right >= 0)[:, None], feats[safe_r], 0)
    # rows I send LEFT arrive at my left neighbor as its RIGHT halo
    right_halo = jax.lax.ppermute(
        pack_left, axis_name, [(i, (i - 1) % n) for i in range(n)])
    left_halo = jax.lax.ppermute(
        pack_right, axis_name, [(i, (i + 1) % n) for i in range(n)])
    return jnp.concatenate([feats, left_halo, right_halo], axis=0)


def sharded_gather_conv(feats: jnp.ndarray, sharded: "jnp.ndarray tuple",
                        weight: jnp.ndarray,
                        axis_name: str = SPACE_AXIS) -> jnp.ndarray:
    """Submanifold conv over spatially-sharded features (call inside
    shard_map with per-shard slices of a ShardedLevel)."""
    from occuseg_tpu.ops.conv import gather_conv_fused

    nbr_local, send_left, send_right, halo = sharded
    ext = halo_exchange(feats, send_left, send_right, halo, axis_name)
    return gather_conv_fused(ext, nbr_local, weight)
