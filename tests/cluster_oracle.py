"""Test-only NumPy oracle for the reference clustering cascade.

Independent re-derivation (like `tests/torch_oracle.py` is for the net) of

* `occupancy_aware_region_based_cross_modal_meanshift_clustering`
  (`/root/reference/examples/ScanNet/evaluate_instance.py:485-645`): greedy
  seed selection by max remaining region offset (:542), a seeded first
  mean-shift iteration (:545-551) followed by 10 refinement iterations with
  the bandwidth re-estimated from the current member set, breaking when the
  centroid shift drops below 1e-5 (:552-565), then instance assignment and
  background/offset clearing (:617-645).
* `merge` (`evaluate_instance.py:162-233`): greedy agglomeration of
  clusters by cross-modal similarity of gaussian-weighted cluster centers
  divided by the pair's occupancy ratio, gated by
  occupancy_ratio_x + occupancy_ratio_y < 2 (:194-196), until the best
  remaining similarity falls to <= 0.5.

Both operate on REGION-LEVEL arrays (the per-point -> per-region
aggregation is `cluster/supervoxel.aggregate_regions`, pinned separately);
parity tests feed identical region inputs to this oracle and to
`cluster/meanshift.meanshift_cluster` / `cluster/merge.occupancy_merge`
and assert identical instance partitions.

Documented deviations from the reference's LITERAL code (each is an
unreachable-or-crashing artifact of the original, not a semantic choice):

1. merge (:174): `torch.LongTensor(region_point_num[sv_groups[i]])` indexes
   the stats arrays with POINT COUNTS instead of the group's region list —
   the in-loop re-merge path (:205) uses the group list; the oracle uses
   the group list everywhere.
2. merge (:166,:228): `valid_center_index = torch.zeros(...)` (float) is
   later `~`-negated, which raises on float tensors in any released torch —
   the sibling variant (:307-308) initializes all-True validity; the oracle
   does the same.
3. merge: the initial similarity map never masks the diagonal, so a
   cluster can "merge with itself" and be destroyed (`sv_groups[y] +=
   sv_groups[x]` with x == y then `sv_groups[x] = [-1]`); the sibling
   variant (:288) masks the diagonal — the oracle masks it.
4. clustering: if the final member set of an instance excludes its own
   seed, the reference re-selects the SAME seed forever (offsets are only
   cleared for members, :640-644). The oracle (and the device
   implementation) consume the seed after every instance so the loop
   terminates; the parity tests count how often this guard fires.
"""

from __future__ import annotations

import numpy as np

BW_RELAX = 1.0


def _cross_modal_prob(emb, pose, c_emb, c_pose, b1, b2):
    """`cross_modal_gaussian` (:155-160): learned bandwidths MULTIPLY the
    modal distances."""
    d1 = np.linalg.norm(emb - c_emb, axis=1) * b1
    d2 = np.linalg.norm(pose - c_pose, axis=1) * b2
    return np.exp(-d1 * d1 - d2 * d2)


def _gaussian(d, bw):
    """`gaussian` (:117): normalized gaussian kernel."""
    return np.exp(-0.5 * (d / bw) ** 2) / (bw * np.sqrt(2 * np.pi))


def meanshift_oracle(offset, emb, pose, bw, count, semantic, valid=None,
                     bw_relax_factor=BW_RELAX, max_instances=300,
                     foreground_class_threshold=2):
    """Region-level port of the clustering loop (:531-645).

    Returns (region_labels [R] int32 with -1 = background/unassigned,
    seed_guard_fires int). Labels are 1-based like the reference
    (`instance_count` pre-increments, :607); parity tests compare
    partitions, not numbering.
    """
    offset = np.asarray(offset, np.float32).copy()
    emb = np.asarray(emb, np.float32)
    pose = np.asarray(pose, np.float32)
    bw = np.asarray(bw, np.float32)
    count = np.asarray(count, np.float32)
    R = offset.shape[0]
    if valid is None:
        valid = np.ones(R, bool)
    feat = np.concatenate([emb, pose], axis=1)

    # :533-539 — wall/floor (class < 2) regions leave the background set
    background = np.asarray(valid, bool) & (
        np.asarray(semantic) >= foreground_class_threshold)
    offsets = np.where(background, offset, 0.0)
    labels = np.full(R, -1, np.int32)
    instance_count = 0
    guard_fires = 0

    def ms_step(c, b, bg):
        prob = _cross_modal_prob(emb, pose, c[: emb.shape[1]],
                                 c[emb.shape[1]:], b[0], b[1])
        flag = (prob > 0.5) & bg
        if not flag.any():
            return flag, c  # degenerate: keep the centroid (device guard)
        d = np.linalg.norm(feat - c, axis=1)
        w = _gaussian(d, max(b.mean(), 1e-8)) * count
        w = np.where(flag, w, 0.0)
        new_c = (feat * w[:, None]).sum(0) / max(w.sum(), 1e-12)
        return flag, new_c

    # :540 while: count < 300 and any background left
    while instance_count < max_instances and background.any():
        seed = int(np.argmax(offsets))
        # first iteration (:543-551): centroid = the seed region's feature,
        # bandwidth = the seed's learned bw * relax
        b = bw[seed] * bw_relax_factor
        flag, c = ms_step(feat[seed], b, background)
        for _ in range(10):  # :552 `for k in range(10)`
            pre_c = c
            if flag.any():  # :554 bandwidth from the current member set
                b = bw[flag].mean(axis=0) * bw_relax_factor
            flag, c = ms_step(pre_c, b, background)
            if np.linalg.norm(pre_c - c) < 1e-5:  # :563-565 break
                break
        instance_count += 1  # :636; minimum_instance_size = 0 (:489)
        if flag.sum() > 0:
            labels[flag] = instance_count
        background[flag] = False  # :617
        offsets[flag] = 0.0       # :618
        if background[seed]:      # deviation 4: termination guard
            guard_fires += 1
        background[seed] = False
        offsets[seed] = 0.0
    return labels, guard_fires


def _gaussian_weighted_mean(values, bwidth, counts):
    """`gaussian_weighted_mean` (:135-142): mean-centered gaussian weights
    (bandwidth doubled) times region point counts."""
    c = values.mean(axis=0)
    d = np.linalg.norm(values - c, axis=1)
    w = _gaussian(d, max(bwidth * 2, 1e-8)) * counts
    return (values * w[:, None]).sum(0) / max(w.sum(), 1e-12)


def merge_oracle(cluster_of_region, region_embedding, region_pose,
                 region_bw, region_count, region_occupancy,
                 bw_relax_factor=BW_RELAX, similarity_threshold=0.5):
    """Port of `merge` (:162-233) over clusters-of-regions.

    cluster_of_region: [R] int, -1 = background. Returns the merged
    cluster id per region (surviving groups keep the absorber's id, the
    reference's `sv_groups[similar_y] += sv_groups[similar_x]`).
    """
    cluster_of_region = np.asarray(cluster_of_region)
    emb = np.asarray(region_embedding, np.float64)
    pos = np.asarray(region_pose, np.float64)
    bw = np.asarray(region_bw, np.float64)
    cnt = np.asarray(region_count, np.float64)
    occ = np.asarray(region_occupancy, np.float64)

    cids = [c for c in np.unique(cluster_of_region) if c >= 0]
    n = len(cids)
    if n <= 1:
        return cluster_of_region.copy()
    groups = [list(np.where(cluster_of_region == c)[0]) for c in cids]
    alive = np.ones(n, bool)

    # per-cluster stats (:174-185, using the group list — deviation 1)
    def stats(regs):
        regs = np.asarray(regs)
        ptn = cnt[regs].sum()
        ocup = occ[regs].mean()
        bwm = bw[regs].mean(axis=0)
        ce = _gaussian_weighted_mean(emb[regs], bwm[0], cnt[regs])
        cp = _gaussian_weighted_mean(pos[regs], bwm[1], cnt[regs])
        return ptn, ocup, bwm, ce, cp

    region_ptn = np.zeros(n)
    region_ocup = np.zeros(n)
    bandwidth = np.zeros((n, bw.shape[1]))
    pred_centers = np.zeros((n, emb.shape[1]))
    pose_centers = np.zeros((n, pos.shape[1]))
    for i in range(n):
        (region_ptn[i], region_ocup[i], bandwidth[i], pred_centers[i],
         pose_centers[i]) = stats(groups[i])

    def row_prob(i):
        """Similarity of cluster i against every cluster (:186-192): the
        occupancy ratio divides by exp(occ) of the OTHER (column) cluster,
        clamped at 0.5."""
        ds = np.linalg.norm(pred_centers[i] - pred_centers, axis=1)
        dp = np.linalg.norm(pose_centers[i] - pose_centers, axis=1)
        tot = region_ptn[i] + region_ptn
        bw1 = (bandwidth[i, 0] * region_ptn[i]
               + bandwidth[:, 0] * region_ptn) / tot
        bw2 = (bandwidth[i, 1] * region_ptn[i]
               + bandwidth[:, 1] * region_ptn) / tot
        d1 = ds * bw1 * bw_relax_factor
        d2 = dp * bw2 * bw_relax_factor
        ratio = np.maximum(tot / np.exp(region_ocup), 0.5)
        return np.exp(-d1 * d1 - d2 * d2) / ratio

    sim = np.full((n, n), -1.0)
    for i in range(n):
        sim[i, :] = row_prob(i)
        sim[i, i] = -1.0  # deviation 3

    while True:
        flat = int(np.argmax(sim))  # torch.argmax: first max, row-major
        i, j = divmod(flat, n)
        if sim[i, j] <= similarity_threshold:  # :187 while > 0.5
            break
        x, y = max(i, j), min(i, j)  # :193-194 absorber = smaller index
        # :194-196 merge gate — the groups' (unclamped) occupancy ratios
        rx = cnt[np.asarray(groups[x])].sum() \
            / np.exp(occ[np.asarray(groups[x])].mean())
        ry = cnt[np.asarray(groups[y])].sum() \
            / np.exp(occ[np.asarray(groups[y])].mean())
        if rx + ry < 2.0:
            # :199-204 absorb x into y (min(group x) == x: only the pair
            # minimum ever absorbs, so a group's smallest index is itself)
            sim[x, :] = -1.0
            sim[:, x] = -1.0
            groups[y] = groups[y] + groups[x]
            groups[x] = []
            alive[x] = False
            # :207-214 refresh y's stats from the merged member list
            (region_ptn[y], region_ocup[y], bandwidth[y], pred_centers[y],
             pose_centers[y]) = stats(groups[y])
            # :216-228 recompute row/col y (both directions get ROW-y's
            # prob, i.e. the occupancy of the column cluster), mask dead
            prob = row_prob(y)
            sim[y, :] = prob
            sim[:, y] = prob
            sim[~alive, y] = -1.0
            sim[y, ~alive] = -1.0
            sim[y, y] = -1.0
        else:
            sim[i, j] = -1.0  # :230 just retire this pair

    out = np.full_like(cluster_of_region, -1)
    for k in range(n):
        if alive[k]:
            out[np.asarray(groups[k], dtype=int)] = cids[k]
    return out
