"""Proposal filtering + instance precision/recall protocol.

Reference: `evaluate_instance.py:1420-1436` (filter: majority class, size >
outlier_ratio * class volumetric size, occupancy ratio in (0.3, 3)) and
`:1486-1529`, `:1703-1741` (greedy IoU matching at 0.25/0.5; reported
"mAP"/"mRecall" are precision tp/(tp+fp) and recall tp/total averaged over
classes with finite values). NumPy metric code, like the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# verbatim `sizes_scannet.txt` (consumed at `evaluate_instance.py:1333`):
# per-class typical instance point counts used for the min-size filter.
DEFAULT_CLASS_SIZES = np.array([
    6103, 28161, 3763, 11300, 2335, 8142, 4225, 3427, 4912, 14615,
    934, 4261, 5159, 9811, 3917, 5650, 1960, 1046, 3108, 3089,
], np.float32)


def filter_proposals(point_instance: np.ndarray, semantic_pred: np.ndarray,
                     occupancy_pred: np.ndarray,
                     class_sizes: Optional[np.ndarray] = None,
                     occupancy_lo: float = 0.3, occupancy_hi: float = 3.0,
                     num_classes: int = 20) -> List[List[np.ndarray]]:
    """Per-class lists of boolean point masks that survive the filters."""
    if class_sizes is None:
        class_sizes = DEFAULT_CLASS_SIZES
    proposals: List[List[np.ndarray]] = [[] for _ in range(num_classes)]
    occ = occupancy_pred.reshape(-1)
    for gid in np.unique(point_instance):
        if gid < 0:
            continue
        mask = point_instance == gid
        vals, counts = np.unique(semantic_pred[mask], return_counts=True)
        cls = int(vals[np.argmax(counts)])
        if cls < 0 or cls >= num_classes:
            continue
        outlier_ratio = 0.1 if cls == num_classes - 1 else 0.25
        size = int(mask.sum())
        occupancy_ratio = size / np.exp(occ[mask].mean())
        if (size > outlier_ratio * class_sizes[cls]
                and occupancy_lo < occupancy_ratio < occupancy_hi):
            proposals[cls].append(mask)
    return proposals


def gt_instances(point_instance_gt: np.ndarray, semantic_gt: np.ndarray,
                 num_classes: int = 20) -> List[List[np.ndarray]]:
    instances: List[List[np.ndarray]] = [[] for _ in range(num_classes)]
    for gid in np.unique(point_instance_gt):
        if gid < 0:
            continue
        mask = point_instance_gt == gid
        vals, counts = np.unique(semantic_gt[mask], return_counts=True)
        cls = int(vals[np.argmax(counts)])
        if 0 <= cls < num_classes:
            instances[cls].append(mask)
    return instances


def instance_precision_recall(
        all_proposals: Sequence[List[List[np.ndarray]]],
        all_instances: Sequence[List[List[np.ndarray]]],
        iou_threshold: float = 0.5, num_classes: int = 20
) -> Dict[str, float]:
    """Greedy per-proposal best-IoU matching accumulated over scenes."""
    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    total = np.zeros(num_classes)
    for proposals, instances in zip(all_proposals, all_instances):
        for c in range(num_classes):
            total[c] += len(instances[c])
            for u in proposals[c]:
                best = 0.0
                for v in instances[c]:
                    inter = np.sum(u & v)
                    union = np.sum(u | v)
                    iou = inter / union if union else 0.0
                    best = max(best, iou)
                if best >= iou_threshold:
                    tp[c] += 1
                else:
                    fp[c] += 1
    with np.errstate(divide="ignore", invalid="ignore"):
        p = tp / (tp + fp)
        r = tp / total
    return {
        "precision_per_class": p, "recall_per_class": r,
        "mAP": float(np.nanmean(p[np.isfinite(p)]))
        if np.isfinite(p).any() else 0.0,
        "mRecall": float(np.nanmean(r[np.isfinite(r)]))
        if np.isfinite(r).any() else 0.0,
    }


def instance_average_precision(
        all_proposals: Sequence[List[List[np.ndarray]]],
        all_instances: Sequence[List[List[np.ndarray]]],
        all_confidences: Optional[Sequence[List[List[float]]]] = None,
        iou_threshold: float = 0.5, num_classes: int = 20
) -> Dict[str, float]:
    """Benchmark-grade instance AP (the ScanNet protocol): proposals ranked
    by confidence, greedy ONE-TO-ONE matching against unmatched GT
    (duplicate detections of one GT are false positives — unlike the
    reference's precision-as-"mAP" which double-counts them,
    `evaluate_instance.py:1703-1741`), AP = area under the interpolated
    precision-recall curve, averaged over classes with ground truth.

    `all_confidences[s][c][i]` scores proposal i of class c in scene s;
    defaults to 1.0 (ties broken by input order, matching submission
    writers that emit uniform confidence).
    """
    ap = np.full(num_classes, np.nan)
    for c in range(num_classes):
        dets = []  # (confidence, scene, proposal mask)
        n_gt = 0
        for s, (props, insts) in enumerate(zip(all_proposals,
                                               all_instances)):
            n_gt += len(insts[c])
            for i, u in enumerate(props[c]):
                conf = (all_confidences[s][c][i]
                        if all_confidences is not None else 1.0)
                dets.append((float(conf), s, u))
        if n_gt == 0:
            continue
        if not dets:
            ap[c] = 0.0
            continue
        dets.sort(key=lambda t: -t[0])
        matched = [np.zeros(len(insts[c]), bool) for insts in all_instances]
        tp = np.zeros(len(dets))
        for d, (_, s, u) in enumerate(dets):
            best, best_j = 0.0, -1
            for j, v in enumerate(all_instances[s][c]):
                if matched[s][j]:
                    continue
                inter = np.sum(u & v)
                union = np.sum(u | v)
                iou = inter / union if union else 0.0
                if iou > best:
                    best, best_j = iou, j
            if best >= iou_threshold and best_j >= 0:
                tp[d] = 1.0
                matched[s][best_j] = True
        cum_tp = np.cumsum(tp)
        precision = cum_tp / (np.arange(len(dets)) + 1)
        recall = cum_tp / n_gt
        # precision envelope + all-point interpolation (VOC2010/ScanNet)
        prec_env = np.maximum.accumulate(precision[::-1])[::-1]
        r_prev = 0.0
        area = 0.0
        for d in range(len(dets)):
            if tp[d]:
                area += (recall[d] - r_prev) * prec_env[d]
                r_prev = recall[d]
        ap[c] = area
    valid = np.isfinite(ap)
    return {
        "ap_per_class": ap,
        "mAP": float(np.mean(ap[valid])) if valid.any() else 0.0,
    }


def per_proposal_statistics(props: List[List[np.ndarray]],
                            gts: List[List[np.ndarray]],
                            semantic_pred: np.ndarray,
                            iou_threshold: float = 0.5,
                            width: int = 1000) -> np.ndarray:
    """Reference-parity per-proposal statistics block for ONE scene
    (`evaluate_instance.py:1507-1552`): a [num_classes, 5, width] array,
    -1-initialized, whose rows per class are
      0: tp     — 1 if the proposal's best-IoU GT of that class >= thr
      1: fp     — 1 - tp
      2: size   — proposal point count
      3: conf   — fraction of proposal points predicted as the class
      4: overlap— best IoU against the class's GT instances
    Stacked over scenes and exported as instance_stat.mat 'stats'
    (reference `:1699`, shape [files, class_num, 5, 1000])."""
    num_classes = len(props)
    out = np.full((num_classes, 5, width), -1.0, np.float64)
    sem = np.asarray(semantic_pred).reshape(-1)
    for c in range(num_classes):
        n = min(len(props[c]), width)
        for pid in range(n):
            u = props[c][pid]
            overlap = 0.0
            for v in gts[c]:
                inter = np.sum(u & v)
                union = np.sum(u | v)
                iou = inter / union if union else 0.0
                overlap = max(overlap, iou)
            size = float(np.sum(u))
            out[c, 0, pid] = 1.0 if overlap >= iou_threshold else 0.0
            out[c, 1, pid] = 0.0 if overlap >= iou_threshold else 1.0
            out[c, 2, pid] = size
            out[c, 3, pid] = float(np.sum(sem[u] == c)) / max(size, 1.0)
            out[c, 4, pid] = overlap
    return out
