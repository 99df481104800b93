"""Semantic segmentation metrics: confusion matrix + per-class/mean IoU.

Reference: `examples/ScanNet/utils.py:210-320` (20-class ScanNet table and
Stanford/S3DIS variant). Confusion accumulation is a device-side bincount;
reporting is NumPy.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SCANNET_CLASS_LABELS = (
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
)

# Stanford3D / S3DIS variant (reference `examples/ScanNet/utils.py:322-380`)
STANFORD_CLASS_LABELS = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "table",
    "chair", "sofa", "bookcase", "board", "clutter",
)



@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray,
                     num_classes: int = 20) -> jnp.ndarray:
    """[C, C] counts over points with 0 <= gt < num_classes (row = gt,
    col = pred); out-of-range gt (e.g. 20-class labels under the 14-class
    Stanford table) is ignored like padding."""
    valid = (gt >= 0) & (gt < num_classes)
    idx = jnp.where(valid, gt * num_classes + jnp.clip(pred, 0,
                                                       num_classes - 1), 0)
    counts = jnp.zeros((num_classes * num_classes,), jnp.int64)
    counts = counts.at[idx].add(valid.astype(jnp.int64))
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(conf: np.ndarray) -> Dict[str, object]:
    conf = np.asarray(conf, np.float64)
    tp = np.diag(conf)
    fp = conf.sum(0) - tp
    fn = conf.sum(1) - tp
    denom = tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / denom
    present = denom > 0
    miou = float(iou[present].mean()) if present.any() else 0.0
    return {"iou_per_class": iou, "mean_iou": miou,
            "accuracy": float(tp.sum() / max(conf.sum(), 1))}


def print_iou_table(conf: np.ndarray,
                    labels: Sequence[str] = SCANNET_CLASS_LABELS) -> str:
    """Formatted per-class report (reference `utils.py:226-267` style)."""
    res = iou_from_confusion(conf)
    lines = ["class            IoU"]
    for name, v in zip(labels, res["iou_per_class"]):
        lines.append(f"{name:16s} {v:.4f}")
    lines.append(f"{'mean':16s} {res['mean_iou']:.4f}")
    return "\n".join(lines)
