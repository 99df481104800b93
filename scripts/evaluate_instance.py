#!/usr/bin/env python
"""Instance-segmentation evaluation (reference
`examples/ScanNet/evaluate_instance.py`): run the model on the val split,
extract instances via supervoxel mean-shift (+ optional occupancy merge),
filter proposals, report precision/recall at IoU 0.25 / 0.5.
"""

import logging
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from occuseg_tpu.cluster import (
    aggregate_regions,
    filter_proposals,
    instance_precision_recall,
    meanshift_cluster,
    occupancy_merge,
)
from occuseg_tpu.cluster.evaluator import gt_instances
from occuseg_tpu.cluster.meanshift import labels_to_points
from occuseg_tpu.train.config import args_to_config, get_parser
from occuseg_tpu.train.loop import build_model, build_spec, get_dataset
from occuseg_tpu.train.state import create_train_state, make_eval_step


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    parser = get_parser()
    parser.add_argument("--use_merge", action="store_true", default=False)
    parser.add_argument("--use_joint_refine", action="store_true",
                        default=False,
                        help="joint semantic-instance refinement "
                             "(evaluate_instance.py:809-964): single-shot "
                             "seeded membership + membership-weighted "
                             "semantic re-vote")
    parser.add_argument("--region_cap", type=int, default=4096)
    args = parser.parse_args()
    config = args_to_config(args)
    config["use_dense_model"] = True

    model = build_model(config)
    spec = build_spec(config)
    dataset = get_dataset(config)
    p_cap, i_cap = config["point_cap"], config["instance_cap"]

    sample = next(iter(dataset.val_batches(p_cap, i_cap, 1)))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items() if k != "region"}
    state = create_train_state(model, jax.random.PRNGKey(0), sample_j, spec)
    if config.get("load"):
        import os
        from occuseg_tpu.train.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
        )
        path = config["load"]
        if os.path.isdir(path) and latest_checkpoint(path):
            path = latest_checkpoint(path)
        state = restore_checkpoint(path, jax.device_get(state))
        logging.info("restored %s", path)

    ev = jax.jit(make_eval_step(model, spec))
    all_props, all_gts = [], []
    for raw in dataset.val_batches(p_cap, i_cap, 1):
        batch = {k: jnp.asarray(v) for k, v in raw.items() if k != "region"}
        out = ev(state, batch)
        valid = np.asarray(raw["labels"]) >= -1
        region = jnp.asarray(raw.get(
            "region", np.arange(p_cap, dtype=np.int32) // 16))
        sem_pred = jnp.argmax(out.semantics, axis=-1)
        regions = aggregate_regions(
            out.embedding, out.displacement, jnp.asarray(raw["pose"]),
            out.bw, out.offset[:, 0], sem_pred, out.occupancy[:, 0],
            region, args.region_cap)
        if args.use_joint_refine:
            from occuseg_tpu.cluster import (
                joint_refine,
                region_semantic_probability,
            )
            sem_prob = region_semantic_probability(
                out.semantics, region, args.region_cap)
            labels, sem_ref, _ = joint_refine(regions, sem_prob)
            sem_pred = labels_to_points(sem_ref, region)
        else:
            labels, _ = meanshift_cluster(regions)
        labels_np = np.asarray(labels)
        if args.use_merge:
            labels_np = occupancy_merge(
                labels_np, np.asarray(regions.embedding),
                np.asarray(regions.pose_embedding), np.asarray(regions.bw),
                np.asarray(regions.count), np.asarray(regions.occupancy))
        pts = np.asarray(labels_to_points(jnp.asarray(labels_np), region))
        props = filter_proposals(pts, np.asarray(sem_pred),
                                 np.asarray(out.occupancy))
        gts = gt_instances(np.asarray(raw["instance_id"]),
                           np.asarray(raw["labels"]))
        all_props.append(props)
        all_gts.append(gts)

    stats = {}
    for thr in (0.25, 0.5):
        # reference-parity metric (precision reported as "mAP",
        # evaluate_instance.py:1703-1741) ...
        res = instance_precision_recall(all_props, all_gts,
                                        iou_threshold=thr)
        logging.info("ref-mAP@%.2f: %.4f  mRecall@%.2f: %.4f", thr,
                     res["mAP"], thr, res["mRecall"])
        stats[f"precision_{int(thr*100)}"] = res["precision_per_class"]
        stats[f"recall_{int(thr*100)}"] = res["recall_per_class"]
        # ... and the benchmark-grade AP (ranked PR curve, one-to-one
        # matching — the ScanNet protocol)
        from occuseg_tpu.cluster.evaluator import instance_average_precision
        ap = instance_average_precision(all_props, all_gts,
                                        iou_threshold=thr)
        logging.info("AP@%.2f: %.4f (benchmark protocol)", thr, ap["mAP"])
        stats[f"ap_{int(thr*100)}"] = ap["ap_per_class"]

    # instance statistics export (reference writes instance_stat.mat,
    # evaluate_instance.py:1548-1552, :1699)
    try:
        import scipy.io
        scipy.io.savemat("instance_stat.mat", {"stats": stats})
        logging.info("wrote instance_stat.mat")
    except Exception as e:
        logging.warning("could not write instance_stat.mat: %s", e)


if __name__ == "__main__":
    main()
