"""Two-stage eval workflow: --dump schema round-trips through .npz and
`--from_dump` clustering reproduces the inline numbers exactly (VERDICT r2
#4; reference `train_instance.py:143-163` / `evaluate_instance.py:1249+`).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load_script():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "evaluate_instance.py")
    spec = importlib.util.spec_from_file_location("eval_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Args:
    region_cap = 256
    use_joint_refine = False
    use_merge = True
    bw_relax_factor = 1.0
    merge_threshold = 0.5
    occupancy_lo = 0.3
    occupancy_hi = 3.0


def _synthetic_scene(seed=0, n=3000, num_classes=20):
    rng = np.random.default_rng(seed)
    # sorted ids -> the arange//4 supervoxels below are instance-pure
    iid = np.sort(rng.integers(0, 6, n)).astype(np.int64)
    centers = rng.standard_normal((6, 8)) * 6
    emb = centers[iid] + 0.05 * rng.standard_normal((n, 8))
    # spatially coherent instances (the cross-modal membership prob needs
    # small within-instance POSE distances, not just embedding distances)
    centers_xyz = rng.uniform(5, 45, (6, 3))
    xyz = (centers_xyz[iid]
           + 0.5 * rng.standard_normal((n, 3))).astype(np.float32)
    # classes with small reference instance sizes (DEFAULT_CLASS_SIZES:
    # picture 934, sink 1046, toilet 1960) so ~500-point instances survive
    # the 0.25*class_size filter
    labels = np.asarray((10, 16, 17))[iid % 3].astype(np.int64)
    occ = np.log(np.maximum(np.bincount(iid, minlength=6)[iid], 1))
    return {
        "xyz": xyz,
        "feature": rng.standard_normal((n, 3)).astype(np.float32),
        "occupancy": occ.astype(np.float32),
        "true_occupancy": occ.astype(np.float32),
        "pred_semantic": labels.copy(),
        "pred_semantic_probability": np.eye(num_classes,
                                            dtype=np.float32)[labels],
        "pred_embedding": emb.astype(np.float32),
        "regions": (np.arange(n) // 4).astype(np.int64),
        "true_semantic": labels.copy(),
        "true_instance": iid,
        "pred_offsets": rng.uniform(0, 1, (n, 1)).astype(np.float32),
        "true_offsets": rng.uniform(0, 1, (n, 1)).astype(np.float32),
        "pred_displacements": (0.01 * rng.standard_normal((n, 3))
                               ).astype(np.float32),
        "true_displacements": np.zeros((n, 3), np.float32),
        "pred_bw": rng.uniform(0.5, 2, (n, 2)).astype(np.float32),
        "scale": np.float64(20.0),
    }


def _props_sizes(props):
    return [[int(m.sum()) for m in cl] for cl in props]


def test_dump_roundtrip_reproduces_inline(tmp_path):
    mod = _load_script()
    args = _Args()
    scene = _synthetic_scene()

    props_a, gts_a, _ = mod.cluster_and_score(scene, args)

    fn = tmp_path / "scene0000.npz"
    np.savez(fn, **scene)
    loaded = dict(np.load(fn, allow_pickle=False))
    props_b, gts_b, _ = mod.cluster_and_score(loaded, args)

    assert _props_sizes(props_a) == _props_sizes(props_b)
    assert _props_sizes(gts_a) == _props_sizes(gts_b)
    for ca, cb in zip(props_a, props_b):
        for ma, mb in zip(ca, cb):
            np.testing.assert_array_equal(ma, mb)


def test_score_scenes_and_joint_refine(tmp_path):
    mod = _load_script()
    args = _Args()
    scenes = [(f"s{i}", _synthetic_scene(i)) for i in range(2)]
    stats = mod.score_scenes(iter(scenes), args)
    assert "ap_50" in stats and "precision_50" in stats
    pp = stats["per_proposal"]
    assert pp.ndim == 4 and pp.shape[0] == 2 and pp.shape[2] == 5
    # tp/fp complementarity on filled entries
    filled = pp[:, :, 0, :] >= 0
    assert np.all((pp[:, :, 0, :] + pp[:, :, 1, :])[filled] == 1)

    args2 = _Args()
    args2.use_joint_refine = True
    args2.use_merge = False
    props, gts, _ = mod.cluster_and_score(_synthetic_scene(3), args2)
    assert sum(len(c) for c in gts) > 0


def test_bw_relax_factor_changes_clustering():
    """The sweep knob must actually reach the mean-shift."""
    mod = _load_script()
    scene = _synthetic_scene(5)
    a1, a2 = _Args(), _Args()
    a1.use_merge = a2.use_merge = False
    a2.bw_relax_factor = 25.0  # absurdly wide bandwidths -> merged clusters
    p1, _, _ = mod.cluster_and_score(scene, a1)
    p2, _, _ = mod.cluster_and_score(scene, a2)
    n1 = sum(len(c) for c in p1)
    n2 = sum(len(c) for c in p2)
    assert n1 != n2
