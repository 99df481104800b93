"""Chunk-U tables must hold across scenes, not just the bench seed.

VERDICT r3 weak #1: the per-level U budgets were tuned against seed-0
chunk-halo maxima and other seeds overflowed into the (~2.5x slower, and
at multi-scene table sizes ~29x slower) XLA fallback. The tier escalation
in `augment_plan_with_chunks` (tiers 1.0/1.3/1.7, each a cached static
shape) must absorb scene variation: this test builds FULL-SIZE bench
scenes for several seeds and asserts every level and transition keeps its
fast-path chunk plan. The reference's analog is robust by construction
(chunks re-split under MAX_INPUT_ADDRESS,
`SCN/Metadata/SubmanifoldConvolutionRules.h:277-357`); here robustness is
budget+tier, so it needs a regression gate.
"""

import numpy as np
import pytest

from occuseg_tpu.core.topology import PlanSpec
from occuseg_tpu.data.synthetic import SceneConfig, make_batch
from occuseg_tpu.native.plan import build_plan_host
from occuseg_tpu.ops.pallas import chunk_conv

# bench.py's geometry (full-size: robustness at toy sizes proves nothing)
CAPS = (196_608, 139_264, 63_488, 17_408, 4_096, 1_024)
SCENE = SceneConfig(num_points=200_000, extent=512, num_objects=24)


@pytest.mark.parametrize("seed", range(6))
def test_all_levels_chunked_across_seeds(seed):
    batch = make_batch(SCENE, num_scenes=1, p_cap=262_144,
                       num_instances=64, seed=seed)
    plan = build_plan_host(batch["coords"], PlanSpec(caps=CAPS))
    if plan is None:
        pytest.skip("native planner unavailable")
    aug = chunk_conv.augment_plan_with_chunks(plan)
    for li, lvl in enumerate(aug.levels):
        assert lvl.chunks is not None, (
            f"seed {seed}: level {li} fell off the chunk fast path")
    for ti, tr in enumerate(aug.transitions):
        assert tr.child_chunks is not None and tr.up_chunks is not None, (
            f"seed {seed}: transition {ti} fell off the chunk fast path")


def test_multi_scene_batch_chunked():
    """Batch-4 (one step) with u_bump=32 — scene-boundary chunks mix two
    scenes' refs; the bumped tables must still cover every level."""
    batch = make_batch(SCENE, num_scenes=4, p_cap=262_144 * 4,
                       num_instances=64, seed=1)
    caps = tuple(c * 4 for c in CAPS)
    plan = build_plan_host(batch["coords"], PlanSpec(caps=caps))
    if plan is None:
        pytest.skip("native planner unavailable")
    aug = chunk_conv.augment_plan_with_chunks(plan, u_bump=32)
    missing = [li for li, lvl in enumerate(aug.levels)
               if lvl.chunks is None]
    assert not missing, f"multi-scene batch lost levels {missing}"
