#!/bin/bash
# Round-4 blocked-batch A/B on silicon (serialize — never run TPU jobs
# concurrently, CLAUDE.md). Known comparisons from earlier captures:
#   batch-1:           ~172-179 ms backbone step (1.01-1.05M voxels/s)
#   batch-4 concat:    ~1.9x per-voxel cost (exp_r4_a; staging-gather
#                      fusion bucket 29 -> 538 ms at 8.5 GB/s)
# This run measures batch-4 BLOCKED (per-scene sub-caps, window staging)
# and refreshes batch-1 (also warms the remote compile cache after the
# chunk_conv.py edits).
set -x
cd /root/repo
echo "=== batch-4 BLOCKED ==="
OCC_SCENES=4 OCC_BLOCKED=1 timeout 5400 python bench.py
echo "=== batch-1 (cache warm + headline refresh) ==="
timeout 5400 python bench.py
