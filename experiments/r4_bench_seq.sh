#!/bin/bash
# Round-4 opening sequence: capture the perf record now that the tunnel is
# back (VERDICT r3 task 1). Serialized — concurrent TPU jobs add a ~26ms
# dispatch floor (CLAUDE.md).
set -x
cd /root/repo
mkdir -p /tmp/r4
echo "=== 1: bench default (flatten-optimizer state, tile-skip OFF) ==="
timeout 3600 python bench.py > /tmp/r4/bench_default.json 2> /tmp/r4/bench_default.err
echo "rc=$?"
cat /tmp/r4/bench_default.json
echo "=== 2: bench OCC_TILE_SKIP=1 ==="
OCC_TILE_SKIP=1 timeout 3600 python bench.py > /tmp/r4/bench_tileskip.json 2> /tmp/r4/bench_tileskip.err
echo "rc=$?"
cat /tmp/r4/bench_tileskip.json
echo "=== done ==="
