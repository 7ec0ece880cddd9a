#!/bin/bash
# Slot-vs-wave exact-cleanup A/B (VERDICT r4 task 3) + fast-mode gap cells.
# One bench.py process per cell (one heavy TPU program per process — the
# axon tunnel poisons the second large compile in a process; CLAUDE.md).
# Bench parity: traffic defaults (1 agent, density 1.0), INNER=20.
set -u
OUT=${1:-/tmp/wave_ab.jsonl}
: > "$OUT"
for B in 4096 8192 16384; do
  for CLEAN in slot wave; do
    echo "### exact B=$B cleanup=$CLEAN" >> "$OUT"
    BENCH_MODE=traffic BENCH_NPC_MODE=exact BENCH_NPC_CLEANUP=$CLEAN \
      BENCH_NUM_ENVS=$B BENCH_ITERS=3 BENCH_INNER=20 BENCH_REPEATS=3 \
      timeout 2400 python bench.py >> "$OUT" 2>/dev/null
  done
  echo "### fast B=$B" >> "$OUT"
  BENCH_MODE=traffic BENCH_NPC_MODE=fast BENCH_NUM_ENVS=$B \
    BENCH_ITERS=3 BENCH_INNER=20 BENCH_REPEATS=3 \
    timeout 2400 python bench.py >> "$OUT" 2>/dev/null
done
echo DONE >> "$OUT"
