#!/bin/bash
# Round-3 TPU queue, part 15 (gated on queue14): roofline + RL closures.
#  R_roofline_2048   — replan-off ablation ceiling at the new headline batch
#                      (updates the Amdahl story for the 189k vs ~220k gap).
#  R2_kernel_cmp     — int32 vs bitpack32 at B=2048 (kernel gain at the
#                      batch that actually ships).
#  Q5_qmix_large_5k  — continue the large QMIX 1.5k -> 5k (VERDICT item 4
#                      asked for "at least a 5k QMIX run on large").
#  Q5E_eval          — operator-swept eval of the 5k checkpoint
#                      (sampled + auction; argmax probes are known-degenerate
#                      at 1.5k — RESULTS.md).
#  P_profile_2048    — xplane op breakdown at B=2048 for the round-4 lever.
#  X_bench2          — bench preflight last.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-19 07:45" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue15_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

Q14PID=$(cat /tmp/r3_queue14.pid 2>/dev/null)
if [ -n "$Q14PID" ]; then
  while kill -0 "$Q14PID" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue15 start (queue14 drained)" >> /tmp/r3_queue.log

stage R_roofline_2048 python3 experiments/xl_sweep.py \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --batches 2048 --iters 0 --steps 100 --replan off

stage R2_kernel_cmp python3 experiments/xl_sweep.py \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --batches 2048 --iters 0 --steps 100 --kernels int32 bitpack32

stage Q5_qmix_large_5k python3 experiments/medium_qmix_5k.py \
  --env_id tarware-large-15agvs-8pickers-partialobs-v1 \
  --num_episodes 5000 --eval_every 500 --eval_episodes 8 \
  --tag large --resume_from runs/qmix_medium_5k_large/ckpt

stage Q5E_eval python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/qmix_medium_5k_large/ckpt \
  --env_id tarware-large-15agvs-8pickers-partialobs-v1 \
  --algo qmix --net gnode --eval_episodes 8 --seeds 3 \
  --stochastic --coordinated --out runs/coord_eval.jsonl

stage P_profile_2048 python3 experiments/profile_step.py \
  --env_id tarware-medium-19agvs-9pickers-partialobs-v1 \
  --batch 2048 --steps 20

stage X_bench2 python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue15 done" >> /tmp/r3_queue.log
