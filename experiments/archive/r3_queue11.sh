#!/bin/bash
# Round-3 TPU queue, part 11 (gated on queue10 draining).
#
# Context: the fresh-VM reset lost runs/ (all trained checkpoints incl.
# the 30k QMIX agent), so the promised "fine-tune WITH coordinated TD
# targets" from that checkpoint is impossible this round. The scientific
# replacement is cheaper and cleaner anyway: train QMIX from scratch
# WITH the claim auction inside the loop (action selection AND TD
# bootstrap use rl/coordination.py, --coordinated), probing with
# coordinated-greedy evals — versus the committed round-3 baseline of
# independent-trained QMIX evaluated under the auction (86.3 -> 99.2,
# RESULTS.md operator table). Question: does learning the Q-function
# under the executed joint operator beat bolting the operator on after?
#
# Then: re-export a serving blob (the previous one died with runs/) from
# the freshest strong checkpoint, and pre-run bench.py so BENCH_r03
# breakage (if any) surfaces before the driver's end-of-round run.
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
SOFT_DEADLINE=$(date -ud "2026-08-18 19:40" +%s)
HARD_DEADLINE=$(date -ud "2026-08-18 20:00" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  if [ -f /tmp/r3_queue_stop ] || [ "$now" -ge "$SOFT_DEADLINE" ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  local budget=$((HARD_DEADLINE - now))
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

Q10PID=$(cat /tmp/r3_queue10.pid 2>/dev/null)
if [ -n "$Q10PID" ]; then
  while kill -0 "$Q10PID" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue11 start (queue10 drained)" >> /tmp/r3_queue.log

stage V_qmix_coordtrain python3 experiments/medium_qmix_5k.py \
  --env_id "$MEDIUM" --num_episodes 5000 --coordinated \
  --eval_every 500 --eval_episodes 8 --tag coordtrain

CK=runs/qmix_medium_5k_coordtrain/ckpt
if [ -d "$CK" ]; then
  stage W_export_blob python3 experiments/export_policy.py \
    --ckpt "$CK" --kind qmix --env_id "$MEDIUM" --net gnode \
    --hidden_dim 64 --coordinated --out runs/policy_qmix_coordtrain.stablehlo
fi

stage X_bench_preflight python3 bench.py

echo "=== $(date -u +%H:%M:%S) queue11 done" >> /tmp/r3_queue.log
