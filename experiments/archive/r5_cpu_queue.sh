#!/bin/bash
# Round-5 CPU queue: honest-T paired evals of the FULL 4-round DAgger
# clones (tag r5scale, produced by r5_queue_v2 stages G5/G6 with the
# scan-fast BC). Gated on the r4 CPU queue draining first so only one
# CPU-heavy eval runs at a time; the r4 queue evaluates the base-BC
# (r4scale) clones with the same protocol, giving a clone-quality
# ablation for free: (BC vs DAgger) x (honest-T protocol).
cd /root/repo
HARD_DEADLINE=$(date -ud "2026-08-20 12:00" +%s)
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
QLOG=/tmp/r5_cpu_queue.log
RD=results_data

wait_for() {  # wait_for <path> — true if it appeared before the deadline
  while [ ! -e "$1" ]; do
    [ "$(date +%s)" -ge "$HARD_DEADLINE" ] && return 1
    [ -f /tmp/r5_cpu_queue_stop ] && return 1
    sleep 60
  done
  return 0
}

honest() {  # honest <out_tag> <env_id> <run_dir>
  local tag=$1 env=$2 run=$3
  [ -f "$RD/honest_t_$tag.json" ] && return 0
  if ! wait_for "$run/result.json"; then
    echo "=== $(date -u +%H:%M:%S) honest_$tag SKIPPED (no clone)" >> $QLOG
    return 0
  fi
  local ck="$run/ckpt_best"; [ -d "$ck" ] || ck="$run/ckpt"
  echo "=== $(date -u +%H:%M:%S) honest_$tag start (ckpt $ck)" >> $QLOG
  timeout -s TERM 14400 python3 experiments/honest_t_eval.py --cpu \
    --env "$env" --ckpt "$ck" --net gnn --hidden_dim 64 \
    --temps 1.5 2.0 2.5 3.0 4.0 \
    --select_seeds 8 --select_seed_base 100 \
    --eval_seeds 24 --eval_seed_base 700 \
    --out "$RD/honest_t_$tag.json" > "/tmp/r5_honest_$tag.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) honest_$tag exit $?" >> $QLOG
  git add results_data 2>/dev/null
  git commit -q -m "honest-T paired eval: $tag clone vs dispatcher" \
    2>/dev/null || true
}

# --- gate: let the r4 CPU queue (r4scale base-BC clones) drain first -------
R4PID=$(cat /tmp/r4_cpu_queue.pid 2>/dev/null)
while [ -n "$R4PID" ] && kill -0 "$R4PID" 2>/dev/null; do sleep 60; done
echo "=== $(date -u +%H:%M:%S) r5 cpu queue start (r4 cpu drained)" >> $QLOG

honest medium_r5 "$MEDIUM" runs/dagger_medium_r5scale
honest large_r5 "$LARGE" runs/dagger_large_r5scale
echo "=== $(date -u +%H:%M:%S) r5 cpu queue done" >> $QLOG
