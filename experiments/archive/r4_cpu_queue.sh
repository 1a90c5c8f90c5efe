#!/bin/bash
# Round-4 CPU-side queue: honest-temperature paired evals of the DAgger
# clones (VERDICT r3 item 5 / weak #4). Runs on the CPU backend so it can
# proceed WHILE the chip queue trains; each eval waits for its clone
# checkpoint (written by stage G / G_large of the chip queues) to appear.
cd /root/repo
HARD_DEADLINE=$(date -ud "2026-08-20 04:00" +%s)
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
QLOG=/tmp/r4_cpu_queue.log
RD=results_data

wait_for() {  # wait_for <path> — true if it appeared before the deadline
  while [ ! -e "$1" ]; do
    [ "$(date +%s)" -ge "$HARD_DEADLINE" ] && return 1
    [ -f /tmp/r4_cpu_queue_stop ] && return 1
    sleep 60
  done
  return 0
}

honest() {  # honest <size_tag> <env_id> <run_dir>
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
    --out "$RD/honest_t_$tag.json" > "/tmp/r4_honest_$tag.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) honest_$tag exit $?" >> $QLOG
  git add results_data 2>/dev/null
  git commit -q -m "honest-T paired eval: $tag clone vs dispatcher" \
    2>/dev/null || true
}

honest medium "$MEDIUM" runs/dagger_medium_r4scale
honest large "$LARGE" runs/dagger_large_r4scale
echo "=== $(date -u +%H:%M:%S) r4 cpu queue done" >> $QLOG
