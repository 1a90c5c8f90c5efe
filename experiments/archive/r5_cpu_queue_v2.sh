#!/bin/bash
# Round-5 CPU queue v2 (post-VM-reset): honest-T paired evals of the
# r5scale DAgger clones, gated on the chip queue (r5_queue_v3.sh)
# producing each clone's result.json. Single-core host — medium runs
# first at full protocol; large runs reduced (3 temps, 16 eval seeds,
# 6 episodes) so it has a chance to finish before round end.
cd /root/repo
HARD_DEADLINE=$(date -ud "2026-08-20 01:25" +%s)
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
QLOG=/tmp/r5_cpu_queue.log
RD=results_data

wait_for() {  # wait_for <path> — true if it appeared before the deadline
  while [ ! -e "$1" ]; do
    [ "$(date +%s)" -ge "$HARD_DEADLINE" ] && return 1
    [ -f /tmp/r5_cpu_queue_stop ] && return 1
    sleep 45
  done
  return 0
}

commit_partial() {
  git add results_data 2>/dev/null
  git commit -q -m "honest-T paired eval: $1" 2>/dev/null || true
}

# --- medium r5scale clone, full protocol ------------------------------------
if [ ! -f $RD/honest_t_medium_r5.json ]; then
  if wait_for runs/dagger_medium_r5scale/result.json; then
    CK=runs/dagger_medium_r5scale/ckpt_best
    [ -d "$CK" ] || CK=runs/dagger_medium_r5scale/ckpt
    echo "=== $(date -u +%H:%M:%S) honest medium_r5 start" >> $QLOG
    timeout -s TERM $(( HARD_DEADLINE - $(date +%s) )) \
      python3 experiments/honest_t_eval.py --cpu \
      --env "$MEDIUM" --ckpt "$CK" --net gnn --hidden_dim 64 \
      --temps 1.5 2.0 2.5 3.0 4.0 \
      --select_seeds 8 --select_seed_base 100 \
      --eval_seeds 24 --eval_seed_base 700 \
      --out $RD/honest_t_medium_r5.json > /tmp/r5_honest_medium.log 2>&1
    echo "=== $(date -u +%H:%M:%S) honest medium_r5 exit $?" >> $QLOG
    commit_partial "medium r5scale DAgger clone vs dispatcher"
  else
    echo "=== honest medium_r5 SKIPPED (no clone before deadline)" >> $QLOG
  fi
fi

# --- large r5scale clone, reduced protocol -----------------------------------
if [ ! -f $RD/honest_t_large_r5.json ]; then
  if wait_for runs/dagger_large_r5scale/result.json; then
    CK=runs/dagger_large_r5scale/ckpt_best
    [ -d "$CK" ] || CK=runs/dagger_large_r5scale/ckpt
    BUDGET=$(( HARD_DEADLINE - $(date +%s) ))
    if [ "$BUDGET" -gt 300 ]; then
      echo "=== $(date -u +%H:%M:%S) honest large_r5 start (budget ${BUDGET}s)" >> $QLOG
      timeout -s TERM "$BUDGET" \
        python3 experiments/honest_t_eval.py --cpu \
        --env "$LARGE" --ckpt "$CK" --net gnn --hidden_dim 64 \
        --temps 2.0 3.0 4.0 \
        --select_seeds 6 --select_seed_base 100 \
        --eval_seeds 16 --eval_seed_base 700 --episodes 6 \
        --out $RD/honest_t_large_r5.json > /tmp/r5_honest_large.log 2>&1
      echo "=== $(date -u +%H:%M:%S) honest large_r5 exit $?" >> $QLOG
      commit_partial "large r5scale DAgger clone vs dispatcher (reduced)"
    fi
  else
    echo "=== honest large_r5 SKIPPED (no clone before deadline)" >> $QLOG
  fi
fi
echo "=== $(date -u +%H:%M:%S) r5 cpu queue v2 done" >> $QLOG
