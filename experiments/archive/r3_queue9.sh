#!/bin/bash
# Round-3 TPU queue, part 9 (reordered for value + deadline-guarded):
# COMA at 32 lockstep envs first (the one open r2-VERDICT item), then
# full-scale DAgger (medium + large) with high-seed paired confirmations
# of the dispatcher-beating result, and MAPPO (DAgger warm start +
# scratch). Waits for queue8 (/tmp/r3_queue8.pid).
#
# Deadline policy: no NEW stage starts after $SOFT_DEADLINE, and every
# stage runs under `timeout` expiring at $HARD_DEADLINE, so the chip is
# free for the driver's end-of-round bench.
cd /root/repo
LARGE=tarware-large-15agvs-8pickers-partialobs-v1
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1
SOFT_DEADLINE=$(date -ud "2026-08-18 18:50" +%s)
HARD_DEADLINE=$(date -ud "2026-08-18 19:35" +%s)

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

Q8PID=$(cat /tmp/r3_queue8.pid 2>/dev/null)
while [ -n "$Q8PID" ] && kill -0 "$Q8PID" 2>/dev/null; do
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue9 start" >> /tmp/r3_queue.log

# COMA sample-starvation fix: 32 lockstep envs (r2-VERDICT item 6; the
# only VERDICT item not covered by queue8). Cheap (~45 min), runs first.
stage G_coma32 python3 experiments/medium_coma_curve.py \
  --num_envs 32 --num_episodes 2500 --entropy_decay 0.9999 \
  --eval_every 250 --eval_episodes 8 --tag envs32

# Full-scale DAgger on medium (probe-like recipe: rollout quality is
# non-monotone in imitation strength; best-by-rollout selection at the
# sampled serving operator).
stage Q_dagger_medium python3 experiments/medium_dagger.py --env "$MEDIUM" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

stage U_paired_medium python3 experiments/paired_clone_eval.py \
  --env "$MEDIUM" --ckpt runs/dagger_medium/ckpt_best \
  --temps 2.0 3.0 3.5 --seeds 24 \
  --out runs/clone_paired_eval_medium_full.json

# MAPPO warm-started from the DAgger clone.
INIT=runs/dagger_medium/ckpt_best
[ -d "$INIT" ] || INIT=runs/dagger_medium/ckpt
stage R_mappo_dagger python3 experiments/medium_mappo.py \
  --num_strides 125 --init_from "$INIT" --lr 1e-4 \
  --eval_every 25 --eval_episodes 8 --tag dagger_ft

# Full-scale DAgger + paired confirmation on large.
stage T_dagger_large python3 experiments/medium_dagger.py --env "$LARGE" \
  --net gnn --hidden_dim 64 --rounds 5 --episodes_per_round 32 \
  --epochs0 10 --epochs_per_round 4 --stride 4 --max_episodes 400 \
  --collect_temperature 2.0 --eval_episodes 8

stage U_paired_large python3 experiments/paired_clone_eval.py \
  --env "$LARGE" --ckpt runs/dagger_large/ckpt_best \
  --temps 1.5 2.0 3.0 --seeds 24 \
  --out runs/clone_paired_eval_large_full.json

# MAPPO from scratch (lowest priority; runs only if time remains).
stage S_mappo_scratch python3 experiments/medium_mappo.py \
  --num_strides 125 --eval_every 25 --eval_episodes 8 --tag scratch

echo "=== $(date -u +%H:%M:%S) queue9 done" >> /tmp/r3_queue.log
