#!/bin/bash
# Round-3 TPU queue, part 6 — MAPPO (scratch + DAgger warm start).
# Waits for queue5 (experiments/r3_queue5.sh).
cd /root/repo

# Stages stop starting after the deadline (UTC HHMM) or when the stop
# file exists, so a late TPU recovery can't leave a stage holding the
# chip when the round-end driver needs it (one TPU process at a time).
DEADLINE=${QUEUE_DEADLINE:-1045}
stage() {
  local name=$1; shift
  if [ -f /tmp/r3_queue_stop ] || [ "$(date -u +%H%M)" -ge "$DEADLINE" ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (deadline/stop)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name: $*" >> /tmp/r3_queue.log
  "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

Q5PID=$(cat /tmp/r3_queue5.pid 2>/dev/null)
while [ -n "$Q5PID" ] && kill -0 "$Q5PID" 2>/dev/null; do
  sleep 60
done
until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) queue6: TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue6 start" >> /tmp/r3_queue.log

# MAPPO warm-started from the DAgger clone — best-by-rollout checkpoint
# first, then last-round, then the BC clone.
INIT=runs/dagger_medium/ckpt_best
[ -d "$INIT" ] || INIT=runs/dagger_medium/ckpt
[ -d "$INIT" ] || INIT=runs/bc_medium/ckpt
stage R_mappo_dagger python3 experiments/medium_mappo.py \
  --num_strides 125 --init_from "$INIT" --lr 1e-4 \
  --eval_every 25 --eval_episodes 8 --tag dagger_ft

# MAPPO from scratch (coordinated) for the no-demonstrations row.
stage S_mappo_scratch python3 experiments/medium_mappo.py \
  --num_strides 125 --eval_every 25 --eval_episodes 8 --tag scratch

echo "=== $(date -u +%H:%M:%S) queue6 done" >> /tmp/r3_queue.log
