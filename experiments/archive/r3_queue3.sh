#!/bin/bash
# Round-3 TPU queue, part 3 — coordination + behavior-cloning stages.
# Waits for queue2 (experiments/r3_queue2.sh) to finish so TPU jobs stay
# serialized (one TPU process at a time on this VM).
cd /root/repo
MEDIUM=tarware-medium-19agvs-9pickers-partialobs-v1

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

# Wait for queue2's bash process to exit (poll; not our child).
Q2PID=$(cat /tmp/r3_queue2.pid 2>/dev/null)
while [ -n "$Q2PID" ] && kill -0 "$Q2PID" 2>/dev/null; do
  sleep 60
done
# Belt and braces: even if queue2 died early, never start TPU stages
# until the backend answers (it can be down for hours after a stranded
# lease — NOTES.md round-3 outage).
until timeout 240 python3 -c "import jax; jax.devices()" 2>/dev/null; do
  echo "=== $(date -u +%H:%M:%S) queue3: TPU still unavailable" >> /tmp/r3_queue.log
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) queue3 start" >> /tmp/r3_queue.log

# Confirm the CPU-backend coordination result on the chip (minutes).
stage I_coord_eval_tpu_base python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/qmix_medium_5k_v2_30k/ckpt --seeds 3 \
  --eval_episodes 8 --out runs/coord_eval_tpu.jsonl
stage I_coord_eval_tpu_coord python3 experiments/eval_rl_checkpoint.py \
  --resume_from runs/qmix_medium_5k_v2_30k/ckpt --seeds 3 \
  --eval_episodes 8 --coordinated --out runs/coord_eval_tpu.jsonl

# Clone the dispatcher at reference scale (~20 min). CPU probes
# (runs/bc_medium_cpu_probe*): gnn rolls out far better than gnode
# (73.8/77.8 vs 49.3/35.6 pick rate) despite lower decision accuracy —
# BC compounding error hits the ODE net harder. gnn is the warm-start
# donor; gnode kept as the comparison row.
stage K_bc_medium python3 experiments/medium_bc.py --env "$MEDIUM" \
  --net gnn --hidden_dim 64 --epochs 30 --stride 2 --eval_episodes 8
stage K2_bc_medium_gnode python3 experiments/medium_bc.py --env "$MEDIUM" \
  --net gnode --hidden_dim 64 --epochs 20 --stride 2 --eval_episodes 8 \
  --tag gnode

# Fine-tune the 30k checkpoint WITH coordinated TD targets (+10k eps).
stage J_qmix_coord_ft python3 experiments/medium_qmix_5k.py \
  --num_episodes 10000 --resume_from runs/qmix_medium_5k_v2_30k/ckpt \
  --coordinated --eval_every 250 --eval_episodes 8 \
  --epsilon_min 0.05 --tag v2_coord_40k

# QMIX from demonstrations: BC warm start (gnn — must match the donor
# net) + coordination, low epsilon.
stage L_qmix_bc_coord python3 experiments/medium_qmix_5k.py \
  --num_episodes 5000 --init_q_from runs/bc_medium/ckpt --net gnn \
  --coordinated --epsilon_start 0.1 --epsilon_min 0.05 \
  --eval_every 250 --eval_episodes 8 --tag bc_coord

echo "=== $(date -u +%H:%M:%S) queue3 done" >> /tmp/r3_queue.log
