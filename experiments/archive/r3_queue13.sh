#!/bin/bash
# Round-3 TPU queue, part 13 (gated on queue12): batch-saturation probes.
#
# The extralarge finding (B=512 -> 1024 lifted per-env throughput 1.53x:
# chip underfill, RESULTS.md "Extralarge throughput") raises the same
# question for the HEADLINE config: is medium-19-9 at B=1024 saturated?
# Probe B=1024/2048/4096 on medium and B=2048 on extralarge. If B=2048
# wins >=10% on medium, bench.py's default batch should move (done by
# hand after reading /tmp/r3_M_batch_probe.log — the driver's
# end-of-round bench.py run picks up whatever default is committed).
cd /root/repo
export MALLOC_MMAP_THRESHOLD_=1073741824 MALLOC_TRIM_THRESHOLD_=1073741824
HARD_DEADLINE=$(date -ud "2026-08-18 20:05" +%s)

stage() {
  local name=$1; shift
  local now=$(date +%s)
  local budget=$((HARD_DEADLINE - now))
  if [ -f /tmp/r3_queue13_stop ] || [ "$budget" -le 60 ]; then
    echo "=== $(date -u +%H:%M:%S) stage $name SKIPPED (stop/deadline)" >> /tmp/r3_queue.log
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) stage $name (budget ${budget}s): $*" >> /tmp/r3_queue.log
  timeout -s TERM "$budget" "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) stage $name exit $?" >> /tmp/r3_queue.log
}

Q12PID=$(cat /tmp/r3_queue12.pid 2>/dev/null)
if [ -n "$Q12PID" ]; then
  while kill -0 "$Q12PID" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) queue13 start (queue12 drained)" >> /tmp/r3_queue.log

stage M_batch_probe python3 experiments/xl_sweep.py \
  --env tarware-medium-19agvs-9pickers-partialobs-v1 \
  --batches 1024 2048 4096 --iters 0 --steps 100

stage XL_batch_probe python3 experiments/xl_sweep.py \
  --env tarware-extralarge-19agvs-9pickers-partialobs-v1 \
  --batches 2048 --iters 0 --steps 100

echo "=== $(date -u +%H:%M:%S) queue13 done" >> /tmp/r3_queue.log
