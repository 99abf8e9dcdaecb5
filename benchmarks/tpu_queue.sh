#!/bin/bash
# Sequential TPU job queue for the single tunneled chip.  Jobs are
# numbered scripts in benchmarks/tpu_queue.d/; the runner waits for the
# current TPU holder (PID in /tmp/thickness_pid) to exit, then pops jobs
# in order.  Drop/remove job files while it runs to reprioritize.
#
# Relay-aware (round-3 outages burned whole job timeouts against a dead
# backend): before popping each job, probe the backend in a bounded
# subprocess and wait it out if the tunnel is down — the probe retries
# every 2 min WITHOUT consuming the job.
set -u
cd /root/repo
HOLD_PID=$(awk '{print $2}' /tmp/thickness_pid 2>/dev/null || echo "")
if [ -n "$HOLD_PID" ]; then
  while kill -0 "$HOLD_PID" 2>/dev/null; do sleep 10; done
fi
probe_ok() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); (x@x).block_until_ready(); print('PROBE_OK')" 2>/dev/null | grep -q PROBE_OK
}
while true; do
  job=$(ls benchmarks/tpu_queue.d/*.sh 2>/dev/null | head -1)
  [ -z "$job" ] && break
  until probe_ok; do
    echo "=== $(date -u +%H:%M:%S) backend down; holding $job ===" >> results/r5/tpu_queue.log
    sleep 120
  done
  echo "=== $(date -u +%H:%M:%S) running $job ===" >> results/r5/tpu_queue.log
  bash "$job" >> results/r5/tpu_queue.log 2>&1
  rm -f "$job"
done
echo "=== $(date -u +%H:%M:%S) queue drained ===" >> results/r5/tpu_queue.log
