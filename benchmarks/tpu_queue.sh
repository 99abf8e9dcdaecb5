#!/bin/bash
# Sequential TPU job queue for the single tunneled chip.  Jobs are
# numbered scripts in benchmarks/tpu_queue.d/; popped in order.
#
# Relay-aware, twice over:
#  * probe the backend in a bounded subprocess before popping a job
#    (round-3 outages burned whole job timeouts against a dead backend);
#  * watchdog each job: the relay can wedge an in-flight RPC forever
#    (epoll wait, zero CPU, no timeout client-side — observed twice on
#    2026-08-20); if the job's newest output under results/r5 goes
#    stale for >20 min AND the job subtree burns no CPU, kill the
#    subtree and retry the job ONCE.
set -u
cd /root/repo
HOLD_PID=$(awk '{print $2}' /tmp/thickness_pid 2>/dev/null || echo "")
if [ -n "$HOLD_PID" ]; then
  while kill -0 "$HOLD_PID" 2>/dev/null; do sleep 10; done
fi
probe_ok() {
  timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((128,128)); v=float((x@x).sum()); print('PROBE_OK', v)" 2>/dev/null | grep -q PROBE_OK
}
descendants() {  # pids of $1 plus all transitive children
  # NB: cannot use the job's pgid here — GNU timeout setpgid()s itself
  # into a fresh group, so the setsid group holds only the sleeping bash
  # (watchdog then saw 0 CPU on a healthy job and killed the wrong
  # group, observed 12:18 UTC).  Walk the ppid tree instead.
  ps -eo pid=,ppid= | awk -v r="$1" '
    {pid[NR]=$1; pp[NR]=$2}
    END{
      want[r]=1; changed=1
      while(changed){changed=0
        for(i=1;i<=NR;i++) if(!(pid[i] in want) && (pp[i] in want)){want[pid[i]]=1; changed=1}}
      for(p in want) print p
    }'
}
subtree_cpu() {  # total utime+stime ticks of a job subtree
  local total=0 st
  for p in $(descendants "$1"); do
    st=$(awk '{print $14+$15}' /proc/$p/stat 2>/dev/null) || continue
    total=$((total + ${st:-0}))
  done
  echo $total
}
kill_subtree() {  # kill every descendant pid and every pgid it leads
  local pids pgids
  pids=$(descendants "$1")
  pgids=$(ps -o pgid= -p $pids 2>/dev/null | sort -u)
  kill $pids 2>/dev/null
  for g in $pgids; do kill -- "-$g" 2>/dev/null; done
  sleep 5
  kill -9 $pids 2>/dev/null
  for g in $pgids; do kill -9 -- "-$g" 2>/dev/null; done
}
run_job() {  # returns 0 normally, 9 if watchdog killed it
  local job=$1
  setsid bash "$job" >> results/r5/tpu_queue.log 2>&1 &
  local jpid=$!
  local stale=0 last_cpu=0 cpu
  while kill -0 $jpid 2>/dev/null; do
    sleep 60
    kill -0 $jpid 2>/dev/null || break
    cpu=$(subtree_cpu $jpid)
    if [ "$cpu" -le "$((last_cpu + 100))" ]; then  # <1s CPU/min: idle
      stale=$((stale + 1))
    else
      stale=0
    fi
    last_cpu=$cpu
    if [ $stale -ge 20 ]; then
      echo "=== $(date -u +%H:%M:%S) watchdog: $job wedged (no CPU 20 min); killing subtree of $jpid ===" >> results/r5/tpu_queue.log
      kill_subtree $jpid
      return 9
    fi
  done
  wait $jpid 2>/dev/null
  return 0
}
while true; do
  job=$(ls benchmarks/tpu_queue.d/*.sh 2>/dev/null | head -1)
  [ -z "$job" ] && break
  until probe_ok; do
    echo "=== $(date -u +%H:%M:%S) backend down; holding $job ===" >> results/r5/tpu_queue.log
    sleep 120
  done
  # settle after the probe client tears down: three jobs in a row wedged
  # at client init when launched within seconds of a probe (epoll-parked
  # forever); jobs launched without an immediately-preceding probe never
  # did (2026-08-20, 10:58/11:09/11:22 UTC)
  sleep 30
  echo "=== $(date -u +%H:%M:%S) running $job ===" >> results/r5/tpu_queue.log
  if ! run_job "$job"; then
    echo "=== $(date -u +%H:%M:%S) retrying $job once ===" >> results/r5/tpu_queue.log
    until probe_ok; do sleep 120; done
    sleep 30
    run_job "$job" || true
  fi
  rm -f "$job"
done
echo "=== $(date -u +%H:%M:%S) queue drained ===" >> results/r5/tpu_queue.log
