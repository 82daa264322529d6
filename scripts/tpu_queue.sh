#!/bin/bash
# Sequential TPU job runner: one axon process at a time, >=75 s between
# jobs (relay-wedge lore, .claude/skills/verify/SKILL.md).  Each job runs
# under its own generous timeout so it exits on its own rather than being
# killed mid-dispatch.  Usage: bash scripts/tpu_queue.sh <joblist file>
# where each line is: <timeout_s> <logfile> <command...>
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
while IFS= read -r line; do
  [ -z "$line" ] && continue
  [ "${line:0:1}" = "#" ] && continue
  t=$(echo "$line" | awk '{print $1}')
  logf=$(echo "$line" | awk '{print $2}')
  cmd=$(echo "$line" | cut -d' ' -f3-)
  echo "=== $(date -u +%H:%M:%S) running (timeout ${t}s): $cmd" >> results/tpu_queue.log
  timeout "$t" bash -c "$cmd" > "$logf.out" 2> "$logf.err"
  rc=$?
  echo "=== $(date -u +%H:%M:%S) rc=$rc: $cmd" >> results/tpu_queue.log
  sleep 75
done < "$1"
echo "=== $(date -u +%H:%M:%S) queue done" >> results/tpu_queue.log
