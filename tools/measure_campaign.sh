#!/bin/bash
# Round-3 TPU measurement campaign. Waits for the axon tunnel to recover
# (a watcher writes /tmp/tunnel_ok), then runs the ordered measurement
# sequence from CLAUDE.md — each in a FRESH process, strictly serialized
# (one TPU process at a time; host has one CPU), logging everything under
# measurements_r03/. Review + doc refresh stays manual.
set -u
OUT=/root/repo/measurements_r03
mkdir -p "$OUT"
cd /root/repo

echo "$(date) waiting for tunnel..." >> "$OUT/campaign.log"
while [ ! -f /tmp/tunnel_ok ]; do sleep 60; done
echo "$(date) tunnel up; settling 120s" >> "$OUT/campaign.log"
sleep 120

run() {
  local name=$1; shift
  local to=$1; shift
  echo "=== $name: $* ($(date))" >> "$OUT/campaign.log"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($(date))" >> "$OUT/campaign.log"
  sleep 30
}

run bench            2400 python bench.py
for c in residual factor solve newton4 init run; do
  run "profile_$c"   1800 python tools/profile_components.py --only "$c"
done
run ab_paired        3600 python tools/ab_paired.py 5 8
run bench_suite      3600 python bench_suite.py
run latency          1800 python tools/bench_latency.py
touch "$OUT/DONE"
echo "$(date) campaign complete" >> "$OUT/campaign.log"
