#!/bin/bash
# Round-4 TPU measurement campaign (VERDICT r3 items 1/3/4/6/7).
# Strictly serialized — one TPU process at a time, fresh process each.
# bench.py itself already ran this round (measurements_r04/bench_head.json).
set -u
OUT=/root/repo/measurements_r04
mkdir -p "$OUT"
cd /root/repo

run() {
  local name=$1; shift
  local to=$1; shift
  echo "=== $name: $* ($(date))" >> "$OUT/campaign.log"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? ($(date))" >> "$OUT/campaign.log"
  sleep 20
}

for c in residual factor solve newton4 init run; do
  run "profile_$c"   1800 python tools/profile_components.py --only "$c"
done
run ab_head_dc1      2400 python tools/ab_inproc.py head dc1
run ab_head_pb1      2400 python tools/ab_inproc.py head pb1
run ab_head_n0       2400 python tools/ab_inproc.py head n0
run bench_suite      5400 python bench_suite.py
run latency          1800 python tools/bench_latency.py
touch "$OUT/DONE_CAMPAIGN"
echo "$(date) campaign complete" >> "$OUT/campaign.log"
