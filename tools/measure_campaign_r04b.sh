#!/bin/bash
# Round-4 campaign part 2: re-run the dispatch-free differential profiles
# for the components that ran under the old per-dispatch profiler, then
# A/B the chunked Jacobian reuse (the profile-directed per-attempt lever).
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

for c in residual sweeps factor solve; do
  run "profile2_$c"  1800 python tools/profile_components.py --only "$c"
done
run ab_head_jr6      2400 python tools/ab_inproc.py head jr6
run ab_head_jr12     2400 python tools/ab_inproc.py head jr12
touch "$OUT/DONE_CAMPAIGN_B"
echo "$(date) campaign part 2 complete" >> "$OUT/campaign.log"
