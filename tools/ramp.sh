#!/bin/bash
# Clean 3-point bench ramp with loadavg settle-waits between legs.
# Back-to-back legs inherit the previous JVM's decaying 1-minute
# loadavg, tripping Bench's contended flag (loadStart > 3.0) even
# though per-query spreads are tight — so wait for the box to idle
# (1-min load < 2.0, bounded at 8 min) before each leg starts.
set -e
cd /root/repo
settle() {
  for i in $(seq 1 120); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 1.5 else 0)")
    [ "$ok" = 1 ] && return 0
    sleep 5
  done
  echo "[ramp] settle timeout at loadavg $l" >&2
}
run_leg() { # $1 = sf dir, $2 = artifact name
  settle
  echo "[ramp] leg $1 starting at loadavg $(cut -d' ' -f1 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > /tmp/ramp_leg.log 2>&1
  cp bench_runs.json "$2"
  python3 - "$2" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"[ramp] {sys.argv[1]}: total {d['value']}s, {len(d['queries'])} queries, "
      f"contended={d['contended']}, retried={d['retried']}, load={d['loadavg']}")
PY
}
# optional args: leg names to run (001 01 03); default all three
LEGS="${*:-001 01 03}"
for leg in $LEGS; do
  case $leg in
    001) run_leg /root/testdata/sf0.01           bench_scaling_sf001.json ;;
    01)  run_leg /root/testdata/sf0.1            bench_scaling_sf01.json ;;
    03)  run_leg /root/repo/testdata_scale/sf0.3 bench_scaling_sf03.json ;;
  esac
done
echo "[ramp] done"
