#!/usr/bin/env python3
"""Cut bench_drives_baseline.json from the warehouse's drive sidecars.

The drive-cost regression gate (graft.queries.DriveCost.flagRegressions)
compares each collected `_DRIVE_COST.json` sidecar against a committed
baseline at the same (drive, log) key. This script walks the warehouse
(`<root>/<logName>/<fingerprint>/_DRIVE_COST.json`, the layout
DriveCost.collect reads) and emits the baseline in the same shape Bench
writes to bench_drives.json, so parseBaseline's regex reads either file.

Usage:
  python3 tools/drives_baseline.py [warehouse_root] [out_path]
Defaults: /tmp/graft_warehouse  bench_drives_baseline.json
"""
import json
import os
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_warehouse"
    out = sys.argv[2] if len(sys.argv) > 2 else "bench_drives_baseline.json"
    entries = []
    for log in sorted(os.listdir(root)):
        logdir = os.path.join(root, log)
        if not os.path.isdir(logdir):
            continue
        for fp in sorted(os.listdir(logdir)):
            side = os.path.join(logdir, fp, "_DRIVE_COST.json")
            if not os.path.isfile(side):
                continue
            try:
                d = json.load(open(side))
            except Exception as e:
                print(f"[baseline] skipping unreadable {side}: {e}",
                      file=sys.stderr)
                continue
            entries.append({"drive": d.get("drive", "?"), "log": log,
                            "ms": int(d.get("ms", -1)),
                            "tag": d.get("tag", "")})
    entries.sort(key=lambda e: -e["ms"])
    # compact separators: DriveCost.parseBaseline's regex reads the
    # exact `"field":"value"` shape Bench writes — no space after ':'
    with open(out, "w") as f:
        json.dump({"drives": entries, "n": len(entries), "root": root}, f,
                  separators=(",", ":"))
        f.write("\n")
    print(f"[baseline] {len(entries)} drives -> {out} "
          f"(total {sum(e['ms'] for e in entries)/1000.0:.1f} s)")


if __name__ == "__main__":
    main()
