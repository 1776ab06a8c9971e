"""Aggregate per-stage shuffle write/read bytes from a Spark event
log (JSON lines) — post-mortem attribution for scratch blowups.

Usage: python tools/parse_eventlog.py /tmp/spark-events/<app-id>
Prints stages sorted by shuffle write bytes with their callsites.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str) -> None:
    stages = {}
    write_b = defaultdict(int)
    read_b = defaultdict(int)
    spill_b = defaultdict(int)
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = si.get("Details", "").split("\n")[0][:120] or si.get("Stage Name", "")
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                sw = (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
                sr = (m.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + (
                    m.get("Shuffle Read Metrics") or {}
                ).get("Local Bytes Read", 0)
                write_b[sid] += sw
                read_b[sid] += sr
                spill_b[sid] += m.get("Disk Bytes Spilled", 0)
    rows = sorted(write_b.items(), key=lambda kv: -kv[1])
    total = sum(write_b.values())
    print(f"total shuffle write: {total/1e9:.2f} GB")
    for sid, wb in rows[:40]:
        if wb < 50e6 and spill_b[sid] < 50e6:
            continue
        print(
            f"stage {sid:4d}  write {wb/1e9:7.2f} GB  read {read_b[sid]/1e9:7.2f} GB"
            f"  spill {spill_b[sid]/1e9:6.2f} GB  {stages.get(sid, '?')}"
        )


if __name__ == "__main__":
    main(sys.argv[1])
