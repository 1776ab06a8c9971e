#!/bin/bash
# Record per-subdir scratch growth of live Spark local dirs every 60 s
# (blockmgr-* = RDD/persist blocks, spark-*/... temp_shuffle etc.).
OUT=${1:-/root/repo/.stress_logs/scratch_watch.log}
while true; do
  {
    echo "== $(date -u +%H:%M:%S) free=$(df --output=avail -h / | tail -1 | tr -d ' ')"
    du -s /tmp/blockmgr-* /tmp/spark-* 2>/dev/null | sort -rn | head -6
  } >> "$OUT"
  sleep 60
done
