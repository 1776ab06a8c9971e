#!/bin/bash
# Record per-kind scratch growth of live Spark block managers every
# 60 s: shuffle_* (shuffle files), rdd_* (persist/localCheckpoint
# blocks), temp_* / broadcast (in-flight).
OUT=${1:-/root/repo/.stress_logs/scratch_watch.log}
while true; do
  {
    echo "== $(date -u +%H:%M:%S) free=$(df --output=avail -h / | tail -1 | tr -d ' ')"
    for B in /tmp/blockmgr-*; do
      [ -d "$B" ] || continue
      find "$B" -type f -printf "%f %s\n" 2>/dev/null | awk -v b="$B" '
        /^shuffle_/ {sh+=$2; next}
        /^rdd_/ {rdd+=$2; next}
        {o+=$2}
        END{printf "%s shuffle=%.1fG rdd=%.1fG other=%.1fG\n", b, sh/1e9, rdd/1e9, o/1e9}'
    done
  } >> "$OUT"
  sleep 60
done
