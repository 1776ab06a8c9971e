#!/bin/bash
# r8 stress sequence: 5M mode-identity compare, then 20M e2e (auto mode)
set -x
cd /root/repo
echo "=== 5M compare modes ==="
STRESS_DOCS=5000000 STRESS_E2E_ONLY=1 STRESS_COMPARE_MODES=1 \
  timeout 5400 python tools/curation_stress.py 2>&1 | grep -v WARN
echo "=== 5M exit: $? ==="
echo "=== 20M e2e auto ==="
STRESS_DOCS=20000000 STRESS_E2E_ONLY=1 \
  timeout 7200 python tools/curation_stress.py 2>&1 | grep -v WARN
echo "=== 20M exit: $? ==="
