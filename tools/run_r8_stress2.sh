#!/bin/bash
# r8 stress take 2: 20M e2e with semi-join-reduced verify, then 5M mode-identity
cd /root/repo
echo "=== 20M e2e auto (semi-join verify) ==="
STRESS_DOCS=20000000 STRESS_E2E_ONLY=1 timeout 7200 python tools/curation_stress.py 2>&1 | grep -avE "^26/|^\[Stage"
echo "=== 20M exit: ${PIPESTATUS[0]} ==="
echo "=== 5M compare modes ==="
STRESS_DOCS=5000000 STRESS_E2E_ONLY=1 STRESS_COMPARE_MODES=1 timeout 5400 python tools/curation_stress.py 2>&1 | grep -avE "^26/|^\[Stage"
echo "=== 5M exit: ${PIPESTATUS[0]} ==="
