"""CI slice of the object-store crash-point fuzz (r9).

The full sweep lives in ``tools/crash_fuzz.py`` (``objcrash`` family
of ``tools/fuzz_all.py``, 24 seeds).  This pins a handful of seeds —
including ones verified to crash mid-pass — so the convergence
invariant (recovery writer steals the expired lease and serves exactly
the landed batches) is exercised on every test run.
"""

import pytest


class TestCrashRecovery:
    # a spread of seeds over the kill-point range (the instrumented
    # sweep measured 18/24 crashing inside the maintenance pass across
    # before/after-op, bucketed, plain and retention variants; the
    # rest exercise crash-free convergence)
    @pytest.mark.parametrize("seed", [2, 3, 14, 19, 21, 8])
    def test_converges_after_injected_crash(self, spark, seed):
        from tools.crash_fuzz import run_seed

        err = run_seed(spark, seed)
        assert err is None, err
