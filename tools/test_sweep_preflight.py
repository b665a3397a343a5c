#!/usr/bin/env python3
"""Unit-drive sweep_big.preflight's non-fatal (oracle-gate) fallback
with a fake clock and fake /proc pressure — the three cases that define
the r18 behavior:

  1. CPU-only contention outlasting the bounded wait PROCEEDS (True):
     a slow single-threaded oracle is fine; skipping would throw away
     the batch's whole Spark phase.
  2. A squeezed memory cap outlasting the wait SKIPS (False): DuckDB
     sizes its cap once at launch from MemAvailable, so proceeding
     bakes in a spurious OOM FAIL (q_bigram_logprob, sf100r r17).
  3. Contention that decays inside the wait passes normally (True).

Run: python3 tools/test_sweep_preflight.py   (prints OK, exit 0)
"""
import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def load_sweep_big():
    # Pin the knobs sweep_big reads at IMPORT time: ambient
    # GRAFT_SWEEP_LOAD_MAX/AVAIL_MIN_GB would shift the thresholds the
    # fake pressure values are written against, and a leftover
    # GRAFT_SWEEP_FORCE=1 short-circuits preflight entirely — either
    # way the test would pass (or fail) without exercising the
    # fallback it pins (r18 review).
    for k in ("GRAFT_SWEEP_LOAD_MAX", "GRAFT_SWEEP_AVAIL_MIN_GB",
              "GRAFT_SWEEP_FORCE"):
        os.environ.pop(k, None)
    spec = importlib.util.spec_from_file_location(
        "sweep_big_under_test", f"{HERE}/sweep_big.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    sb = load_sweep_big()
    fake_clock = [0.0]
    # sb.time IS the process-wide time module — patch through a
    # restore so an importer calling main() doesn't inherit a frozen
    # clock (r18 review); standalone execution is unaffected.
    real_time, real_sleep = sb.time.time, sb.time.sleep
    sb.time.time = lambda: fake_clock[0]
    sb.time.sleep = lambda s: fake_clock.__setitem__(0, fake_clock[0] + s)
    try:
        # 1. CPU-only contention, memory clear -> proceed
        sb.host_pressure = lambda: (20.0, 120.0)
        fake_clock[0] = 0.0
        assert sb.preflight("cpu-only", fatal=False) is True, \
            "CPU-only contention must proceed after the bounded wait"

        # 2. memory squeezed -> skip
        sb.host_pressure = lambda: (1.0, 10.0)
        fake_clock[0] = 0.0
        assert sb.preflight("mem-squeeze", fatal=False) is False, \
            "memory pressure must skip (it corrupts the DuckDB cap)"

        # 3. contention decays inside the wait -> normal pass
        calls = [0]

        def decaying():
            calls[0] += 1
            return (20.0 if calls[0] < 3 else 2.0, 120.0)

        sb.host_pressure = decaying
        fake_clock[0] = 0.0
        assert sb.preflight("decay", fatal=False) is True, \
            "in-wait decay must pass without reaching the fallback"
    finally:
        sb.time.time, sb.time.sleep = real_time, real_sleep

    print("OK: all 3 preflight fallback cases hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
