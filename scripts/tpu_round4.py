#!/usr/bin/env python
"""Round-4 TPU validation + measurement runner.

Waits for the tunnel (device_put probe, bounded retries), then runs the
hardware queue in dependency order, each step a subprocess under a hard
timeout with wedge-tolerant retries, logging to scripts/round4_tpu.log:

  1. correctness gates (must pass before any perf number):
     a. tpu_bisect v3   — full-program bytes vs the XLA oracle (the
        compact split + config-keyed selectors landed since round 3)
     b. tpu_check_mcu_group — grouped entropy path byte parity per mode
        (444 gm=2 / 422 gm=2 / gray gm=8) vs forced gm=1, + A/B timing
  2. probes: tpu_probe_bp_floor (additive floor decomposition + tile
     sweep), tpu_calibrate_roofline (machine rates for docs/ROOFLINE.md)
  3. measurement: bench.py, tpu_datapoints (mode/size/quality sweep)

If a gate FAILS (not timeout): stop. mcu_group revert = force gm=1 in
encoder._entropy_mcu_group; compact-split revert = git revert."""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "scripts", "round4_tpu.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def wait_for_tpu(max_wait_s=7200, probe_timeout=90, interval=300):
    """Ride out a tunnel wedge: a tiny device_put probe until it
    completes (or max_wait expires). Distinguishes WEDGE (devices list,
    transfers stall) from DEAD TERMINAL (no listener on :8103)."""
    t0 = time.time()
    code = ("import jax, numpy as np\n"
            "x = jax.device_put(np.ones((8,128),np.float32))\n"
            "print('TPUOK', float(x.sum()), flush=True)\n")
    while time.time() - t0 < max_wait_s:
        try:
            p = subprocess.run([sys.executable, "-u", "-c", code],
                               cwd=ROOT, timeout=probe_timeout,
                               capture_output=True, text=True)
            if "TPUOK" in p.stdout:
                log("tunnel is live")
                return True
            log(f"probe rc={p.returncode}: "
                f"{(p.stdout + p.stderr).strip()[-200:]}")
        except subprocess.TimeoutExpired:
            try:
                import urllib.request
                urllib.request.urlopen("http://127.0.0.1:8103",
                                       timeout=5)
                state = "WEDGE (listener up, transfers stall)"
            except Exception as e:
                state = (f"listener check: {type(e).__name__} — "
                         f"dead terminal if refused")
            log(f"device_put probe timed out — {state}; retrying in "
                f"{interval}s")
        time.sleep(interval)
    log("gave up waiting for the tunnel")
    return False


def run(name, argv, timeout, retries=2, gate=False):
    timed_out = False
    for attempt in range(retries + 1):
        log(f"=== {name} (attempt {attempt + 1}) ===")
        try:
            p = subprocess.run([sys.executable, "-u"] + argv, cwd=ROOT,
                               timeout=timeout, capture_output=True,
                               text=True)
        except subprocess.TimeoutExpired:
            log(f"{name}: TIMEOUT after {timeout}s (wedge?) — "
                f"{'retrying' if attempt < retries else 'giving up'}")
            timed_out = True
            wait_for_tpu(max_wait_s=1800)
            continue
        tail = "\n".join((p.stdout + p.stderr).splitlines()[-40:])
        with open(LOG, "a") as f:
            f.write(tail + "\n")
        if p.returncode == 0:
            log(f"{name}: OK")
            print(tail, flush=True)
            return "ok"
        log(f"{name}: rc={p.returncode}")
        print(tail, flush=True)
        if gate:
            return "fail"
        timed_out = False
        time.sleep(30)
    return "timeout" if timed_out else "fail"


def main():
    if not wait_for_tpu():
        return 2
    steps = [
        # Current full queue (end of round 4): gates cover every
        # HW-validated default (packed ps_at, gs=8 grouped compact,
        # MCU grouping, divisor tile, flat-RGB parameter).
        ("bisect-v3", ["scripts/tpu_bisect.py", "v3"], 1200, True),
        ("bisect-r0", ["scripts/tpu_bisect.py", "r0"], 1200, True),
        ("ab-compact-groups", ["scripts/tpu_ab_compact_groups.py"],
         1800, True),
        ("check-mcu-group", ["scripts/tpu_check_mcu_group.py"], 1800,
         True),
        ("ab-bp-place", ["scripts/tpu_ab_bp_place.py"], 1800, False),
        ("ab-sm-jb", ["scripts/tpu_ab_sm_jb.py"], 2400, True),
        ("ab-gm4-444", ["scripts/tpu_ab_gm4.py", "444", "2", "4"], 1800,
         True),
        ("probe-img2d", ["scripts/tpu_probe_img2d.py"], 1800, False),
        ("calibrate-roofline", ["scripts/tpu_calibrate_roofline.py"],
         1200, False),
        ("bench", ["bench.py"], 3600, False),
        ("datapoints", ["scripts/tpu_datapoints.py"], 2400, False),
    ]
    for name, argv, timeout, gate in steps:
        status = run(name, argv, timeout, gate=gate)
        if gate and status == "fail":
            log(f"GATE FAILED at {name} — wrong bytes; stopping. "
                f"Reverts: see module docstring")
            return 1
        if gate and status == "timeout":
            log(f"GATE {name} never completed (wedge, NOT a failure) — "
                f"stopping so no perf number lands on unvalidated "
                f"kernels; rerun when the tunnel recovers")
            return 2
    log("round4 TPU queue complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
