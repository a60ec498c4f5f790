#!/usr/bin/env python
"""Round-3 TPU validation + measurement runner.

Runs the hardware queue in dependency order the moment the tunnel is
back, each step as a subprocess under a hard timeout with one retry
(wedge tolerance), logging to stdout and scripts/round3_tpu.log:

  1. correctness gates (must pass before any perf number):
     a. tpu_compact_direct  — adversarial compact vectors on HW
        (drain fix, plane-2 lax.cond TRUE branch)
     b. tpu_bisect v3 / r0 / nostuff — full-program bytes vs XLA oracle
  2. A/Bs (each asserts byte equality internally):
     a. tpu_ab_compact_p2   — conditional plane 2 vs 3-plane baseline
     b. tpu_probe_pixel_dma — DMA-input pixel kernel vs XLA pixel path
  3. measurement: bench.py, tpu_datapoints, cli bench --stages

If a correctness gate FAILS (not timeout), stop: the queue in the memory
note round3-hw-validation-queue says what to revert."""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "scripts", "round3_tpu.log")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(name, argv, timeout, retries=1, gate=False):
    """Returns 'ok', 'fail' (nonzero rc — a real result), or 'timeout'
    (tunnel wedge — NOT a failure; the step never produced a verdict)."""
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
            time.sleep(60)
            continue
        tail = "\n".join((p.stdout + p.stderr).splitlines()[-25:])
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
    steps = [
        ("compact-direct", ["scripts/tpu_compact_direct.py"], 590, True),
        ("bisect-v3", ["scripts/tpu_bisect.py", "v3"], 590, True),
        ("bisect-r0", ["scripts/tpu_bisect.py", "r0"], 590, True),
        ("bisect-nostuff", ["scripts/tpu_bisect.py", "nostuff"], 590, True),
        ("ab-compact-p2", ["scripts/tpu_ab_compact_p2.py"], 590, False),
        ("ab-pixel-dma", ["scripts/tpu_probe_pixel_dma.py"], 590, False),
        ("bench", ["bench.py"], 3600, False),
        ("datapoints", ["scripts/tpu_datapoints.py"], 1800, False),
        ("stages", ["-m", "jpegtpu.cli", "bench", "--stages"], 1200,
         False),
    ]
    for name, argv, timeout, gate in steps:
        status = run(name, argv, timeout, gate=gate)
        if gate and status == "fail":
            log(f"GATE FAILED at {name} — a kernel produced wrong bytes; "
                f"stopping. See memory note round3-hw-validation-queue "
                f"for the revert plan")
            return 1
        if gate and status == "timeout":
            log(f"GATE {name} never completed (tunnel wedge, NOT a "
                f"failure) — kernels remain unvalidated; stopping so no "
                f"perf number is taken on unvalidated kernels. Rerun "
                f"when the tunnel recovers")
            return 2
    log("round3 TPU queue complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
