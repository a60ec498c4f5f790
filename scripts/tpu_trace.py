#!/usr/bin/env python
"""Capture a jax.profiler device trace of the production encode — the
CL-event profiling analog (reference lib/OpenCL/Event.cpp:26-29): per-
kernel device times, inspectable with tensorboard/xprof.
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jpegtpu
    from jpegtpu.io import ppm

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jpegtpu_trace"
    img = ppm.read_pnm("/root/reference/data/fruit.ppm")
    jpegtpu.encode(img, quality=90, subsampling="420")   # warm/compile
    print("warmed; tracing...", flush=True)
    with jax.profiler.trace(out_dir):
        for _ in range(5):
            jpegtpu.encode(img, quality=90, subsampling="420")
    files = glob.glob(os.path.join(out_dir, "**", "*"), recursive=True)
    events = [f for f in files if f.endswith((".pb", ".json.gz", ".xplane.pb"))]
    print(f"trace dir {out_dir}: {len(files)} files, "
          f"{len(events)} event files", flush=True)
    assert events, "no trace events captured"
    print("TRACE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
