#!/usr/bin/env python
"""Device trace of the CURRENT production 4K program (module-flag
defaults: nat pixel kernel, kb=3 compact), printing per-op in-context
durations — the round-3 attribution refresh after the nat/kb cuts."""

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def summarize(trace_dir, label, n_frames):
    files = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"),
                      recursive=True)
    if not files:
        log(f"{label}: NO perfetto trace found")
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        args = ev.get("args") or {}
        ln = args.get("long_name") or args.get("tf_op") or ""
        if ln:
            name = f"{name} [{ln}]"
        dur[name] += ev.get("dur", 0)
        cnt[name] += 1
    rows = sorted(dur.items(), key=lambda kv: -kv[1])
    tot = sum(dur.values())
    log(f"--- {label}: {tot / 1e3 / n_frames:.2f} ms/frame device total "
        f"({len(rows)} distinct ops) ---")
    for name, d in rows[:22]:
        log(f"  {d / 1e3 / n_frames:7.3f} ms  x{cnt[name] // n_frames:<3d}"
            f" {name[:160]}")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")

    from jpegtpu import encoder as enc_mod
    from jpegtpu.config import EncoderConfig

    sub = sys.argv[1] if len(sys.argv) > 1 else "420"
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    if sub == "gray":
        img = img[..., 0]
    imgd = jax.device_put(jnp.asarray(img))
    cfg = EncoderConfig(quality=90, subsampling=sub,
                        restart_interval="rows")
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))

    n_frames = 8
    fn, _, _ = enc_mod._jitted_encode((h, w), cfg)
    float(probe(fn(imgd)))
    log("warm; tracing")
    d = "/tmp/trace_now"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d, create_perfetto_trace=True):
        outs = [fn(imgd) for _ in range(n_frames)]
        float(probe(outs[-1]))
    summarize(d, f"production {sub}", n_frames)
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
