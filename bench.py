#!/usr/bin/env python
"""Headline benchmark: 4K q=90 4:2:0 encode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured quantity: the full device encode pipeline — fused pixel-path matmul
+ Pallas entropy kernels (symbolize, per-block pack, segment merge, stream
compaction, byte-stuffing + RST splice) — synchronized per frame via a
dependent scalar fetch. The device output IS the complete entropy scan
(device_stuff on by default): remaining host work is one fetch of
total_scan_bytes plus JFIF header concatenation. The host link transfer is
excluded: this environment reaches the chip through a network tunnel whose
device->host path runs at a few MB/s with hundreds of ms latency, so
including it would benchmark the tunnel, not the encoder; on a real v5e
host (PCIe, tens of GB/s) the ~1-3 MB/frame of compressed output is
sub-millisecond and overlaps with compute. The reference's own comparison
likewise times kernels via CL event profiling, not host round-trips
(src/OpenCLProject_JpegEncoder.cpp:622-629).

vs_baseline: BASELINE.json's north star is >=10x the reference OpenCL GPU
4K throughput on one chip. The reference publishes no numbers (BASELINE.md);
extrapolating its per-stage GPU times from the one hardcoded 256x256 run to
4K puts it at ~8 MPix/s on period hardware, so the 10x target is 80 MPix/s,
used as the denominator here.

Failure hardening: the TPU tunnel intermittently fails in two modes
(CLAUDE.md) — a WEDGE (backend up, device ops stall or first init raises
UNAVAILABLE; recovers in minutes) and a DEAD TERMINAL (the axon relay is
gone; nothing but the environment can revive it). Round 2 lost its official
perf artifact to a single transient init failure, so this script now runs
the measurement in a child process (fresh interpreter = fresh backend init)
under a hard timeout, with bounded backoff retries; the persistent compile
cache (.jax_cache) makes post-recovery attempts cheap. Only the final JSON
line goes to stdout; diagnostics go to stderr.
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

ATTEMPT_TIMEOUT = int(os.environ.get("JPEGTPU_BENCH_TIMEOUT", 580))
BACKOFFS = [int(x) for x in os.environ.get(
    "JPEGTPU_BENCH_BACKOFFS", "0,45,90,180,240").split(",")]


def _listener_up() -> bool:
    """True if the axon relay is listening (wedge) — False means the
    DEAD TERMINAL mode where only the environment can restart it."""
    try:
        with socket.create_connection(("127.0.0.1", 8103), timeout=5):
            return True
    except OSError:
        return False


def supervise() -> int:
    last_tail = ""
    for attempt, delay in enumerate(BACKOFFS, 1):
        if delay:
            print(f"[bench] backing off {delay}s", file=sys.stderr,
                  flush=True)
            time.sleep(delay)
        mode = "up" if _listener_up() else "DOWN (dead terminal?)"
        print(f"[bench] attempt {attempt}/{len(BACKOFFS)} "
              f"(axon listener {mode})", file=sys.stderr, flush=True)
        try:
            args = [sys.executable, "-u", os.path.abspath(__file__),
                    "--run"]
            if "--stream" in sys.argv:
                args.append("--stream")
            p = subprocess.run(
                args, timeout=ATTEMPT_TIMEOUT, capture_output=True,
                text=True)
        except subprocess.TimeoutExpired as e:
            print(f"[bench] attempt {attempt} timed out after "
                  f"{ATTEMPT_TIMEOUT}s (tunnel wedge?)", file=sys.stderr,
                  flush=True)
            err = e.stderr or b""
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
            last_tail = err[-2000:]
            continue
        if p.stderr:
            sys.stderr.write(p.stderr[-4000:])
            sys.stderr.flush()
        line = next((ln for ln in reversed(p.stdout.splitlines())
                     if ln.startswith("{")), None)
        if p.returncode == 0 and line:
            print(line, flush=True)     # the one JSON line on stdout
            return 0
        print(f"[bench] attempt {attempt} failed rc={p.returncode}",
              file=sys.stderr, flush=True)
        last_tail = p.stdout[-2000:]
    print(f"[bench] all attempts failed; last output tail:\n{last_tail}",
          file=sys.stderr, flush=True)
    return 1


def run_bench() -> int:
    import jax
    if os.environ.get("JPEGTPU_BENCH_CPU"):      # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from jpegtpu.config import EncoderConfig
    from jpegtpu.encoder import Encoder, _jitted_encode

    h, w = (int(x) for x in os.environ.get(
        "JPEGTPU_BENCH_SHAPE", "2160,3840").split(","))
    rng = np.random.default_rng(0)
    # Structured (JPEG-like) content, not white noise: gradients + texture.
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] +
                  rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)

    import dataclasses

    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")

    # Correctness gate: the full encode must produce a JPEG an independent
    # decoder accepts, at fidelity no worse than PIL's own encoder at the
    # same settings minus a 0.5 dB margin (computed dynamically per content,
    # same floor as `cli verify` — a hardcoded threshold let a ~1.3 dB
    # quality regression pass, VERDICT r3 weak #4). A corrupted scan body
    # cannot post a headline number.
    from jpegtpu.cli import VERIFY_PSNR_MARGIN_DB, _pil_reference_psnr
    psnr_floor = _pil_reference_psnr(img, 90, "420") - VERIFY_PSNR_MARGIN_DB

    def gated_encode(cfg):
        enc = Encoder(cfg)
        jpg = enc.encode(img)
        assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
        import io as _io

        from PIL import Image
        dec = np.asarray(Image.open(_io.BytesIO(jpg)).convert("RGB"),
                         dtype=np.float64)
        mse = float(np.mean((dec - img.astype(np.float64)) ** 2))
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
        assert psnr > psnr_floor, (
            f"decoded PSNR {psnr:.2f} dB below the {psnr_floor:.2f} dB "
            f"PIL-parity gate — corrupt output?")
        return jpg, psnr

    # Round-2-validated baseline kernel selection, as a plain config value
    # (no module-global mutation; the selectors are jit-cache-keyed
    # EncoderConfig fields since round 4).
    baseline_cfg = dataclasses.replace(cfg, pixel_path="xla", compact_kb=1,
                                       bp_merge_rot=False, fuse_bp=False,
                                       compact_groups=1)
    try:
        jpg, psnr = gated_encode(cfg)
    except Exception as e:
        if cfg == baseline_cfg:
            raise
        # The batched compact kernel / natural-layout pixel kernel are
        # the newest Mosaic constructs in the program; if compilation or
        # the correctness gate fails, fall back to the round-2-validated
        # baseline kernels rather than losing the round's official
        # artifact.
        print(f"[bench] production config failed ({type(e).__name__}: "
              f"{e}); retrying with round-2 baseline kernel config",
              file=sys.stderr, flush=True)
        cfg = baseline_cfg
        jpg, psnr = gated_encode(cfg)

    # Device-pipeline throughput, amortized: frames are queued back-to-back
    # (steady-state pipelining) and one dependent scalar fetch at the end
    # forces completion of the whole chain. Subtracting the 1-frame chain
    # removes the fixed dispatch+fetch round-trip (~30 ms through this
    # tunnel), which would otherwise dominate per-frame numbers.
    fn, _, kind = _jitted_encode((h, w), cfg)
    # flat-RGB [H, W*3] parameter (see encoder._run_device): saves
    # ~0.34 ms/4K of device relayout copies, byte-identical
    imgd = jax.device_put(jnp.asarray(img.reshape(h, -1)))
    probe = jax.jit(lambda o: jnp.sum(o[1]) +
                    jnp.sum(o[0][::4099].astype(jnp.int32)))
    float(probe(fn(imgd)))  # warm both programs

    def chain(k):
        t0 = time.perf_counter()
        outs = [fn(imgd) for _ in range(k)]
        float(probe(outs[-1]))
        return time.perf_counter() - t0

    if "--stream" in sys.argv:
        # Sustained image-STREAM mode (BASELINE config 5's single-chip
        # stand-in, VERDICT r4 #8): N DISTINCT frames round-robin over a
        # device-resident 4-frame ring, dispatched back-to-back with one
        # dependent scalar fetch at the end. Distinct content defeats
        # any same-input caching illusion and exercises steady-state
        # dispatch; frames are device-resident because the tunnel's
        # host<->device link runs at a few MB/s (a 25 MB/frame upload
        # would benchmark the tunnel — on a real v5e host the PCIe
        # upload overlaps compute; same exclusion argument as the
        # headline). The 1-frame chain subtraction removes the fixed
        # dispatch+fetch round trip exactly as the headline does, so
        # the two numbers are directly comparable: a sustained number
        # below the per-frame one exposes dispatch-gap loss.
        from jpegtpu.bench.stages import sustained_stream
        n_stream = int(os.environ.get("JPEGTPU_BENCH_STREAM", "20"))
        ring = [imgd]
        for i in range(1, 4):
            alt = np.clip(
                np.roll(base, 173 * i, axis=1)[..., None] +
                rng.normal(0, 12, (h, w, 3)), 0, 255).astype(np.uint8)
            ring.append(jax.device_put(jnp.asarray(alt.reshape(h, -1))))
        dt, dispatch_bound = sustained_stream(fn, ring, n_stream, probe)
        sustained = (h * w) / dt / 1e6
        print(json.dumps({
            "metric": f"encode_stream_sustained_{h}x{w}_q90_420_device",
            "value": round(sustained, 2),
            "unit": "MPix/s/chip",
            "vs_baseline": round(sustained / 80.0, 3),
            "sustained_mpixps": round(sustained, 2),
            "frames": n_stream,
            "distinct_frames": 4,
            "dispatch_bound": dispatch_bound,
            "psnr_db": round(psnr, 2),
        }))
        return 0

    d1 = min(chain(1) for _ in range(3))
    d21 = min(chain(21) for _ in range(3))
    dt = (d21 - d1) / 20
    mpix_s = (h * w) / dt / 1e6

    target = 80.0
    smoke = (h, w) != (2160, 3840) or os.environ.get("JPEGTPU_BENCH_CPU")
    print(json.dumps({
        "metric": ("encode_throughput_smoke" if smoke else
                   "encode_throughput_4k_q90_420_device"),
        "value": round(mpix_s, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(mpix_s / target, 3),
        "psnr_db": round(psnr, 2),
        "psnr_floor_db": round(psnr_floor, 2),
        "bytes": len(jpg),
        "compact_kb": cfg.compact_kb,
        "compact_groups": cfg.compact_groups,
        "bp_merge_rot": cfg.bp_merge_rot,
        "pixel_path": cfg.pixel_path,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(run_bench() if "--run" in sys.argv else supervise())
