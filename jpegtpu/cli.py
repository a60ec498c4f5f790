"""Command-line driver.

The reference's driver has no CLI at all — image path, quality, work sizes
are compiled in (src/OpenCLProject_JpegEncoder.cpp:255-320; SURVEY §5
'Config / flag system: None'). This replaces it with a real flag system:

    python -m jpegtpu.cli encode in.ppm [in2.ppm ...] -o out.jpg \
        -q 90 --subsampling 420 --restart rows
    python -m jpegtpu.cli info                       # device banner
    python -m jpegtpu.cli bench in.ppm --stages      # per-stage telemetry
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_encode_flags(p):
    p.add_argument("-q", "--quality", type=int, default=90)
    p.add_argument("--subsampling",
                   choices=["444", "444s", "420", "422", "gray"],
                   default="420")
    p.add_argument("--restart", default="rows",
                   help="restart interval in MCUs, 0 to disable, or 'rows'")
    p.add_argument("--no-pallas", action="store_true",
                   help="use the XLA oracle paths end to end")
    p.add_argument("--host-bitpack", action="store_true",
                   help="disable on-device entropy kernels")
    p.add_argument("--dump-stages", metavar="DIR", default=None,
                   help="write intermediate stage images (YCbCr planes, "
                        "padded/subsampled chroma) as PGMs for inspection — "
                        "the reference's debug-artifact workflow (SURVEY "
                        "§4.1) as an opt-in flag")
    p.add_argument("--batch", action="store_true",
                   help="throughput mode: load inputs concurrently and "
                        "run same-shaped color groups as ONE device "
                        "program (encoder.encode_batch)")


def _config(args):
    from jpegtpu.config import EncoderConfig
    restart = args.restart if args.restart == "rows" else int(args.restart)
    return EncoderConfig(quality=args.quality, subsampling=args.subsampling,
                         restart_interval=restart,
                         use_pallas=not args.no_pallas,
                         device_bitpack=not args.host_bitpack)


def _out_path(args, path) -> str:
    if args.output and len(args.inputs) == 1:
        return args.output
    base = args.output or ""
    stem = os.path.splitext(os.path.basename(path))[0] + ".jpg"
    return (os.path.join(base, stem) if base
            else os.path.splitext(path)[0] + ".jpg")


def _cmd_encode_batch(args, cfg) -> int:
    """Throughput mode: concurrent loads (native PNM fast path), then one
    fused device program per same-shaped color group; gray/odd-one-out
    images fall back to the per-image encoder inside encode_batch."""
    import dataclasses

    from jpegtpu import encoder as enc_mod
    from jpegtpu.io import loader

    imgs = loader.load_images(args.inputs)
    groups = loader.group_by_shape(imgs)
    jpgs: dict = {}
    t0 = time.perf_counter()
    for shape, idxs in groups.items():
        sub = cfg.subsampling if len(shape) == 3 else "gray"
        gcfg = dataclasses.replace(cfg, subsampling=sub)
        files = enc_mod.encode_batch([imgs[i] for i in idxs], config=gcfg)
        jpgs.update(zip(idxs, files))
    dt = time.perf_counter() - t0
    total = 0
    for i, path in enumerate(args.inputs):
        out = _out_path(args, path)
        with open(out, "wb") as f:
            f.write(jpgs[i])
        total += len(jpgs[i])
    mpix = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    print(f"{len(imgs)} images ({len(groups)} shape group"
          f"{'s' if len(groups) != 1 else ''}) -> {total} bytes in "
          f"{dt * 1e3:.1f} ms ({mpix / dt:.1f} MPix/s incl. compile)")
    return 0


def cmd_encode(args) -> int:
    from jpegtpu.encoder import Encoder
    from jpegtpu.io import ppm

    import dataclasses

    cfg = _config(args)
    if args.batch and len(args.inputs) > 1:
        return _cmd_encode_batch(args, cfg)
    enc = Encoder(cfg)
    gray_enc = None
    outputs = []
    for i, path in enumerate(args.inputs):
        img = ppm.read_pnm(path)
        if img.ndim == 2:
            # PGM input -> single-component grayscale JPEG
            if gray_enc is None:
                gray_enc = Encoder(dataclasses.replace(
                    cfg, subsampling="gray"))
            use = gray_enc
        else:
            use = enc
        if args.dump_stages and img.ndim == 3:
            _dump_stages(img, _config(args), args.dump_stages,
                         os.path.splitext(os.path.basename(path))[0])
        t0 = time.perf_counter()
        jpg = use.encode(img)
        dt = time.perf_counter() - t0
        out = _out_path(args, path)
        with open(out, "wb") as f:
            f.write(jpg)
        outputs.append(out)
        h, w = img.shape[:2]
        print(f"{path} [{w}x{h}] -> {out} ({len(jpg)} bytes, "
              f"{dt * 1e3:.1f} ms incl. first-use compile)" if i == 0 else
              f"{path} [{w}x{h}] -> {out} ({len(jpg)} bytes, "
              f"{dt * 1e3:.1f} ms)")
    return 0


def _dump_stages(img, cfg, out_dir, stem):
    """Write per-stage debug artifacts (the reference dumps PPMs after each
    CPU stage, src/OpenCLProject_JpegEncoder.cpp:32-123; here it's opt-in)."""
    import numpy as np
    from jpegtpu.core import ops
    from jpegtpu.io import ppm

    os.makedirs(out_dir, exist_ok=True)
    ycc = np.asarray(ops.rgb_to_ycbcr(img))
    names = ["y", "cb", "cr"]
    for c, n in enumerate(names):
        ppm.write_pnm(os.path.join(out_dir, f"{stem}_{n}.pgm"),
                      np.clip(ycc[..., c], 0, 255).astype(np.uint8))
    padded = np.asarray(ops.pad_to_multiple(ycc, cfg.mcu_size))
    ppm.write_pnm(os.path.join(out_dir, f"{stem}_y_padded.pgm"),
                  np.clip(padded[..., 0], 0, 255).astype(np.uint8))
    if cfg.subsampling == "420":
        import jax.numpy as jnp
        _, cb, cr = ops.downsample_chroma_420(jnp.asarray(padded))
        ppm.write_pnm(os.path.join(out_dir, f"{stem}_cb_420.pgm"),
                      np.clip(np.asarray(cb), 0, 255).astype(np.uint8))
        ppm.write_pnm(os.path.join(out_dir, f"{stem}_cr_420.pgm"),
                      np.clip(np.asarray(cr), 0, 255).astype(np.uint8))

    # Coefficient-level artifacts: quantized zigzag blocks and per-segment
    # bit counts — the analog of the reference's 8x8 preview printers
    # (src/utils.cpp:352-451), for diagnosing TPU-vs-oracle divergence.
    if cfg.subsampling != "444s":
        import jax.numpy as jnp
        from jpegtpu.entropy import scan as escan
        coeffs = np.asarray(ops.encode_blocks(img, cfg.quality,
                                              cfg.subsampling))
        np.save(os.path.join(out_dir, f"{stem}_coeffs_zigzag.npy"), coeffs)
        _, mx = ops.mcu_grid(*img.shape[:2], cfg.subsampling)
        restart = cfg.resolve_restart(mx)
        lens, _ = escan.symbolize_scan(jnp.asarray(coeffs), cfg.n_luma,
                                       restart)
        per_mcu = np.asarray(lens).reshape(coeffs.shape[0], -1).sum(axis=1)
        if restart > 0:
            seg_bits = np.add.reduceat(
                per_mcu, np.arange(0, per_mcu.size, restart))
        else:
            seg_bits = per_mcu.sum(keepdims=True)
        np.save(os.path.join(out_dir, f"{stem}_seg_bits.npy"), seg_bits)


def cmd_info(args) -> int:
    """Device banner — the analog of OpenCL::printDeviceInfo
    (lib/OpenCL/Device.cpp:33-43)."""
    import jax
    import jpegtpu
    from jpegtpu import native

    from jpegtpu.config import EncoderConfig

    print(f"jpegtpu {jpegtpu.__version__}")
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device {d.id}: {d.device_kind} ({d.platform})")
    print(f"native helpers: {'loaded' if native.available() else 'absent'}")
    cfg = EncoderConfig()  # default config = env-resolved kernel selectors
    print(f"kernel paths: pixel_path={cfg.pixel_path} "
          f"compact_kb={cfg.compact_kb} compact_groups={cfg.compact_groups} "
          f"fuse_bp={cfg.fuse_bp} bp_merge_rot={cfg.bp_merge_rot}")
    return 0


def _pil_reference_psnr(img, quality: int, subsampling: str) -> float:
    """PSNR of PIL's own JPEG encoder at the same settings — the dynamic
    per-content quality floor for the verify gate."""
    import io as _io

    import numpy as np
    from PIL import Image

    pil_sub = {"444": 0, "422": 1, "420": 2}.get(subsampling, 0)
    buf = _io.BytesIO()
    mode = "L" if img.ndim == 2 else "RGB"
    kw = {} if img.ndim == 2 else {"subsampling": pil_sub}
    Image.fromarray(img, mode).save(buf, "JPEG", quality=quality, **kw)
    dec = Image.open(buf)
    arr = np.asarray(dec.convert("RGB") if img.ndim == 3 else dec)
    mse = np.mean((arr.astype(np.float64) - img.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


# verify passes if decoded PSNR is within this many dB of PIL's own
# encoder at the same quality/subsampling (exact table parity is covered
# by the test suite; this is the operator-facing corruption gate).
VERIFY_PSNR_MARGIN_DB = 0.5


def cmd_verify(args) -> int:
    """Encode -> independent decode (PIL) -> PSNR/size gate: the
    operator-facing replacement for the reference's eyeball-the-PPM-dumps
    verification loop (SURVEY §4). Exit 1 on decoder failure, shape
    mismatch, or PSNR more than VERIFY_PSNR_MARGIN_DB below PIL's own
    encoder at the same settings."""
    import io as _io

    import numpy as np
    from PIL import Image

    from jpegtpu.encoder import Encoder
    from jpegtpu.io import loader

    cfg = _config(args)
    imgs = loader.load_images(args.inputs)
    enc = Encoder(cfg)
    import dataclasses
    ok = True
    for path, img in zip(args.inputs, imgs):
        use = enc
        sub = cfg.subsampling
        if img.ndim == 2:
            sub = "gray"
            use = Encoder(dataclasses.replace(cfg, subsampling=sub))
        jpg = use.encode(img)
        try:
            dec = Image.open(_io.BytesIO(jpg))
            arr = np.asarray(dec.convert("RGB") if img.ndim == 3 else dec)
        except Exception as e:
            print(f"{path}: FAIL decoder rejected output ({e})")
            ok = False
            continue
        if arr.shape != img.shape:
            print(f"{path}: FAIL decoded shape {arr.shape} != {img.shape}")
            ok = False
            continue
        mse = np.mean((arr.astype(np.float64) - img.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        floor = (_pil_reference_psnr(img, cfg.quality, sub) -
                 VERIFY_PSNR_MARGIN_DB)
        raw = img.size
        if psnr < floor:
            print(f"{path}: FAIL PSNR {psnr:.2f} dB below the "
                  f"{floor:.2f} dB gate (PIL at the same settings "
                  f"- {VERIFY_PSNR_MARGIN_DB} dB)")
            ok = False
            continue
        print(f"{path}: OK {len(jpg)}B ({raw / len(jpg):.1f}:1) "
              f"PSNR {psnr:.2f} dB (gate {floor:.2f})")
    return 0 if ok else 1


def cmd_bench(args) -> int:
    import numpy as np
    from jpegtpu.bench import stages
    from jpegtpu.io import ppm

    if args.inputs:
        img = ppm.read_pnm(args.inputs[0])
    else:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (2160, 3840, 3), dtype=np.uint8)
    cfg = _config(args)
    if args.stages:
        if args.trace:
            # Device trace capture — the CL-event profiling analog
            # (/root/reference/lib/OpenCL/Event.cpp:26-29): per-kernel
            # device times, not just host wall-clock chains.
            import jax
            with jax.profiler.trace(args.trace):
                print(stages.speedup_table(img, cfg))
            print(f"device trace written to {args.trace} "
                  f"(inspect with tensorboard/xprof)")
        else:
            print(stages.speedup_table(img, cfg))
    elif getattr(args, "stream", 0):
        # Sustained stream on a user image — the shared
        # stages.sustained_stream methodology (same as bench.py
        # --stream, so the numbers are directly comparable).
        import jax
        import jax.numpy as jnp

        from jpegtpu.encoder import _jitted_encode
        # Same input validation as Encoder.encode (the stream branch
        # calls the jitted program directly, which would otherwise
        # crash deep in the device trace on a shape mismatch).
        if cfg.subsampling == "gray":
            if img.ndim == 3 and img.shape[2] == 1:
                img = img[..., 0]
            if img.ndim != 2:
                raise SystemExit(
                    f"gray mode expects [H, W] input, got {img.shape}")
        elif img.ndim != 3 or img.shape[2] != 3:
            raise SystemExit(f"expected [H, W, 3] RGB, got {img.shape}")
        h, w = img.shape[:2]
        fn, _, _ = _jitted_encode((h, w), cfg)
        dev = jax.device_put(jnp.asarray(
            img if cfg.subsampling == "gray" else img.reshape(h, -1)))
        probe = jax.jit(lambda o: jnp.sum(o[1]) +
                        jnp.sum(o[0].reshape(-1)[::4099].astype(jnp.int32)))
        n = args.stream
        dt, dispatch_bound = stages.sustained_stream(fn, [dev], n, probe)
        print(json.dumps({
            "image": f"{w}x{h}", "frames": n,
            "ms_per_frame_sustained": round(dt * 1e3, 2),
            "sustained_mpixps": round(h * w / dt / 1e6, 2),
            "dispatch_bound": dispatch_bound}))
    else:
        from jpegtpu.encoder import Encoder
        enc = Encoder(cfg)
        enc.encode(img)
        n = args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            jpg = enc.encode(img)
        dt = (time.perf_counter() - t0) / n
        h, w = img.shape[:2]
        print(json.dumps({
            "image": f"{w}x{h}", "bytes": len(jpg),
            "ms_per_frame_e2e": round(dt * 1e3, 2),
            "mpix_s_e2e": round(h * w / dt / 1e6, 2)}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jpegtpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("encode", help="encode PPM images to JPEG")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--output", default=None,
                   help="output file (single input) or directory")
    _add_encode_flags(p)
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("info", help="print device/backend banner")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("verify", help="encode then decode (PIL) and report "
                                      "PSNR/size per input")
    p.add_argument("inputs", nargs="+")
    _add_encode_flags(p)
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("bench", help="benchmark encode throughput")
    p.add_argument("inputs", nargs="*")
    p.add_argument("--stages", action="store_true",
                   help="per-stage telemetry table")
    p.add_argument("--trace", metavar="DIR", default=None,
                   help="with --stages: capture a jax.profiler device "
                        "trace (per-kernel device times) into DIR")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--stream", type=int, metavar="N", default=0,
                   help="sustained-stream mode: pipeline N frames "
                        "(device-dispatched back-to-back, one dependent "
                        "sync) and report sustained MPix/s — the "
                        "BASELINE config-5 image-stream stand-in")
    _add_encode_flags(p)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
