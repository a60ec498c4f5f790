"""CLI driver tests (replaces the reference's flag-less hardcoded driver,
SURVEY §5 'Config / flag system: None')."""

import io

import numpy as np
import pytest

from jpegtpu.cli import main
from jpegtpu.io import ppm


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


def test_cli_encode_roundtrip(tmp_path, smooth_img, capsys):
    src = tmp_path / "img.ppm"
    out = tmp_path / "img.jpg"
    ppm.write_pnm(src, smooth_img)
    rc = main(["encode", str(src), "-o", str(out), "-q", "85",
               "--subsampling", "420"])
    assert rc == 0
    from PIL import Image
    dec = np.asarray(Image.open(out).convert("RGB"))
    assert dec.shape == smooth_img.shape
    assert _psnr(dec, smooth_img) > 25
    assert "bytes" in capsys.readouterr().out


def test_cli_encode_default_output_and_gray(tmp_path):
    src = tmp_path / "g.pgm"
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    ppm.write_pnm(src, gray)
    rc = main(["encode", str(src), "-q", "90"])
    assert rc == 0
    from PIL import Image
    dec = Image.open(tmp_path / "g.jpg")
    assert dec.size == (24, 16)


def test_cli_dump_stages(tmp_path, smooth_img):
    src = tmp_path / "img.ppm"
    ppm.write_pnm(src, smooth_img)
    dump = tmp_path / "stages"
    rc = main(["encode", str(src), "-o", str(tmp_path / "o.jpg"),
               "--dump-stages", str(dump)])
    assert rc == 0
    got = sorted(p.name for p in dump.iterdir())
    assert "img_y.pgm" in got and "img_cb_420.pgm" in got
    y = ppm.read_pnm(dump / "img_y.pgm")
    assert y.shape == smooth_img.shape[:2]


def test_cli_dump_coefficients(tmp_path, smooth_img):
    """--dump-stages must also emit coefficient-level artifacts (quantized
    zigzag blocks + per-segment bit counts) that read back consistently."""
    src = tmp_path / "img.ppm"
    ppm.write_pnm(src, smooth_img)
    dump = tmp_path / "stages"
    rc = main(["encode", str(src), "-o", str(tmp_path / "o.jpg"),
               "-q", "80", "--dump-stages", str(dump)])
    assert rc == 0
    coeffs = np.load(dump / "img_coeffs_zigzag.npy")
    seg_bits = np.load(dump / "img_seg_bits.npy")
    from jpegtpu.config import EncoderConfig
    from jpegtpu.core import ops
    cfg = EncoderConfig(quality=80, subsampling="420")
    my, mx = ops.mcu_grid(*smooth_img.shape[:2], "420")
    assert coeffs.shape == (my * mx, cfg.blocks_per_mcu, 64)
    assert seg_bits.shape == (my,)          # restart='rows': one per row
    assert (seg_bits > 0).all()
    # DC of the first luma block: spatial average maps through DCT+quant
    assert abs(int(coeffs[0, 0, 0])) < 2048


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "backend" in out and "device" in out


def test_cli_bench_json(tmp_path, smooth_img, capsys):
    src = tmp_path / "img.ppm"
    ppm.write_pnm(src, smooth_img)
    rc = main(["bench", str(src), "--iters", "1", "-q", "50"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mpix_s_e2e" in out


def test_cli_bench_stream_json(tmp_path, smooth_img, capsys):
    """cli bench --stream N: sustained-stream mode (round 5, the
    BASELINE config-5 stand-in exposed on the CLI)."""
    src = tmp_path / "img.ppm"
    ppm.write_pnm(src, smooth_img)
    rc = main(["bench", str(src), "--stream", "3", "-q", "50"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sustained_mpixps" in out


def test_bench_supervisor_end_to_end():
    """bench.py's retry supervisor must forward the child's one JSON line
    to stdout (smoke mode: CPU backend, small shape). Round 2 lost its
    official perf artifact to a transient backend failure; this pins the
    supervise->child->JSON pipeline."""
    import json
    import os
    import subprocess
    import sys
    env = dict(os.environ, JPEGTPU_BENCH_CPU="1",
               JPEGTPU_BENCH_SHAPE="160,256",
               JPEGTPU_BENCH_TIMEOUT="240", JPEGTPU_BENCH_BACKOFFS="0,1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                       capture_output=True, text=True, timeout=300, env=env)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0


def test_cli_verify_ok(tmp_path, smooth_img, capsys):
    src = tmp_path / "img.ppm"
    ppm.write_pnm(src, smooth_img)
    rc = main(["verify", str(src), "-q", "85"])
    assert rc == 0
    assert "OK" in capsys.readouterr().out


def test_cli_verify_fails_on_corrupt_scan(tmp_path, smooth_img,
                                          monkeypatch, capsys):
    """One corrupted scan byte must flip verify to exit 1 (the PSNR gate
    vs PIL at the same settings) — verify is a gate, not a report."""
    from jpegtpu import encoder as enc_mod
    src = tmp_path / "img.ppm"
    ppm.write_pnm(src, smooth_img)
    real_encode = enc_mod.Encoder.encode

    def corrupt(self, img):
        jpg = bytearray(real_encode(self, img))
        # Flip bits mid-scan (well after the headers, before EOI): DC
        # drift corrupts the remainder of the decoded row strip.
        jpg[len(jpg) // 2] ^= 0x5A
        return bytes(jpg)

    monkeypatch.setattr(enc_mod.Encoder, "encode", corrupt)
    rc = main(["verify", str(src), "-q", "85"])
    assert rc == 1
    assert "FAIL" in capsys.readouterr().out


def test_cli_encode_batch_mode(tmp_path, smooth_img, capsys):
    """--batch groups same-shaped inputs through encode_batch (one device
    program per group on TPU; per-image fallback elsewhere) and writes
    every output, including a gray odd-one-out in its own group."""
    rng = np.random.default_rng(2)
    paths = []
    for i in range(3):
        p = tmp_path / f"c{i}.ppm"
        ppm.write_pnm(p, smooth_img)
        paths.append(str(p))
    gray = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    gp = tmp_path / "g.pgm"
    ppm.write_pnm(gp, gray)
    paths.append(str(gp))
    rc = main(["encode", "--batch", *paths, "-q", "85"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2 shape groups" in out
    from PIL import Image
    for i in range(3):
        dec = Image.open(tmp_path / f"c{i}.jpg")
        assert dec.size == (smooth_img.shape[1], smooth_img.shape[0])
    assert Image.open(tmp_path / "g.jpg").size == (24, 16)
