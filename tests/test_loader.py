"""Batch loader tests."""

import numpy as np
import pytest

from jpegtpu.io import loader, ppm


@pytest.fixture
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    shapes = [(16, 24, 3), (16, 24, 3), (8, 8, 3)]
    for i, s in enumerate(shapes):
        ppm.write_pnm(tmp_path / f"im{i}.ppm",
                      rng.integers(0, 256, s, dtype=np.uint8))
    ppm.write_pnm(tmp_path / "g.pgm",
                  rng.integers(0, 256, (8, 8), dtype=np.uint8))
    (tmp_path / "not_an_image.txt").write_text("x")
    return tmp_path


def test_scan_dir(img_dir):
    paths = loader.scan_dir(img_dir)
    assert [p.split("/")[-1] for p in paths] == \
        ["g.pgm", "im0.ppm", "im1.ppm", "im2.ppm"]


def test_load_images_order(img_dir):
    paths = loader.scan_dir(img_dir)
    imgs = loader.load_images(paths)
    assert imgs[0].ndim == 2
    assert imgs[1].shape == (16, 24, 3)


def test_group_by_shape_and_batch(img_dir):
    paths = loader.scan_dir(img_dir)[1:]   # the three ppms
    imgs = loader.load_images(paths)
    groups = loader.group_by_shape(imgs)
    assert groups[(16, 24, 3)] == [0, 1]
    assert groups[(8, 8, 3)] == [2]
    batch = loader.load_batch(paths[:2])
    assert batch.shape == (2, 16, 24, 3)
    with pytest.raises(ValueError, match="mixed shapes"):
        loader.load_batch(paths)


def test_cli_verify(img_dir, capsys):
    from jpegtpu.cli import main
    paths = loader.scan_dir(img_dir)
    rc = main(["verify", *paths, "-q", "90"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("OK") == 4 and "PSNR" in out


def test_native_fast_path_matches_oracle(tmp_path):
    """loader's native read path must return pixels identical to the
    Python oracle for P6/P5, comments, and odd sizes — and fall back
    cleanly on malformed input."""
    from jpegtpu import native
    from jpegtpu.io import loader
    rng = np.random.default_rng(5)
    color = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 31), dtype=np.uint8)
    pc, pg = tmp_path / "c.ppm", tmp_path / "g.pgm"
    ppm.write_pnm(pc, color)
    ppm.write_pnm(pg, gray)
    # comment-bearing header
    pcm = tmp_path / "cm.ppm"
    pcm.write_bytes(b"P6 # w\n# another\n23 17\n255\n" +
                    color.tobytes())
    for p, want in ((pc, color), (pg, gray), (pcm, color)):
        got = loader._read_pnm(str(p))
        assert np.array_equal(got, want), p
        if native.available():
            fast = native.read_pnm_file(str(p))
            assert fast is not None and np.array_equal(fast, want)
    # truncated pixel data: native path declines, oracle raises
    bad = tmp_path / "bad.ppm"
    bad.write_bytes(b"P6\n23 17\n255\n" + color.tobytes()[:-7])
    if native.available():
        assert native.read_pnm_file(str(bad)) is None
    with pytest.raises(ppm.PPMError):
        loader._read_pnm(str(bad))
