"""PPM (P6) / PGM (P5) image I/O.

Capability parity with the reference's readers/writers: readPPMImage
(src/utils.cpp:11-65 — validates the P6 magic, skips '#' comments, requires
maxval 255) and writePPMImage (src/utils.cpp:68-82), plus the PGM support in
the course library (lib/Core/Image.cpp:31-161). The batch loader
(jpegtpu.io.loader) reads through the native C++ fast path
(jpegtpu.native.read_pnm_file) when available; this module is the
always-available Python implementation and the semantics oracle.
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Union

import numpy as np


class PPMError(ValueError):
    pass


def _read_header_token(f) -> bytes:
    """Next whitespace-delimited token, skipping '#' comments (the same
    grammar the reference parses at src/utils.cpp:29-44)."""
    tok = b""
    while True:
        ch = f.read(1)
        if ch == b"":
            raise PPMError("unexpected EOF in PNM header")
        if ch == b"#":
            while ch not in (b"\n", b""):
                ch = f.read(1)
            continue
        if ch.isspace():
            if tok:
                return tok
            continue
        tok += ch


def read_pnm(path_or_bytes: Union[str, Path, bytes]) -> np.ndarray:
    """Read a binary PPM (P6) or PGM (P5) file.

    Returns uint8 [H, W, 3] for P6 or [H, W] for P5. Only maxval 255 is
    supported, matching the reference (src/utils.cpp:38)."""
    if isinstance(path_or_bytes, (str, Path)):
        data = Path(path_or_bytes).read_bytes()
    else:
        data = path_or_bytes
    f = io.BytesIO(data)
    magic = f.read(2)
    if magic not in (b"P6", b"P5"):
        raise PPMError(f"not a binary PPM/PGM (magic {magic!r})")
    width = int(_read_header_token(f))
    height = int(_read_header_token(f))
    maxval = int(_read_header_token(f))
    if maxval != 255:
        raise PPMError(f"only maxval 255 supported, got {maxval}")
    channels = 3 if magic == b"P6" else 1
    raw = f.read(width * height * channels)
    if len(raw) != width * height * channels:
        raise PPMError("truncated pixel data")
    arr = np.frombuffer(raw, dtype=np.uint8)
    if channels == 3:
        return arr.reshape(height, width, 3)
    return arr.reshape(height, width)


def write_pnm(path: Union[str, Path], img: np.ndarray) -> None:
    """Write uint8 [H,W,3] as P6 or [H,W] as P5."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    elif img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    else:
        raise PPMError(f"unsupported shape {img.shape}")
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
