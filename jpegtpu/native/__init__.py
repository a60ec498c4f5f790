"""ctypes loader for the native C++ runtime helpers.

Auto-builds libjpegtpu_native.so on first use (g++ via make); every entry
point has a pure-numpy fallback so the framework degrades gracefully where
no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libjpegtpu_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src_mtime = max(os.path.getmtime(os.path.join(_DIR, f))
                        for f in ("native.cpp", "cpu_encoder.cpp"))
        if (not os.path.exists(_LIB_PATH) or
                os.path.getmtime(_LIB_PATH) < src_mtime):
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.stuff_assemble.restype = ctypes.c_longlong
        lib.stuff_assemble.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_longlong]
        lib.stuff_assemble_contig.restype = ctypes.c_longlong
        lib.stuff_assemble_contig.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_longlong]
        lib.merge_bitstreams_stuff.restype = ctypes.c_longlong
        lib.merge_bitstreams_stuff.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_void_p, ctypes.c_longlong]
        lib.cpu_encode_scan.restype = ctypes.c_longlong
        lib.cpu_encode_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_longlong]
        lib.cpu_encode_scan_staged.restype = ctypes.c_longlong
        lib.cpu_encode_scan_staged.argtypes = (
            lib.cpu_encode_scan.argtypes + [ctypes.c_void_p])
        lib.parse_pnm_header.restype = ctypes.c_int
        lib.parse_pnm_header.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def stuff_assemble(segs: np.ndarray, nbytes: np.ndarray,
                   restart: int) -> bytes:
    """Unstuffed per-segment bytes [n_seg, cap] + lengths -> final entropy
    scan (stuffed, RST markers spliced). C++ fast path, numpy fallback."""
    segs = np.ascontiguousarray(segs, dtype=np.uint8)
    nbytes = np.ascontiguousarray(nbytes, dtype=np.int32)
    n_seg, cap = segs.shape
    lib = _load()
    if lib is not None:
        total_in = int(nbytes.sum())
        out = np.empty(total_in * 2 + 2 * n_seg + 16, np.uint8)
        n = lib.stuff_assemble(
            segs.ctypes.data, nbytes.ctypes.data, n_seg, cap,
            1 if restart > 0 else 0, out.ctypes.data, out.size)
        if n >= 0:
            return out[:n].tobytes()
    # numpy fallback
    parts = []
    for s in range(n_seg):
        raw = segs[s, :int(nbytes[s])]
        idx = np.flatnonzero(raw == 0xFF)
        if idx.size:
            stuffed = np.insert(raw, idx + 1, 0)
        else:
            stuffed = raw
        parts.append(stuffed.tobytes())
        if restart > 0 and s != n_seg - 1:
            parts.append(bytes((0xFF, 0xD0 + (s % 8))))
    return b"".join(parts)


def merge_bitstreams(streams: np.ndarray, bitlens: np.ndarray) -> bytes:
    """Merge raw per-shard bitstreams ([n, cap] big-endian bytes + bit
    lengths) into one 1-padded, stuffed scan. C++ fast path with a Python
    bit-string fallback."""
    streams = np.ascontiguousarray(streams, dtype=np.uint8)
    bitlens = np.ascontiguousarray(bitlens, dtype=np.int64)
    n, cap = streams.shape
    lib = _load()
    if lib is not None:
        total = int(bitlens.sum())
        out = np.empty(total // 4 + 64, np.uint8)  # 2x bytes + slack
        got = lib.merge_bitstreams_stuff(
            streams.ctypes.data, bitlens.ctypes.data, n, cap,
            out.ctypes.data, out.size)
        if got >= 0:
            return out[:got].tobytes()
    # Python fallback (slow, exact)
    bits = "".join(
        "".join(f"{b:08b}" for b in streams[i])[:int(bitlens[i])]
        for i in range(n))
    bits += "1" * ((-len(bits)) % 8)
    raw = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    out = bytearray()
    for x in raw:
        out.append(x)
        if x == 0xFF:
            out.append(0)
    return bytes(out)


_CPU_MODES = {"444": 0, "422": 1, "420": 2, "gray": 3}
# Per-mode MCU geometry (mcu_h, mcu_w, blocks per MCU) for buffer sizing.
_CPU_GEOM = {"444": (8, 8, 3), "422": (8, 16, 4), "420": (16, 16, 6),
             "gray": (8, 8, 1)}


def _cpu_encode_args(img: np.ndarray, quality: int, subsampling: str,
                     restart: int):
    """Shared ctypes argument marshalling for the C++ encoder entries:
    (args tuple, output buffer, capacity). Tables come from the same
    Python sources as the device path so the tiers can never disagree."""
    from jpegtpu.core import tables
    from jpegtpu.entropy import huffman_tables as ht

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    qtab = np.concatenate([
        tables.quant_table_zigzag(quality, chroma=False),
        tables.quant_table_zigzag(quality, chroma=True)]).astype(np.uint16)
    zig = np.ascontiguousarray(tables.ZIGZAG_ORDER, dtype=np.int32)
    dc_codes, dc_lens, ac_codes, ac_lens = ht.packed_luts()
    dc_codes = np.ascontiguousarray(dc_codes, np.uint32)
    dc_lens = np.ascontiguousarray(dc_lens, np.int32)
    ac_codes = np.ascontiguousarray(ac_codes, np.uint32)
    ac_lens = np.ascontiguousarray(ac_lens, np.int32)
    # True worst-case output bound: every block at MAX_BITS_PER_BLOCK, all
    # bytes 0xFF (stuffing doubles them), one RST marker per segment. The
    # previous img.size*3 heuristic could overflow at quality 100 on
    # adversarial content, and the C++ -1 would then be misread as "library
    # unavailable".
    from jpegtpu.entropy.assemble import MAX_BITS_PER_BLOCK
    mh, mw, bpm = _CPU_GEOM[subsampling]
    n_mcu = -(-h // mh) * (-(-w // mw))
    n_seg = -(-n_mcu // restart) if restart > 0 else 1
    cap = (n_mcu * bpm * MAX_BITS_PER_BLOCK // 8) * 2 + 2 * n_seg + 64
    out = np.empty(cap, np.uint8)
    # Keep every array referenced until the call returns.
    keep = (img, qtab, zig, dc_codes, dc_lens, ac_codes, ac_lens)
    args = (img.ctypes.data, h, w, _CPU_MODES[subsampling],
            qtab.ctypes.data, zig.ctypes.data, dc_codes.ctypes.data,
            dc_lens.ctypes.data, ac_codes.ctypes.data, ac_lens.ctypes.data,
            int(restart), out.ctypes.data, cap)
    return args, out, keep


def cpu_encode_scan(img: np.ndarray, quality: int, subsampling: str,
                    restart: int):
    """Sequential C++ reference encoder -> stuffed entropy scan bytes
    (with RST markers), or None if the native library is unavailable.

    The CPU-tier analog of the reference's JpegEncoderHost pipeline; all
    tables come from the same Python sources as the device path."""
    lib = _load()
    if lib is None or subsampling not in _CPU_MODES:
        return None
    args, out, _keep = _cpu_encode_args(img, quality, subsampling, restart)
    n = lib.cpu_encode_scan(*args)
    if n < 0:
        return None
    return out[:n].tobytes()


# Stage keys for cpu_encode_scan_staged, in C++ stage_secs order.
CPU_STAGES = ("pad", "csc", "subsample", "dct", "quant_zigzag", "entropy")


def cpu_encode_scan_staged(img: np.ndarray, quality: int, subsampling: str,
                           restart: int):
    """Stage-timed C++ encode: (scan bytes, {stage: seconds}) or None.

    Whole-image stage passes mirroring the reference's per-stage CPU
    timing brackets (src/OpenCLProject_JpegEncoder.cpp:62-247); byte-
    identical to cpu_encode_scan."""
    lib = _load()
    if lib is None or subsampling not in _CPU_MODES:
        return None
    args, out, _keep = _cpu_encode_args(img, quality, subsampling, restart)
    secs = np.zeros(len(CPU_STAGES), np.float64)
    n = lib.cpu_encode_scan_staged(*args, secs.ctypes.data)
    if n < 0:
        return None
    return out[:n].tobytes(), dict(zip(CPU_STAGES, secs.tolist()))


def read_pnm_file(path) -> Optional[np.ndarray]:
    """Bulk PNM load: one file read + C++ header parse + zero-copy buffer
    slice (~2x faster than the tokenizing Python reader on small files —
    measured in jpegtpu.io.loader). Returns None when the native library
    is unavailable or the file isn't a well-formed maxval-255 P5/P6, so
    the caller can fall back to jpegtpu.io.ppm.read_pnm, the semantics
    oracle (which raises the typed errors)."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    off = ctypes.c_longlong()
    rc = lib.parse_pnm_header(data, len(data), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(ch),
                              ctypes.byref(off))
    if rc != 0:
        return None
    count = w.value * h.value * ch.value
    if len(data) - off.value < count:
        return None       # truncated: let the oracle raise its typed error
    arr = np.frombuffer(data, np.uint8, count=count, offset=off.value)
    shape = (h.value, w.value, 3) if ch.value == 3 else (h.value, w.value)
    return arr.reshape(shape)


def stuff_assemble_contig(stream: np.ndarray, nbytes: np.ndarray,
                          restart: int) -> bytes:
    """Back-to-back segment bytes (device-compacted) + lengths -> final
    entropy scan. C++ fast path, numpy fallback."""
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    nbytes = np.ascontiguousarray(nbytes, dtype=np.int32)
    n_seg = nbytes.shape[0]
    lib = _load()
    if lib is not None:
        total_in = int(nbytes.sum())
        out = np.empty(total_in * 2 + 2 * n_seg + 16, np.uint8)
        n = lib.stuff_assemble_contig(
            stream.ctypes.data, nbytes.ctypes.data, n_seg,
            1 if restart > 0 else 0, out.ctypes.data, out.size)
        if n >= 0:
            return out[:n].tobytes()
    parts = []
    off = 0
    for s in range(n_seg):
        n = int(nbytes[s])
        raw = stream[off:off + n]
        off += n
        idx = np.flatnonzero(raw == 0xFF)
        parts.append((np.insert(raw, idx + 1, 0) if idx.size else raw)
                     .tobytes())
        if restart > 0 and s != n_seg - 1:
            parts.append(bytes((0xFF, 0xD0 + (s % 8))))
    return b"".join(parts)
