"""Native helper unit tests (C++ fast paths vs their numpy fallbacks)."""

import numpy as np
import pytest

from jpegtpu import native


def test_stuff_assemble_rows():
    segs = np.array([[0xFF, 0x12, 0xFF, 0, 0, 0],
                     [0xAB, 0xCD, 0xFF, 0xFF, 0, 0]], np.uint8)
    nb = np.array([3, 4], np.int32)
    out = native.stuff_assemble(segs, nb, restart=1)
    assert out == bytes([0xFF, 0, 0x12, 0xFF, 0, 0xFF, 0xD0,
                         0xAB, 0xCD, 0xFF, 0, 0xFF, 0])
    # no markers when restart disabled
    out0 = native.stuff_assemble(segs, nb, restart=0)
    assert out0 == bytes([0xFF, 0, 0x12, 0xFF, 0,
                          0xAB, 0xCD, 0xFF, 0, 0xFF, 0])


def test_stuff_assemble_contig_matches_rows():
    rng = np.random.default_rng(0)
    segs = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    nb = rng.integers(1, 33, 5).astype(np.int32)
    rows = native.stuff_assemble(segs, nb, restart=1)
    contig = np.concatenate([segs[i, :nb[i]] for i in range(5)])
    got = native.stuff_assemble_contig(contig, nb, restart=1)
    assert got == rows


def test_merge_bitstreams_bit_exact():
    rng = np.random.default_rng(1)
    # build reference via bit strings
    streams, lens, ref_bits = [], [], ""
    for n in [13, 8, 27, 1]:
        bits = "".join(rng.choice(["0", "1"], n))
        ref_bits += bits
        padded = bits + "0" * ((-len(bits)) % 8)
        streams.append([int(padded[i:i + 8], 2)
                        for i in range(0, len(padded), 8)])
        lens.append(n)
    cap = max(len(s) for s in streams)
    arr = np.zeros((4, cap), np.uint8)
    for i, s in enumerate(streams):
        arr[i, :len(s)] = s
    got = native.merge_bitstreams(arr, np.array(lens, np.int64))
    ref_bits += "1" * ((-len(ref_bits)) % 8)
    raw = bytes(int(ref_bits[i:i + 8], 2) for i in range(0, len(ref_bits), 8))
    exp = bytearray()
    for x in raw:
        exp.append(x)
        if x == 0xFF:
            exp.append(0)
    assert got == bytes(exp)


def test_parse_pnm_header_native():
    if not native.available():
        pytest.skip("native unavailable")
    lib = native._load()
    import ctypes
    data = b"P6 # c\n13 11\n255\n" + b"\x00" * (13 * 11 * 3)
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    off = ctypes.c_longlong()
    rc = lib.parse_pnm_header(data, len(data), ctypes.byref(w),
                              ctypes.byref(h), ctypes.byref(c),
                              ctypes.byref(off))
    assert rc == 0 and (w.value, h.value, c.value) == (13, 11, 3)
    assert data[off.value:] == b"\x00" * (13 * 11 * 3)


def test_stage_times_from_report():
    from jpegtpu.bench.telemetry import StageTimes
    rep = {"oracle:csc": 0.001, "pixel_path_fused": 0.002,
           "block_pack": 0.005, "seg_merge": 0.008, "compact": 0.0005,
           "host:fetch_and_assemble": 0.5, "native_available": 1.0}
    t = StageTimes.from_report(rep)
    assert t.pixel_path == 0.002
    assert abs(t.device_total - 0.0155) < 1e-9
    assert "device_total" in t.report()


@pytest.mark.parametrize("sub", ["444", "422", "420", "gray"])
def test_cpu_encode_scan_staged_matches_monolithic(sub):
    """The stage-timed whole-image-pass C++ encoder must be byte-identical
    to the monolithic per-MCU cpu_encode_scan (same double math, different
    loop structure) and report a positive time for every stage it ran."""
    if not native.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(3)
    shape = (61, 45) if sub == "gray" else (61, 45, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    for restart in (0, 5):
        mono = native.cpu_encode_scan(img, 80, sub, restart)
        scan, times = native.cpu_encode_scan_staged(img, 80, sub, restart)
        assert scan == mono
        assert set(times) == set(native.CPU_STAGES)
        for k in ("pad", "csc", "dct", "quant_zigzag", "entropy"):
            assert times[k] > 0
        if sub not in ("420", "422"):      # skipped stage: only clock
            assert times["subsample"] < 1e-4   # bracket overhead remains


def test_speedup_table_populates_cpu_columns():
    """Every mappable device row must carry a CPU time and speedup (the
    reference's headline printout, OpenCLProject_JpegEncoder.cpp:622-629)."""
    if not native.available():
        pytest.skip("native unavailable")
    from jpegtpu.bench import stages
    from jpegtpu.config import EncoderConfig
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (128, 160, 3), dtype=np.uint8)
    cfg = EncoderConfig(quality=90, subsampling="420",
                        restart_interval="rows")
    table = stages.speedup_table(img, cfg)
    for row in ("oracle:csc", "oracle:pad", "oracle:subsample",
                "pixel_path_fused", "entropy total (device)",
                "sum of isolated stages", "pipelined device program"):
        line = next(ln for ln in table.splitlines() if row in ln)
        assert line.rstrip().endswith("x"), line
