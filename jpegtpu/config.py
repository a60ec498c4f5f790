"""Encoder configuration.

The reference has *no* config system — every knob is a compile-time constant
(image path src/OpenCLProject_JpegEncoder.cpp:320, work sizes :294-300, quant
tables src/utils.hpp:42-62, quality fixed at 50). This dataclass is the
TPU-native replacement: quality, subsampling structure, restart interval and
mesh shape are all first-class runtime parameters.
"""

from __future__ import annotations

import dataclasses


# Chroma subsampling modes.
#   "444"  — no subsampling; scan interleave Y,Cb,Cr per 8x8 MCU.
#   "444s" — reference-parity mode: 2x2-average the chroma planes but keep
#            full stored resolution (the reference's performCDS semantics,
#            src/utils.cpp:113-141 — smoothing, not structural subsampling),
#            scan structure identical to "444".
#   "420"  — true 4:2:0: half-resolution chroma planes, 16x16 MCU with
#            Y00,Y01,Y10,Y11,Cb,Cr interleave. The reference lists this as a
#            target config but never implements it structurally (SURVEY §2.3).
#   "422"  — 2x1 subsampling: half-width chroma, 16x8 MCU with Y0,Y1,Cb,Cr.
#   "gray" — single-component (luma-only) JPEG for [H, W] grayscale input.
SUBSAMPLING_MODES = ("444", "444s", "420", "422", "gray")


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Static (trace-time) configuration for one encode pipeline."""

    quality: int = 50                 # libjpeg-style quality 1..100
    subsampling: str = "420"          # one of SUBSAMPLING_MODES
    # Restart interval in MCUs. 0 disables restart markers (single segment,
    # fully sequential DC chain — the reference's only mode). "rows" makes
    # each MCU row one restart segment, the natural sharding unit.
    restart_interval: int | str = "rows"
    # Use the fused production pixel path (one matmul per MCU geometry,
    # kernels/fused_dctq.py) when True, else the staged oracle ops
    # (core/ops.py) — identical coefficients either way.
    use_pallas: bool = True
    # Use the Pallas entropy kernels + device bitstream packing (True; TPU
    # only) or the XLA oracle formulation (False / off-TPU).
    device_bitpack: bool = True
    # Assemble the final entropy scan on device (0xFF00 stuffing + RSTn
    # splicing in the compaction kernel): the device output IS the scan
    # and the host only concatenates headers. False falls back to the
    # native C++ (or numpy) host stuffing path. TPU + device_bitpack only.
    device_stuff: bool = True

    def __post_init__(self):
        if not (1 <= self.quality <= 100):
            raise ValueError(f"quality must be in 1..100, got {self.quality}")
        if self.subsampling not in SUBSAMPLING_MODES:
            raise ValueError(
                f"subsampling must be one of {SUBSAMPLING_MODES}, "
                f"got {self.subsampling!r}")
        if isinstance(self.restart_interval, str):
            if self.restart_interval != "rows":
                raise ValueError("restart_interval must be an int >= 0 or 'rows'")
        elif self.restart_interval < 0:
            raise ValueError("restart_interval must be >= 0")

    @property
    def mcu_shape(self) -> tuple:
        """(height, width) of one MCU in pixels."""
        return {"420": (16, 16), "422": (8, 16)}.get(self.subsampling,
                                                     (8, 8))

    @property
    def mcu_size(self) -> int:
        """Max MCU dimension (padding granularity for square-safe uses)."""
        return max(self.mcu_shape)

    @property
    def blocks_per_mcu(self) -> int:
        return {"420": 6, "422": 4, "gray": 1}.get(self.subsampling, 3)

    @property
    def n_luma(self) -> int:
        return {"420": 4, "422": 2}.get(self.subsampling, 1)

    def resolve_restart(self, mcus_per_row: int) -> int:
        """Concrete restart interval in MCUs for a given image geometry."""
        if self.restart_interval == "rows":
            return mcus_per_row
        return int(self.restart_interval)
