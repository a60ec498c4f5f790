"""Encoder configuration.

The reference has *no* config system — every knob is a compile-time constant
(image path src/OpenCLProject_JpegEncoder.cpp:320, work sizes :294-300, quant
tables src/utils.hpp:42-62, quality fixed at 50). This dataclass is the
TPU-native replacement: quality, subsampling structure, restart interval and
mesh shape are all first-class runtime parameters.
"""

from __future__ import annotations

import dataclasses
import os


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

# Default per-block bit budget for device buffers (~4x typical q90 usage).
# The encoder detects budget overflow on device and re-runs with the
# worst-case bound, so this is a throughput/memory knob, not a correctness
# one (encoder.py module docstring).
DEFAULT_BITS_BUDGET = 384


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
    # --- Kernel-path selectors (hardware-A/B-validated variants). Each is
    # a first-class config field so it participates in the jit cache key;
    # the JPEGTPU_* env vars remain as default overrides only (read at
    # config construction, never mutated by production code).
    #
    # Pixel-path implementation for the Pallas tier:
    #   "nat" (production): natural-layout Pallas kernel — row-slab input,
    #         in-kernel MCU transpose + MXU matmul (5.10 vs 5.72 ms/4K,
    #         scripts/tpu_ab_pixel_nat.py).
    #   "xla": XLA-tiled fallback/oracle formulation.
    #   "dma": NEGATIVE RESULT — fails Mosaic on hardware (unaligned
    #         input-DMA slices); interpret mode only.
    pixel_path: str = dataclasses.field(
        default_factory=lambda: os.environ.get("JPEGTPU_PIXEL_PATH", "nat"))
    # Mega-fused pixel+block-pack front-end (kernels/fused_pipeline).
    # TESTED NEGATIVE RESULT on HW (cost-neutral, docs/PERF.md); default off.
    fuse_bp: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("JPEGTPU_FUSE_BP", "0") != "0")
    # Chunks per serial iteration in the device stuffing kernel (1 =
    # round-2 single-chunk kernel; 3 = production latency-hiding batch,
    # HW A/B scripts/tpu_ab_compact_kb.py; 4 exercises the wf=16 window
    # variant, tested negative for speed). 5..6 also measured slower and
    # are NOT selectable (untested codepaths — VERDICT r4 #5). NOTE:
    # with compact_groups > 1 (the default) the grouped kernel clamps
    # kb to <= 3 (its window holds 8 frames), so kb=4 only takes effect
    # when compact_groups == 1.
    compact_kb: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("JPEGTPU_COMPACT_KB", "3")))
    # Rotate-select MCU merge in block_pack. TESTED NEGATIVE (cost-neutral).
    bp_merge_rot: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "JPEGTPU_BP_MERGE_ROT", "0") != "0")
    # Independent serial chains in the device stuffing kernel: segments
    # split into `compact_groups` contiguous groups, each compacted by
    # its own register-window chain into its own frame-aligned output
    # region (kernels/compact.py:_compact_stuff_kernel_gkb); the host
    # stitches the exact-size spans. 1 = the single-chain kernel.
    # Effective on the single-image device_stuff path; capped at n_seg.
    # PRODUCTION DEFAULT 8 (HW A/B 2026-08-20, scripts/
    # tpu_ab_compact_groups.py: byte-identical at gs 2/4/8/16;
    # 4.86-4.99 -> 4.66-4.71 ms/4K q90 420 at gs=8 over 3 interleaved
    # reps; gs=16 regresses — more chains than latency to hide).
    compact_groups: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get(
            "JPEGTPU_COMPACT_GROUPS", "8")))
    # First-pass per-block bit budget for device stream buffers
    # (0 = DEFAULT_BITS_BUDGET). Undersized budgets are detected on device
    # and escalated to the worst case by the host, on every path
    # (single / batch / sharded) — see encoder._budget_overflow.
    bits_budget: int = 0

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
        if self.pixel_path not in ("nat", "xla", "dma"):
            raise ValueError(
                f"pixel_path must be 'nat', 'xla' or 'dma', "
                f"got {self.pixel_path!r}")
        if not (1 <= self.compact_kb <= 4):
            raise ValueError(
                f"compact_kb must be in 1..4, got {self.compact_kb}")
        if not (1 <= self.compact_groups <= 64):
            raise ValueError(
                f"compact_groups must be in 1..64, got "
                f"{self.compact_groups}")
        if self.bits_budget < 0:
            raise ValueError(
                f"bits_budget must be >= 0, got {self.bits_budget}")

    @property
    def first_pass_budget(self) -> int:
        """The per-block bit budget the first device pass compiles with.

        Mode-aware defaults (round 5): smaller first-pass budgets make
        LARGER MCU groups chunk-free (ceil(blocks*budget/32)+2 <= 128
        words), which the auto grouping rule (entropy_pack.mcu_group)
        converts into fewer seg_merge serial appends at identical bytes:
          444/444s @330: a gm=4 unit (12 blocks) fits ONE chunk (was 2
            at 384) — 7.31-7.64 -> 6.74-7.07 ms/4K q90
            (scripts/ab_budget444.log);
          422 @248: gm=4 (16 blocks, 126 words) — 5.17-5.38 ->
            4.86-5.03 and 5.01-5.28 -> 5.00-5.04 ms across two runs
            (scripts/ab_budget_all.log, ab_budget_all2.log);
          420 keeps 384: the gm=2@330 upgrade measured neutral-to-
            marginal across two runs (ab_budget_all*.log), so the
            larger escalation headroom wins;
          gray keeps 384: gm=16@248 measured neutral-to-WORSE than
            gm=8@384 (2.70-3.02 vs 3.01-3.06, ab_budget_all2.log) —
            appends are no longer gray's bottleneck; the gm=16
            candidate was removed from mcu_group outright (dead under
            every auto default).
        All byte-identical; denser content triggers the tested
        budget-escalation re-run (2x cost on that frame only). At
        quality >= 97 the reduced-budget defaults are disabled:
        measured on the bench content (scripts/probe_budget_guard.log)
        the worst unit climbs 2059 -> 3529 of the 4032-bit cap across
        q90..q96 at 422@248 (444@330: 1673 -> 2791) — q96 clears the
        cap with ~12% margin and the extrapolated q97 point would
        cross it, exactly where the guard restores 384."""
        if self.bits_budget:
            return self.bits_budget
        if self.quality >= 97:
            return DEFAULT_BITS_BUDGET
        if self.subsampling in ("444", "444s"):
            return 330
        if self.subsampling == "422":
            return 248
        return DEFAULT_BITS_BUDGET

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
