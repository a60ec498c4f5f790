"""Per-stage telemetry — the TPU analog of the reference's CPUTelemetry
struct (src/utils.hpp:65-75) and CL-event profiling (lib/OpenCL/Event.cpp:26-29).

Stage wall times come from jpegtpu.bench.stages (amortized chained timing —
the only reliable mechanism on tunneled chips, see bench.py); this module
holds the summary struct mirroring the reference's telemetry fields.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass
class StageTimes:
    """Stage wall-clock seconds, mirroring CPUTelemetry's fields plus the
    entropy/container stages the reference never had (SURVEY §2.10-2.11).
    Oracle-tier diagnostic stages (csc/pad/subsample) are isolated XLA
    programs; in production they are fused into pixel_path."""
    csc: float = 0.0
    pad: float = 0.0
    subsample: float = 0.0
    pixel_path: float = 0.0       # fused CSC+subsample+shift+DCT+quant+zigzag
    block_pack: float = 0.0       # RLE + Huffman symbol mapping + block pack
    seg_merge: float = 0.0        # segment bitstream merge
    compact: float = 0.0          # stream compaction
    host_assemble: float = 0.0    # fetch + stuffing + markers (host)
    device_total: float = 0.0     # production pipeline sum

    _KEYMAP = {
        "oracle:csc": "csc",
        "oracle:pad": "pad",
        "oracle:subsample": "subsample",
        "pixel_path_fused": "pixel_path",
        "block_pack": "block_pack",
        "symbolize": "block_pack",
        "seg_merge": "seg_merge",
        "compact": "compact",
        "host:fetch_and_assemble": "host_assemble",
    }

    @classmethod
    def from_report(cls, report: Dict[str, float]) -> "StageTimes":
        """Build from a jpegtpu.bench.stages.stage_report dict."""
        t = cls()
        for k, v in report.items():
            field = cls._KEYMAP.get(k)
            if field:
                setattr(t, field, getattr(t, field) + v)
        t.device_total = (t.pixel_path + t.block_pack + t.seg_merge +
                          t.compact)
        return t

    def report(self) -> str:
        rows = [f"  {f.name:>14}: {getattr(self, f.name) * 1e3:10.2f} ms"
                for f in dataclasses.fields(self)]
        return "\n".join(rows)
