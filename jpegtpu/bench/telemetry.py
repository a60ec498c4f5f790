"""Per-stage telemetry — the TPU analog of the reference's CPUTelemetry
struct (src/utils.hpp:65-75) and CL-event profiling (lib/OpenCL/Event.cpp:26-29).

On TPU, per-stage wall times come from block_until_ready() brackets around
separately jitted stage programs (stages fuse in the production pipeline, so
stage timing is a diagnostic mode, exactly like the reference's per-kernel
event profiling was).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict

import jax


@dataclasses.dataclass
class StageTimes:
    """Stage wall-clock micro-seconds, mirroring CPUTelemetry's fields plus
    the entropy/container stages the reference never timed because it never
    had them (SURVEY §2.10-2.11)."""
    csc_us: float = 0.0
    subsample_us: float = 0.0
    pixel_path_us: float = 0.0     # fused shift+DCT+quant+zigzag
    symbolize_us: float = 0.0      # RLE + Huffman symbol mapping
    pack_us: float = 0.0           # bit packing + stuffing
    assemble_us: float = 0.0       # host container assembly
    total_us: float = 0.0

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)

    def report(self) -> str:
        rows = [f"  {k:>16}: {v:12.1f} us" for k, v in self.as_dict().items()]
        return "\n".join(rows)


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 5):
    """Median device wall time of a jitted fn (blocks until ready)."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return out, times[len(times) // 2]
