#!/usr/bin/env python
"""Direct compact_segments_stuffed checks ON HARDWARE with the adversarial
vectors the unit tests use in interpret mode: trailing-marker frame-edge
residues {4093,4094,4095} (the round-3 drain fix), an all-0xFF segment
(the only content that takes the conditional third plane's lax.cond TRUE
branch), and FF-dense random content. Real entropy scans essentially
never reach the plane-2 branch, so full-program bisects cannot exercise
it — this does, against the host stuffing oracle."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log  # noqa: E402


def stuff_oracle(seg_bytes_list, restart, mnum=None):
    parts = []
    for s, raw in enumerate(seg_bytes_list):
        out = []
        for x in raw:
            out.append(int(x))
            if x == 0xFF:
                out.append(0)
        parts.append(bytes(out))
        if mnum is not None:
            if mnum[s]:
                parts.append(bytes((0xFF, mnum[s])))
        elif restart > 0 and s != len(seg_bytes_list) - 1:
            parts.append(bytes((0xFF, 0xD0 + (s % 8))))
    return b"".join(parts)


def run_case(name, by, seg_bits, frames, restart, mnum=None):
    import jax.numpy as jnp
    from jpegtpu.kernels import entropy_pack as ep
    n_seg = by.shape[0]
    nbytes = (seg_bits + 7) // 8
    b4 = by.reshape(n_seg, -1, 4).astype(np.uint32)
    words = ((b4[..., 0] << 24) | (b4[..., 1] << 16) |
             (b4[..., 2] << 8) | b4[..., 3])
    expected = stuff_oracle([by[s, :nbytes[s]] for s in range(n_seg)],
                            restart, mnum)
    stream, _, total = ep.compact_segments_stuffed(
        jnp.asarray(words), jnp.asarray(seg_bits), frames, restart,
        mnum=None if mnum is None else jnp.asarray(
            np.asarray(mnum, np.int32)))
    raw = np.asarray(stream).view(np.uint8)[:int(total)]
    ok = int(total) == len(expected) and raw.tobytes() == expected
    log(f"{name}: {'OK' if ok else 'MISMATCH'} "
        f"({int(total)} vs {len(expected)} bytes)")
    return ok


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend {jax.default_backend()}")
    rng = np.random.default_rng(0)
    ok = True

    # 1. trailing marker at frame-edge residues (drain fix)
    for resid in (4093, 4094, 4095):
        by = rng.integers(0, 255, (2, 2 * 4096), dtype=np.uint8)
        n0 = 100
        n1 = (4096 + resid) - (n0 + 2)
        ok &= run_case(f"trailing-marker resid={resid}", by,
                       np.array([n0 * 8, n1 * 8], np.int32), 2, 4,
                       mnum=[0xD0, 0xD1])

    # 2. all-FF segment (plane-2 lax.cond TRUE branch)
    by = np.full((2, 2 * 4096), 0xFF, np.uint8)
    by[1] = rng.integers(0, 256, 2 * 4096, dtype=np.uint8)
    ok &= run_case("all-FF rows", by,
                   np.array([5000 * 8, 300 * 8], np.int32), 2, 4)

    # 3. FF-dense random (mixed branches within one run)
    by = rng.integers(0, 256, (3, 2 * 4096), dtype=np.uint8)
    by[rng.random(by.shape) < 0.25] = 0xFF
    ok &= run_case("ff-dense random", by,
                   np.array([4097 * 8, 5000 * 8, 40 * 8], np.int32), 2, 4)

    log("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
