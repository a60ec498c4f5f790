#!/usr/bin/env python
"""Pixel-path formulation probe: the trace (tpu_trace_ab.py) shows the
fused matmul itself is 0.124 ms while XLA's tile-matrix materialization
chain costs 1.29 ms (5D reshape 0.71 + transpose copy 0.45 + reshape
0.13). Try formulations that give XLA fewer/cheaper layout hops:

  v0    current mcu_tiles -> x @ M
  kmaj  K-major tile matrix built with ONE transpose ([768, nm]), fed to
        dot_general contracting dim0 x dim0 (MXU-native operand order)
  multi multi-dim contraction straight off the 4D view (no explicit
        tile matrix): dot_general(((1,3),(0,1)))
All must be BIT-identical to v0."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_stages_common import log, sync_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu.core import ops
    from jpegtpu.kernels import fused_dctq as fd
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    m, bias = fd.mcu_operator(90, "420")
    mj = jnp.asarray(m)
    bj = jnp.asarray(bias)
    nry, nrx = h // 16, w // 16
    nm = nry * nrx

    def finish(y):
        y = y + bj
        return ops.round_half_away(y).astype(jnp.int32)

    def v0(x):
        t = fd.mcu_tiles(x, 16, 16).astype(jnp.float32)
        return finish(t @ mj)

    def kmaj(x):
        t = x.reshape(nry, 16, nrx, 48).transpose(1, 3, 0, 2)
        t = t.reshape(768, nm).astype(jnp.float32)
        y = jax.lax.dot_general(t, mj, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return finish(y)

    def multi(x):
        t = x.reshape(nry, 16, nrx, 48).astype(jnp.float32)
        m3 = mj.reshape(16, 48, 384)
        y = jax.lax.dot_general(t, m3, (((1, 3), (0, 1)), ((), ())),
                                preferred_element_type=jnp.float32)
        return finish(y).reshape(nm, 384)

    xj = jnp.asarray(img)
    ref = None
    for name, f in (("v0   ", v0), ("kmaj ", kmaj), ("multi", multi)):
        fj = jax.jit(f)
        try:
            t = sync_time(fj, xj)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")
            continue
        got = np.asarray(fj(xj)).reshape(nm, 384)
        if ref is None:
            ref = got
        nbad = int((got != ref).sum())
        log(f"{name}: {t * 1e3:.2f} ms  (#diff vs v0: {nbad})")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
