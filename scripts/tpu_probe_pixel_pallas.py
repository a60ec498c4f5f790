#!/usr/bin/env python
"""Pallas pixel-path probe: can a kernel beat the XLA fused matmul's
1.6 ms (of which ~1.35 ms is the MCU-tiling transpose, tpu_probe_pixel)?

Idea: never materialize the [nMCU, 768] tile matrix. Per MCU row r the
input x[r] = [16, 240, 48] u8 (a FREE reshape of the padded image) holds
pixel row y's 48 bytes per MCU contiguously; the operator is split into
16 row-operators M_y so the kernel computes sum_y cast(x[r,y]) @ M_y on
the MXU directly from the natural layout.

Variants:
  padK  - M_y padded [48->128, 384]: 16 K=128 matmuls (2.7x FLOPs, no
          lane assembly)
  asm   - build [240, 768] with static unaligned lane writes (48y mod
          128), one K=768 matmul (minimal FLOPs, riskier lowering)
Both swept over R = MCU rows per grid step.

Mosaic cannot cast u8 -> f32, so the image is pre-biased to int8
(x ^ 0x80 = x - 128 in i8) outside the kernel; the kernel casts
i8 -> f32 and the +128 correction folds into the bias vector
(bias' = bias + 128 * colsum(M)).
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jpegtpu.core import ops
    from jpegtpu.kernels import fused_dctq as fd
    log(f"backend {jax.default_backend()}")

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    m, bias = fd.mcu_operator(90, "420")        # [768, 384], [384]
    nry, nrx = h // 16, w // 16                 # 135, 240

    # reference (current XLA path)
    f_ref = jax.jit(lambda x: fd.encode_blocks(x, 90, "420"))
    t = sync_time(f_ref, jnp.asarray(img))
    ref = np.asarray(f_ref(jnp.asarray(img)))
    log(f"XLA fused path: {t * 1e3:.2f} ms")

    # Mosaic can't cast u8 -> f32: pre-bias to int8 (x ^ 0x80 == x - 128
    # in i8) and fold the +128 back into the bias vector.
    img_i8 = (img ^ 0x80).view(np.int8)
    x4 = jnp.asarray(img_i8.reshape(nry, 16, nrx, 48))
    bias128 = np.asarray(bias) + 128.0 * np.asarray(m).sum(axis=0)

    # M_y for padK: [16, 128, 384]
    m_rows = np.asarray(m).reshape(16, 48, 384)
    m_pad = np.zeros((16, 128, 384), np.float32)
    m_pad[:, :48] = m_rows
    m_pad_j = jnp.asarray(m_pad.reshape(16 * 128, 384))
    bias_j = jnp.asarray(bias128.reshape(1, 384).astype(np.float32))

    def kern_asm_u8(x_ref, m_ref, b_ref, o_ref, scr, *, r_blk):
        """Exactness variant: input is the XOR-biased i8 (x - 128);
        restore the EXACT u8 values in f32 (f + 128, exact for integer
        f32), one K=768 dot with the ORIGINAL bias — same operand values
        as the XLA path, so any residual diff is pure MXU-tiling order."""
        for b in range(r_blk):
            for y in range(16):
                f = x_ref[b, y].astype(jnp.float32) + 128.0  # [240, 48]
                scr[:, y * 48:(y + 1) * 48] = f
            acc = jnp.dot(scr[...], m_ref[...],
                          preferred_element_type=jnp.float32) + \
                jnp.broadcast_to(b_ref[...], (nrx, 384))
            r = jnp.floor(jnp.abs(acc) + 0.5) * jnp.sign(acc)
            o_ref[b * nrx:(b + 1) * nrx, :] = r.astype(jnp.int32)

    def kern_padk(x_ref, m_ref, b_ref, o_ref, *, r_blk):
        for b in range(r_blk):
            acc = jnp.broadcast_to(b_ref[...], (nrx, 384))
            for y in range(16):
                blk = x_ref[b, y].astype(jnp.float32)       # [240, 48]
                blk = jnp.pad(blk, ((0, 0), (0, 80)))
                acc = acc + jnp.dot(
                    blk, m_ref[y * 128:(y + 1) * 128, :],
                    preferred_element_type=jnp.float32)
            r = jnp.floor(jnp.abs(acc) + 0.5) * jnp.sign(acc)
            o_ref[b * nrx:(b + 1) * nrx, :] = r.astype(jnp.int32)

    def kern_asm(x_ref, m_ref, b_ref, o_ref, scr, *, r_blk):
        for b in range(r_blk):
            for y in range(16):
                blk = x_ref[b, y].astype(jnp.float32)       # [240, 48]
                scr[:, y * 48:(y + 1) * 48] = blk
            acc = jnp.dot(scr[...], m_ref[...],
                          preferred_element_type=jnp.float32) + \
                jnp.broadcast_to(b_ref[...], (nrx, 384))
            r = jnp.floor(jnp.abs(acc) + 0.5) * jnp.sign(acc)
            o_ref[b * nrx:(b + 1) * nrx, :] = r.astype(jnp.int32)

    m_j = jnp.asarray(m)
    bias_orig_j = jnp.asarray(np.asarray(bias).reshape(1, 384))

    def run(kern, name, r_blk, m_arr, scratch, bb=None):
        f = jax.jit(lambda x, mm, bb: pl.pallas_call(
            functools.partial(kern, r_blk=r_blk),
            grid=(nry // r_blk,),
            in_specs=[
                pl.BlockSpec((r_blk, 16, nrx, 48), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(m_arr.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 384), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r_blk * nrx, 384), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nry * nrx, 384), jnp.int32),
            scratch_shapes=scratch,
        )(x, mm, bb))
        bvec = bias_j if bb is None else bb
        try:
            t = sync_time(f, x4, m_arr, bvec)
        except Exception as e:
            log(f"{name} R={r_blk}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
            return
        got = np.asarray(f(x4, m_arr, bvec)).reshape(ref.shape)
        bad = np.abs(got - ref).max()
        nbad = int((got != ref).sum())
        log(f"{name} R={r_blk}: {t * 1e3:.2f} ms (max |diff| vs XLA "
            f"path: {bad}, #diff: {nbad})")

    for r_blk in (1, 3, 5):
        run(kern_asm_u8, "asm_u8", r_blk, m_j,
            [pltpu.VMEM((nrx, 768), jnp.float32)], bb=bias_orig_j)
    for r_blk in (1, 3, 5):
        run(kern_padk, "padK", r_blk, m_pad_j, [])
    for r_blk in (1, 3, 5):
        run(kern_asm, "asm", r_blk, m_j,
            [pltpu.VMEM((nrx, 768), jnp.float32)])
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
