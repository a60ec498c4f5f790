#!/usr/bin/env python
"""Split compact_stuffed's ~2.6 us/chunk into fixed scaffold cost (fori +
scalar loads + DMA start/wait + flush checks) vs expansion/placement
vector work, by timing the real kernel against a gutted variant that
keeps the DMA/loop/flush structure but replaces the byte expansion +
rank placement with a trivial passthrough."""

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
    from jpegtpu.entropy import scan
    from jpegtpu.kernels import entropy_pack as ep
    from jpegtpu.kernels import fused_dctq
    log(f"backend {jax.default_backend()}")

    # real 4K q90 stream data
    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    quality, subsampling, n_luma, b = 90, "420", 4, 6
    restart, n_seg = 240, 135
    coeffs = jax.jit(lambda x: fused_dctq.encode_blocks(
        x, quality, subsampling))(jnp.asarray(img))
    n_mcu = coeffs.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)
    dcd = scan.dc_diffs(coeffs, n_luma, restart).reshape(-1)
    cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
    mw, ml = ep.block_pack_mcu(coeffs.reshape(-1, 64),
                               cls.astype(jnp.int32), dcd, b, chunks)
    w_cap = -(-restart * b * 384 // 32)
    sw, sb, _ = ep.seg_merge_mcu(mw, ml, n_seg, restart, w_cap)
    sw = jnp.asarray(np.asarray(sw))
    sb = jnp.asarray(np.asarray(sb))
    fps = sw.shape[1] // 1024
    nch_total = int(np.asarray((sb + 7) // 8 + 4095).sum() // 4096)
    log(f"segments {n_seg}, frames/seg {fps}, total real chunks "
        f"~{nch_total}")

    f_real = jax.jit(lambda a, bb: ep.compact_segments_stuffed(
        a, bb, fps, restart))
    t = sync_time(f_real, sw, sb)
    log(f"real kernel: {t * 1e3:.2f} ms ({t * 1e9 / nch_total:.0f} "
        f"ns/chunk)")

    # gutted kernel: same scaffold, passthrough body
    def gut_kernel(off_ref, slen_ref, innb_ref, send_ref, nch_ref,
                   mnum_ref, frames_ref, out_ref, chunk_ref, flush_ref,
                   sem_in, sem_out, *, n_seg, f_per_seg, out_frames):
        su32 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)

        def bswap(wv):
            return (jnp.right_shift(wv, 24) |
                    (jnp.right_shift(wv, 8) & jnp.uint32(0xFF00)) |
                    (jnp.left_shift(wv & jnp.uint32(0xFF00), 8)) |
                    jnp.left_shift(wv, 24))

        def _out_copy(fi):
            return pltpu.make_async_copy(
                flush_ref.at[fi & 1],
                out_ref.at[jnp.minimum(fi, out_frames - 1)],
                sem_out.at[fi & 1])

        def flush_frame(win, fi):
            @pl.when(fi >= 2)
            def _():
                _out_copy(fi - 2).wait()
            for par in range(4):
                @pl.when((fi & 3) == par)
                def _(par=par):
                    flush_ref[par & 1] = bswap(win[par * 8:(par + 1) * 8])
            _out_copy(fi).start()

        def flush_and_zero(win, cur, end):
            win0 = win
            f0 = cur >> 12
            f1 = end >> 12
            for tt in range(3):
                fi = f0 + tt

                @pl.when(fi < f1)
                def _(fi=fi):
                    flush_frame(win0, fi)
                zmask = (fi < f1) & ((su32 >> 3) == (fi & 3))
                win = jnp.where(zmask, 0, win)
            return win

        def _in_copy(s, i, slot):
            return pltpu.make_async_copy(frames_ref.at[s, i],
                                         chunk_ref.at[slot], sem_in.at[slot])

        def chunk_body(i, state):
            s, win, nch = state
            slot = i & 1
            _in_copy(s, i, slot).wait()

            @pl.when(i + 1 < nch)
            def _():
                _in_copy(s, i + 1, 1 - slot).start()
            ch = chunk_ref[slot]
            cur = off_ref[0, s * f_per_seg + i, 0]
            slen = slen_ref[0, s * f_per_seg + i, 0]
            # passthrough "placement": OR the raw chunk into window rows
            win = win | jnp.pad(ch, ((0, 24), (0, 0)))
            win = flush_and_zero(win, cur, cur + slen)
            return s, win, nch

        def seg_body(s, win):
            nch = nch_ref[0, s, 0]

            @pl.when(nch > 0)
            def _():
                _in_copy(s, 0, 0).start()
            _, win, _ = jax.lax.fori_loop(0, nch, chunk_body, (s, win, nch))
            return win

        win = jax.lax.fori_loop(0, n_seg, seg_body,
                                jnp.zeros((32, 128), jnp.uint32))
        total = send_ref[0, n_seg - 1, 0]
        last = total >> 12
        flush_frame(win, last)

        @pl.when(last >= 1)
        def _():
            _out_copy(last - 1).wait()
        _out_copy(last).wait()

    def gutted(seg_words, seg_bits):
        n_seg_ = seg_words.shape[0]
        f = fps
        mnum = np.zeros(n_seg_, np.int32)
        chunk_off, out_chunk, in_chunk, seg_end, nchunks, seg_start, tot = \
            ep._stuff_precompute(seg_words, seg_bits, f, mnum)
        out_frames = n_seg_ * f * 2 + 1
        kern = functools.partial(gut_kernel, n_seg=n_seg_, f_per_seg=f,
                                 out_frames=out_frames)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                     [pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((out_frames, 8, 128),
                                           jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((2, 8, 128), jnp.uint32),
                pltpu.VMEM((2, 8, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(chunk_off.reshape(1, n_seg_ * f, 1),
          out_chunk.reshape(1, n_seg_ * f, 1),
          in_chunk.reshape(1, n_seg_ * f, 1),
          seg_end.reshape(1, n_seg_, 1),
          nchunks.reshape(1, n_seg_, 1),
          jnp.asarray(mnum).reshape(1, n_seg_, 1),
          seg_words.reshape(n_seg_, f, 8, 128))
        return out

    f_gut = jax.jit(gutted)
    t = sync_time(f_gut, sw, sb)
    log(f"gutted scaffold: {t * 1e3:.2f} ms ({t * 1e9 / nch_total:.0f} "
        f"ns/chunk)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
