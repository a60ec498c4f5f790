"""Top-level encoder: uint8 RGB image(s) -> complete JFIF/JPEG bytes.

The TPU-native replacement for the reference's driver (JpegEncoderHost +
main, src/OpenCLProject_JpegEncoder.cpp:28-633). Where the reference
round-trips through host memory between every stage (SURVEY §3.1), here the
whole pipeline — fused pixel-path matmul, RLE/Huffman symbolization and
bitstream packing — is ONE jit-compiled device program; the host only
supplies pixels and receives packed entropy segments to stuff and splice
between markers (C++ fast path, jpegtpu.native). And unlike the reference,
the output is a real, decodable JPEG file (SURVEY §2.10).

Two interchangeable entropy back-ends (bit-identical, tests enforce):
  * Pallas kernels (jpegtpu.kernels.entropy_pack) — production TPU path;
  * the XLA scatter formulation (jpegtpu.entropy.scan/assemble) — oracle,
    and the default off-TPU.

Device->host traffic is kept small with a per-block bit-budget: segments are
packed into a buffer sized for `bits_budget` bits/block (default 4x typical),
and the rare image that overflows escalates to the worst-case bound
(MAX_BITS_PER_BLOCK) and re-runs — correctness is unconditional.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpegtpu import native
from jpegtpu.config import DEFAULT_BITS_BUDGET, EncoderConfig
from jpegtpu.container import jfif
from jpegtpu.core import ops
from jpegtpu.entropy import assemble, scan
from jpegtpu.entropy.assemble import MAX_BITS_PER_BLOCK


class BatchGeometryError(ValueError):
    """A batch cannot take the fused single-program path (geometry only —
    genuine input errors raise plain ValueError and propagate)."""


def _pixel_path(img, quality: str, subsampling: str, use_fused: bool):
    if use_fused:
        from jpegtpu.kernels import fused_dctq
        return fused_dctq.encode_blocks(img, quality, subsampling)
    return ops.encode_blocks(img, quality, subsampling)


# Kernel-path selectors (pixel_path / fuse_bp / compact_kb / bp_merge_rot)
# are EncoderConfig fields since round 4 — jit-cache-keyed through the
# config, visible in `cli info`, env vars honored as config DEFAULTS only
# (JPEGTPU_PIXEL_PATH / JPEGTPU_FUSE_BP / JPEGTPU_COMPACT_KB /
# JPEGTPU_BP_MERGE_ROT; see config.py for each variant's HW provenance).


def _pixel_path_pairs(img, quality: str, subsampling: str, use_fused: bool,
                      pixel_path: str = "nat", with_dc: bool = False):
    """Pixel path for the Pallas production programs, in the pairs/native
    layout [..., nMCU, B*64] (block-major columns). On supported
    geometries this is the in-VMEM tiling Pallas kernel — bit-identical
    to the fused XLA twin, which the oracle path keeps (architecture
    invariant: every Pallas kernel has an XLA oracle twin). The form
    feeds entropy_pack.block_pack_mcu_pairs with zero relayout.

    with_dc: also return the kernel-emitted [..., nMCU, 8] DC plane (or
    None when the selected path cannot emit one — callers fall back to
    slicing coeffs[:, ::64])."""
    from jpegtpu.kernels import fused_dctq
    if use_fused:
        if pixel_path == "dma":
            y = fused_dctq.encode_blocks_pallas_dma_pairs(
                img, quality, subsampling)
            return (y, None) if with_dc else y
        if pixel_path == "nat":
            return fused_dctq.encode_blocks_pallas_nat_pairs(
                img, quality, subsampling, with_dc=with_dc)
        y = fused_dctq.encode_blocks_pairs(img, quality, subsampling)
        return (y, None) if with_dc else y
    c = ops.encode_blocks(img, quality, subsampling)
    *b, n_mcu, nb, _ = c.shape
    y = c.reshape(*b, n_mcu, nb * 64)
    return (y, None) if with_dc else y


def _n_luma(subsampling: str) -> int:
    return {"420": 4, "422": 2}.get(subsampling, 1)


def _device_encode_xla(img, *, quality, subsampling, restart, n_seg,
                       mcus_per_seg, use_fused):
    """XLA-only device program -> stuffed segments (oracle/off-TPU path)."""
    n_luma = _n_luma(subsampling)
    if img.ndim == 2 and subsampling != "gray":
        img = img.reshape(img.shape[0], -1, 3)   # flat-RGB parameter
    coeffs = _pixel_path(img, quality, subsampling, use_fused)
    n_mcu, b, _ = coeffs.shape
    lens, bits = scan.symbolize_scan(coeffs, n_luma, restart)
    pad = n_seg * mcus_per_seg - n_mcu
    if pad:
        lens = jnp.concatenate(
            [lens, jnp.zeros((pad, b, 64), lens.dtype)], axis=0)
        bits = jnp.concatenate(
            [bits, jnp.zeros((pad, b, 64), bits.dtype)], axis=0)
    return assemble.pack_segments(lens.reshape(-1, 64), bits.reshape(-1, 64),
                                  n_seg, mcus_per_seg * b)


def _mcu_major_ok(pad_mcu: int, mps: int, chunks: int) -> bool:
    """MCU-major block_pack->seg_merge handoff: measured SLOWER than the
    transpose path and disabled (negative result, kept tested).

    The handoff skips seg_merge_mcu's [n_seg, mps] -> [G, mps, S]
    transpose of the 50 MB stream tensor by letting block_pack emit
    seg_merge's native block order (one segment per grid step). An
    interleaved on-chip A/B (scripts/tpu_ab_mcumajor.py, 6 reps, valid
    streams bit-identical) measured 6.90 vs 6.73 ms/4K frame: XLA fuses
    the transpose into the adjacent pad copy (~0.4 ms, cheaper than the
    1.2 ms the anonymized trace suggested), while forcing block_pack's
    grid tile from 512 down to mps=240 costs more than the copy saves.
    Applicability gate (exact unragged grids, 8 | mps per the Mosaic
    block rule, per-segment block within VMEM budget) kept so tests can
    re-enable via _MCU_MAJOR_ENABLED."""
    return (_MCU_MAJOR_ENABLED and pad_mcu == 0 and mps % 8 == 0 and
            mps * chunks * 512 <= (2 << 20))


_MCU_MAJOR_ENABLED = False

# restart=0 virtual segment fan-out. 8 fills one seg_merge sublane-row
# band. TESTED NEGATIVE at 16/32 (round 5, scripts/ab_vseg.log,
# byte-identical): 4.82-4.94 -> 5.36-5.49 (16) -> 6.61-6.92 ms (32) —
# the per-stream bit_join passes grow linearly with the fan-out and
# swamp the saved append iterations. 8 stays the optimum.
_VSEG = int(os.environ.get("JPEGTPU_VSEG", "8"))


def _fused_bp_or_none(img, quality, subsampling, restart, bits_budget,
                      use_fused, fuse_bp=False):
    """Mega-fused pixel+block-pack front-end (kernels/fused_pipeline):
    (mwords, mlens, n_mcu, b) or None when the geometry/mode is not
    covered (caller falls back to the split pipeline)."""
    if not (use_fused and fuse_bp and
            subsampling in ("420", "422", "444")):
        return None
    from jpegtpu.kernels import entropy_pack, fused_pipeline
    n_luma = _n_luma(subsampling)
    b = n_luma + 2
    mcu_chunks, _ = entropy_pack.mcu_capacity(b, bits_budget)
    out = fused_pipeline.fused_pixel_block_pack_pairs(
        img, quality, subsampling, restart, mcu_chunks, n_luma)
    if out is None:
        return None
    mwords, mlens = out
    return mwords, mlens, mlens.shape[0], b


def _device_encode_pallas(img, *, quality, subsampling, restart, n_seg,
                          mcus_per_seg, bits_budget, use_fused,
                          device_stuff=False, pixel_path="nat",
                          fuse_bp=False, compact_kb=None,
                          bp_merge_rot=None, mcu_group=1,
                          compact_groups=1):
    """Pallas device program -> compacted stream + per-segment bit counts
    + the max per-MCU bit count (host escalation check, see mcu_capacity).
    With device_stuff, the stream is the COMPLETE stuffed scan with RST
    markers and a total-byte count is appended to the return."""
    from jpegtpu.kernels import compact, entropy_pack
    n_luma = _n_luma(subsampling)
    if img.ndim == 2 and subsampling != "gray":
        # [H, W*3] flat-RGB parameter (production fast path): the host
        # reshape is free, and a 2D jit parameter's device layout feeds
        # the nat pixel kernel's row-slab view directly — the 3D
        # parameter costs ~0.34 ms/4K of XLA relayout copies
        # (scripts/tpu_probe_img2d.py, byte-identical, 420 + 444).
        img = img.reshape(img.shape[0], -1, 3)
    fused_bp = _fused_bp_or_none(img, quality, subsampling, restart,
                                 bits_budget, use_fused, fuse_bp)
    if fused_bp is not None:
        _fused_mw, _fused_ml, n_mcu, b = fused_bp
    else:
        from jpegtpu.kernels import fused_dctq as _fdq
        if _fdq._PIXEL_DC:
            coeffs, dc_plane = _pixel_path_pairs(img, quality, subsampling,
                                                 use_fused, pixel_path,
                                                 with_dc=True)
        else:
            coeffs = _pixel_path_pairs(img, quality, subsampling,
                                       use_fused, pixel_path)
            dc_plane = None
        n_mcu, bx64 = coeffs.shape
        b = bx64 // 64
        dc_src = (dc_plane[:, :b] if dc_plane is not None
                  else coeffs[:, ::64])
        dcd = scan.dc_diffs_from_dc(dc_src, n_luma, restart).reshape(-1)
        cls = (jnp.arange(n_mcu * b, dtype=jnp.int32) % b >= n_luma)
    bps = mcus_per_seg * b
    w_cap = -(-bps * bits_budget // 32)
    mcu_chunks, _ = entropy_pack.mcu_capacity(b, bits_budget)
    pad_mcu = n_seg * mcus_per_seg - n_mcu

    def _mwords_mlens():
        if fused_bp is not None:
            return _fused_mw, _fused_ml
        return entropy_pack.block_pack_mcu_pairs(
            coeffs, cls.astype(jnp.int32), dcd, b, mcu_chunks,
            n_luma=n_luma, merge_rot=bp_merge_rot)

    if (fused_bp is None and mcu_group == 1 and
            _mcu_major_ok(pad_mcu, mcus_per_seg, mcu_chunks)):
        # MCU-major handoff: block_pack emits seg_merge's native block
        # order, skipping the 50 MB transpose (scripts/tpu_trace_ab.py)
        mwords, mlens = entropy_pack.block_pack_mcu_pairs(
            coeffs, cls.astype(jnp.int32), dcd, b, mcu_chunks,
            mcu_major_segs=n_seg, n_luma=n_luma, merge_rot=bp_merge_rot)
        seg_words, seg_bits, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, n_seg, mcus_per_seg, w_cap, mcu_major=True)
    elif restart == 0 and n_seg == 1 and n_mcu >= _VSEG:
        # Virtual 8-way split: one real segment would idle 7 of 8
        # seg_merge sublane rows (555 vs 1215 MPix/s at 4K). Merge 8
        # virtual segments in parallel — DC prediction is untouched
        # (dcd was computed restartless above) — then bit-join them
        # (the splits are bit-unaligned, entropy_pack.bit_join).
        mwords, mlens = _mwords_mlens()
        mps_v = -(-n_mcu // _VSEG)
        pad_v = _VSEG * mps_v - n_mcu
        if pad_v:
            mwords = jnp.concatenate(
                [mwords,
                 jnp.zeros((pad_v, mwords.shape[1]), mwords.dtype)])
            mlens = jnp.concatenate(
                [mlens, jnp.zeros(pad_v, mlens.dtype)])
        w_cap_v = -(-mps_v * b * bits_budget // 32)
        sw_v, sb_v, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, _VSEG, mps_v, w_cap_v)
        # per-VIRTUAL-segment budget overflow must still trigger the
        # host escalation; the joined [1] seg_bits can no longer show it
        cap_v_bits = (sw_v.shape[1] // 1024 - 1) * 1024 * 32
        max_mcu_bits = jnp.where(jnp.max(sb_v) > cap_v_bits,
                                 jnp.int32(1 << 30), max_mcu_bits)
        fj = (_VSEG * sw_v.shape[1]) // 1024 + 2
        joined, total_bits = entropy_pack.bit_join(sw_v, sb_v, fj * 1024)
        seg_words = joined.reshape(1, fj * 1024)
        seg_bits = total_bits.reshape(1)
    elif fused_bp is None and mcu_group > 1:
        # Grouped path (small-g modes): gm MCUs merge as ONE unit in
        # block_pack — same bytes (the segment stream is the identical
        # concatenation), 1/gm the seg_merge serial appends, and no
        # half-dummy symbolize pairs for odd/small g. Preconditions
        # (pad_mcu == 0, gm | mcus_per_seg) enforced by
        # _entropy_mcu_group/entropy_pack.mcu_group.
        assert pad_mcu == 0 and mcus_per_seg % mcu_group == 0
        g_eff = b * mcu_group
        gchunks, _ = entropy_pack.mcu_capacity(g_eff, bits_budget)
        cg = coeffs.reshape(n_mcu // mcu_group,
                            mcu_group * coeffs.shape[1])
        mwords, mlens = entropy_pack.block_pack_mcu_pairs(
            cg, cls.astype(jnp.int32), dcd, g_eff, gchunks,
            n_luma=n_luma, merge_rot=bp_merge_rot, cls_period=b)
        seg_words, seg_bits, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, n_seg, mcus_per_seg // mcu_group, w_cap)
    else:
        mwords, mlens = _mwords_mlens()
        if pad_mcu:  # ragged last segment: append silent (0-length) MCUs
            mwords = jnp.concatenate(
                [mwords,
                 jnp.zeros((pad_mcu, mwords.shape[1]), mwords.dtype)])
            mlens = jnp.concatenate(
                [mlens, jnp.zeros(pad_mcu, mlens.dtype)])
        seg_words, seg_bits, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, n_seg, mcus_per_seg, w_cap)
    # Device compaction: only the actual compressed bytes ever cross the
    # host link (which can be slow — e.g. a tunneled chip).
    frames_per_seg = seg_words.shape[1] // 1024
    if device_stuff:
        gs = min(compact_groups, n_seg)
        if gs > 1:
            # Grouped chains: 2D stream, one frame-aligned region per
            # chain; the host stitches the exact-size spans (group_lens).
            stream2d, group_lens, _, total = \
                compact.compact_segments_stuffed_grouped(
                    seg_words, seg_bits, frames_per_seg, restart, gs,
                    k_chunks=compact_kb)
            return stream2d, seg_bits, max_mcu_bits, total, group_lens
        stream, _, total = compact.compact_segments_stuffed(
            seg_words, seg_bits, frames_per_seg, restart,
            k_chunks=compact_kb)
        return stream, seg_bits, max_mcu_bits, total
    stream = compact.compact_segments(seg_words, seg_bits,
                                           frames_per_seg)
    return stream, seg_bits, max_mcu_bits


def _device_encode_pallas_batch(imgs, *, quality, subsampling, restart,
                                n_seg, mcus_per_seg, bits_budget, use_fused,
                                device_stuff=False, marker_nums=None,
                                pixel_path="nat", fuse_bp=False,
                                compact_kb=None, bp_merge_rot=None,
                                mcu_group=1, compact_groups=1):
    """Batched device program: [B, H, W, 3] -> one compacted stream + per-
    segment bit counts for the whole batch.

    Works by flattening the batch into the block dimension: with restart
    segments that divide each image's MCU count (restart_interval='rows'),
    image boundaries coincide with segment starts, so DC-predictor resets
    and segment packing need no per-image special casing.
    """
    from jpegtpu.kernels import compact, entropy_pack
    n_luma = _n_luma(subsampling)
    if imgs.ndim == 3 and subsampling != "gray":
        imgs = imgs.reshape(*imgs.shape[:2], -1, 3)   # flat-RGB batch
    fused_bp = _fused_bp_or_none(imgs, quality, subsampling, restart,
                                 bits_budget, use_fused, fuse_bp)
    if fused_bp is not None:
        mwords, mlens, _nm_tot, b = fused_bp
        bsz = imgs.shape[0]
    else:
        from jpegtpu.kernels import fused_dctq as _fdq
        if _fdq._PIXEL_DC:
            coeffs, dc_plane = _pixel_path_pairs(imgs, quality, subsampling,
                                                 use_fused, pixel_path,
                                                 with_dc=True)
        else:
            coeffs = _pixel_path_pairs(imgs, quality, subsampling,
                                       use_fused, pixel_path)
            dc_plane = None
        bsz, n_mcu, bx64 = coeffs.shape
        b = bx64 // 64
        flat = coeffs.reshape(bsz * n_mcu, bx64)
        dc_src = (dc_plane.reshape(bsz * n_mcu, -1)[:, :b]
                  if dc_plane is not None else flat[:, ::64])
        dcd = scan.dc_diffs_from_dc(dc_src, n_luma, restart).reshape(-1)
        cls = (jnp.arange(bsz * n_mcu * b, dtype=jnp.int32) % b >= n_luma)
    bps = mcus_per_seg * b
    w_cap = -(-bps * bits_budget // 32)
    mcu_chunks, _ = entropy_pack.mcu_capacity(b, bits_budget)
    if (fused_bp is None and mcu_group == 1 and
            _mcu_major_ok(0, mcus_per_seg, mcu_chunks)):
        mwords, mlens = entropy_pack.block_pack_mcu_pairs(
            flat, cls.astype(jnp.int32), dcd, b, mcu_chunks,
            mcu_major_segs=bsz * n_seg, n_luma=n_luma,
            merge_rot=bp_merge_rot)
        seg_words, seg_bits, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, bsz * n_seg, mcus_per_seg, w_cap,
            mcu_major=True)
    elif fused_bp is None and mcu_group > 1:
        # Grouped path — see _device_encode_pallas. Image boundaries
        # coincide with segment starts (batch precondition), and
        # gm | mcus_per_seg, so groups never straddle an image either.
        assert mcus_per_seg % mcu_group == 0
        g_eff = b * mcu_group
        gchunks, _ = entropy_pack.mcu_capacity(g_eff, bits_budget)
        cg = flat.reshape(flat.shape[0] // mcu_group,
                          mcu_group * flat.shape[1])
        mwords, mlens = entropy_pack.block_pack_mcu_pairs(
            cg, cls.astype(jnp.int32), dcd, g_eff, gchunks,
            n_luma=n_luma, merge_rot=bp_merge_rot, cls_period=b)
        seg_words, seg_bits, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, bsz * n_seg, mcus_per_seg // mcu_group, w_cap)
    else:
        if fused_bp is None:
            mwords, mlens = entropy_pack.block_pack_mcu_pairs(
                flat, cls.astype(jnp.int32), dcd, b, mcu_chunks,
                n_luma=n_luma, merge_rot=bp_merge_rot)
        seg_words, seg_bits, max_mcu_bits = entropy_pack.seg_merge_mcu(
            mwords, mlens, bsz * n_seg, mcus_per_seg, w_cap)
    frames_per_seg = seg_words.shape[1] // 1024
    if device_stuff:
        gs = 1
        if compact_groups > 1 and marker_nums is None:
            # Groups of WHOLE images (gs | bsz) so each image's bytes
            # live in one output region and per-image extraction stays a
            # single slice (_encode_batch_fused).
            gs = max(g for g in range(1, min(compact_groups, bsz) + 1)
                     if bsz % g == 0)
        if gs > 1:
            stream2d, group_lens, img_off, total = \
                compact.compact_segments_stuffed_grouped(
                    seg_words, seg_bits, frames_per_seg, restart, gs,
                    segs_per_image=n_seg, k_chunks=compact_kb)
            return (stream2d, seg_bits.reshape(bsz, n_seg), max_mcu_bits,
                    img_off, total, group_lens)
        stream, img_off, total = compact.compact_segments_stuffed(
            seg_words, seg_bits, frames_per_seg, restart,
            segs_per_image=n_seg, mnum=marker_nums,
            full_offsets=marker_nums is not None, k_chunks=compact_kb)
        return (stream, seg_bits.reshape(bsz, n_seg), max_mcu_bits,
                img_off, total)
    stream = compact.compact_segments(seg_words, seg_bits,
                                           frames_per_seg)
    return stream, seg_bits.reshape(bsz, n_seg), max_mcu_bits


@functools.lru_cache(maxsize=32)
def _jitted_encode_batch(batch: int, shape: Tuple[int, int],
                         cfg: EncoderConfig, bits_budget: int = 0):
    restart, n_seg, mcus_per_seg = _geometry(shape, cfg)
    my, mx = ops.mcu_grid(*shape, cfg.subsampling)
    if restart <= 0 or (my * mx) % restart:
        raise BatchGeometryError(
            "batched encode requires restart segments dividing each "
            "image's MCU count (use restart_interval='rows')")
    fn = functools.partial(
        _device_encode_pallas_batch, quality=cfg.quality,
        subsampling=cfg.subsampling, restart=restart, n_seg=n_seg,
        mcus_per_seg=mcus_per_seg,
        bits_budget=bits_budget or cfg.first_pass_budget,
        use_fused=cfg.use_pallas, device_stuff=cfg.device_stuff,
        pixel_path=cfg.pixel_path, fuse_bp=cfg.fuse_bp,
        compact_kb=cfg.compact_kb, bp_merge_rot=cfg.bp_merge_rot,
        mcu_group=_entropy_mcu_group(shape, cfg, bits_budget),
        compact_groups=cfg.compact_groups)
    return jax.jit(fn), restart, n_seg


def _budget_overflow(seg_bits_np: np.ndarray, max_mcu_bits: int,
                     cap_bits: int, blocks_per_mcu: int,
                     bits_budget: int) -> bool:
    """True when the first-pass bit budget was insufficient: a segment
    spilled its frame capacity, or a single MCU exceeded the (budget-sized)
    MCU stream capacity — both silently truncate on device, so the host
    must re-run with the worst-case budget (which can never overflow).
    bits_budget must be the budget the first pass actually compiled with."""
    from jpegtpu.kernels.entropy_pack import mcu_capacity
    _, mcu_cap_bits = mcu_capacity(blocks_per_mcu, bits_budget)
    return (int(seg_bits_np.max(initial=0)) > cap_bits or
            max_mcu_bits > mcu_cap_bits)


def _geometry(shape: Tuple[int, int], cfg: EncoderConfig):
    h, w = shape
    my, mx = ops.mcu_grid(h, w, cfg.subsampling)
    n_mcu = my * mx
    restart = cfg.resolve_restart(mx)
    n_seg = -(-n_mcu // restart) if restart > 0 else 1
    mcus_per_seg = restart if restart > 0 else n_mcu
    return restart, n_seg, mcus_per_seg


def _entropy_mcu_group(shape: Tuple[int, int], cfg: EncoderConfig,
                       bits_budget: int = 0) -> int:
    """The MCU grouping factor the Pallas entropy program compiles with
    (entropy_pack.mcu_group: gm consecutive MCUs merge as one unit when
    that is chunk-count-free — cuts seg_merge's serial appends by gm and
    halves the small-g symbolize waste for 444/422/gray; a no-op, gm=1,
    for 420). Decided ONCE here so the device program and the host
    budget-overflow check always agree on blocks per merge unit."""
    restart, n_seg, mcus_per_seg = _geometry(shape, cfg)
    my, mx = ops.mcu_grid(*shape, cfg.subsampling)
    if (cfg.fuse_bp or (restart == 0 and n_seg == 1)
            or n_seg * mcus_per_seg != my * mx):   # ragged pad: plain path
        return 1
    from jpegtpu.kernels import entropy_pack
    return entropy_pack.mcu_group(cfg.blocks_per_mcu,
                                  bits_budget or cfg.first_pass_budget,
                                  mcus_per_seg)


@functools.lru_cache(maxsize=64)
def _jitted_encode(shape: Tuple[int, int], cfg: EncoderConfig,
                   bits_budget: int = 0):
    """Compiled device program for one (H, W) geometry + config.

    Returns (fn, restart, kind) with kind in {'stuffed', 'words'}.
    """
    restart, n_seg, mcus_per_seg = _geometry(shape, cfg)
    # The v3 merge streams MCU blocks through a grid dimension, so VMEM use
    # is independent of segment length — restart_interval=0 takes the
    # Pallas path too (the old 6 MB heuristic and its 65x XLA-fallback
    # cliff are gone).
    use_pallas_entropy = (cfg.device_bitpack and
                          jax.default_backend() == "tpu")
    if use_pallas_entropy:
        fn = functools.partial(
            _device_encode_pallas, quality=cfg.quality,
            subsampling=cfg.subsampling, restart=restart, n_seg=n_seg,
            mcus_per_seg=mcus_per_seg,
            bits_budget=bits_budget or cfg.first_pass_budget,
            use_fused=cfg.use_pallas, device_stuff=cfg.device_stuff,
            pixel_path=cfg.pixel_path, fuse_bp=cfg.fuse_bp,
            compact_kb=cfg.compact_kb, bp_merge_rot=cfg.bp_merge_rot,
            mcu_group=_entropy_mcu_group(shape, cfg, bits_budget),
            compact_groups=cfg.compact_groups)
        return jax.jit(fn), restart, ("scan" if cfg.device_stuff
                                      else "stream")
    fn = functools.partial(
        _device_encode_xla, quality=cfg.quality, subsampling=cfg.subsampling,
        restart=restart, n_seg=n_seg, mcus_per_seg=mcus_per_seg,
        use_fused=cfg.use_pallas)
    return jax.jit(fn), restart, "stuffed"


class Encoder:
    """Reusable encoder; compiled programs are cached per image geometry."""

    def __init__(self, config: EncoderConfig | None = None):
        self.config = config or EncoderConfig()

    def _run_device(self, img: np.ndarray):
        h, w = img.shape[:2]
        fn, restart, kind = _jitted_encode((h, w), self.config)
        # flat-RGB [H, W*3] parameter: free host reshape, saves ~0.34
        # ms/4K of device relayout copies (the program accepts either
        # form — _device_encode_pallas normalizes)
        if img.ndim == 3:
            img = img.reshape(h, -1)
        out = fn(jnp.asarray(img))
        if kind in ("scan", "stream"):
            stream, seg_bits, max_mcu = out[:3]
            seg_bits_np = np.asarray(seg_bits)     # tiny fetch, also syncs
            n_seg = seg_bits.shape[0]
            if stream.ndim == 2:                   # grouped chains (gscan)
                spg = -(-n_seg // stream.shape[0])
                frames = (stream.shape[1] // 1024 - 2) // (2 * spg)
            elif kind == "scan":                   # stuffed out is 2x+slack
                frames = (stream.shape[0] // 1024 - 1) // (2 * n_seg)
            else:
                frames = stream.shape[0] // n_seg // 1024
            cap_bits = (frames - 1) * 1024 * 32    # last frame is slack
            gm = _entropy_mcu_group((h, w), self.config)
            if _budget_overflow(seg_bits_np, int(np.asarray(max_mcu)),
                                cap_bits, self.config.blocks_per_mcu * gm,
                                self.config.first_pass_budget):
                # Rare escalation: re-run with the worst-case budget.
                fn, restart, kind = _jitted_encode(
                    (h, w), self.config, MAX_BITS_PER_BLOCK)
                out = fn(jnp.asarray(img))
                stream, seg_bits = out[0], out[1]
                seg_bits_np = np.asarray(seg_bits)
            if kind == "scan" and stream.ndim == 2:
                return ("gscan", (stream, np.asarray(out[4])),
                        int(np.asarray(out[3])), restart)
            if kind == "scan":
                return ("scan", stream, int(np.asarray(out[3])), restart)
            return ("stream", stream, seg_bits_np, restart)
        stuffed, nbytes, _ = out
        return ("stuffed", stuffed, np.asarray(nbytes), restart)

    # Fetch granularity for the compacted stream (u32 words = 4 MB chunks):
    # rounding keeps the number of distinct compiled device-slice programs
    # tiny while still transferring only ~the compressed size.
    _FETCH_GRANULE = 1 << 20

    def encode_to_scan(self, img: np.ndarray) -> Tuple[bytes, int]:
        """Device pipeline + host assembly -> (entropy scan bytes, restart)."""
        if self.config.subsampling == "gray":
            if img.ndim == 3 and img.shape[2] == 1:
                img = img[..., 0]
            if img.ndim != 2:
                raise ValueError(
                    f"gray mode expects [H, W] input, got {img.shape}")
        elif img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"expected [H, W, 3] RGB, got {img.shape}")
        kind, payload, meta, restart = self._run_device(img)
        if kind == "scan":
            # Device output IS the final scan (stuffed + RST markers);
            # fetch exactly the compressed bytes and we are done.
            total = meta
            n_words = -(-total // 4)
            n_fetch = min(
                -(-n_words // self._FETCH_GRANULE) * self._FETCH_GRANULE,
                payload.shape[0])
            raw = np.asarray(payload[:n_fetch])
            scan_bytes = raw.view(np.uint8)[:total].tobytes()
        elif kind == "gscan":
            # Grouped chains: stitch each chain's exact-size span (the
            # scan is their concatenation; lengths are device scalars).
            stream2d, glens = payload
            parts = []
            for g in range(stream2d.shape[0]):
                nb = int(glens[g])
                if nb == 0:
                    continue
                n_words = -(-nb // 4)
                n_fetch = min(
                    -(-n_words // self._FETCH_GRANULE) *
                    self._FETCH_GRANULE, stream2d.shape[1])
                raw = np.asarray(stream2d[g, :n_fetch])
                parts.append(raw.view(np.uint8)[:nb].tobytes())
            scan_bytes = b"".join(parts)
        elif kind == "stream":
            nbytes = (meta.astype(np.int64) + 7) // 8
            total = int(nbytes.sum())
            n_words = -(-total // 4)
            n_fetch = min(
                -(-n_words // self._FETCH_GRANULE) * self._FETCH_GRANULE,
                payload.shape[0])
            raw = np.asarray(payload[:n_fetch])
            stream = raw.view(np.uint8)[:total]
            scan_bytes = native.stuff_assemble_contig(
                stream, nbytes.astype(np.int32), restart)
        else:
            scan_bytes = assemble.assemble_scan_host(
                np.asarray(payload), meta, restart)
        return scan_bytes, restart

    def encode(self, img: np.ndarray) -> bytes:
        """uint8 RGB [H, W, 3] -> complete JFIF/JPEG bytes."""
        h, w = img.shape[:2]
        scan_bytes, restart = self.encode_to_scan(img)
        return jfif.wrap_jpeg(h, w, self.config.quality,
                              self.config.subsampling, restart, scan_bytes)


def encode(img: np.ndarray, quality: int = 50, subsampling: str = "420",
           restart_interval: int | str = "rows", **kw) -> bytes:
    """One-shot convenience wrapper."""
    cfg = EncoderConfig(quality=quality, subsampling=subsampling,
                        restart_interval=restart_interval, **kw)
    return Encoder(cfg).encode(img)


def encode_cpu(img: np.ndarray, quality: int = 50, subsampling: str = "420",
               restart_interval: int | str = "rows") -> bytes:
    """Sequential native-C++ reference encode (the CPU-tier oracle,
    mirroring the reference's JpegEncoderHost pipeline). Produces a
    complete JFIF file; raises if the native library is unavailable."""
    cfg = EncoderConfig(quality=quality, subsampling=subsampling,
                        restart_interval=restart_interval)
    h, w = img.shape[:2]
    _, mx = ops.mcu_grid(h, w, cfg.subsampling)
    restart = cfg.resolve_restart(mx)
    scan_bytes = native.cpu_encode_scan(img, cfg.quality, cfg.subsampling,
                                        restart)
    if scan_bytes is None:
        raise RuntimeError("native CPU encoder unavailable")
    return jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling, restart,
                          scan_bytes)


def encode_batch(imgs: Sequence[np.ndarray],
                 config: EncoderConfig | None = None, **kw) -> List[bytes]:
    """Encode a batch of images.

    Same-shaped uint8 batches on TPU run as ONE device program over
    [B, H, W, 3] (fixed dispatch/compile overhead amortized across the
    batch); anything else falls back to a shared per-image Encoder. The
    multi-chip sharded path lives in jpegtpu.dist. Pass a prebuilt
    EncoderConfig as `config`, or EncoderConfig fields as keywords.
    """
    if config is not None and kw:
        raise TypeError("pass either config= or EncoderConfig keywords")
    cfg = config or (EncoderConfig(**kw) if kw else EncoderConfig())
    imgs = list(imgs)
    shapes = {im.shape for im in imgs}
    if (len(imgs) > 1 and len(shapes) == 1 and
            cfg.device_bitpack and jax.default_backend() == "tpu"):
        try:
            return _encode_batch_fused(np.stack(imgs), cfg)
        except BatchGeometryError as e:
            # Geometry prevents the single-program path; a throughput-mode
            # user should know they are paying N dispatches instead of 1.
            warnings.warn(f"encode_batch: fused batch path unavailable "
                          f"({e}); falling back to per-image encodes",
                          RuntimeWarning, stacklevel=2)
    enc = Encoder(cfg)
    return [enc.encode(im) for im in imgs]


def _encode_batch_fused(imgs: np.ndarray, cfg: EncoderConfig) -> List[bytes]:
    bsz, h, w = imgs.shape[:3]
    fn, restart, n_seg = _jitted_encode_batch(bsz, (h, w), cfg)
    if imgs.ndim == 4:
        imgs = imgs.reshape(bsz, h, -1)     # flat-RGB batch parameter
    out_dev = fn(jnp.asarray(imgs))
    stream, seg_bits, max_mcu = out_dev[:3]
    seg_bits_np = np.asarray(seg_bits)
    if stream.ndim == 2:                       # grouped chains
        spg = (bsz // stream.shape[0]) * n_seg
        frames = (stream.shape[1] // 1024 - 2) // (2 * spg)
    elif cfg.device_stuff:
        frames = (stream.shape[0] // 1024 - 1) // (2 * bsz * n_seg)
    else:
        frames = stream.shape[0] // (bsz * n_seg) // 1024
    cap_bits = (frames - 1) * 1024 * 32
    gm = _entropy_mcu_group((h, w), cfg)
    if _budget_overflow(seg_bits_np, int(np.asarray(max_mcu)), cap_bits,
                        cfg.blocks_per_mcu * gm, cfg.first_pass_budget):
        fn, restart, n_seg = _jitted_encode_batch(
            bsz, (h, w), cfg, MAX_BITS_PER_BLOCK)
        out_dev = fn(jnp.asarray(imgs))
        stream, seg_bits = out_dev[0], out_dev[1]
        seg_bits_np = np.asarray(seg_bits)

    gran = Encoder._FETCH_GRANULE
    if cfg.device_stuff and stream.ndim == 2:
        # Grouped chains over whole images (gs | bsz): image i's bytes
        # live in region i // ipg at its global offset minus the group's
        # first image offset.
        img_off = np.asarray(out_dev[3])
        glens = np.asarray(out_dev[5])
        gs = stream.shape[0]
        ipg = bsz // gs
        raws = []
        for g in range(gs):
            n_words = -(-int(glens[g]) // 4)
            n_fetch = min(-(-n_words // gran) * gran, stream.shape[1])
            raws.append(np.asarray(stream[g, :n_fetch])
                        .view(np.uint8)[:int(glens[g])])
        files = []
        for i in range(bsz):
            g = i // ipg
            start = int(img_off[i] - img_off[g * ipg])
            end = (int(img_off[i + 1] - img_off[g * ipg])
                   if (i + 1) % ipg else int(glens[g]))
            files.append(jfif.wrap_jpeg(h, w, cfg.quality,
                                        cfg.subsampling, restart,
                                        raws[g][start:end].tobytes()))
        return files
    if cfg.device_stuff:
        img_off = np.asarray(out_dev[3])
        total = int(np.asarray(out_dev[4]))
        n_words = -(-total // 4)
        n_fetch = min(-(-n_words // gran) * gran, stream.shape[0])
        raw = np.asarray(stream[:n_fetch]).view(np.uint8)[:total]
        bounds = list(img_off) + [total]
        return [jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling, restart,
                               raw[bounds[i]:bounds[i + 1]].tobytes())
                for i in range(bsz)]

    nbytes = (seg_bits_np.astype(np.int64) + 7) // 8   # [B, n_seg]
    total = int(nbytes.sum())
    n_words = -(-total // 4)
    n_fetch = min(-(-n_words // gran) * gran, stream.shape[0])
    raw = np.asarray(stream[:n_fetch]).view(np.uint8)[:total]

    out = []
    off = 0
    for i in range(bsz):
        nb = nbytes[i]
        sz = int(nb.sum())
        scan_bytes = native.stuff_assemble_contig(
            raw[off:off + sz], nb.astype(np.int32), restart)
        off += sz
        out.append(jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling,
                                  restart, scan_bytes))
    return out
