"""Sharded batch encode: shard_map over a ('data', 'row') mesh.

Parallel decomposition (SURVEY §2.14 mapping table, BASELINE.json configs
4-5): image batches shard over 'data'; within an image, MCU rows shard over
'row'. Restart-interval segmentation makes entropy coding embarrassingly
parallel — each segment resets the DC predictor and is byte-aligned, so a
shard owning whole segments needs NO sequential coupling with its neighbors
(the restart mechanism exists precisely to break the DC chain, SURVEY §2.14).
Cross-shard work is pure collectives: an all_gather of per-shard byte counts
over ICI computes every shard's output byte offset, and a psum yields the
total scan size, so the host can splice RST markers without a serial pass.

Constraint (round 1): restart segments must not cross row-shard boundaries
(restart_interval='rows' guarantees this). Segment-crossing shards would need
bit-level stream merging; that is what DC-boundary ppermute exchange +
bit-shift merge would buy and is deliberately out of scope until needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from jpegtpu import native
from jpegtpu.config import EncoderConfig
from jpegtpu.container import jfif
from jpegtpu.core import ops
from jpegtpu.dist import mesh as mesh_lib
from jpegtpu.encoder import (DEFAULT_BITS_BUDGET, _device_encode_pallas,
                             _device_encode_xla, _n_luma, _pixel_path)
from jpegtpu.entropy import assemble, scan
from jpegtpu.entropy.assemble import MAX_BITS_PER_BLOCK


def _pallas_entropy_ok(cfg: EncoderConfig, mcus_per_seg: int) -> bool:
    """Same selection rule as the single-device encoder (jpegtpu.encoder):
    the v3 merge streams from HBM, so segment length no longer matters."""
    return cfg.device_bitpack and jax.default_backend() == "tpu"


def _shard_fn(imgs, *, quality, subsampling, restart, n_seg_local,
              mcus_per_seg, use_pallas, mesh):
    """Per-shard body: imgs [b_loc, h_loc, W, 3] (pre-padded; h_loc a
    multiple of the MCU size). Returns per-shard stuffed segments plus
    ICI-computed global offsets."""
    enc = functools.partial(
        _device_encode_xla, quality=quality, subsampling=subsampling,
        restart=restart, n_seg=n_seg_local, mcus_per_seg=mcus_per_seg,
        use_fused=use_pallas)
    stuffed, nbytes, seg_bits = jax.vmap(enc)(imgs)

    # Global segment byte offsets: all_gather per-shard totals over the ICI
    # 'row' axis, exclusive-sum below my index; then psum for the total.
    local_total = jnp.sum(nbytes, axis=1)                    # [b_loc]
    totals = jax.lax.all_gather(local_total, mesh_lib.ROW_AXIS)  # [n_row, b_loc]
    my = jax.lax.axis_index(mesh_lib.ROW_AXIS)
    below = jnp.sum(jnp.where(
        jnp.arange(totals.shape[0])[:, None] < my, totals, 0), axis=0)
    offsets = below[:, None] + jnp.cumsum(nbytes, axis=1) - nbytes
    grand_total = jax.lax.psum(local_total, mesh_lib.ROW_AXIS)
    return stuffed, nbytes, offsets, grand_total


def _shard_fn_pallas(imgs, *, quality, subsampling, restart, n_seg_local,
                     mcus_per_seg, bits_budget, use_fused, n_seg_keep=0,
                     pixel_path="nat", fuse_bp=False, compact_kb=None,
                     bp_merge_rot=None, mcu_group=1):
    """Per-shard body on the Pallas entropy path: the shard's whole image
    batch folds into the block dimension (same trick as
    encoder._device_encode_pallas_batch — vmap would batch the ANY-space
    compact kernel, which Mosaic rejects), producing ONE compacted stream
    per shard. The ICI work is a psum/all_gather of byte totals so every
    shard knows the global output size.

    With n_seg_keep > 0 (segments per image the DECODER expects, from the
    unpadded height) the shard also stuffs + splices RSTn markers on
    device: marker numbers are computed from the mesh row index so the
    RST cycle runs across row shards within each image, the image's true
    last segment (which may sit before this shard's end when row-padding
    added droppable tail segments) gets no marker, and the host assembly
    is pure byte concatenation."""
    from jpegtpu.encoder import _device_encode_pallas_batch
    if n_seg_keep:
        b_loc = imgs.shape[0]
        r = jax.lax.axis_index(mesh_lib.ROW_AXIS).astype(jnp.int32)
        within = (jnp.arange(b_loc * n_seg_local, dtype=jnp.int32)
                  % n_seg_local)
        g = r * n_seg_local + within        # within-image global seg index
        mnum = jnp.where(g < n_seg_keep - 1, 0xD0 + (g % 8),
                         0).astype(jnp.int32)
        stream, seg_bits, max_mcu, seg_start, total = \
            _device_encode_pallas_batch(
                imgs, quality=quality, subsampling=subsampling,
                restart=restart, n_seg=n_seg_local,
                mcus_per_seg=mcus_per_seg, bits_budget=bits_budget,
                use_fused=use_fused, device_stuff=True, marker_nums=mnum,
                pixel_path=pixel_path, fuse_bp=fuse_bp,
                compact_kb=compact_kb, bp_merge_rot=bp_merge_rot,
                mcu_group=mcu_group)
        max_mcu = jax.lax.pmax(max_mcu, mesh_lib.ROW_AXIS)
        return (stream.reshape(1, -1), seg_bits,
                seg_start.reshape(1, -1), total.reshape(1, 1),
                max_mcu.reshape(1))
    stream, seg_bits, max_mcu = _device_encode_pallas_batch(
        imgs, quality=quality, subsampling=subsampling, restart=restart,
        n_seg=n_seg_local, mcus_per_seg=mcus_per_seg,
        bits_budget=bits_budget, use_fused=use_fused,
        pixel_path=pixel_path, fuse_bp=fuse_bp, compact_kb=compact_kb,
        bp_merge_rot=bp_merge_rot, mcu_group=mcu_group)
    # stream: [L] u32 (all shard images' segments, in order);
    # seg_bits: [b_loc, n_seg_local]
    nbytes = (seg_bits + 7) >> 3
    grand_total = jax.lax.psum(jnp.sum(nbytes), mesh_lib.ROW_AXIS)
    max_mcu = jax.lax.pmax(max_mcu, mesh_lib.ROW_AXIS)
    return (stream.reshape(1, -1), seg_bits, grand_total.reshape(1),
            max_mcu.reshape(1))


def _sharded_mcu_group(cfg: EncoderConfig, restart: int,
                       bits_budget: int) -> int:
    """Grouping factor for the sharded Pallas path (the single-device
    decision logic, encoder._entropy_mcu_group, restricted to the
    rows/N-restart geometries this path accepts)."""
    if cfg.fuse_bp or restart <= 0:
        return 1
    from jpegtpu.kernels import entropy_pack
    return entropy_pack.mcu_group(cfg.blocks_per_mcu, bits_budget, restart)


@functools.lru_cache(maxsize=16)
def _build_sharded_pallas(mesh_key, shape: Tuple[int, int, int],
                          cfg: EncoderConfig, bits_budget: int,
                          n_seg_keep: int = 0):
    mesh = _MESHES[mesh_key]
    b, h, w = shape
    n_row = mesh.shape[mesh_lib.ROW_AXIS]
    h_loc = h // n_row
    my_loc, mx = ops.mcu_grid(h_loc, w, cfg.subsampling)
    restart = cfg.resolve_restart(mx)
    if restart <= 0 or mx % restart:
        # Same contract as _build_sharded: a restart interval that does not
        # divide the MCUs-per-row count would cross row-shard boundaries and
        # silently undercount segments here (corrupt output, not an error).
        raise ValueError(
            "sharded encode requires restart segments that do not cross "
            "row shards (use restart_interval='rows' or a divisor of the "
            "MCUs-per-row count)")
    n_seg_local = my_loc * (mx // restart)
    fn = functools.partial(
        _shard_fn_pallas, quality=cfg.quality, subsampling=cfg.subsampling,
        restart=restart, n_seg_local=n_seg_local, mcus_per_seg=restart,
        bits_budget=bits_budget, use_fused=cfg.use_pallas,
        n_seg_keep=n_seg_keep, pixel_path=cfg.pixel_path,
        fuse_bp=cfg.fuse_bp, compact_kb=cfg.compact_kb,
        bp_merge_rot=cfg.bp_merge_rot,
        mcu_group=_sharded_mcu_group(cfg, restart, bits_budget))
    if n_seg_keep:
        out_specs = (P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                     P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                     P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                     P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                     P(mesh_lib.DATA_AXIS))
    else:
        out_specs = (P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                     P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                     P(mesh_lib.DATA_AXIS),
                     P(mesh_lib.DATA_AXIS))
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS, None, None),
        out_specs=out_specs,
        check_vma=False)
    return _jit_replicated_out(sharded, mesh), restart, n_seg_local


def _assemble_sharded_pallas(stream, seg_bits, b, n_data, n_row, h, w, cfg,
                             restart, n_seg_local):
    """Host assembly for the sharded Pallas path.

    stream: [n_data, n_row * L] — one compacted stream per (data, row)
    shard, each holding that shard's whole image batch back to back.
    seg_bits: [B, n_row * n_seg_local]. Fetches each shard stream's
    compressed prefix once, then splices every image's segments in one
    contiguous stuffing pass (RST numbering runs across row shards).
    """
    b_loc = b // n_data
    per_shard_words = stream.shape[1] // n_row
    seg_bits_np = np.asarray(seg_bits).reshape(b, n_row, n_seg_local)
    nbytes = (seg_bits_np.astype(np.int64) + 7) // 8

    my_real, mx = ops.mcu_grid(h, w, cfg.subsampling)
    n_seg_keep = my_real * (mx // restart)

    # Fetch each (data, row) shard's stream prefix once (compressed size).
    chunk_bytes = {}
    for d in range(n_data):
        for r in range(n_row):
            total = int(nbytes[d * b_loc:(d + 1) * b_loc, r].sum())
            n_words = -(-total // 4)
            raw = np.asarray(
                stream[d, r * per_shard_words:
                       r * per_shard_words + n_words]).view(np.uint8)
            chunk_bytes[(d, r)] = raw[:total]

    out = []
    for i in range(b):
        d, j = divmod(i, b_loc)
        parts, lens = [], []
        kept = 0
        for r in range(n_row):
            keep_segs = min(max(n_seg_keep - kept, 0), n_seg_local)
            if keep_segs == 0:
                break
            # image j's bytes start after images 0..j-1 of this chunk
            start = int(nbytes[d * b_loc:d * b_loc + j, r].sum())
            nb = nbytes[i, r, :keep_segs]
            parts.append(chunk_bytes[(d, r)][start:start + int(nb.sum())])
            lens.append(nb)
            kept += keep_segs
        contig = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        nb_all = np.concatenate(lens).astype(np.int32)
        scan_bytes = native.stuff_assemble_contig(contig, nb_all, restart)
        out.append(jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling,
                                  restart, scan_bytes))
    return out


def _assemble_sharded_pallas_stuffed(stream, seg_start, totals, b, n_data,
                                     n_row, h, w, cfg, restart,
                                     n_seg_local, n_seg_keep):
    """Host assembly when shards stuff + splice on device: fetch each
    shard stream's exact stuffed bytes once, then per image concatenate
    the per-shard slices (markers are already numbered across shards by
    _shard_fn_pallas) and wrap headers. No host codec work at all.

    Row-padding tail segments (beyond n_seg_keep per image) are embedded
    in the device streams but carry no markers and are simply not
    sliced out."""
    b_loc = b // n_data
    per_shard_words = stream.shape[1] // n_row
    ss = np.asarray(seg_start).reshape(n_data, n_row,
                                       b_loc * n_seg_local)
    tot = np.asarray(totals).reshape(n_data, n_row).astype(np.int64)

    shard_bytes = {}
    for d in range(n_data):
        for r in range(n_row):
            nb = int(tot[d, r])
            n_words = -(-nb // 4)
            raw = np.asarray(
                stream[d, r * per_shard_words:
                       r * per_shard_words + n_words]).view(np.uint8)
            shard_bytes[(d, r)] = raw[:nb]

    out = []
    for i in range(b):
        d, j = divmod(i, b_loc)
        parts = []
        for r in range(n_row):
            keep = min(max(n_seg_keep - r * n_seg_local, 0), n_seg_local)
            if keep == 0:
                break
            start = int(ss[d, r, j * n_seg_local])
            idx_end = j * n_seg_local + keep
            end = (int(ss[d, r, idx_end]) if idx_end < ss.shape[2]
                   else int(tot[d, r]))
            parts.append(shard_bytes[(d, r)][start:end])
        scan_bytes = b"".join(p.tobytes() for p in parts)
        out.append(jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling,
                                  restart, scan_bytes))
    return out


def _shard_fn_norestart(imgs, *, quality, subsampling, use_fused, n_row,
                        bits_budget):
    """No-restart sharded body: the whole image is ONE entropy segment, so
    the DC predictor chains ACROSS row shards — each shard receives its
    predecessor's final DC values (Y, Cb, Cr) over ICI via ppermute (the
    BASELINE 'DC-predictor boundary exchange'), then emits a raw unaligned
    bitstream; the host merges shard streams at bit level (C++)."""
    n_luma = _n_luma(subsampling)

    coeffs = jax.vmap(
        lambda im: _pixel_path(im, quality, subsampling, use_fused))(imgs)
    b_loc, n_mcu, b, _ = coeffs.shape
    last_dc = jnp.stack(
        [coeffs[:, -1, n_luma - 1, 0],
         coeffs[:, -1, min(n_luma, b - 1), 0],
         coeffs[:, -1, min(n_luma + 1, b - 1), 0]], axis=1)  # [b_loc, 3]
    perm = [(i, i + 1) for i in range(n_row - 1)]
    prev_dc = jax.lax.ppermute(last_dc, mesh_lib.ROW_AXIS, perm)

    def entropy(coeffs_i, init_i):
        lens, bits = scan.symbolize_scan(coeffs_i, n_luma, 0,
                                         init_dc=init_i)
        words, seg_bits = assemble.pack_words(
            lens.reshape(-1, 64), bits.reshape(-1, 64), 1, n_mcu * b,
            bits_budget)
        return words[0], seg_bits.reshape(1)

    words, bits = jax.vmap(entropy)(coeffs, prev_dc)
    return words, bits


def _shard_fn_norestart_pallas(imgs, *, quality, subsampling, use_fused,
                               n_row, bits_budget, pixel_path="nat",
                               bp_merge_rot=None):
    """No-restart sharded body on the Pallas entropy path: the same ICI
    DC-predictor exchange as _shard_fn_norestart, then the fast kernels
    per shard image — block_pack + 8-way VIRTUAL segment merge + device
    bit_join (the single-device restart=0 machinery; virtual splits do
    not touch DC prediction). Emits raw UNALIGNED bitstreams
    (bit_join(pad_final=False)): the host joins shard streams at bit
    level (native.merge_bitstreams), exactly as the XLA body."""
    from jpegtpu.encoder import _VSEG, _pixel_path_pairs
    from jpegtpu.kernels import entropy_pack
    n_luma = _n_luma(subsampling)
    coeffs = jax.vmap(lambda im: _pixel_path_pairs(
        im, quality, subsampling, use_fused, pixel_path))(imgs)
    b_loc, n_mcu, bx64 = coeffs.shape
    b = bx64 // 64
    dc_last = coeffs[:, -1, ::64]                  # [b_loc, b]
    last_dc = jnp.stack(
        [dc_last[:, n_luma - 1], dc_last[:, min(n_luma, b - 1)],
         dc_last[:, min(n_luma + 1, b - 1)]], axis=1)
    perm = [(i, i + 1) for i in range(n_row - 1)]
    prev_dc = jax.lax.ppermute(last_dc, mesh_lib.ROW_AXIS, perm)

    dcd = jax.vmap(lambda c2, ini: scan.dc_diffs_from_dc(
        c2[:, ::64], n_luma, 0, init_dc=ini))(coeffs, prev_dc)
    cls = (jnp.arange(b_loc * n_mcu * b, dtype=jnp.int32) % b >= n_luma)
    chunks, _ = entropy_pack.mcu_capacity(b, bits_budget)
    vseg = _VSEG if n_mcu >= _VSEG else 1
    mps_v = -(-n_mcu // vseg)
    pad_v = vseg * mps_v - n_mcu
    # images flatten into the block dimension (vmap would batch the
    # Mosaic kernels); virtual padding interleaves per image tail
    mw, ml = entropy_pack.block_pack_mcu_pairs(
        coeffs.reshape(b_loc * n_mcu, bx64), cls.astype(jnp.int32),
        dcd.reshape(-1), b, chunks, n_luma=n_luma,
        merge_rot=bp_merge_rot)
    if pad_v:
        mw = jnp.pad(mw.reshape(b_loc, n_mcu, -1),
                     ((0, 0), (0, pad_v), (0, 0)))
        mw = mw.reshape(b_loc * (n_mcu + pad_v), -1)
        ml = jnp.pad(ml.reshape(b_loc, n_mcu),
                     ((0, 0), (0, pad_v))).reshape(-1)
    w_cap_v = -(-mps_v * b * bits_budget // 32)
    sw, sb, _ = entropy_pack.seg_merge_mcu(
        mw, ml, b_loc * vseg, mps_v, w_cap_v)
    fj = (vseg * sw.shape[1]) // 1024 + 2
    joined, total = jax.vmap(
        lambda w_, b_: entropy_pack.bit_join(
            w_, b_, fj * 1024, pad_final=False))(
        sw.reshape(b_loc, vseg, -1), sb.reshape(b_loc, vseg))
    return joined, total.reshape(b_loc, 1)


@functools.lru_cache(maxsize=16)
def _build_sharded_norestart(mesh_key, shape: Tuple[int, int, int],
                             cfg: EncoderConfig):
    mesh = _MESHES[mesh_key]
    b, h, w = shape
    n_row = mesh.shape[mesh_lib.ROW_AXIS]
    mh = cfg.mcu_shape[0]
    if h % (n_row * mh):
        raise ValueError(
            "no-restart sharded encode cannot pad rows (padding blocks "
            "would join the single segment); H must divide into whole-MCU "
            f"row shards (H={h}, shards={n_row}, MCU height={mh})")
    if _pallas_entropy_ok(cfg, 0):
        fn = functools.partial(
            _shard_fn_norestart_pallas, quality=cfg.quality,
            subsampling=cfg.subsampling, use_fused=cfg.use_pallas,
            n_row=n_row, bits_budget=MAX_BITS_PER_BLOCK,
            pixel_path=cfg.pixel_path, bp_merge_rot=cfg.bp_merge_rot)
    else:
        fn = functools.partial(
            _shard_fn_norestart, quality=cfg.quality,
            subsampling=cfg.subsampling, use_fused=cfg.use_pallas,
            n_row=n_row, bits_budget=MAX_BITS_PER_BLOCK)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS, None, None),
        out_specs=(P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                   P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS)),
        check_vma=False)
    return _jit_replicated_out(sharded, mesh)


def _encode_batch_sharded_norestart(imgs, cfg, mesh):
    b, h, w = imgs.shape[:3]
    n_row = mesh.shape[mesh_lib.ROW_AXIS]
    fn = _build_sharded_norestart(_mesh_key(mesh), (b, h, w), cfg)
    words, bits = fn(_put_imgs(imgs, mesh))
    words = np.asarray(words).reshape(b, n_row, -1)
    bits = np.asarray(bits).reshape(b, n_row).astype(np.int64)
    out = []
    for i in range(b):
        streams = words[i].byteswap().view(np.uint8).reshape(n_row, -1)
        scan_bytes = native.merge_bitstreams(streams, bits[i])
        out.append(jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling, 0,
                                  scan_bytes))
    return out


@functools.lru_cache(maxsize=16)
def _build_sharded(mesh_key, shape: Tuple[int, int, int], cfg: EncoderConfig):
    """Compile the sharded encode for (B, H_pad, W_pad) under a mesh."""
    mesh = _MESHES[mesh_key]
    b, h, w = shape
    n_row = mesh.shape[mesh_lib.ROW_AXIS]
    mcu = cfg.mcu_shape[0]
    if h % (n_row * mcu):
        raise ValueError(f"padded H {h} must divide into {n_row} row shards "
                         f"of whole MCU rows")
    h_loc = h // n_row
    my_loc, mx = ops.mcu_grid(h_loc, w, cfg.subsampling)
    restart = cfg.resolve_restart(mx)
    if restart <= 0 or mx % restart:
        raise ValueError(
            "sharded encode requires restart segments that do not cross "
            "row shards (use restart_interval='rows' or a divisor of the "
            "MCUs-per-row count)")
    n_seg_local = my_loc * (mx // restart)

    fn = functools.partial(
        _shard_fn, quality=cfg.quality, subsampling=cfg.subsampling,
        restart=restart, n_seg_local=n_seg_local,
        mcus_per_seg=restart, use_pallas=cfg.use_pallas, mesh=mesh)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS, None, None),
        out_specs=(P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS, None),
                   P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                   P(mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS),
                   P(mesh_lib.DATA_AXIS)),
        check_vma=False)
    return _jit_replicated_out(sharded, mesh), restart


def _put_imgs(imgs: np.ndarray, mesh):
    """Host batch -> device array sharded (data, row) over the mesh.

    Single-process: a plain transfer (jit shards it). Multi-process (DCN
    pods, dist/mesh.py::init_multihost): every process holds the full host
    batch and contributes its addressable shards — the standard
    host-local -> global array bring-up."""
    if jax.process_count() == 1:
        return jnp.asarray(imgs)
    spec = [mesh_lib.DATA_AXIS, mesh_lib.ROW_AXIS] + \
        [None] * (imgs.ndim - 2)
    sharding = NamedSharding(mesh, P(*spec))
    # Every process holds the full batch; the callback hands each device
    # its global slice (unambiguous, unlike *_from_process_local_data
    # which reads its argument as this process's portion only).
    return jax.make_array_from_callback(imgs.shape, sharding,
                                        lambda idx: imgs[idx])


def _jit_replicated_out(fn, mesh):
    """jit wrapper: on multi-process meshes, replicate outputs to every
    host so the (host-side) assembly runs identically on all processes."""
    if jax.process_count() == 1:
        return jax.jit(fn)
    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


_MESHES = {}


def _mesh_key(mesh) -> tuple:
    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat))
    _MESHES[key] = mesh
    return key


def encode_batch_sharded(imgs: np.ndarray, cfg: EncoderConfig, mesh):
    """uint8 [B, H, W, 3] -> list of complete JPEG byte strings.

    B must divide by the 'data' axis size. Images are mirror-padded on host
    to make H divide into whole-MCU row shards.
    """
    b, h, w = imgs.shape[:3]
    n_row = mesh.shape[mesh_lib.ROW_AXIS]
    mh, mw = cfg.mcu_shape
    _, mx = ops.mcu_grid(h, w, cfg.subsampling)
    if cfg.resolve_restart(mx) == 0:
        return _encode_batch_sharded_norestart(imgs, cfg, mesh)
    mult_h, mult_w = n_row * mh, mw
    ph, pw = (-h) % mult_h, (-w) % mult_w
    if ph or pw:
        imgs = np.pad(imgs, [(0, 0), (0, ph), (0, pw), (0, 0)],
                      mode="symmetric")
    hp, wp = h + ph, w + pw

    _, mx_p = ops.mcu_grid(hp, wp, cfg.subsampling)
    restart_p = cfg.resolve_restart(mx_p)
    if _pallas_entropy_ok(cfg, restart_p):
        key = _mesh_key(mesh)
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        b_loc = b // n_data
        from jpegtpu.encoder import _budget_overflow
        if cfg.device_stuff:
            # Device-side stuffing + RST splicing per shard: host assembly
            # is byte concatenation only (see _shard_fn_pallas).
            my_real, mx_real = ops.mcu_grid(h, w, cfg.subsampling)
            n_seg_keep = my_real * (mx_real // cfg.resolve_restart(mx_real))

            def run(budget):
                fn, restart, n_seg_local = _build_sharded_pallas(
                    key, (b, hp, wp), cfg, budget, n_seg_keep)
                outs = fn(_put_imgs(imgs, mesh))
                return (fn, restart, n_seg_local) + outs

            _, restart, n_seg_local, stream, seg_bits, seg_start, totals, \
                max_mcu = run(cfg.first_pass_budget)
            n_seg_shard = b_loc * n_seg_local
            frames = ((stream.shape[1] // n_row // 1024) - 1) \
                // (2 * n_seg_shard)
            cap_bits = (frames - 1) * 1024 * 32
            gm = _sharded_mcu_group(cfg, restart, cfg.first_pass_budget)
            if _budget_overflow(np.asarray(seg_bits),
                                int(np.asarray(max_mcu).max(initial=0)),
                                cap_bits, cfg.blocks_per_mcu * gm,
                                cfg.first_pass_budget):
                _, restart, n_seg_local, stream, seg_bits, seg_start, \
                    totals, max_mcu = run(MAX_BITS_PER_BLOCK)
            return _assemble_sharded_pallas_stuffed(
                stream, seg_start, totals, b, n_data, n_row, h, w, cfg,
                restart, n_seg_local, n_seg_keep)
        fn, restart, n_seg_local = _build_sharded_pallas(
            key, (b, hp, wp), cfg, cfg.first_pass_budget)
        stream, seg_bits, total, max_mcu = fn(_put_imgs(imgs, mesh))
        frames = stream.shape[1] // n_row // (b_loc * n_seg_local) // 1024
        cap_bits = (frames - 1) * 1024 * 32
        gm = _sharded_mcu_group(cfg, restart, cfg.first_pass_budget)
        if _budget_overflow(np.asarray(seg_bits),
                            int(np.asarray(max_mcu).max(initial=0)),
                            cap_bits, cfg.blocks_per_mcu * gm,
                            cfg.first_pass_budget):
            fn, restart, n_seg_local = _build_sharded_pallas(
                key, (b, hp, wp), cfg, MAX_BITS_PER_BLOCK)
            stream, seg_bits, total, max_mcu = fn(_put_imgs(imgs, mesh))
        return _assemble_sharded_pallas(stream, seg_bits, b, n_data, n_row,
                                        h, w, cfg, restart, n_seg_local)

    fn, restart = _build_sharded(_mesh_key(mesh), (b, hp, wp), cfg)
    stuffed, nbytes, offsets, total = fn(_put_imgs(imgs, mesh))
    stuffed = np.asarray(stuffed).reshape(b, -1, stuffed.shape[-1])
    nbytes = np.asarray(nbytes).reshape(b, -1)

    # Shard-alignment padding may add whole MCU rows beyond what a decoder
    # expects from the SOF dimensions; their segments sit at the tail of the
    # segment order (row-major) and are simply dropped.
    my_real, mx = ops.mcu_grid(h, w, cfg.subsampling)
    n_seg_keep = my_real * (mx // restart)

    out = []
    for i in range(b):
        parts = []
        for s in range(n_seg_keep):
            parts.append(stuffed[i, s, :int(nbytes[i, s])].tobytes())
            if s != n_seg_keep - 1:
                parts.append(bytes((0xFF, 0xD0 + (s % 8))))
        out.append(jfif.wrap_jpeg(h, w, cfg.quality, cfg.subsampling,
                                  restart, b"".join(parts)))
    return out


def dryrun(n_devices: int) -> None:
    """Compile + execute sharded encodes on tiny shapes over an n_devices
    mesh and assert BYTE parity with the single-device encoder (driver
    validation hook; runs on virtual CPU devices).

    Covers both restart modes (row segments; restart=0 with the
    DC-predictor exchange + bit-level merge) on the XLA tier, then the
    Pallas kernel tier (interpret mode on CPU, exactly as tests/test_dist
    runs it) with device stuffing on and off — so a regression that
    corrupts scan bodies while preserving markers fails the dryrun."""
    import dataclasses

    from jpegtpu.encoder import Encoder

    devices = jax.devices()[:n_devices]
    n_row = 1
    for cand in (8, 4, 2, 1):
        if n_devices % cand == 0 and cand <= n_devices:
            n_row = cand
            break
    m = mesh_lib.make_mesh(n_devices // n_row, n_row, devices=devices)
    b = m.shape[mesh_lib.DATA_AXIS] * 2
    h, w = 16 * n_row, 32
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)

    for restart in ("rows", 0):
        cfg = EncoderConfig(quality=75, subsampling="420",
                            restart_interval=restart)
        expect = [Encoder(cfg).encode(imgs[i]) for i in range(b)]
        jpegs = encode_batch_sharded(imgs, cfg, m)
        assert len(jpegs) == b
        for i, (got, want) in enumerate(zip(jpegs, expect)):
            assert bytes(got) == want, (
                f"sharded output differs from single-device encoder "
                f"(restart={restart!r}, image {i})")

    # Pallas tier, interpret mode: both device_stuff tiers must reproduce
    # the same bytes. Swap the gate + interpret flags like the test suite
    # does, restoring on exit.
    from jpegtpu.kernels import entropy_pack as epk
    from jpegtpu.kernels import fused_dctq as fdq
    saved = (globals()["_pallas_entropy_ok"], epk._interpret, fdq._interpret)
    cfg = EncoderConfig(quality=75, subsampling="420",
                        restart_interval="rows")
    expect = [Encoder(cfg).encode(imgs[i]) for i in range(b)]
    try:
        globals()["_pallas_entropy_ok"] = lambda cfg_, mps: True
        epk._interpret = lambda: True
        fdq._interpret = lambda: True
        _build_sharded_pallas.cache_clear()
        for device_stuff in (True, False):
            cfg_t = dataclasses.replace(cfg, device_stuff=device_stuff)
            jpegs = encode_batch_sharded(imgs, cfg_t, m)
            for i, (got, want) in enumerate(zip(jpegs, expect)):
                assert bytes(got) == want, (
                    f"Pallas sharded output differs from single-device "
                    f"encoder (device_stuff={device_stuff}, image {i})")
    finally:
        (globals()["_pallas_entropy_ok"], epk._interpret,
         fdq._interpret) = saved
        _build_sharded_pallas.cache_clear()
