"""Vectorized RLE + Huffman symbolization (SIMD-shaped entropy front-end).

Replaces the reference's sequential per-coefficient loops — RLEBlockAC
(src/utils.cpp:572-609), getValueCategory/valueToBitString
(src/utils.cpp:623-653) and the symbol-emission half of HuffmanEncoder
(src/utils.cpp:656-698) — with fixed-shape array ops, because a TPU (like the
reference's own GPU, whose rleKernel .cl:198-235 fell back to a sequential
per-MCU scan) has no efficient data-dependent output compaction.

Key idea: every zigzag position is a *symbol slot* of statically known
position; a slot emits 0 bits if nothing is coded there. Per 64-slot block:

    slot 0         -> the DC (size, diff) symbol
    slot k, c!=0   -> AC (runlength%16, size) symbol + magnitude bits
    slot k, c==0   -> ZRL (15,0) iff k precedes a nonzero and the zero-run
                      through k is a multiple of 16
    slot last+1    -> EOB iff the block has trailing zeros

Runs are recovered with one cumulative-max (previous-nonzero index) and one
max (last-nonzero index) — no serial scan, no compaction. The packer
(jpegtpu.entropy.assemble) then turns (lens, bits) into the bitstream with a
prefix sum. Everything here is jit-able and vmap-able.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpegtpu.entropy import huffman_tables as ht


def _size_category(av: jax.Array) -> jax.Array:
    """JPEG size category: bits needed for |v| (0 for v=0), exact integer
    computation (11 vector compares; av < 2^12 always holds for baseline).
    Matches getValueCategory (src/utils.cpp:623-627)."""
    s = jnp.zeros(av.shape, jnp.int32)
    for i in range(12):
        s = s + (av >= (1 << i)).astype(jnp.int32)
    return s


def _magnitude_bits(v: jax.Array, size: jax.Array) -> jax.Array:
    """JPEG magnitude (1's-complement for negatives) in the low `size` bits.
    Matches valueToBitString (src/utils.cpp:630-653)."""
    neg = v + (jnp.left_shift(jnp.int32(1), size) - 1)
    return jnp.where(v < 0, neg, v).astype(jnp.uint32)


def dc_diffs(coeffs: jax.Array, n_luma: int, restart: int,
             init_dc=None) -> jax.Array:
    """DC differentials with restart-interval predictor resets.

    coeffs: [nM, B, 64] scan-order quantized blocks. Returns [nM, B] int32.

    The DC predictor chain (HuffmanEncoder, src/utils.cpp:665-671) is the
    only sequential coupling in the whole codec (SURVEY §2.14). Expressed as
    a shifted subtraction it vectorizes completely; restart boundaries just
    mask the shifted operand to zero. restart=0 means one segment (the
    reference's only mode).

    init_dc: optional [3] (Y, Cb, Cr) predictor values for the very first
    block of each component — used by the no-restart sharded mode, where a
    row shard receives its predecessor's last DC over ICI (ppermute).
    """
    return dc_diffs_from_dc(coeffs[:, :, 0], n_luma, restart, init_dc)


def dc_diffs_from_dc(dc: jax.Array, n_luma: int, restart: int,
                     init_dc=None) -> jax.Array:
    """dc_diffs from the DC slots alone: dc [nM, B] -> [nM, B] int32.
    Used by the pairs-form production path, which slices DC columns
    (every 64th) out of [nM, B*64] instead of carrying [nM, B, 64]."""
    n_mcu, b = dc.shape
    out = []
    for comp, (comp_slots, per) in enumerate(
            (((0, n_luma), n_luma), ((n_luma, n_luma + 1), 1),
             ((n_luma + 1, b), 1))):
        lo, hi = comp_slots
        lo, hi = min(lo, b), min(hi, b)
        if hi <= lo:
            continue
        d = dc[:, lo:hi].reshape(-1)
        mod = (restart if restart > 0 else n_mcu) * per
        idx = jnp.arange(d.shape[0], dtype=jnp.int32)
        init = (jnp.asarray(init_dc)[comp] if init_dc is not None
                else jnp.int32(0))
        reset_val = jnp.where(idx == 0, init, 0)
        prev = jnp.where(idx % mod == 0, reset_val, jnp.roll(d, 1))
        out.append((d - prev).reshape(n_mcu, hi - lo))
    return jnp.concatenate(out, axis=1).astype(jnp.int32)


def block_symbols(coeffs: jax.Array, cls: jax.Array,
                  dcdiff: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symbolize blocks: ([N,64] coeffs, [N] class 0/1, [N] dcdiff) ->
    (lens [N,64] int32, bits [N,64] uint32).

    bits holds code||magnitude right-aligned in the low `lens` bits; a slot
    with lens==0 emits nothing.
    """
    dc_codes, dc_lens, ac_codes, ac_lens = ht.packed_luts()
    dc_codes = jnp.asarray(dc_codes)
    dc_lens = jnp.asarray(dc_lens)
    ac_codes = jnp.asarray(ac_codes.reshape(-1))   # [2*256]
    ac_lens = jnp.asarray(ac_lens.reshape(-1))

    n = coeffs.shape[0]
    k = jnp.arange(64, dtype=jnp.int32)[None, :]          # [1,64]
    c = coeffs.astype(jnp.int32)
    nz = c != 0
    # Sentinel: treat the DC slot as "nonzero" so AC runs start after it.
    m = nz.at[:, 0].set(True)

    # prev[k] = index of last emitted-coefficient position before k.
    masked = jnp.where(m, k, -1)
    cmax = jax.lax.cummax(masked, axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), cmax[:, :-1]], axis=1)
    last_nz = jnp.max(jnp.where(m, k, 0), axis=1, keepdims=True)  # [N,1]

    run = k - prev - 1                                    # zeros before k
    av = jnp.abs(c)
    size = _size_category(av)

    is_ac = k > 0
    emit_nz = is_ac & nz
    emit_zrl = is_ac & ~nz & (k < last_nz) & ((k - prev) % 16 == 0)
    emit_eob = (k == last_nz + 1) & (last_nz < 63)

    rs = jnp.where(emit_nz,
                   jnp.left_shift(run % 16, 4) | size,
                   jnp.where(emit_zrl, ht.ZRL, ht.EOB)).astype(jnp.int32)
    tbl_idx = cls[:, None] * 256 + rs
    a_code = ac_codes[tbl_idx]
    a_len = ac_lens[tbl_idx]

    mag = _magnitude_bits(c, size)
    ac_bits = jnp.left_shift(a_code, size.astype(jnp.uint32)) | \
        jnp.where(emit_nz, mag, 0)
    ac_total = a_len + jnp.where(emit_nz, size, 0)
    emit_any = emit_nz | emit_zrl | emit_eob
    ac_bits = jnp.where(emit_any, ac_bits, 0)
    ac_total = jnp.where(emit_any, ac_total, 0)

    # DC slot.
    d_size = _size_category(jnp.abs(dcdiff))
    d_code = dc_codes[cls, d_size]
    d_len = dc_lens[cls, d_size]
    d_bits = jnp.left_shift(d_code, d_size.astype(jnp.uint32)) | \
        _magnitude_bits(dcdiff, d_size)
    d_total = d_len + d_size

    lens = ac_total.at[:, 0].set(d_total)
    bits = ac_bits.at[:, 0].set(d_bits)
    return lens.astype(jnp.int32), bits.astype(jnp.uint32)


def symbolize_scan(coeffs: jax.Array, n_luma: int, restart: int,
                   init_dc=None) -> Tuple[jax.Array, jax.Array]:
    """[nM, B, 64] scan-order coefficients -> (lens, bits) both [nM, B, 64].

    B = blocks per MCU (3 for 4:4:4 — Y,Cb,Cr; 6 for 4:2:0 — 4Y,Cb,Cr).
    Slots 0..n_luma-1 use the luma tables, the rest chroma, matching the
    reference's component->table mapping (src/utils.cpp:672-693).
    """
    n_mcu, b, _ = coeffs.shape
    cls_pattern = np.array([0] * n_luma + [1] * (b - n_luma), dtype=np.int32)
    cls = jnp.asarray(np.tile(cls_pattern, n_mcu))
    dcd = dc_diffs(coeffs, n_luma, restart, init_dc=init_dc).reshape(-1)
    lens, bits = block_symbols(coeffs.reshape(-1, 64), cls, dcd)
    return lens.reshape(n_mcu, b, 64), bits.reshape(n_mcu, b, 64)
