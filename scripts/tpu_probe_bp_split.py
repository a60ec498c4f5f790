#!/usr/bin/env python
"""Probe: where do block_pack_mcu's 3.2 ms go? Times cut-down kernel
variants: (A) symbolize only (bits+lens, no packing), (B) symbolize +
per-block pack (no MCU merge), (C) the full fused kernel."""

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
    log(f"backend {jax.default_backend()}")

    from jpegtpu.entropy import scan
    from jpegtpu.kernels import entropy_pack as ep
    from jpegtpu.kernels import fused_dctq
    import jpegtpu.entropy.huffman_tables as ht

    h, w = 2160, 3840
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    img = np.clip(base[..., None] + rng.normal(0, 12, (h, w, 3)),
                  0, 255).astype(np.uint8)
    imgd = jax.device_put(jnp.asarray(img))

    quality, subsampling, n_luma, b = 90, "420", 4, 6
    restart = 240

    f_px = jax.jit(lambda x: fused_dctq.encode_blocks(x, quality,
                                                      subsampling))
    coeffs = jax.block_until_ready(f_px(imgd))
    n_mcu = coeffs.shape[0]
    chunks, _ = ep.mcu_capacity(b, 384)
    dcd = np.asarray(scan.dc_diffs(coeffs, n_luma, restart)).reshape(-1)
    cls = (np.arange(n_mcu * b, dtype=np.int32) % b >= n_luma).astype(
        np.int32)
    c_all = jnp.asarray(np.asarray(coeffs).reshape(-1, 64))
    cls_j = jnp.asarray(cls)
    dcd_j = jnp.asarray(dcd)

    # --- variant A: symbolize only (stop before packing) ---
    def _sym_only(c, cls2, dcd2, ac_tbl_ref, dc_tbl_ref):
        """_symbolize_pair clone truncated before csum/place."""
        t = c.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
        k = lane & 63
        half = jnp.right_shift(lane, 6)

        def per_half(a2):
            return jnp.where(half == 0, a2[:, 0:1], a2[:, 1:2])

        clsb = per_half(cls2)
        dcdiff = per_half(dcd2)
        nz = c != 0
        m = nz | (k == 0)
        masked = jnp.where(m, k, -1)
        cmax = ep._cumlog64(masked, jnp.maximum, -1, k)
        prev = pltpu.roll(cmax, 1, axis=1)
        prev = jnp.where(k == 0, 0, prev)
        last_nz = per_half(jnp.concatenate(
            [cmax[:, 63:64], cmax[:, 127:128]], axis=1))
        run = k - prev - 1
        av = jnp.abs(c)
        size = ep._size_category(av)
        is_ac = k > 0
        emit_nz = is_ac & nz
        emit_zrl = is_ac & (~nz) & (k < last_nz) & ((k - prev) % 16 == 0)
        emit_eob = (k == last_nz + 1) & (last_nz < 63)
        emit_any = emit_nz | emit_zrl | emit_eob
        rs = jnp.where(emit_nz, ((run % 16) << 4) | size,
                       jnp.where(emit_zrl, ht.ZRL, ht.EOB))
        d_size2 = ep._size_category(jnp.abs(dcd2))
        idx = clsb * 256 + rs
        low = idx & 127
        chunk = jnp.right_shift(idx, 7)
        packed = jnp.zeros((t, 128), jnp.int32)
        for ci in range(4):
            tbl_c = jnp.broadcast_to(ac_tbl_ref[ci:ci + 1, :], (t, 128))
            g = jnp.take_along_axis(tbl_c, low, axis=1)
            packed = jnp.where(chunk == ci, g, packed)
        a_code = jnp.right_shift(packed, 5)
        a_len = packed & 31
        dc_idx = per_half(cls2 * 16 + d_size2)
        dc_tbl = jnp.broadcast_to(dc_tbl_ref[...], (t, 128))
        d_packed = jnp.take_along_axis(dc_tbl, dc_idx, axis=1)
        d_code = jnp.right_shift(d_packed, 5)
        d_len = d_packed & 31
        d_size = per_half(d_size2)
        mag_sz = jnp.where(emit_nz, size, 0)
        neg = c + (jnp.left_shift(1, mag_sz) - 1)
        mag = jnp.where(c < 0, neg, c).astype(jnp.uint32) & \
            (jnp.left_shift(jnp.uint32(1), mag_sz.astype(jnp.uint32)) - 1)
        bits = (jnp.left_shift(a_code.astype(jnp.uint32),
                               mag_sz.astype(jnp.uint32)) | mag)
        lens = jnp.where(emit_any, a_len + mag_sz, 0)
        bits = jnp.where(emit_any, bits, 0)
        d_mag_neg = dcdiff + (jnp.left_shift(1, d_size) - 1)
        d_mag = jnp.where(dcdiff < 0, d_mag_neg,
                          dcdiff).astype(jnp.uint32) & \
            (jnp.left_shift(jnp.uint32(1), d_size.astype(jnp.uint32)) - 1)
        d_bits = (jnp.left_shift(d_code.astype(jnp.uint32),
                                 d_size.astype(jnp.uint32)) | d_mag)
        d_total = d_len + d_size
        lens = jnp.where(k == 0, d_total, lens)
        bits = jnp.where(k == 0, d_bits, bits)
        return bits, lens

    def kern_a(coeffs_ref, cls_ref, dcd_ref, ac_ref, dc_ref,
               bits_ref, lens_ref, *, g2):
        acc_b = jnp.zeros_like(bits_ref)
        acc_l = jnp.zeros_like(lens_ref)
        cls_a = cls_ref[...].astype(jnp.int32)
        dcd_a = dcd_ref[...].astype(jnp.int32)
        for p in range(g2):
            c = coeffs_ref[:, 128 * p:128 * (p + 1)].astype(jnp.int32)
            bb, ll = _sym_only(c, cls_a[:, 2 * p:2 * p + 2],
                               dcd_a[:, 2 * p:2 * p + 2], ac_ref, dc_ref)
            acc_b = acc_b ^ bb
            acc_l = acc_l + ll
        bits_ref[...] = acc_b
        lens_ref[...] = acc_l

    tile = ep._TILE
    n = c_all.shape[0]
    nm = n // b
    g2 = (b + 1) // 2
    c3 = np.asarray(c_all).reshape(nm, b, 64)
    cls2 = cls.reshape(nm, b)
    dcd2 = dcd.reshape(nm, b)
    if b != 2 * g2:
        c3 = np.concatenate([c3, np.zeros((nm, 1, 64), c3.dtype)], axis=1)
        cls2 = np.concatenate([cls2, np.zeros((nm, 1), np.int32)], axis=1)
        dcd2 = np.concatenate([dcd2, np.zeros((nm, 1), np.int32)], axis=1)
    pad = (-nm) % tile
    if pad:
        c3 = np.concatenate([c3, np.zeros((pad, 2 * g2, 64), c3.dtype)])
        cls2 = np.concatenate([cls2, np.zeros((pad, 2 * g2), np.int32)])
        dcd2 = np.concatenate([dcd2, np.zeros((pad, 2 * g2), np.int32)])
    nmp = c3.shape[0]
    c3j = jnp.asarray(c3.reshape(nmp, 2 * g2 * 64))
    cls2j = jnp.asarray(cls2)
    dcd2j = jnp.asarray(dcd2)
    ac_tbl = jnp.asarray(ep._lut_tables())
    dc_tbl = jnp.asarray(ep._dc_tables())

    fa = jax.jit(lambda c, cl, dd, at, dt: pl.pallas_call(
        functools.partial(kern_a, g2=g2),
        grid=(nmp // tile,),
        in_specs=[
            pl.BlockSpec((tile, g2 * 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2 * g2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2 * g2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nmp, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nmp, 128), jnp.int32),
        ),
    )(c, cl, dd, at, dt))
    t = sync_time(fa, c3j, cls2j, dcd2j, ac_tbl, dc_tbl)
    log(f"A symbolize-only x{g2} pairs: {t * 1e3:.2f} ms")

    # --- variant B: full per-block pack, no merge (block_pack on N) ---
    fb = jax.jit(lambda c, cl, dd: ep.block_pack(c, cl, dd))
    t = sync_time(fb, c_all, cls_j, dcd_j)
    log(f"B block_pack (sym + place, no merge): {t * 1e3:.2f} ms")

    # --- variant C: full fused ---
    fc = jax.jit(lambda c, cl, dd: ep.block_pack_mcu(c, cl, dd, b, chunks))
    t = sync_time(fc, c_all, cls_j, dcd_j)
    log(f"C block_pack_mcu (full): {t * 1e3:.2f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
