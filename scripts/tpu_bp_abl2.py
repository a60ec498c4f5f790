#!/usr/bin/env python
"""block_pack upstream ablations (timing only): which pre-placement
section carries the 2.5 ms? Sections: run-structure scans (cummax),
Huffman table gathers, magnitude/bit assembly, lens prefix matmul,
per_half broadcasts."""

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

    import jpegtpu.kernels.entropy_pack as ep
    import jpegtpu.entropy.huffman_tables as ht

    n = 194560
    rng = np.random.default_rng(0)
    coeffs_np = np.zeros((n, 64), np.int32)
    nzm = rng.random((n, 64)) < 0.2
    coeffs_np[nzm] = rng.integers(-255, 256, nzm.sum())
    cls_np = (rng.random(n) < 1 / 3).astype(np.int32)
    dcd_np = rng.integers(-200, 200, n).astype(np.int32)
    coeffs = jax.device_put(jnp.asarray(coeffs_np))
    cls_a = jax.device_put(jnp.asarray(cls_np))
    dcd = jax.device_put(jnp.asarray(dcd_np))

    def kernel(coeffs_ref, cls_ref, dcdiff_ref, ac_tbl_ref, dc_tbl_ref,
               words_ref, lens_ref, *, skip):
        c = coeffs_ref[...].astype(jnp.int32)
        cls2 = cls_ref[...].astype(jnp.int32)
        dcd2 = dcdiff_ref[...].astype(jnp.int32)
        t = c.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
        k = lane & 63
        half = jnp.right_shift(lane, 6)

        def per_half(a2):
            return jnp.where(half == 0, a2[:, 0:1], a2[:, 1:2])

        cls = per_half(cls2)
        dcdiff = per_half(dcd2)

        nz = c != 0
        if "scan" in skip:
            prev = k - 1
            last_nz = jnp.full((t, 128), 40, jnp.int32)
        else:
            m = nz | (k == 0)
            masked = jnp.where(m, k, -1)
            cmax = ep._cumlog64(masked, jnp.maximum, -1, k)
            prev = pltpu.roll(cmax, 1, axis=1)
            prev = jnp.where(k == 0, 0, prev)
            mk = jnp.where(m, k, 0)
            lmax0 = jnp.max(jnp.where(half == 0, mk, 0), axis=1,
                            keepdims=True)
            lmax1 = jnp.max(jnp.where(half == 1, mk, 0), axis=1,
                            keepdims=True)
            last_nz = jnp.where(half == 0, lmax0, lmax1)

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

        if "huff" in skip:
            a_code = rs.astype(jnp.uint32)
            a_len = (rs & 15) + 2
            d_code = per_half(d_size2).astype(jnp.uint32)
            d_len = per_half(d_size2) + 3
            d_size = per_half(d_size2)
        else:
            idx = cls * 256 + rs
            low = idx & 127
            chunk = jnp.right_shift(idx, 7)
            packed = jnp.zeros((t, 128), jnp.int32)
            for ci in range(4):
                tbl_c = jnp.broadcast_to(ac_tbl_ref[ci:ci + 1, :],
                                         (t, 128))
                g = jnp.take_along_axis(tbl_c, low, axis=1)
                packed = jnp.where(chunk == ci, g, packed)
            a_code = jnp.right_shift(packed, 5).astype(jnp.uint32)
            a_len = packed & 31
            dc_idx = per_half(cls2 * 16 + d_size2)
            dc_tbl = jnp.broadcast_to(dc_tbl_ref[...], (t, 128))
            d_packed = jnp.take_along_axis(dc_tbl, dc_idx, axis=1)
            d_code = jnp.right_shift(d_packed, 5).astype(jnp.uint32)
            d_len = d_packed & 31
            d_size = per_half(d_size2)

        if "bits" in skip:
            bits = a_code
            lens = jnp.where(emit_any, a_len + size, 0)
            d_bits = d_code
            d_total = d_len + d_size
        else:
            mag_sz = jnp.where(emit_nz, size, 0)
            neg = c + (jnp.left_shift(1, mag_sz) - 1)
            mag = jnp.where(c < 0, neg, c).astype(jnp.uint32) & \
                (jnp.left_shift(jnp.uint32(1),
                                mag_sz.astype(jnp.uint32)) - 1)
            bits = (jnp.left_shift(a_code, mag_sz.astype(jnp.uint32)) |
                    mag)
            lens = jnp.where(emit_any, a_len + mag_sz, 0)
            bits = jnp.where(emit_any, bits, 0)
            d_mag_neg = dcdiff + (jnp.left_shift(1, d_size) - 1)
            d_mag = jnp.where(dcdiff < 0, d_mag_neg,
                              dcdiff).astype(jnp.uint32) & \
                (jnp.left_shift(jnp.uint32(1),
                                d_size.astype(jnp.uint32)) - 1)
            d_bits = (jnp.left_shift(d_code,
                                     d_size.astype(jnp.uint32)) | d_mag)
            d_total = d_len + d_size

        lens = jnp.where(k == 0, d_total, lens)
        bits = jnp.where(k == 0, d_bits, bits)

        if "mm" in skip:
            csum = k * 8
            offs = csum - 8
            total = jnp.concatenate([c[:, 0:1], c[:, 1:2]], axis=1)
        else:
            csum = ep._prefix64_mm(lens.astype(jnp.float32),
                                   ep._halfprefix_tril()).astype(jnp.int32)
            offs = csum - lens
            total = jnp.concatenate([csum[:, 63:64], csum[:, 127:128]],
                                    axis=1)

        w_idx = jnp.right_shift(offs, 5)
        b_in_w = offs & 31
        n1 = jnp.minimum(lens, 32 - b_in_w)
        rem = lens - n1
        rem_u = rem.astype(jnp.uint32)
        hi = jnp.left_shift(jnp.right_shift(bits, rem_u),
                            (32 - b_in_w - n1).astype(jnp.uint32) & 31)
        rem_mask = jnp.left_shift(jnp.uint32(1), rem_u) - 1
        lo = jnp.left_shift(bits & rem_mask,
                            (32 - rem).astype(jnp.uint32) & 31)

        if "place" in skip:
            words = hi | lo | w_idx.astype(jnp.uint32)
        else:
            words = ep._place_pair(hi, lo, w_idx, k, half)

        words_ref[...] = words
        lens_ref[...] = total

    ac_tbl = jnp.asarray(ep._lut_tables())
    dc_tbl = jnp.asarray(ep._dc_tables())

    def run(skip):
        kern = functools.partial(kernel, skip=skip)
        n2 = n // 2
        tile = ep._TILE

        def f(c, kk, d):
            return pl.pallas_call(
                kern,
                grid=(n2 // tile,),
                in_specs=[
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((n2, 128), jnp.uint32),
                    jax.ShapeDtypeStruct((n2, 2), jnp.int32),
                ),
            )(c.reshape(n2, 128), kk.reshape(n2, 2), d.reshape(n2, 2),
              ac_tbl, dc_tbl)
        return jax.jit(f)

    for skip, name in ((frozenset(), "inline copy, nothing skipped"),
                       (frozenset({"scan"}), "skip run scans"),
                       (frozenset({"huff"}), "skip huffman gathers"),
                       (frozenset({"bits"}), "skip bit assembly"),
                       (frozenset({"mm"}), "skip lens prefix matmul"),
                       (frozenset({"scan", "huff", "bits", "mm",
                                   "place"}), "skip everything")):
        f = run(skip)
        t = sync_time(f, coeffs, cls_a, dcd)
        log(f"{name}: {t * 1e3:.2f} ms")

    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
