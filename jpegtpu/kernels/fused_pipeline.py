"""Mega-fused device front-end: pixels -> merged MCU bitstreams in ONE
Pallas kernel.

Fuses the natural-layout pixel kernel (fused_dctq._pixel_kernel_nat: row
slabs in, in-kernel MCU-tiling transpose, one MXU matmul) with the
symbolize + per-block pack + MCU merge stage (entropy_pack.
_block_pack_mcu_kernel), so the [nMCU, g*64] coefficient tensor never
exists in HBM. On a 4K 4:2:0 frame that removes a ~50 MB write + ~50 MB
read between the two kernels plus the XLA glue that derived DC diffs and
classes from the coefficient tensor (a strided [::64] gather over the
full 50 MB — see docs/PERF.md "dc-diff / offsets / misc XLA glue").

The DC-difference chain (the one cross-MCU dependency JPEG has — the
reference computes it serially in HuffmanEncoder, src/utils.cpp:665-671)
is computed in-kernel: each grid step processes whole image MCU rows,
one MCU per sublane row, so the previous MCU's DC is a sublane roll; the
chain tail carries across rows / grid steps in a VMEM scratch (grid
steps execute serially), and restart resets come from the global MCU
index. Semantics identical to entropy.scan.dc_diffs_from_dc (init_dc
unsupported — the sharded no-restart path keeps the split kernels).

Output is bit-identical to the split pipeline by construction (the same
_symbolize_pair / _merge_pairs code runs on the same int32 coefficients)
and asserted by tests + the hardware A/B (scripts/tpu_ab_fused_bp.py).

Twin-rounding hazard (the one qualification to the bit-identical-oracle
invariant): the Pallas pixel kernels (nat and this fused front-end) and
the XLA twin (fused_dctq.encode_blocks / encode_blocks_pairs) compute
the SAME f32 affine operator, but XLA may fuse the +0.5-and-floor
rounding differently from Mosaic, so a coefficient whose pre-rounding
value lands within one ulp of x.5 can round to a different integer —
producing a different (still valid) JPEG. This has never been observed
on real content at 4K, but tests that compare the fused and split
PALLAS pipelines pin both sides to the same pixel kernel rather than
mixing Pallas vs XLA pixel paths (tests/test_kernels.py
test_fused_pipeline_matches_split). Encoder-level Pallas-vs-oracle
byte-parity tests still pass on all tested content; hardware validation
always goes through full-program byte comparison (scripts/tpu_bisect.py)
which would surface a knife-edge divergence as a mismatch to triage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpegtpu.kernels import entropy_pack, fused_dctq
from jpegtpu.kernels.entropy_pack import (_dc_tables, _lut_tables,
                                          _merge_pairs, _symbolize_pair)


def _fused_px_bp_kernel(x_ref, m_ref, b_ref, ac_tbl_ref, dc_tbl_ref,
                        mwords_ref, mlens_ref, scr, cc_scr, carry,
                        *, r_blk: int, nrx: int, mh: int, row_bytes: int,
                        grp: int, g: int, chunks: int, n_luma: int,
                        reset_every: int):
    """One grid step: r_blk image MCU rows -> r_blk*nrx merged MCU
    streams. The pixel matmuls run per image row; the coefficients stage
    through VMEM scratch so symbolize/pack/merge run ONCE over all
    tn = r_blk*nrx MCU rows (larger tiles amortize the gather passes,
    cf. the _TILE=512-vs-256 sweep). reset_every: DC-predictor reset
    period in MCUs (restart interval); 0 = reset at MCU 0 only
    (restartless); == nrx resolves to static per-row resets (the
    production rows-restart case)."""
    i = pl.program_id(0)
    ng = nrx // grp                                  # grp-MCU lane groups
    gb = grp * row_bytes                             # 128-aligned
    g2 = (g + 1) // 2
    tn = r_blk * nrx
    su = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0)

    for b in range(r_blk):
        # --- pixel stage (== fused_dctq._pixel_kernel_nat) ---
        v = pltpu.bitcast(x_ref[b * mh:(b + 1) * mh, :], jnp.int8) ^ \
            jnp.int8(-128)
        z = v.astype(jnp.float32) + 128.0            # exact u8 restore
        r2 = jnp.swapaxes(z.reshape(mh, ng, gb), 0,
                          1).reshape(ng, mh * gb)
        cols = []
        for ii in range(grp):
            sl = [r2[:, y * gb + ii * row_bytes:
                     y * gb + (ii + 1) * row_bytes]
                  for y in range(mh)]
            cols.append(jnp.concatenate(sl, axis=1))
        scr[...] = jnp.stack(cols, axis=1).reshape(nrx, mh * row_bytes)
        acc = jnp.dot(scr[...], m_ref[...],
                      preferred_element_type=jnp.float32) + b_ref[...]
        cc_scr[b * nrx:(b + 1) * nrx, :] = \
            (jnp.sign(acc) * jnp.floor(jnp.abs(acc) + 0.5)
             ).astype(jnp.int32)

    cc = cc_scr[...]                                 # [tn, g*64]

    # --- DC diffs (scan.dc_diffs_from_dc semantics, in registers) ---
    dcs = [cc[:, 64 * j:64 * j + 1] for j in range(g)]
    row0 = su == 0                                   # needs the carry
    if reset_every == nrx:
        reset = jnp.full_like(row0, False)           # static row starts
        for b in range(r_blk):
            reset = reset | (su == b * nrx)
    elif reset_every == 0:
        reset = (i == 0) & row0
    else:
        m_idx = i * tn + su
        reset = (m_idx % reset_every) == 0

    def prev_of(col, ci):
        """Previous MCU's chain-tail DC for channel ci, from the rolled
        column / the cross-step carry scratch, zeroed at restart
        resets."""
        p = pltpu.roll(col, 1, axis=0)
        p = jnp.where(row0, carry[0:1, ci:ci + 1], p)
        return jnp.where(reset, 0, p)

    dcds = []
    for j in range(g):
        if j == 0:
            prev = prev_of(dcs[n_luma - 1], 0)
        elif j < n_luma:
            prev = dcs[j - 1]                        # intra-MCU, no reset
        else:                                        # Cb / Cr own chains
            prev = prev_of(dcs[j], 1 + (j - n_luma))
        dcds.append(dcs[j] - prev)
    # carry the chain tails into the next grid step
    carry[0:1, 0:1] = dcs[n_luma - 1][tn - 1:tn, :]
    for ch in range(min(2, g - n_luma)):
        carry[0:1, 1 + ch:2 + ch] = dcs[n_luma + ch][tn - 1:tn, :]

    # --- symbolize + pack + merge (== _block_pack_mcu_kernel) ---
    pair_words, pair_tot = [], []
    for p in range(g2):
        if 128 * (p + 1) <= g * 64:
            c = cc[:, 128 * p:128 * (p + 1)]
        else:                                        # odd g: dummy block
            c = jnp.concatenate(
                [cc[:, 128 * p:], jnp.zeros((tn, 64), jnp.int32)],
                axis=1)
        ca = int(min(2 * p, g - 1) >= n_luma)
        cb = int(min(2 * p + 1, g - 1) >= n_luma)
        cls2 = jnp.concatenate(
            [jnp.full((tn, 1), ca, jnp.int32),
             jnp.full((tn, 1), cb, jnp.int32)], axis=1)
        dcd2 = jnp.concatenate(
            [dcds[2 * p],
             dcds[2 * p + 1] if 2 * p + 1 < g else
             jnp.zeros((tn, 1), jnp.int32)], axis=1)
        w_p, tot_p = _symbolize_pair(
            c, cls2, dcd2, ac_tbl_ref, dc_tbl_ref,
            static_cls=ca if ca == cb else None)
        pair_words.append(w_p)
        pair_tot.append(tot_p)
    merged, off = _merge_pairs(pair_words, pair_tot, g, chunks)
    mwords_ref[...] = merged
    mlens_ref[...] = off


def fused_pixel_block_pack_pairs(img: jax.Array, quality: int,
                                 subsampling: str, restart_mcus: int,
                                 chunks: int, n_luma: int):
    """uint8 RGB [..., H, W, 3] -> (mwords [nM, chunks*128] u32 merged
    MCU streams, mlens [nM] i32) — bit-identical to
    block_pack_mcu_pairs(encode_blocks_pairs(img, ...), ...) with
    dc_diffs_from_dc(restart=restart_mcus), computed without the
    coefficient tensor ever reaching HBM. Returns None for geometries
    the natural-layout pixel kernel does not cover (caller falls back
    to the split pipeline)."""
    if subsampling not in ("420", "422", "444"):
        return None
    (padded, b, m, bias, mh, row_bytes, in_dim, out_dim, n_mcu, nrx,
     rows, r_blk, pad_rows) = fused_dctq._pixel_geometry(
        img, quality, subsampling)
    grp = 128 // np.gcd(128, row_bytes)
    if nrx % grp:
        return None
    g = out_dim // 64
    assert n_luma == {"420": 4, "422": 2}.get(subsampling, 1)
    x = padded.reshape(rows * mh, nrx * row_bytes)   # free row-major view
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_rows * mh, nrx * row_bytes), jnp.uint8)])
    grid_rows = rows + pad_rows
    tn = r_blk * nrx
    kernel = functools.partial(
        _fused_px_bp_kernel, r_blk=r_blk, nrx=nrx, mh=mh,
        row_bytes=row_bytes, grp=grp, g=g, chunks=chunks, n_luma=n_luma,
        reset_every=restart_mcus)
    mw, ml = pl.pallas_call(
        kernel,
        grid=(grid_rows // r_blk,),
        in_specs=[
            pl.BlockSpec((r_blk * mh, nrx * row_bytes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, chunks * 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid_rows * nrx, chunks * 128),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((grid_rows * nrx, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nrx, in_dim), jnp.float32),
            pltpu.VMEM((tn, out_dim), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        interpret=entropy_pack._interpret(),
    )(x, jnp.asarray(m), jnp.asarray(bias.reshape(1, out_dim)),
      jnp.asarray(_lut_tables()), jnp.asarray(_dc_tables()))
    nm = rows * nrx
    return mw[:nm], ml[:nm].reshape(nm)
