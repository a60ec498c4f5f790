"""On-device bitstream packing: symbols -> stuffed JPEG entropy segments.

The reference never packs bits at all — HuffmanEncoder accumulates a
std::string of '0'/'1' chars and stops (src/utils.cpp:656-698; SURVEY §2.11
"Missing JPEG container"). This module supplies the missing capability,
designed for a fixed-shape SIMD machine:

1. Bit offsets: exclusive prefix-sum of per-slot bit lengths within each
   restart segment (restart segments are the parallel unit — each resets the
   DC predictor and is byte-aligned, so segments are fully independent).
2. Word packing: each symbol's bits span at most two 32-bit big-endian words;
   two masked shifts + a scatter-add place them (bit ranges are disjoint, so
   add == or, and colliding *words* accumulate correctly).
3. 1-padding of each segment's final partial byte (ITU-T T.81 F.1.2.3).
4. 0xFF00 byte stuffing via a second prefix-sum (output index = input index +
   #FFs before it) and scatter, with stuffed 0x00s materializing from the
   zero-initialized output.

Everything is jit-able with static shapes; per-segment true byte counts come
back as a small int array and the host (or a gather on the final device) trims
and concatenates with RSTn markers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Conservative static bound on coded bits per 8x8 block: 63 AC symbols of at
# most 16(code)+10(mag) bits plus a DC symbol of at most 11(code)+11(mag).
MAX_BITS_PER_BLOCK = 63 * 26 + 22


def _shl32(x: jax.Array, s: jax.Array) -> jax.Array:
    """uint32 shift-left that yields 0 for s >= 32 (lane-safe)."""
    s = s.astype(jnp.uint32)
    return jnp.where(s >= 32, jnp.uint32(0),
                     jnp.left_shift(x, jnp.minimum(s, jnp.uint32(31))))


def _shr32(x: jax.Array, s: jax.Array) -> jax.Array:
    s = s.astype(jnp.uint32)
    return jnp.where(s >= 32, jnp.uint32(0),
                     jnp.right_shift(x, jnp.minimum(s, jnp.uint32(31))))


def seg_words(blocks_per_seg: int, bits_budget: int = MAX_BITS_PER_BLOCK) -> int:
    """Static 32-bit-word capacity for one restart segment."""
    return -(-blocks_per_seg * bits_budget // 32)


def pack_words(lens: jax.Array, bits: jax.Array, n_seg: int,
               blocks_per_seg: int,
               bits_budget: int = MAX_BITS_PER_BLOCK
               ) -> Tuple[jax.Array, jax.Array]:
    """Pack symbol slots into per-segment big-endian u32 word arrays —
    raw (unpadded, unstuffed) bitstreams.

    Returns (words [n_seg, w_cap] uint32, seg_bits [n_seg] int32). Used
    directly by the no-restart sharded mode (host merges shard streams at
    bit level) and as the first half of pack_segments.
    """
    w_cap = seg_words(blocks_per_seg, bits_budget)
    l = lens.reshape(n_seg, blocks_per_seg * 64)
    v = bits.reshape(n_seg, blocks_per_seg * 64)

    # 1) bit offsets (exclusive prefix sum per segment).
    csum = jnp.cumsum(l, axis=1, dtype=jnp.int32)
    offs = csum - l
    seg_bits = csum[:, -1]

    # 2) pack into big-endian u32 words via scatter-add.
    w_idx = jnp.right_shift(offs, 5)
    b_in_w = (offs & 31).astype(jnp.int32)
    n1 = jnp.minimum(l, 32 - b_in_w)
    rem = l - n1                                     # bits spilling to word+1
    hi = _shl32(_shr32(v, rem), 32 - b_in_w - n1)
    rem_mask = _shl32(jnp.full(v.shape, 1, jnp.uint32), rem) - 1
    lo = _shl32(v & rem_mask, 32 - rem)
    hi = jnp.where(l > 0, hi, 0)
    lo = jnp.where(rem > 0, lo, 0)

    seg_base = (jnp.arange(n_seg, dtype=jnp.int32) * w_cap)[:, None]
    gidx_hi = (seg_base + w_idx).reshape(-1)
    gidx_lo = (seg_base + w_idx + 1).reshape(-1)
    words = jnp.zeros((n_seg * w_cap,), jnp.uint32)
    words = words.at[gidx_hi].add(hi.reshape(-1), mode="drop")
    words = words.at[gidx_lo].add(lo.reshape(-1), mode="drop")
    return words.reshape(n_seg, w_cap), seg_bits


def pack_segments(lens: jax.Array, bits: jax.Array, n_seg: int,
                  blocks_per_seg: int,
                  bits_budget: int = MAX_BITS_PER_BLOCK
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pack symbol slots into per-segment stuffed byte arrays.

    lens/bits: [n_blocks_total, 64] from jpegtpu.entropy.scan, in scan order;
    n_blocks_total is padded up to n_seg*blocks_per_seg by the caller (padding
    blocks must have all-zero lens).

    Returns (stuffed [n_seg, cap_bytes*2] uint8, stuffed_nbytes [n_seg] int32,
    seg_bits [n_seg] int32).
    """
    w_cap = seg_words(blocks_per_seg, bits_budget)
    b_cap = w_cap * 4
    words, seg_bits = pack_words(lens, bits, n_seg, blocks_per_seg,
                                 bits_budget)

    # 3) explode to big-endian bytes and 1-pad the final partial byte.
    by = jnp.stack([(words >> 24) & 0xFF, (words >> 16) & 0xFF,
                    (words >> 8) & 0xFF, words & 0xFF], axis=-1)
    by = by.reshape(n_seg, b_cap).astype(jnp.uint32)
    tail = (seg_bits % 8).astype(jnp.int32)
    pad_mask = jnp.where(tail > 0,
                         jnp.left_shift(1, (8 - tail)) - 1, 0).astype(jnp.uint32)
    last_byte = jnp.where(tail > 0, seg_bits >> 3, 0)
    seg_ids = jnp.arange(n_seg)
    by = by.at[seg_ids, last_byte].add(pad_mask)
    n_bytes = ((seg_bits + 7) >> 3).astype(jnp.int32)

    # 4) 0xFF00 stuffing.
    pos = jnp.arange(b_cap, dtype=jnp.int32)[None, :]
    valid = pos < n_bytes[:, None]
    is_ff = (by == 0xFF) & valid
    shift = jnp.cumsum(is_ff.astype(jnp.int32), axis=1) - is_ff
    out_pos = pos + shift
    out_cap = b_cap * 2
    gidx = jnp.where(valid, seg_ids[:, None] * out_cap + out_pos, -1)
    out = jnp.zeros((n_seg * out_cap,), jnp.uint8)
    out = out.at[gidx.reshape(-1)].set(
        by.astype(jnp.uint8).reshape(-1), mode="drop")
    out = out.reshape(n_seg, out_cap)
    stuffed_nbytes = n_bytes + jnp.sum(is_ff, axis=1, dtype=jnp.int32)
    return out, stuffed_nbytes, seg_bits


def assemble_scan_host(stuffed: np.ndarray, stuffed_nbytes: np.ndarray,
                       restart: int) -> bytes:
    """Concatenate segments with RSTn markers between them (host side).

    RST markers cycle 0xFFD0..0xFFD7 (T.81 §B.2.1.2); no marker after the
    last segment. With restart=0 there is a single segment and no markers.
    """
    parts = []
    n_seg = stuffed.shape[0]
    for s in range(n_seg):
        parts.append(stuffed[s, :int(stuffed_nbytes[s])].tobytes())
        if restart > 0 and s != n_seg - 1:
            parts.append(bytes((0xFF, 0xD0 + (s % 8))))
    return b"".join(parts)
