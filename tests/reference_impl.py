"""Slow, obviously-correct Python implementations used as test oracles.

These mirror the *semantics* of the reference CPU pipeline (scalar loops,
sequential RLE/Huffman — src/utils.cpp) in straightforward Python, so the
vectorized TPU paths can be checked symbol-for-symbol and bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from jpegtpu.entropy import huffman_tables as ht


def size_category(v: int) -> int:
    s, v = 0, abs(int(v))
    while v:
        s += 1
        v >>= 1
    return s


def magnitude_bits(v: int, s: int) -> str:
    if s == 0:
        return ""
    if v < 0:
        v = v + (1 << s) - 1
    return format(v, f"0{s}b")


def _codes(table: ht.HuffTable):
    return ht.canonical_codes(list(table.bits), list(table.vals))


def encode_block_bits(coeffs, chroma: bool, dc_pred: int) -> str:
    """One zigzag block -> '0'/'1' bit string (sequential JPEG F.1.2)."""
    dc_codes = _codes(ht.dc_table(chroma))
    ac_codes = _codes(ht.ac_table(chroma))
    out = []
    d = int(coeffs[0]) - dc_pred
    s = size_category(d)
    code, ln = dc_codes[s]
    out.append(format(code, f"0{ln}b") + magnitude_bits(d, s))
    k = 1
    while k < 64:
        if all(int(x) == 0 for x in coeffs[k:]):
            code, ln = ac_codes[ht.EOB]
            out.append(format(code, f"0{ln}b"))
            break
        run = 0
        while int(coeffs[k]) == 0:
            run += 1
            k += 1
        while run > 15:
            code, ln = ac_codes[ht.ZRL]
            out.append(format(code, f"0{ln}b"))
            run -= 16
        s = size_category(int(coeffs[k]))
        code, ln = ac_codes[(run << 4) | s]
        out.append(format(code, f"0{ln}b") + magnitude_bits(int(coeffs[k]), s))
        k += 1
    return "".join(out)


def encode_scan_bits(coeffs, n_luma: int, restart: int) -> list[str]:
    """[nM, B, 64] scan-order blocks -> list of per-segment bit strings,
    with DC predictor resets at restart boundaries."""
    n_mcu, b, _ = coeffs.shape
    r = restart if restart > 0 else n_mcu
    segs = []
    for s0 in range(0, n_mcu, r):
        preds = [0, 0, 0]
        bits = []
        for i in range(s0, min(s0 + r, n_mcu)):
            for slot in range(b):
                comp = 0 if slot < n_luma else (1 if slot == n_luma else 2)
                chroma = slot >= n_luma
                bits.append(encode_block_bits(
                    coeffs[i, slot], chroma, preds[comp]))
                preds[comp] = int(coeffs[i, slot, 0])
        segs.append("".join(bits))
    return segs


def pack_and_stuff(bitstr: str) -> bytes:
    """1-pad to a byte boundary, pack MSB-first, stuff 0x00 after 0xFF."""
    bitstr = bitstr + "1" * ((-len(bitstr)) % 8)
    raw = bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))
    out = bytearray()
    for x in raw:
        out.append(x)
        if x == 0xFF:
            out.append(0)
    return bytes(out)
