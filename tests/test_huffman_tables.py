"""Huffman table tests: canonical-code anchors, structural invariants, and
bit-for-bit parity with the reference's string tables (parsed from
/root/reference/src/huffman.hpp at test time — data comparison, not copying)."""

import os
import re

import numpy as np
import pytest

from jpegtpu.entropy import huffman_tables as ht


def test_table_sizes():
    assert sum(ht.DC_LUMA_BITS) == 12
    assert sum(ht.DC_CHROMA_BITS) == 12
    assert sum(ht.AC_LUMA_BITS) == 162 == len(ht.AC_LUMA_VALS)
    assert sum(ht.AC_CHROMA_BITS) == 162 == len(ht.AC_CHROMA_VALS)


def test_wellknown_codes():
    """Classic anchors every JPEG text lists."""
    dc_l = ht.canonical_codes(ht.DC_LUMA_BITS, ht.DC_LUMA_VALS)
    assert dc_l[0] == (0b00, 2)
    assert dc_l[1] == (0b010, 3)
    ac_l = ht.canonical_codes(ht.AC_LUMA_BITS, ht.AC_LUMA_VALS)
    assert ac_l[ht.EOB] == (0b1010, 4)          # EOB = "1010"
    assert ac_l[0x01] == (0b00, 2)              # (0,1) = "00"
    assert ac_l[ht.ZRL] == (0b11111111001, 11)  # ZRL = "11111111001"
    ac_c = ht.canonical_codes(ht.AC_CHROMA_BITS, ht.AC_CHROMA_VALS)
    assert ac_c[ht.EOB] == (0b00, 2)            # chroma EOB = "00"


def test_prefix_free():
    for tbl in [ht.dc_table(False), ht.dc_table(True),
                ht.ac_table(False), ht.ac_table(True)]:
        codes = ht.canonical_codes(list(tbl.bits), list(tbl.vals))
        strs = [format(c, f"0{l}b") for c, l in codes.values()]
        assert len(set(strs)) == len(strs)
        for a in strs:
            for b in strs:
                if a is not b:
                    assert not b.startswith(a) or a == b
        # no code of all ones (would break FF-stuffing guarantees)
        assert all(set(s) != {"1"} for s in strs)


def test_packed_luts_consistent():
    dc_codes, dc_lens, ac_codes, ac_lens = ht.packed_luts()
    assert dc_codes.shape == (2, 16) and ac_codes.shape == (2, 256)
    # valid AC symbols have nonzero length; (15,0)=ZRL and (0,0)=EOB valid
    assert ac_lens[0, ht.ZRL] == 11
    assert ac_lens[0, ht.EOB] == 4
    # gaps: (0,11)..(14,0) style invalid entries are zero-length
    assert ac_lens[0, 0x0B] == 0


_REF = "/root/reference/src/huffman.hpp"


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not mounted")
def test_parity_with_reference_string_tables():
    """Parse the reference's '0'/'1' code strings and compare against our
    canonically generated codes (src/huffman.hpp:9-428)."""
    text = open(_REF).read()

    def parse(name):
        m = re.search(name + r"\s*=\s*\{(.*?)\};", text, re.S)
        assert m, name
        return re.findall(r'"([01]+)"', m.group(1))

    dc_l = parse("DC_LUMA_HUFF_CODES")
    ours = ht.canonical_codes(ht.DC_LUMA_BITS, ht.DC_LUMA_VALS)
    for cat, s in enumerate(dc_l[:12]):
        code, ln = ours[cat]
        assert format(code, f"0{ln}b") == s, f"DC luma cat {cat}"

    dc_c = parse("DC_CHROMA_HUFF_CODES")
    ours = ht.canonical_codes(ht.DC_CHROMA_BITS, ht.DC_CHROMA_VALS)
    for cat, s in enumerate(dc_c[:12]):
        code, ln = ours[cat]
        assert format(code, f"0{ln}b") == s, f"DC chroma cat {cat}"

    # AC tables are [16][11] run x size, with run/size gaps as placeholders;
    # compare every valid (run,size) entry.
    # AC tables are vector<vector<string>>: 16 run rows; rows 0 and 15 carry
    # sizes 0..10 (EOB / ZRL in the size-0 slot), rows 1..14 sizes 1..10.
    for name, bits, vals in [("AC_LUMA_HUFF_CODES", ht.AC_LUMA_BITS,
                              ht.AC_LUMA_VALS),
                             ("AC_CHROMA_HUFF_CODES", ht.AC_CHROMA_BITS,
                              ht.AC_CHROMA_VALS)]:
        m = re.search(name + r"\s*=\s*\{(.*?)\n\};", text, re.S)
        assert m, name
        rows = [re.findall(r'"([01]+)"', row)
                for row in re.findall(r"\{(.*?)\}", m.group(1), re.S)]
        assert len(rows) == 16, name
        ours = ht.canonical_codes(bits, vals)
        checked = 0
        for run, row in enumerate(rows):
            start = 0 if run in (0, 15) else 1
            for j, s in enumerate(row):
                sym = (run << 4) | (start + j)
                assert sym in ours, f"{name} run={run} size={start + j}"
                code, ln = ours[sym]
                o = format(code, f"0{ln}b")
                if name == "AC_LUMA_HUFF_CODES" and run == 3 and start + j >= 4:
                    # Known reference bug: huffman.hpp's AC luma run-3 rows
                    # for sizes 4..10 carry a typo'd extra leading '1',
                    # making them 17-bit codes — illegal in JPEG (T.81
                    # B.2.4.2 caps code length at 16). Ours are the Annex-K
                    # values; assert the reference is exactly ours + the
                    # spurious bit so any other drift still fails loudly.
                    assert len(s) == 17 and s == "1" + o, \
                        f"{name} run={run} size={start + j}"
                else:
                    assert o == s, f"{name} run={run} size={start + j}"
                checked += 1
        assert checked == 162, name


def test_dht_payload_shape():
    t = ht.ac_table(False)
    assert len(t.dht_payload) == 16 + 162
    t = ht.dc_table(True)
    assert len(t.dht_payload) == 16 + 12
