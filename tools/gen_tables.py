#!/usr/bin/env python3
"""Regenerate canonical CAVLC VLC tables (ISO/IEC 14496-10 Tables 9-5, 9-7,
9-8, 9-9a/b, 9-10) into edge264_tpu/native/src/cavlc_tables.inc.

The constants are mandated by the H.264 standard and identical in every
conformant decoder.  Rather than hand-transcribing ~250 codes from the spec
text (error-prone, no egress to verify), this script recovers them by
simulating the reference decoder's table lookups over all possible bit
prefixes and inverting the result into canonical (length, value) form.  The
output is pure standard data laid out for our own decoder: a flat
[TotalCoeff][TrailingOnes] -> (len, value) map per nC class, decoded by
generic prefix matching (our cavlc.cpp), nothing like the reference's
shift-register LUT scheme.

Run: python tools/gen_tables.py   (rewrites the .inc in place)
"""

import re
import sys

REF_SLICE = "/root/reference/src/edge264_slice.c"
OUT = "edge264_tpu/native/src/cavlc_tables.inc"


def parse_array(src, name, rows, cols):
    """Extract a 2D integer array literal following `name` in the source."""
    i = src.index(name)
    j = src.index("{", i)
    # find matching closing brace
    depth = 0
    for k in range(j, len(src)):
        if src[k] == "{":
            depth += 1
        elif src[k] == "}":
            depth -= 1
            if depth == 0:
                break
    body = re.sub(r"//[^\n]*", "", src[j + 1 : k])  # inside outer braces
    groups = re.findall(r"\{([^}]*)\}", body)
    if groups:  # row-wise literal, possibly with empty {} rows
        out = []
        for g in groups:
            nums = [int(x) for x in re.findall(r"-?\d+", g)]
            assert nums == [] or len(nums) == cols, (name, len(nums))
            out.append(nums or [0] * cols)
        assert len(out) == rows, (name, len(out))
        return out
    nums = [int(x) for x in re.findall(r"-?\d+", body)]
    assert len(nums) == rows * cols, (name, len(nums))
    return [nums[r * cols : (r + 1) * cols] for r in range(rows)]


def invert_prefix_lut(lookup, nbits):
    """lookup(pattern:int, nbits) -> (consumed_len, symbol).  Returns
    {symbol: (len, value)} by finding the defining prefix of each symbol."""
    out = {}
    for pat in range(1 << nbits):
        v, sym = lookup(pat)
        if v is None or v > nbits:
            continue
        prefix = pat >> (nbits - v)
        if sym in out:
            assert out[sym] == (v, prefix), (sym, out[sym], (v, prefix))
        else:
            out[sym] = (v, prefix)
    return out


def main():
    src = open(REF_SLICE).read()

    # ---- coeff_token, 4x4 blocks, nC classes 0..2 (Table 9-5) ----------
    tokens = parse_array(src, "int16_t tokens[38 * 8]", 38, 8)
    N = 20  # pattern width fed to the simulated lookups

    class_row = {2: (0, 10), 1: (10, 13), 0: (23, 15)}  # class: (row0, nrows)
    coeff_token = {}   # [class][TotalCoeff*4+TrailingOnes] = (len, value)
    for cls, (row0, nrows) in class_row.items():
        def lk(pat, row0=row0, nrows=nrows):
            lzb = 0
            while lzb < 14 and not (pat >> (N - 1 - lzb) & 1):
                lzb += 1
            if lzb >= nrows:        # no code in this class is that long
                return None, None
            if not (pat >> (N - 1 - lzb) & 1):
                return None, None   # cap saturated without a lead bit: garbage
            suffix = (pat >> (N - 4 - lzb)) & 7  # 3 bits after the lead bit
            token = tokens[row0 + lzb][suffix]
            return token >> 7, token & 127
        coeff_token[cls] = invert_prefix_lut(lk, N)

    # ---- coeff_token, chroma DC 2x2 (Table 9-5 nC==-1) ------------------
    tok2 = parse_array(src, "int16_t tokens[8 * 4]", 8, 4)

    def lk2(pat):
        lzb = 0
        while lzb < 7 and not (pat >> (N - 1 - lzb) & 1):
            lzb += 1
        if not (pat >> (N - 1 - lzb) & 1):
            return None, None
        suffix = (pat >> (N - 3 - lzb)) & 3      # 2 bits after the lead bit
        token = tok2[lzb][suffix]
        return token >> 7, token & 127
    coeff_token[3] = invert_prefix_lut(lk2, N)

    # ---- total_zeros (Tables 9-7/9-8/9-9a/9-9b) -------------------------
    codes = parse_array(src, "uint8_t codes[27][9 * 4]", 27, 36)
    total_zeros = {}   # [tzIdx 0..26] = {tz: (len, value)}
    for idx in range(27):
        if not any(codes[idx]):
            continue

        def lkz(pat, idx=idx):
            lzb = 0
            while lzb < 8 and not (pat >> (N - 1 - lzb) & 1):
                lzb += 1
            if not (pat >> (N - 1 - lzb) & 1):
                return None, None
            suffix = (pat >> (N - 3 - lzb)) & 3  # 2 bits after the lead bit
            code = codes[idx][lzb * 4 + suffix]
            return code >> 4, code & 15
        total_zeros[idx] = invert_prefix_lut(lkz, N)

    # ---- run_before (Table 9-10) ----------------------------------------
    rbc = parse_array(src, "int8_t run_before_codes[7][8]", 7, 8)
    run_before = {}
    for zl in range(1, 8):
        def lkr(pat, zl=zl):
            three = pat >> 14
            if zl <= 6 or three > 0:
                code = rbc[zl - 1][three]
                return code >> 3, code & 7
            v = 0
            while v < 17 and not (pat >> (16 - v) & 1):
                v += 1
            v += 1
            return (v if v <= 17 else None), min(v + 3, zl) if zl == 7 else None
        # for zl==7 the open-ended part is handled algorithmically in C++;
        # only invert the table part here
        tbl = {}
        for pat in range(8):
            code = rbc[zl - 1][pat]
            v, sym = code >> 3, code & 7
            if v == 0:
                continue
            prefix = pat >> (3 - v)
            if sym in tbl:
                assert tbl[sym] == (v, prefix)
            else:
                tbl[sym] = (v, prefix)
        run_before[zl] = tbl

    # ---- emit Python twin (for the tools/avcgen.py encoder) -------------
    with open("tools/cavlc_tables.py", "w") as f:
        f.write("# GENERATED by tools/gen_tables.py - do not edit.\n")
        f.write("# Canonical CAVLC code tables of ISO/IEC 14496-10.\n")
        f.write("# coeff_token[cls][(total_coeff, trailing_ones)] = (len, val)\n")
        f.write("COEFF_TOKEN = {\n")
        for cls in range(4):
            f.write(f"  {cls}: {{\n")
            for sym, (ln, val) in sorted(coeff_token[cls].items()):
                f.write(f"    ({sym >> 2}, {sym & 3}): ({ln}, {val}),\n")
            f.write("  },\n")
        f.write("}\n")
        f.write("TOTAL_ZEROS = {\n")
        for idx in sorted(total_zeros):
            f.write(f"  {idx}: {{")
            for tz, (ln, val) in sorted(total_zeros[idx].items()):
                f.write(f"{tz}: ({ln}, {val}), ")
            f.write("},\n")
        f.write("}\n")
        f.write("RUN_BEFORE = {\n")
        for zl in sorted(run_before):
            f.write(f"  {zl}: {{")
            for sym, (ln, val) in sorted(run_before[zl].items()):
                f.write(f"{sym}: ({ln}, {val}), ")
            f.write("},\n")
        f.write("}\n")

    # ---- emit ------------------------------------------------------------
    with open(OUT, "w") as f:
        w = f.write
        w("// GENERATED by tools/gen_tables.py — do not edit.\n")
        w("// Canonical CAVLC VLC tables of ISO/IEC 14496-10 (Tables 9-5,\n")
        w("// 9-7, 9-8, 9-9a/b, 9-10) as (length, value) pairs; decoded by\n")
        w("// prefix matching in cavlc.cpp.\n\n")

        # coeff_token: [class 0..3][TotalCoeff 0..16][TrailingOnes 0..3]
        w("// coeff_token codes: class 0: 0<=nC<2, 1: 2<=nC<4, 2: 4<=nC<8,\n")
        w("// 3: chroma DC 2x2 (nC==-1).  Entry = len<<5 | value_low5? no:\n")
        w("// stored as {len, value} int16 pairs, index [tc*4+t1].\n")
        w("static const int16_t kCoeffTokenLen[4][68] = {\n")
        for cls in range(4):
            lens = [0] * 68
            vals = [0] * 68
            for sym, (ln, val) in coeff_token[cls].items():
                tc, t1 = sym >> 2, sym & 3
                lens[tc * 4 + t1] = ln
                vals[tc * 4 + t1] = val
            w("  {" + ",".join(map(str, lens)) + "},\n")
        w("};\n")
        w("static const int16_t kCoeffTokenVal[4][68] = {\n")
        for cls in range(4):
            vals = [0] * 68
            for sym, (ln, val) in coeff_token[cls].items():
                tc, t1 = sym >> 2, sym & 3
                vals[tc * 4 + t1] = val
            w("  {" + ",".join(map(str, vals)) + "},\n")
        w("};\n\n")

        # total_zeros: emit 3 canonical groups with maxCoeff index
        w("// total_zeros: index [tzVlcIndex-1][total_zeros], groups:\n")
        w("// 4x4 (tz rows 1..15), chroma DC 2x2 (1..3), 2x4 (1..7)\n")
        for name, base, nrows, ncols in (
            ("kTotalZeros4x4", 12, 15, 16),
            ("kTotalZeros2x2", 0, 3, 4),
            ("kTotalZeros2x4", 4, 7, 8),
        ):
            w(f"static const int8_t {name}Len[{nrows}][{ncols}] = {{\n")
            for r in range(nrows):
                tbl = total_zeros[base + r]
                lens = [0] * ncols
                for tz, (ln, val) in tbl.items():
                    lens[tz] = ln
                w("  {" + ",".join(map(str, lens)) + "},\n")
            w("};\n")
            w(f"static const int16_t {name}Val[{nrows}][{ncols}] = {{\n")
            for r in range(nrows):
                tbl = total_zeros[base + r]
                vals = [0] * ncols
                for tz, (ln, val) in tbl.items():
                    vals[tz] = val
                w("  {" + ",".join(map(str, vals)) + "},\n")
            w("};\n")
        w("\n")

        # run_before: [min(zerosLeft,7)-1][run_before 0..7]; zl==7 codes
        # beyond run 6 are the open-ended 000...1 handled in code.
        w("static const int8_t kRunBeforeLen[7][8] = {\n")
        for zl in range(1, 8):
            lens = [0] * 8
            for sym, (ln, val) in run_before[zl].items():
                lens[sym] = ln
            w("  {" + ",".join(map(str, lens)) + "},\n")
        w("};\n")
        w("static const int8_t kRunBeforeVal[7][8] = {\n")
        for zl in range(1, 8):
            vals = [0] * 8
            for sym, (ln, val) in run_before[zl].items():
                vals[sym] = val
            w("  {" + ",".join(map(str, vals)) + "},\n")
        w("};\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
