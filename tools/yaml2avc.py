"""YAML trace -> Annex-B bitstream compiler: the inverse of the decoder's
log format, mirroring the reference's gen_avc.py (tests/gen_avc.py:142-509)
where the SAME YAML schema doubles as log output and test-vector input.

Scope (the reference generator's residual support is likewise CAVLC):
SPS / PPS / I slices (IDR and non-IDR) with CAVLC entropy, Intra_4x4,
Intra_16x16 and I_PCM macroblocks with full coefficient/sample
round-trip.

    python -m tools.yaml2avc trace.yaml out.264

Round-trip contract (tests/test_yaml_roundtrip.py): decoding the emitted
stream reproduces the input trace line-for-line and the same pixels.
"""

from __future__ import annotations

import sys

import yaml

from tools.avcgen import MbSpec, make_idr_slice, make_pps, make_sps


def _blocks(mb):
    """Iterator over the mb's logged residual blocks; each yields the
    scan-order level list (zeros when total_coeff was 0)."""
    for b in mb.get("coeffLevels") or []:
        yield b.get("c")


def _take(it, n, *, dc_skip=False):
    """Next block as an n-length scan-order list; dc_skip prepends the
    implicit 0 of AC blocks (parsed with zigzag+1, 15 levels)."""
    c = next(it)
    if c is None:
        return [0] * n
    return ([0] + list(c)) if dc_skip else list(c)


def _mb_spec(mb):
    t = mb["mb_type"]
    if t == 25:
        s = mb["pcm_samples"]
        return MbSpec("pcm", samples_y=list(s["Y"]),
                      samples_cb=list(s["Cb"]), samples_cr=list(s["Cr"]))
    blocks = _blocks(mb)
    qp_delta = mb.get("mb_qp_delta", 0)
    chroma_mode = mb.get("intra_chroma_pred_mode", 0)
    if t == 0:          # Intra_4x4
        cbp = mb["coded_block_pattern"]
        luma = []
        for i8 in range(4):
            if cbp >> i8 & 1:
                luma += [_take(blocks, 16) for _ in range(4)]
            else:
                luma += [[0] * 16 for _ in range(4)]
        spec = MbSpec("i4", modes=list(mb["Intra4x4PredModes"]),
                      cbp=cbp, chroma_mode=chroma_mode, qp_delta=qp_delta,
                      luma_coeffs=luma,
                      chroma_dc=_chroma_dc(blocks, cbp),
                      chroma_ac=_chroma_ac(blocks, cbp))
        return spec
    # Intra_16x16: mb_type 1..24 packs pred/cbp (§7.4.5 Table 7-11)
    m1 = t - 1
    pred = m1 % 4
    cbp_chroma = (m1 // 4) % 3
    cbp_luma = 15 if m1 >= 12 else 0
    cbp = cbp_luma | cbp_chroma << 4
    dc = _take(blocks, 16)
    if cbp_luma:
        luma = [_take(blocks, 16, dc_skip=True) for _ in range(16)]
    else:
        luma = [[0] * 16 for _ in range(16)]
    return MbSpec("i16", pred_mode=pred, cbp=cbp, chroma_mode=chroma_mode,
                  qp_delta=qp_delta, dc_coeffs=dc, luma_coeffs=luma,
                  chroma_dc=_chroma_dc(blocks, cbp),
                  chroma_ac=_chroma_ac(blocks, cbp))


def _chroma_dc(blocks, cbp):
    if cbp >> 4:
        return [_take(blocks, 4) for _ in range(2)]
    return [[0] * 4, [0] * 4]


def _chroma_ac(blocks, cbp):
    if cbp >> 4 == 2:
        return [[_take(blocks, 16, dc_skip=True) for _ in range(4)]
                for _ in range(2)]
    return [[[0] * 16 for _ in range(4)] for _ in range(2)]


def stream_from_trace(text: str) -> bytes:
    docs = yaml.safe_load(text)
    out = b""
    sps = pps = None
    for doc in docs or []:
        t = doc.get("nal_unit_type")
        if t == 7:
            sps = doc
            crop = doc.get("frame_crop_offsets") or {}
            out += make_sps(
                doc["pic_size_in_mbs"]["width"],
                doc["pic_size_in_mbs"]["height"],
                profile=doc["profile_idc"],
                level=int(round(float(doc["level_idc"]) * 10)),
                log2_max_frame_num=doc["log2_max_frame_num"],
                poc_type=doc["pic_order_cnt_type"],
                log2_max_poc_lsb=doc.get("log2_max_pic_order_cnt_lsb", 4),
                max_ref_frames=doc["max_num_ref_frames"],
                gaps=doc["gaps_in_frame_num_value_allowed_flag"],
                crop=(crop.get("left", 0) // 2, crop.get("right", 0) // 2,
                      crop.get("top", 0) // 2, crop.get("bottom", 0) // 2))
        elif t == 8:
            pps = doc
            if doc["entropy_coding_mode_flag"]:
                raise NotImplementedError(
                    "CABAC traces carry no residual levels")
            nri = doc["num_ref_idx_default_active"]
            out += make_pps(
                pps_id=doc["pic_parameter_set_id"],
                init_qp=doc["pic_init_qp"],
                chroma_qp_off=doc["chroma_qp_index_offset"],
                deblock_control=bool(
                    doc["deblocking_filter_control_present_flag"]),
                nrefs=nri["l0"], nrefs1=nri["l1"])
        elif t in (1, 5):
            if doc["slice_type"] not in (2, 7):
                raise NotImplementedError(
                    f"slice_type {doc['slice_type']} (only I slices)")
            specs = [_mb_spec(mb) for mb in doc["macroblocks_cavlc"]]
            poc = doc["pic_order_cnt"]
            poc_bits = poc.get("bits", sps.get(
                "log2_max_pic_order_cnt_lsb", 4))
            fn = doc["frame_num"]
            dbi = doc.get("disable_deblocking_filter_idc")
            out += make_idr_slice(
                sps["pic_size_in_mbs"]["width"],
                sps["pic_size_in_mbs"]["height"], specs,
                slice_qp=pps["pic_init_qp"] + doc["slice_qp_delta"],
                init_qp=pps["pic_init_qp"],
                frame_num=fn["absolute"] & ((1 << fn["bits"]) - 1),
                idr_pic_id=doc.get("idr_pic_id", 0),
                poc_lsb=poc["absolute"] & ((1 << poc_bits) - 1),
                idr=(t == 5),
                nal_ref_idc=doc["nal_ref_idc"],
                first_mb=doc["first_mb_in_slice"],
                log2_max_frame_num=sps["log2_max_frame_num"],
                log2_max_poc_lsb=sps.get("log2_max_pic_order_cnt_lsb", 4),
                deblock_idc=dbi,
                no_output_of_prior=bool(
                    doc.get("no_output_of_prior_pics_flag", 0)),
                long_term=bool(doc.get("long_term_reference_flag", 0)))
        else:
            raise NotImplementedError(f"nal_unit_type {t}")
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: python -m tools.yaml2avc trace.yaml out.264",
              file=sys.stderr)
        return 2
    with open(argv[0]) as f:
        data = stream_from_trace(f.read())
    with open(argv[1], "wb") as f:
        f.write(data)
    print(f"wrote {argv[1]} ({len(data)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
