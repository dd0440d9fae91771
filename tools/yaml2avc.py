"""YAML trace -> Annex-B bitstream compiler: the inverse of the decoder's
log format, mirroring the reference's gen_avc.py (tests/gen_avc.py:142-509)
where the SAME YAML schema doubles as log output and test-vector input.

Scope: SPS / PPS / I, P and B slices in BOTH entropy modes.  CAVLC
residuals come from the `- {nC, c}` entries, CABAC residuals from the
`- {c: [...]}` / `- {}` entries the decoder logs per coded_block_flag
(mb_cabac.cpp).  Inter macroblocks rebuild from mb_type / sub_mb_types /
ref_idx / mvds.  Not covered (the trace either lacks the data or the
encoder the feature): ref-list modification, mmco ops, weighted
prediction tables, inter 8x8 transforms, MVC.

    python -m tools.yaml2avc trace.yaml out.264

Round-trip contract (tests/test_yaml_roundtrip.py): decoding the emitted
stream reproduces the input trace line-for-line and the same pixels.
"""

from __future__ import annotations

import sys

import yaml

from tools.avcgen import (MbSpec, make_b_slice, make_cabac_slice,
                          make_idr_slice, make_p_slice, make_pps,
                          make_sps)


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


# B 16x8/8x16 list-use pairs: mb_type = 4 + 2*k (+1 for 8x16)
_B_PAIR_USE = [(1, 1), (2, 2), (1, 2), (2, 1), (1, 3),
               (2, 3), (3, 1), (3, 2), (3, 3)]


def _inter_residuals(mb):
    """Shared residual fields for an inter MbSpec (cbp-gated 4x4 luma +
    chroma DC/AC), consumed from the mb's coeffLevels in visit order."""
    blocks = _blocks(mb)
    cbp = mb.get("coded_block_pattern", 0)
    luma = []
    for i8 in range(4):
        if cbp >> i8 & 1:
            luma += [_take(blocks, 16) for _ in range(4)]
        else:
            luma += [[0] * 16 for _ in range(4)]
    return dict(cbp=cbp, qp_delta=mb.get("mb_qp_delta", 0),
                luma_coeffs=luma, chroma_dc=_chroma_dc(blocks, cbp),
                chroma_ac=_chroma_ac(blocks, cbp))


def _ref_map(mb, keys, l=0):
    d = mb.get("ref_idx") or {}
    return [int(d.get(str(k + 4 * l), d.get(k + 4 * l, 0)))
            for k in keys]


def _mb_spec_p(mb):
    t = mb["mb_type"]
    if t >= 5:                  # intra-in-P: I-slice numbering - 5
        m2 = dict(mb)
        m2["mb_type"] = t - 5
        return _mb_spec(m2)
    if t == 4:
        raise NotImplementedError("P_8x8ref0")
    if mb.get("transform_size_8x8_flag"):
        raise NotImplementedError("inter 8x8 transform")
    kind = {0: "p16", 1: "p16x8", 2: "p8x16", 3: "p8"}[t]
    mvds = [tuple(v) for v in mb.get("mvds") or []]
    if kind == "p8":
        sub = list(mb["sub_mb_types"])
        refidx = _ref_map(mb, range(4))
        return MbSpec(kind, refidx=refidx, sub_types=sub, mvds=mvds,
                      **_inter_residuals(mb))
    ri_keys = {"p16": [0], "p16x8": [0, 2], "p8x16": [0, 1]}[kind]
    return MbSpec(kind, refidx=_ref_map(mb, ri_keys), sub_types=None,
                  mvds=mvds, **_inter_residuals(mb))


def _mb_spec_b(mb):
    t = mb["mb_type"]
    if t >= 23:                 # intra-in-B: I-slice numbering - 23
        m2 = dict(mb)
        m2["mb_type"] = t - 23
        return _mb_spec(m2)
    if mb.get("transform_size_8x8_flag"):
        raise NotImplementedError("inter 8x8 transform")
    if t == 0:
        return MbSpec("bdirect", **_inter_residuals(mb))
    mvds = [tuple(v) for v in mb.get("mvds") or []]
    if t <= 3:
        return MbSpec("b16", use=[t],
                      refidx=[_ref_map(mb, [0], 0), _ref_map(mb, [0], 1)],
                      sub_types=None, mvds=mvds, **_inter_residuals(mb))
    if t == 22:
        sub = list(mb["sub_mb_types"])
        return MbSpec("b8", use=None, sub_types=sub,
                      refidx=[_ref_map(mb, range(4), 0),
                              _ref_map(mb, range(4), 1)],
                      mvds=mvds, **_inter_residuals(mb))
    k = (t - 4) >> 1
    kind = "b16x8" if (t - 4) % 2 == 0 else "b8x16"
    ri_keys = [0, 2] if kind == "b16x8" else [0, 1]
    return MbSpec(kind, use=list(_B_PAIR_USE[k]),
                  refidx=[_ref_map(mb, ri_keys, 0),
                          _ref_map(mb, ri_keys, 1)],
                  sub_types=None, mvds=mvds, **_inter_residuals(mb))


def _slice_specs(doc, n_mbs_slice):
    """Spec list for one slice, expanding CAVLC skip runs / CABAC skip
    flags and padding trailing skips up to the slice's mb count."""
    st = doc["slice_type"] % 5
    skip_kind = "bskip" if st == 1 else "skip"
    mbs = doc.get("macroblocks_cabac")
    cabac = mbs is not None
    if mbs is None:
        mbs = doc.get("macroblocks_cavlc") or []
    specs = []
    for mb in mbs:
        if cabac:
            if mb.get("mb_skip_flag"):
                specs.append(MbSpec(skip_kind))
                continue
        else:
            specs += [MbSpec(skip_kind)] * int(mb.get("mb_skip_run", 0))
            if "mb_type" not in mb:     # trailing-skip-run entry
                continue
        if st == 2:
            specs.append(_mb_spec(mb))
        elif st == 0:
            specs.append(_mb_spec_p(mb))
        else:
            specs.append(_mb_spec_b(mb))
    if len(specs) < n_mbs_slice:        # trailing skips (CAVLC final run
        specs += [MbSpec(skip_kind)] * (n_mbs_slice - len(specs))
    assert len(specs) == n_mbs_slice, (len(specs), n_mbs_slice)
    return specs


def stream_from_trace(text: str) -> bytes:
    docs = yaml.safe_load(text)
    out = b""
    sps = pps = None
    for di, doc in enumerate(docs or []):
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
            nri = doc["num_ref_idx_default_active"]
            out += make_pps(
                pps_id=doc["pic_parameter_set_id"],
                cabac=bool(doc["entropy_coding_mode_flag"]),
                init_qp=doc["pic_init_qp"],
                chroma_qp_off=doc["chroma_qp_index_offset"],
                deblock_control=bool(
                    doc["deblocking_filter_control_present_flag"]),
                nrefs=nri["l0"], nrefs1=nri["l1"])
        elif t in (1, 5):
            st = doc["slice_type"] % 5
            if st not in (0, 1, 2):
                raise NotImplementedError(
                    f"slice_type {doc['slice_type']}")
            if doc.get("memory_management_control_operations") or \
                    doc.get("ref_pic_list_modifications_l0") or \
                    doc.get("ref_pic_list_modifications_l1"):
                raise NotImplementedError("mmco / ref-list modification")
            mbW = sps["pic_size_in_mbs"]["width"]
            mbH = sps["pic_size_in_mbs"]["height"]
            n_mbs = mbW * mbH
            first_mb = doc["first_mb_in_slice"]
            # slice extent: up to the next slice of the same frame (a
            # following doc with first_mb > this one's) or the frame end
            end_mb = n_mbs
            for nxt in docs[di + 1:]:
                if nxt.get("nal_unit_type") in (1, 5):
                    nf = nxt.get("first_mb_in_slice", 0)
                    if nf > first_mb:
                        end_mb = nf
                    break
            specs = _slice_specs(doc, end_mb - first_mb)
            poc = doc["pic_order_cnt"]
            poc_bits = poc.get("bits", sps.get(
                "log2_max_pic_order_cnt_lsb", 4))
            fn = doc["frame_num"]
            dbi = doc.get("disable_deblocking_filter_idc")
            cabac = bool(pps["entropy_coding_mode_flag"])
            common = dict(
                slice_qp=pps["pic_init_qp"] + doc["slice_qp_delta"],
                init_qp=pps["pic_init_qp"],
                frame_num=fn["absolute"] & ((1 << fn["bits"]) - 1),
                poc_lsb=poc["absolute"] & ((1 << poc_bits) - 1),
                nal_ref_idc=doc["nal_ref_idc"],
                first_mb=first_mb,
                log2_max_frame_num=sps["log2_max_frame_num"],
                log2_max_poc_lsb=sps.get("log2_max_pic_order_cnt_lsb", 4),
                deblock_idc=dbi)
            nra = doc.get("num_ref_idx_active") or {}
            pps_nrefs = (pps["num_ref_idx_default_active"]["l0"],
                         pps["num_ref_idx_default_active"]["l1"])
            nrefs = (nra.get("l0", pps_nrefs[0]),
                     nra.get("l1", pps_nrefs[1]))
            if cabac:
                out += make_cabac_slice(
                    mbW, mbH, specs, st,
                    idr=(t == 5), idr_pic_id=doc.get("idr_pic_id", 0),
                    nrefs=nrefs, pps_nrefs=pps_nrefs,
                    cabac_init_idc=doc.get("cabac_init_idc", 0),
                    direct_spatial=bool(
                        doc.get("direct_spatial_mv_pred_flag", 1)),
                    pps_id=doc.get("pic_parameter_set_id", 0), **common)
            elif st == 2:
                out += make_idr_slice(
                    mbW, mbH, specs, idr=(t == 5),
                    idr_pic_id=doc.get("idr_pic_id", 0),
                    no_output_of_prior=bool(
                        doc.get("no_output_of_prior_pics_flag", 0)),
                    long_term=bool(
                        doc.get("long_term_reference_flag", 0)), **common)
            elif st == 0:
                out += make_p_slice(
                    mbW, mbH, specs, nrefs=nrefs[0],
                    pps_nrefs=pps_nrefs[0], **common)
            else:
                out += make_b_slice(
                    mbW, mbH, specs, nrefs=nrefs,
                    pps_nrefs=pps_nrefs,
                    direct_spatial=bool(
                        doc.get("direct_spatial_mv_pred_flag", 1)),
                    **common)
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
