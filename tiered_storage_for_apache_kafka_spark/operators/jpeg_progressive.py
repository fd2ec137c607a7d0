"""Progressive JPEG (SOF2): T.81 Annex G decode + a scripted encoder.

Real web/training corpora are MAJORITY progressive — a pipeline whose
decoder handles only baseline (SOF0) silently rejects most of the
images it is pointed at. This module implements the full progressive
DCT process from the public ITU-T T.81 spec (Annex G):

- **decode**: multi-scan reassembly with spectral selection (Ss..Se
  bands) and successive approximation (Ah/Al bit planes) — DC first /
  DC refinement (raw bits), AC first with EOB-run coding, and the AC
  refinement correction-bit procedure (G.1.2.3); interleaved DC scans
  and single-component AC scans, sampling factors up to 2x2 (4:2:0).
  Coefficients accumulate per component across scans; dequantization,
  IDCT, chroma upsampling and YCbCr->RGB run once at the end.
- **encode_jpeg_progressive**: a fixed 9-scan script in the shape
  libjpeg's default progression uses (DC Al=1 interleaved; per-band AC
  first scans at Al=1; DC refinement; per-component AC refinement to
  Al=0). Every scan refines to bit plane 0, so the decoded image is
  BIT-EXACT with the baseline codec's decode of the same quantized
  coefficients — which is how the tests pin correctness.

The reference repo has no media codecs; this exists for the
training-data-pipeline surface (multimodal decode operators). Shares
the baseline codec's Huffman/bit/DCT machinery (`jpeg_codec.py`).
"""

from __future__ import annotations

import struct

import numpy as np

from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_huffman,
    _category,
    _decoder_for,
    _extend,
    _fdct_quant,
    _idct_block,
    _marker,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    scale_quant_table,
)


def jpeg_process(blob: bytes) -> str:
    """Cheap marker sniff: 'baseline' (SOF0), 'extended' (SOF1),
    'progressive' (SOF2), 'lossless/arith/other' for the rest, or
    'not-jpeg'. Reads only marker headers — never entropy data — so a
    router can split a corpus by process before paying any decode."""
    if blob[:2] != b"\xff\xd8":
        return "not-jpeg"
    names = {0xC0: "baseline", 0xC1: "extended", 0xC2: "progressive"}
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return "not-jpeg"
        tag = blob[pos + 1]
        if tag == 0xD9:
            break
        if tag == 0x01 or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= tag <= 0xCF and tag not in (0xC4, 0xC8, 0xCC):
            return names.get(tag, "other")
        (length,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        if tag == 0xDA:  # entropy data follows; no SOF seen yet
            return "not-jpeg"
        pos += 2 + length
    return "not-jpeg"


# -- decoder (T.81 Annex G) ---------------------------------------------------


def _entropy_end(blob: bytes, start: int) -> int:
    """End of an entropy-coded segment: the next marker that is neither
    a stuffed 0x00 nor an RST."""
    i = start
    n = len(blob)
    while i < n - 1:
        if blob[i] == 0xFF and blob[i + 1] != 0x00 and not (
            0xD0 <= blob[i + 1] <= 0xD7
        ):
            return i
        i += 1
    raise ValueError("progressive JPEG: entropy segment without end marker")


def decode_progressive(blob: bytes) -> "np.ndarray":
    """Decode a SOF2 progressive JPEG; returns uint8 HxWxC like the
    baseline decoder. Restart intervals (DRI + RSTn) are decoded: each
    scan resyncs at its interval boundaries, resetting DC predictions
    and the EOB run."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], object] = {}
    frame = None
    comps: list[dict] = []
    coeffs: list[np.ndarray] = []  # per comp: (by, bx, 64) zigzag order
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG: lone 0xFF at end of stream")
        tag = blob[pos + 1]
        if tag == 0xD9:  # EOI: all scans applied; reconstruct
            if frame is None or not comps:
                raise ValueError("progressive JPEG without SOF2 frame")
            return _reconstruct(frame, comps, coeffs, qtables)
        if tag == 0x01 or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(blob):
            raise ValueError("truncated JPEG marker")
        (length,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        body = blob[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG marker body")
        if tag == 0xDB:  # DQT (8-bit, as baseline)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                if zz.size != 64:
                    raise ValueError("short DQT payload")
                qtables[tq] = zz.astype(np.int64)  # kept in zigzag order
                p += 65
        elif tag == 0xC2:  # SOF2
            if len(body) < 6:
                raise ValueError("short SOF2 payload")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if len(body) < 6 + nc * 3:
                raise ValueError("short SOF2 component list")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling factors {hi}x{vi} (max 2x2)"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            frame = (h, w, nc)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bx"] = mcux * c["h"]
                c["by"] = mcuy * c["v"]
                # non-interleaved scans cover only the component's own
                # raster of ceil(dim/8) blocks
                c["nbx"] = (-(-w * c["h"] // hmax) + 7) // 8
                c["nby"] = (-(-h * c["v"] // vmax) + 7) // 8
                c["pred"] = 0
            coeffs = [
                np.zeros((c["by"], c["bx"], 64), dtype=np.int32)
                for c in comps
            ]
        elif tag == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("short DHT payload")
                huff[(tc, th)] = _decoder_for(bits, vals)
                p += 17 + n
        elif tag in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError("decode_progressive expects a SOF2 frame")
        elif tag == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("short DRI payload")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS: one progressive scan
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            if len(body) < 1 + ns * 2 + 3:
                raise ValueError("short SOS payload")
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + c * 2 : 3 + c * 2]
                idx = next(
                    (i for i, x in enumerate(comps) if x["id"] == cs), None
                )
                if idx is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((idx, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + ns * 2 : 4 + ns * 2]
            ah, al = ahal >> 4, ahal & 0x0F
            data_start = pos + 2 + length
            data_end = _entropy_end(blob, data_start)
            reader = _BitReader(blob[data_start:data_end])
            _apply_scan(
                reader, comps, coeffs, huff, scan, ss, se, ah, al, frame,
                restart_interval,
            )
            pos = data_end
            continue
        pos += 2 + length
    raise ValueError("progressive JPEG has no EOI")


def _apply_scan(
    reader, comps, coeffs, huff, scan, ss, se, ah, al, frame, ri=0
):
    """Apply one SOS segment to the coefficient store (zigzag order)."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        _dc_scan(reader, comps, coeffs, huff, scan, ah, al, frame, ri)
        return
    if len(scan) != 1:
        raise ValueError("progressive AC scans are single-component")
    idx, _td, ta = scan[0]
    if ah == 0:
        _ac_first_scan(reader, comps[idx], coeffs[idx],
                       huff.get((1, ta)), ss, se, al, ri)
    else:
        _ac_refine_scan(reader, comps[idx], coeffs[idx],
                        huff.get((1, ta)), ss, se, al, ri)


def _dc_scan(reader, comps, coeffs, huff, scan, ah, al, frame, ri=0):
    h, w, _nc = frame

    def maybe_restart(n_unit: int) -> None:
        # T.81 restart in a progressive scan: byte-align + RSTn, reset
        # DC predictions (EOB runs are an AC-scan concept)
        if ri and n_unit and n_unit % ri == 0:
            reader.restart(n_unit // ri - 1)
            for c in comps:
                c["pred"] = 0

    n_unit = 0
    if len(scan) > 1:  # interleaved: MCU order
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(n_unit)
                n_unit += 1
                for idx, td, _ta in scan:
                    c = comps[idx]
                    for byi in range(c["v"]):
                        for bxi in range(c["h"]):
                            _dc_block(
                                reader, c, coeffs[idx],
                                my * c["v"] + byi, mx * c["h"] + bxi,
                                huff.get((0, td)), ah, al,
                            )
    else:
        idx, td, _ta = scan[0]
        c = comps[idx]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                maybe_restart(n_unit)
                n_unit += 1
                _dc_block(reader, c, coeffs[idx], by, bx,
                          huff.get((0, td)), ah, al)


def _dc_block(reader, comp, coef, by, bx, dc_dec, ah, al):
    if ah == 0:  # first DC scan: baseline DC diff of the point transform
        if dc_dec is None:
            raise ValueError("DC scan references missing Huffman table")
        t = dc_dec.decode(reader)
        comp["pred"] += _extend(reader.receive(t), t)
        coef[by, bx, 0] = comp["pred"] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            coef[by, bx, 0] |= 1 << al


def _ac_first_scan(reader, comp, coef, ac_dec, ss, se, al, ri=0):
    if ac_dec is None:
        raise ValueError("AC scan references missing Huffman table")
    eobrun = 0
    n_unit = 0
    for by in range(comp["nby"]):
        for bx in range(comp["nbx"]):
            if ri and n_unit and n_unit % ri == 0:
                # restart resets the EOB run with the entropy state
                reader.restart(n_unit // ri - 1)
                eobrun = 0
            n_unit += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            blk = coef[by, bx]
            while k <= se:
                rs = ac_dec.decode(reader)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past end of band")
                blk[k] = _extend(reader.receive(s), s) << al
                k += 1
    return eobrun


def _ac_refine_scan(reader, comp, coef, ac_dec, ss, se, al, ri=0):
    """T.81 G.1.2.3 AC successive-approximation refinement (the
    correction-bit procedure, same control flow as the spec's
    flowcharts / libjpeg's decode_mcu_AC_refine)."""
    if ac_dec is None:
        raise ValueError("AC scan references missing Huffman table")
    p1 = 1 << al
    m1 = -1 << al
    eobrun = 0
    n_unit = 0
    for by in range(comp["nby"]):
        for bx in range(comp["nbx"]):
            if ri and n_unit and n_unit % ri == 0:
                reader.restart(n_unit // ri - 1)
                eobrun = 0
            n_unit += 1
            blk = coef[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = ac_dec.decode(reader)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r)
                            if r:
                                eobrun += reader.receive(r)
                            break  # correction bits continue below
                        # r == 15: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "AC refinement size must be 1"
                            )
                        newval = p1 if reader.read_bit() else m1
                    # advance over r ZERO-history coefficients, emitting
                    # correction bits for the nonzero-history ones passed
                    while k <= se:
                        if blk[k] != 0:
                            if reader.read_bit() and not (blk[k] & p1):
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB block: only correction bits for nonzero history
                while k <= se:
                    if blk[k] != 0 and reader.read_bit() and not (
                        blk[k] & p1
                    ):
                        blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1
    return eobrun


def _reconstruct(frame, comps, coeffs, qtables):
    h, w, nc = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("frame references missing quantization table")
        qnat = np.zeros(64, dtype=np.int64)
        qnat[ZIGZAG] = q  # zigzag -> natural order
        plane = np.zeros((c["by"] * 8, c["bx"] * 8), dtype=np.uint8)
        for by in range(c["by"]):
            for bx in range(c["bx"]):
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = coeffs[ci][by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_block(
                    nat.reshape(8, 8), qnat.reshape(8, 8)
                )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = plane.repeat(ry, axis=0)
        if rx > 1:
            plane = plane.repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    img = np.stack(planes, axis=2)
    if nc == 3:
        img = _ycbcr_to_rgb(img)
    return img


# -- encoder (fixed progression script) ---------------------------------------


def encode_jpeg_progressive(
    pixels: "np.ndarray",
    quality: int = 92,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Progressive JFIF encoder with a libjpeg-shaped scan script:

      1. DC, all components interleaved, Al=1
      2. AC 1..5  per component, Al=1   (coarse band first)
      3. AC 6..63 per component, Al=1
      4. DC refinement to Al=0 (raw bits)
      5. AC 1..63 refinement per component to Al=0

    Every bit plane refines to 0, so decoding recovers the EXACT
    quantized coefficients — decode(progressive bytes) is bit-identical
    to decode(baseline bytes) of the same image/quality/subsampling."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive needs uint8 pixels")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ncomp = pixels.shape
    if ncomp not in (1, 3):
        raise ValueError("1 or 3 components")
    if h % 8 or w % 8:
        raise ValueError("dimensions must be multiples of 8")
    sub420 = subsampling == "420" and ncomp == 3
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if sub420 and (h % 16 or w % 16):
        raise ValueError("4:2:0 needs dimensions that are multiples of 16")
    if ncomp == 3:
        pixels = _rgb_to_ycbcr(pixels)

    ql = scale_quant_table(QUANT_LUMA, quality)
    qc = scale_quant_table(QUANT_CHROMA, quality)

    # quantized coefficients per component, zigzag order
    comps = []
    for c in range(ncomp):
        hi = vi = 2 if (sub420 and c == 0) else 1
        if not sub420:
            hi = vi = 1
        comps.append({"id": c + 1, "tq": 0 if c == 0 else 1, "h": hi, "v": vi})
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for ci, c in enumerate(comps):
        if c["h"] == hmax and c["v"] == vmax:
            plane = pixels[:, :, ci]
        else:  # 2x2 box-averaged chroma, as the baseline 4:2:0 encoder
            from tiered_storage_for_apache_kafka_spark.operators.jpeg_codec import (  # noqa: E501
                _round_half_up,
            )

            plane = np.clip(
                _round_half_up(
                    pixels[:, :, ci]
                    .astype(np.float64)
                    .reshape(h // 2, 2, w // 2, 2)
                    .mean(axis=(1, 3))
                ),
                0,
                255,
            ).astype(np.uint8)
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["nbx"] = (-(-plane.shape[1] // 8))
        c["nby"] = (-(-plane.shape[0] // 8))
        q = ql if ci == 0 else qc
        arr = np.zeros((c["by"], c["bx"], 64), dtype=np.int32)
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                nat = _fdct_quant(blk, q)
                arr[by, bx] = nat.flatten()[ZIGZAG]
        planes.append(arr)

    out = bytearray(b"\xff\xd8")
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate([ql] + ([qc] if ncomp == 3 else [])):
        out += _marker(
            0xDB, bytes([tid]) + bytes(int(v) for v in q.flatten()[ZIGZAG])
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _marker(0xC2, sof)  # SOF2 progressive
    huff_defs = [
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if ncomp == 3:
        huff_defs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huff_defs:
        out += _marker(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))

    dc_codes = [
        _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huffman(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_codes = [
        _build_huffman(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huffman(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    def sos_header(scan_comps, ss, se, ah, al):
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            c = comps[ci]
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            sos += bytes([c["id"], (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return _marker(0xDA, sos)

    # scan 1: DC first, interleaved, Al=1
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    wtr = _BitWriter()
    preds = [0] * ncomp
    n_unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                wtr.restart(n_unit // restart_interval - 1)
                preds = [0] * ncomp
            n_unit += 1
            for ci, c in enumerate(comps):
                codes = dc_codes[0 if ci == 0 else 1]
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        v = int(
                            planes[ci][my * c["v"] + byi, mx * c["h"] + bxi, 0]
                        ) >> 1  # point transform Al=1
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _category(diff)
                        code, size = codes[t]
                        wtr.write(code, size)
                        if t:
                            wtr.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
    out += wtr.flush()

    # scans 2..: AC first per component, two bands, Al=1
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([ci], ss, se, 0, 1)
            out += _encode_ac_first(planes[ci], comps[ci],
                                    ac_codes[0 if ci == 0 else 1], ss, se, 1,
                                    restart_interval)
    # DC refinement to Al=0: raw bits, interleaved
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    n_unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                wtr.restart(n_unit // restart_interval - 1)
            n_unit += 1
            for ci, c in enumerate(comps):
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        wtr.write(
                            int(
                                planes[ci][
                                    my * c["v"] + byi, mx * c["h"] + bxi, 0
                                ]
                            )
                            & 1,
                            1,
                        )
    out += wtr.flush()
    # AC refinement per component to Al=0
    for ci in range(ncomp):
        out += sos_header([ci], 1, 63, 1, 0)
        out += _encode_ac_refine(planes[ci], comps[ci],
                                 ac_codes[0 if ci == 0 else 1], 1, 63, 0,
                                 restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift (truncate toward zero)."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_ac_first(plane, comp, codes, ss, se, al, ri=0) -> bytes:
    wtr = _BitWriter()
    eobrun = 0
    n_unit = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, size = codes[r << 4]
            wtr.write(code, size)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun = 0

    for by in range(comp["nby"]):
        for bx in range(comp["nbx"]):
            if ri and n_unit and n_unit % ri == 0:
                flush_eob()  # an EOB run never crosses a restart
                wtr.restart(n_unit // ri - 1)
            n_unit += 1
            blk = plane[by, bx]
            run = 0
            wrote = False
            for k in range(ss, se + 1):
                v = _pt(int(blk[k]), al)
                if v == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    code, size = codes[0xF0]  # ZRL
                    wtr.write(code, size)
                    run -= 16
                t = _category(v)
                code, size = codes[(run << 4) | t]
                wtr.write(code, size)
                wtr.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
                wrote = True
            if run or not wrote:
                # standard K.3/K.5 AC tables define no EOBn symbols
                # (r>0), so runs are capped at one block (EOB0) — the
                # decoder still handles general EOBn from optimizing
                # encoders
                eobrun += 1
                flush_eob()
    flush_eob()
    return wtr.flush()


def _encode_ac_refine(plane, comp, codes, ss, se, al, ri=0) -> bytes:
    """T.81 G.1.2.3 encoder side (libjpeg's encode_mcu_AC_refine
    structure): newly-significant coefficients carry run-length + sign;
    previously-significant ones emit correction bits buffered and
    flushed after the codeword whose decoder-side advance passes them.
    ZRLs are emitted as soon as the zero-history run exceeds 15 at ANY
    nonzero position at-or-before the last newly-significant index —
    emitting them lazily (only at new coefficients) would flush
    correction bits the decoder's 16-position advance never reaches,
    desynchronizing the entropy stream (regression-tested)."""
    wtr = _BitWriter()
    eobrun = 0
    n_unit = 0
    pending: list[int] = []  # correction bits riding the next EOB

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            # EOB0 per block: the standard Annex K tables define no
            # EOBn symbols; the decoder still handles general EOBn
            code, size = codes[0x00]
            wtr.write(code, size)
            for b in pending:
                wtr.write(b, 1)
            pending.clear()
            eobrun = 0

    for by in range(comp["nby"]):
        for bx in range(comp["nbx"]):
            if ri and n_unit and n_unit % ri == 0:
                flush_eob()  # an EOB run never crosses a restart
                wtr.restart(n_unit // ri - 1)
            n_unit += 1
            blk = plane[by, bx]
            absvals = [_pt(abs(int(blk[k])), al) for k in range(ss, se + 1)]
            # index of the LAST newly-significant coefficient: past it,
            # only correction bits remain and they ride the EOB
            eob = -1
            for i, a in enumerate(absvals):
                if a == 1:
                    eob = i
            r = 0
            bits: list[int] = []
            for i, a in enumerate(absvals):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush_eob()
                    code, size = codes[0xF0]
                    wtr.write(code, size)
                    r -= 16
                    for b in bits:
                        wtr.write(b, 1)
                    bits.clear()
                if a > 1:
                    # already significant: next bit of the magnitude
                    bits.append(a & 1)
                    continue
                # newly significant (a == 1, so i <= eob and r <= 15)
                flush_eob()
                code, size = codes[(r << 4) | 1]
                wtr.write(code, size)
                wtr.write(1 if int(blk[ss + i]) > 0 else 0, 1)
                for b in bits:
                    wtr.write(b, 1)
                bits.clear()
                r = 0
            if r > 0 or bits:
                eobrun += 1
                pending.extend(bits)
                flush_eob()
    flush_eob()
    return wtr.flush()
