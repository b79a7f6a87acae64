"""Vendored pure-Python baseline JPEG codec (VERDICT r8 ask #3).

Real multimodal corpora are JPEG-first; the codec seam in
operators/multimodal.py previously handled PNG only.  This module
implements the baseline sequential DCT process from the public JPEG
specification (ITU-T T.81 / ISO 10918-1, with the JFIF color
conventions): 8-bit samples, 1- or 3-component images, Huffman entropy
coding, any sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0), and
restart markers.  Progressive (SOF2), arithmetic coding, 12-bit, and
hierarchical modes raise NotImplementedError loudly; malformed or
truncated streams raise ValueError.

The IDCT runs in numpy float64 (separable 8x8 basis-matrix product) —
deterministic across platforms, which is what the content-checksum
operators need.  T.81 deliberately leaves IDCT precision
implementation-defined, so JPEG pixel output is never bit-identical
across libraries; the contract here is *self-consistency*: this
decoder's RGB output is the engine's JPEG pixel convention, exactly as
operators/png.py's output is its PNG convention.  Production swaps the
seam for Pillow/turbojpeg; nothing above the seam changes.

The encoder exists for fixtures and round-trip tests: baseline, JFIF,
optional 4:2:0 subsampling and restart intervals, Annex-K quantization
tables under the classic IJG quality scaling.  It writes its own
(deliberately simple, single-length) Huffman tables into DHT — any
canonically-valid table is legal JPEG, and the decoder consumes
arbitrary DHT tables, so round-trips also exercise table parsing.

Pure stdlib + numpy.  Scale note: per-row Python decode is the
documented weak spot at 100-TB media scale (VERDICT r8); the seam is
the fix point, not the callers.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order: position k in the scan -> natural (row-major)
#: index in the 8x8 block (T.81 Figure 5)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K base quantization tables (natural order)
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: 8x8 DCT-II basis matrix C (orthonormal): spatial = C.T @ coeff @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# --------------------------------------------------------------- decode
class _Huff:
    """Canonical Huffman table from a DHT segment: (length, code) ->
    symbol, decoded bit-by-bit (tables are <= 16 levels deep)."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(values):
                    raise ValueError("JPEG: DHT counts exceed symbols")
                self.lut[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing; a bare
    marker inside the segment surfaces as _MarkerHit (RSTn handling)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: truncated entropy segment")
            b = self.data[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("JPEG: truncated after 0xFF")
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise _MarkerHit(nxt)
            else:
                self.pos += 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits, expect and consume a marker; return it."""
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
        ):
            raise ValueError("JPEG: expected restart marker")
        marker = self.data[self.pos + 1]
        self.pos += 2
        return marker

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit magnitude value to its signed DIFF."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_block(coeff: np.ndarray) -> np.ndarray:
    return _C.T @ coeff @ _C


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG to (width, height, raw RGB bytes).

    Grayscale replicates into three channels, matching the PNG codec's
    ``convert("RGB")`` convention.  Raises ValueError on malformed
    input and NotImplementedError for legal-but-uncovered modes
    (progressive, arithmetic, 12-bit, >2 sampling factors)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG: bad signature")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) is supported"
            )
        if marker == 0xC0:  # SOF0
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6]
            )
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG {precision}-bit samples unsupported"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {ncomp} components unsupported"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                h, v = hv >> 4, hv & 15
                if h not in (1, 2) or v not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {h}x{v} unsupported"
                    )
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            frame = {
                "w": width, "h": height, "comps": comps,
            }
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = seg[p + 17:p + 17 + nv]
                table = _Huff(bits, values)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 15] = table
                else:
                    huff_ac[tc_th & 15] = table
                p += 17 + nv
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError(
                        "JPEG 16-bit quantization tables unsupported"
                    )
                qt[pq_tq & 15] = list(seg[p + 1:p + 65])
                p += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows the segment
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i:3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(f"JPEG: scan names unknown comp {cs}")
                scan.append(
                    {"comp": comp, "dc": td_ta >> 4, "ac": td_ta & 15}
                )
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError(
                    "JPEG multi-scan (non-interleaved) unsupported"
                )
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skipped
        pos += seglen
    raise ValueError("JPEG: no scan data before EOI")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list[dict],
    qt: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> tuple[int, int, bytes]:
    width, height = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    zz = ZIGZAG
    dequants = []
    for s in scan:
        tq = s["comp"]["tq"]
        if tq not in qt:
            raise ValueError(f"JPEG: missing quantization table {tq}")
        dequants.append(np.array(qt[tq], dtype=np.float64))
    mcu_index = 0
    next_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                marker = reader.align_to_marker()
                if marker != 0xD0 + next_rst:
                    raise ValueError(
                        f"JPEG: expected RST{next_rst}, got "
                        f"marker 0x{marker:02x}"
                    )
                next_rst = (next_rst + 1) % 8
                preds = [0] * len(comps)
            for ci, s in enumerate(scan):
                comp = s["comp"]
                dq = dequants[ci]
                dc_tab = huff_dc.get(s["dc"])
                ac_tab = huff_ac.get(s["ac"])
                if dc_tab is None or ac_tab is None:
                    raise ValueError(
                        f"JPEG: scan references missing Huffman table "
                        f"(dc={s['dc']}, ac={s['ac']})"
                    )
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        try:
                            block_zz = _decode_block(
                                reader,
                                dc_tab,
                                ac_tab,
                                preds,
                                ci,
                            )
                        except _MarkerHit as m:
                            raise ValueError(
                                f"JPEG: unexpected marker 0x{m.marker:02x} "
                                "inside entropy data"
                            ) from None
                        coeff = np.zeros(64)
                        coeff[zz] = block_zz * dq
                        pix = _idct_block(coeff.reshape(8, 8))
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_index += 1
    out = []
    for ci, comp in enumerate(comps):
        plane = planes[ci] + 128.0
        if comp["h"] != hmax or comp["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // comp["v"], axis=0),
                hmax // comp["h"],
                axis=1,
            )
        out.append(plane[:height, :width])
    if len(out) == 1:
        g = np.clip(np.floor(out[0] + 0.5), 0, 255).astype(np.uint8)
        rgb = np.repeat(g[:, :, None], 3, axis=2)
        return width, height, rgb.tobytes()
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return width, height, rgb.tobytes()


def _decode_block(
    reader: _BitReader,
    dc_table: _Huff,
    ac_table: _Huff,
    preds: list[int],
    ci: int,
) -> np.ndarray:
    """One 8x8 block's dequant-ready coefficients in ZIGZAG order."""
    block = np.zeros(64)
    s = reader.decode_huff(dc_table)
    preds[ci] += _extend(reader.receive(s), s)
    block[0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_table)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past end of block")
        block[k] = _extend(reader.receive(size), size)
        k += 1
    return block


# --------------------------------------------------------------- encode
def _quality_tables(quality: int) -> tuple[list[int], list[int]]:
    """Classic IJG quality scaling of the Annex K tables (quality 100
    degenerates to all-ones: near-lossless round-trips for tests)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        out.append(
            [min(255, max(1, (v * scale + 50) // 100)) for v in base]
        )
    return out[0], out[1]


def _simple_huff() -> tuple[
    list[int], list[int], list[int], list[int], dict, dict
]:
    """Deliberately simple canonical Huffman spec: every DC category at
    4 bits (12 codes), every AC (run, size) symbol at 8 bits (162
    codes; code 0xFF is never assigned, satisfying T.81's all-ones
    reservation).  Poor compression, trivially correct — fixture
    encoders optimize for verifiability, not size."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for s in range(1, 11) for r in range(16)
    ]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)  # all codes at length 8
    dc_codes = {v: (4, i) for i, v in enumerate(dc_vals)}
    ac_codes = {v: (8, i) for i, v in enumerate(ac_vals)}
    return dc_bits, dc_vals, ac_bits, ac_vals, dc_codes, ac_codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s per T.81


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    writer: _BitWriter,
    coeff_zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    dc = int(coeff_zz[0])
    diff = dc - pred
    s = _category(diff)
    length, code = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coeff_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("JPEG encoder: coefficient magnitude > 10 bits")
        length, code = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = ac_codes[0x00]
        writer.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization of one padded plane; returns an array
    of shape (blocks_y, blocks_x, 64) in ZIGZAG order."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    out = np.zeros((by, bx, 64), dtype=np.int64)
    shifted = plane - 128.0
    for yy in range(by):
        for xx in range(bx):
            block = shifted[yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8]
            coeff = _C @ block @ _C.T
            zzc = coeff.reshape(64)[ZIGZAG]
            out[yy, xx] = np.floor(zzc / qt + 0.5).astype(np.int64)
    return out


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Encode raw RGB bytes as a baseline JFIF JPEG.  ``subsample``
    turns on 4:2:0 chroma (box-average downsampling); a nonzero
    ``restart_interval`` writes DRI and RSTn markers every that many
    MCUs; ``grayscale`` keeps only the luma component — all three
    exist so the decoder's paths are testable offline."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qly, qlc = _quality_tables(quality)
    if grayscale:
        return _encode_gray(width, height, y, qly, restart_interval)
    hmax = vmax = 2 if subsample else 1
    if subsample:
        ph = -(-height // 2) * 2
        pw = -(-width // 2) * 2
        cbp = _pad_to(cb, 2, 2).reshape(ph // 2, 2, pw // 2, 2)
        crp = _pad_to(cr, 2, 2).reshape(ph // 2, 2, pw // 2, 2)
        cb = cbp.mean(axis=(1, 3))
        cr = crp.mean(axis=(1, 3))
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    yp = _pad_to(y, mcu_h, mcu_w)
    cbp = _pad_to(cb, 8, 8)
    crp = _pad_to(cr, 8, 8)
    qt_y = np.array(qly, dtype=np.float64)
    qt_c = np.array(qlc, dtype=np.float64)
    # tables are stored natural-order here; blocks come out in zigzag,
    # so reorder the tables into zigzag for the quantize divide
    qt_y_zz = qt_y[ZIGZAG]
    qt_c_zz = qt_c[ZIGZAG]
    blocks = [
        _plane_blocks(yp, qt_y_zz),
        _plane_blocks(cbp, qt_c_zz),
        _plane_blocks(crp, qt_c_zz),
    ]
    comps = [
        {"h": hmax, "v": vmax, "tq": 0},
        {"h": 1, "v": 1, "tq": 1},
        {"h": 1, "v": 1, "tq": 1},
    ]
    mcus_x = yp.shape[1] // mcu_w
    mcus_y = yp.shape[0] // mcu_h
    (
        dc_bits, dc_vals, ac_bits, ac_vals, dc_codes, ac_codes,
    ) = _simple_huff()
    writer = _BitWriter()
    preds = [0, 0, 0]
    segments = []
    mcu_index = 0
    next_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                writer.flush()
                segments.append(bytes(writer.out))
                segments.append(bytes([0xFF, 0xD0 + next_rst]))
                writer = _BitWriter()
                next_rst = (next_rst + 1) % 8
                preds = [0, 0, 0]
            for ci in range(3):
                comp = comps[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        preds[ci] = _encode_block(
                            writer,
                            blocks[ci][
                                my * comp["v"] + by, mx * comp["h"] + bx
                            ],
                            preds[ci],
                            dc_codes,
                            ac_codes,
                        )
            mcu_index += 1
    writer.flush()
    segments.append(bytes(writer.out))
    entropy = b"".join(segments)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, table_natural: np.ndarray) -> bytes:
        zz = table_natural[ZIGZAG].astype(np.int64)
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    sof_comps = b"".join(
        bytes([i + 1, (c["h"] << 4) | c["v"], c["tq"]])
        for i, c in enumerate(comps)
    )
    sos_comps = b"".join(bytes([i + 1, 0x00]) for i in range(3))
    parts = [
        b"\xff\xd8",  # SOI
        seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"),
        dqt(0, qt_y),
        dqt(1, qt_c),
        seg(
            0xC0,
            struct.pack(">BHHB", 8, height, width, 3) + sof_comps,
        ),
        dht(0, 0, dc_bits, dc_vals),
        dht(1, 0, ac_bits, ac_vals),
    ]
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    parts.append(seg(0xDA, bytes([3]) + sos_comps + b"\x00\x3f\x00"))
    parts.append(entropy)
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


def _encode_gray(
    width: int,
    height: int,
    y: np.ndarray,
    qly: list[int],
    restart_interval: int,
) -> bytes:
    """Single-component (luma only) baseline encode — exists to test
    the decoder's grayscale path; shares the block/Huffman machinery."""
    qt_y = np.array(qly, dtype=np.float64)
    qt_y_zz = qt_y[ZIGZAG]
    yp = _pad_to(y, 8, 8)
    blocks = _plane_blocks(yp, qt_y_zz)
    mcus_y, mcus_x = blocks.shape[:2]
    (
        dc_bits, dc_vals, ac_bits, ac_vals, dc_codes, ac_codes,
    ) = _simple_huff()
    writer = _BitWriter()
    pred = 0
    segments = []
    mcu_index = 0
    next_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                writer.flush()
                segments.append(bytes(writer.out))
                segments.append(bytes([0xFF, 0xD0 + next_rst]))
                writer = _BitWriter()
                next_rst = (next_rst + 1) % 8
                pred = 0
            pred = _encode_block(
                writer, blocks[my, mx], pred, dc_codes, ac_codes
            )
            mcu_index += 1
    writer.flush()
    segments.append(bytes(writer.out))
    entropy = b"".join(segments)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    parts = [
        b"\xff\xd8",
        seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"),
        seg(
            0xDB,
            bytes([0]) + bytes(int(v) for v in qt_y[ZIGZAG].astype(int)),
        ),
        seg(
            0xC0,
            struct.pack(">BHHB", 8, height, width, 1)
            + bytes([1, 0x11, 0]),
        ),
        seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)),
        seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)),
    ]
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    parts.append(seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00"))
    parts.append(entropy)
    parts.append(b"\xff\xd9")
    return b"".join(parts)
