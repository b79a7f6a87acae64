"""Vendored pure-Python PNG codec — the minimal real-image fallback.

The multimodal operators keep their pixel work behind a codec seam
(operators/multimodal.py): Pillow when importable, else this module for
PNG, else a loud NotImplementedError.  Implemented from the public PNG
specification (RFC 2083 / W3C PNG): 8-bit-depth, non-interlaced images
in the five standard color types, with all five scanline filters.  The
output contract matches ``PIL.Image.convert("RGB")`` — grayscale
replicates, palette maps through PLTE, and alpha is DISCARDED (not
composited) — so the Pillow path and this path produce identical RGB
bytes and therefore identical pixel checksums for the same file.

Pure stdlib (zlib + struct): no dependency, deterministic across
platforms, and fast enough for test/gate payloads.  Production replaces
the seam with Pillow/turbojpeg; nothing above the seam changes.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG to (width, height, raw RGB bytes).

    Raises ValueError on malformed/truncated input and
    NotImplementedError for the (rare) legal variants this minimal
    decoder does not cover (interlacing, bit depths other than 8).
    """
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    palette = b""
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG color type {color_type} invalid")
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT corrupt: {exc}") from exc

    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")

    # unfilter scanlines (filters 0-4; fpx = bytes-per-pixel lookback)
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y * stride:(y + 1) * stride] = line
        prev = line

    # normalize to RGB, matching PIL.convert("RGB") (alpha discarded)
    if color_type == 2:
        rgb = bytes(out)
    elif color_type == 0:
        rgb = bytes(b for v in out for b in (v, v, v))
    elif color_type == 4:
        rgb = bytes(
            b for i in range(0, len(out), 2) for b in (out[i],) * 3
        )
    elif color_type == 6:
        rgb = bytearray()
        for i in range(0, len(out), 4):
            rgb.extend(out[i:i + 3])
        rgb = bytes(rgb)
    else:  # 3: palette
        if not palette:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray()
        for idx in out:
            base = idx * 3
            if base + 3 > len(palette):
                raise ValueError("PNG palette index out of range")
            rgb.extend(palette[base:base + 3])
        rgb = bytes(rgb)
    return width, height, rgb


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes as a minimal valid PNG (8-bit truecolor,
    filter 0 on every scanline, one IDAT)."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}x{height}x3"
        )
    stride = width * 3
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        raw.extend(rgb[y * stride:(y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_rgb_nearest(
    src_w: int, src_h: int, rgb: bytes, dst_w: int, dst_h: int
) -> bytes:
    """Nearest-neighbor resample of raw RGB bytes — the deterministic
    real resize kernel (source pixel = floor(dst_index * src / dst),
    the classic integer nearest-neighbor mapping)."""
    if src_w <= 0 or src_h <= 0:
        raise ValueError("empty source image")
    out = bytearray(dst_w * dst_h * 3)
    for y in range(dst_h):
        sy = y * src_h // dst_h
        row = sy * src_w * 3
        dst_row = y * dst_w * 3
        for x in range(dst_w):
            sx = x * src_w // dst_w
            s = row + sx * 3
            d = dst_row + x * 3
            out[d:d + 3] = rgb[s:s + 3]
    return bytes(out)
