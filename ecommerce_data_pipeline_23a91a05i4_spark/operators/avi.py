"""Minimal RIFF/AVI container for MJPEG video — pure-Python writer and
parser (VERDICT r11 next #5: the real video frame-decode path).

Format source is the PUBLIC spec only: RIFF is the little-endian
chunked container (fourcc + u32 size + body, word-aligned); the AVI
form is Microsoft's "AVI RIFF File Reference" — ``RIFF('AVI ')``
holding ``LIST('hdrl')`` (an ``avih`` main header + one
``LIST('strl')`` per stream) and ``LIST('movi')`` whose ``00dc``
chunks carry one compressed frame each, optionally followed by an
``idx1`` index.  MJPEG is the trivial video codec: every ``00dc``
payload is a complete baseline JPEG, decodable by the vendored T.81
decoder (operators/jpeg.py) — no inter-frame state, which is exactly
why MJPEG/AVI is the one video format a dependency-free engine can
support end-to-end.

The WRITER exists to synthesize deterministic fixtures (and for the
round-trip tests); the PARSER plus the JPEG tiers give
``multimodal.sample_video_frames(fake=False)`` real decoded frames.

Scale notes: parsing is a single forward walk over the blob —
O(n_frames) chunk headers, no decode until a frame is selected — so
offset-sampling a 2-hour asset decodes only the sampled frames, never
the stream.  All of it runs inside mapInPandas Arrow batches
(per-asset work, embarrassingly parallel, no shuffle).
"""

from __future__ import annotations

import struct

_RIFF = b"RIFF"
_AVI = b"AVI "
_LIST = b"LIST"


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-length bodies carry one pad
    # byte that is NOT counted in the stored size
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(_LIST, list_type + body)


def build_mjpeg_avi(
    frames: list[bytes],
    fps: int = 10,
    width: int = 0,
    height: int = 0,
) -> bytes:
    """Assemble JPEG-encoded ``frames`` into a spec-shaped MJPEG AVI:
    avih + strh/strf headers (fixed frame rate ``fps``), a ``movi``
    list with one ``00dc`` chunk per frame, and an ``idx1`` index
    (offsets relative to the ``movi`` fourcc, keyframe-flagged — every
    MJPEG frame is one)."""
    if not frames:
        raise ValueError("build_mjpeg_avi: need at least one frame")
    if fps <= 0:
        raise ValueError(f"build_mjpeg_avi: fps must be positive, got {fps}")
    us_per_frame = round(1_000_000 / fps)
    max_bytes = max(len(f) for f in frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            us_per_frame,          # dwMicroSecPerFrame
            max_bytes * fps,       # dwMaxBytesPerSec (upper bound)
            0,                     # dwPaddingGranularity
            0x10,                  # dwFlags: AVIF_HASINDEX
            len(frames),           # dwTotalFrames
            0,                     # dwInitialFrames
            1,                     # dwStreams
            max_bytes,             # dwSuggestedBufferSize
            width,
            height,
            0, 0, 0, 0,            # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIIi4H",
            b"vids",               # fccType
            b"MJPG",               # fccHandler
            0,                     # dwFlags
            0,                     # wPriority
            0,                     # wLanguage
            0,                     # dwInitialFrames
            1,                     # dwScale   } rate/scale = fps
            fps,                   # dwRate    }
            0,                     # dwStart
            len(frames),           # dwLength (in frames)
            max_bytes,             # dwSuggestedBufferSize
            0,                     # dwQuality
            0,                     # dwSampleSize (0: varying)
            0, 0, width, height,   # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,                    # biSize (BITMAPINFOHEADER)
            width,
            height,
            1,                     # biPlanes
            24,                    # biBitCount
            b"MJPG",               # biCompression
            width * height * 3,    # biSizeImage (nominal)
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks: list[bytes] = []
    idx_entries: list[bytes] = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for f in frames:
        c = _chunk(b"00dc", f)
        movi_chunks.append(c)
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", 0x10, offset, len(f))
        )
        offset += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(_RIFF, _AVI + hdrl + movi + idx1)


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    data[pos:end]; tolerates a truncated trailing header."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        yield fourcc, body, min(size, end - body)
        pos = body + size + (size % 2)  # word alignment


def parse_avi(data: bytes) -> dict:
    """Parse an AVI blob into ``{"us_per_frame", "n_frames",
    "duration_ms", "frames"}`` (frames: raw JPEG payloads, stream
    order).  One forward walk, no decoding.  Handles the ``rec ``
    sub-lists interleaved files use; raises ValueError on a non-AVI
    blob — a corrupt asset in a 100 TB manifest should be filtered by
    the caller, not crash the executor (sample_video_frames wraps
    this per-row)."""
    if len(data) < 12 or data[:4] != _RIFF or data[8:12] != _AVI:
        raise ValueError("parse_avi: not a RIFF/AVI blob")
    us_per_frame = None
    frames: list[bytes] = []

    def scan_movi(pos: int, end: int) -> None:
        for fcc, body, size in _walk(data, pos, end):
            if fcc == _LIST and data[body:body + 4] == b"rec ":
                scan_movi(body + 4, body + size)
            elif fcc[2:4] in (b"dc", b"db"):
                frames.append(data[body:body + size])

    (total,) = struct.unpack_from("<I", data, 4)
    for fcc, body, size in _walk(data, 12, min(8 + total, len(data))):
        if fcc != _LIST:
            continue
        ltype = data[body:body + 4]
        if ltype == b"hdrl":
            for f2, b2, s2 in _walk(data, body + 4, body + size):
                if f2 == b"avih" and s2 >= 4:
                    (us_per_frame,) = struct.unpack_from("<I", data, b2)
        elif ltype == b"movi":
            scan_movi(body + 4, body + size)
    if us_per_frame is None or not us_per_frame:
        raise ValueError("parse_avi: missing avih main header")
    if not frames:
        raise ValueError("parse_avi: no frame chunks in movi list")
    return {
        "us_per_frame": int(us_per_frame),
        "n_frames": len(frames),
        "duration_ms": (len(frames) * int(us_per_frame)) // 1000,
        "frames": frames,
    }


def frame_index_at(offset_ms: int, us_per_frame: int, n_frames: int) -> int:
    """The frame covering ``offset_ms`` under a fixed frame rate —
    floor(offset / frame_duration), clamped to the last frame (the
    sampling contract shared with the plan-arithmetic oracle)."""
    if n_frames <= 0:
        raise ValueError("frame_index_at: empty stream")
    return min((offset_ms * 1000) // us_per_frame, n_frames - 1)
