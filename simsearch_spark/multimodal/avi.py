"""Dependency-free AVI (RIFF) container parser — real video FRAME INDEXING
for the multimodal surface using only stdlib ``struct``.

Scope: the container layer — locate the ``movi`` LIST and index its video
chunks (``..dc`` compressed / ``..db`` uncompressed), returning per-frame
(offset, size) into the payload plus the fps from the main AVI header —
and the RAW frame decoders: BI_RGB DIB (bottom-up BGR, padded strides)
and, r12, the YUY2/I420 YUV fourccs via a fixed-point BT.601 matrix
whose gray fixed point is exact (MJPEG frames route to the in-repo JPEG
decoder at the dispatch layer, multimodal/binary.py).

Same explicit-seam contract as multimodal/png.py / wav.py: malformed
containers raise ``ValueError``, never low-level struct errors.  The
reference engine has no video operators (LLM-pipeline extension surface).
"""

from __future__ import annotations

import struct

_US_PER_S = 1_000_000


def _chunk(cid: bytes, body: bytes) -> bytes:
    """One RIFF chunk, word-padded."""
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _lst(kind: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", len(body) + 4) + kind + body


def encode_avi_mjpeg(frames: list[bytes], fps: int = 25) -> bytes:
    """Minimal valid AVI wrapping ``frames`` as ``00dc`` video chunks —
    enough container structure for the parser (and any standard demuxer)
    to index: RIFF(AVI ) → LIST(hdrl: avih + LIST(strl: strh/strf)) →
    LIST(movi: 00dc…) → idx1."""

    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        _US_PER_S // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0)
    )
    # biCompression carries the honest 'MJPG' fourcc (it was 0/BI_RGB in
    # r6-r8, harmless then; now that raw DIB routes on BI_RGB the MJPEG
    # container must declare itself)
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, 16, 16, 1, 24, int.from_bytes(b"MJPG", "little"), 0, 0, 0, 0, 0,
    )
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih) + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx_entries = []
    off = 4  # idx1 offsets are relative to the start of 'movi'
    for f in frames:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(payload: bytes) -> tuple[float, list[tuple[int, int]]]:
    """Parse an AVI container → (fps, [(absolute_offset, size), ...]) for
    every video frame chunk in stream order.  ``payload[off:off+size]`` IS
    the frame's compressed bytes.  Raises ``ValueError`` on malformed
    containers, never struct.error."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps = 0.0
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal fps
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            try:
                (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            except struct.error as e:
                raise ValueError(f"malformed chunk header at {pos}: {e}") from e
            body_start = pos + 8
            if body_start + ln > end:
                raise ValueError(f"chunk at {pos} overruns container")
            if cid == b"LIST":
                kind = payload[body_start : body_start + 4]
                if kind in (b"hdrl", b"movi", b"strl"):
                    walk(body_start + 4, body_start + ln)
            elif cid == b"avih":
                if ln < 4:
                    raise ValueError("malformed avih chunk")
                (us_per_frame,) = struct.unpack("<I", payload[body_start : body_start + 4])
                fps = _US_PER_S / us_per_frame if us_per_frame else 0.0
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append((body_start, ln))
            pos = body_start + ln + (ln & 1)  # word alignment

    walk(12, min(len(payload), 12 + struct.unpack("<I", payload[4:8])[0] - 4))
    return fps, frames


def encode_avi_raw(frames_rgb: list[bytes], width: int, height: int, fps: int = 25) -> bytes:
    """Minimal AVI wrapping UNCOMPRESSED video: each frame is top-down
    row-major RGB24 pixel bytes (w·h·3), stored as a ``00db`` chunk in the
    standard DIB layout — bottom-up rows, BGR byte order, row stride
    padded to 4 bytes — with an honest ``strf`` BITMAPINFOHEADER
    (biCompression=0/BI_RGB, biBitCount=24) so demuxers and
    ``parse_avi_video_format`` can route the frames to the raw decoder."""

    stride = (width * 3 + 3) & ~3
    dibs = []
    for f in frames_rgb:
        if len(f) != width * height * 3:
            raise ValueError(f"frame size {len(f)} != {width}x{height}x3")
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray(stride)
            base = y * width * 3
            for x in range(width):
                r, g, b = f[base + 3 * x : base + 3 * x + 3]
                row[3 * x : 3 * x + 3] = bytes((b, g, r))  # BGR
            rows.append(bytes(row))
        dibs.append(b"".join(rows))
    n = len(dibs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        _US_PER_S // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0)
    hdrl = _lst(b"hdrl", _chunk(b"avih", avih) + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"movi" + b"".join(_chunk(b"00db", f) for f in dibs)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_video_format(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """The VIDEO stream's ``strf`` BITMAPINFOHEADER → (biCompression,
    biWidth, biHeight, biBitCount, strh_fccHandler).  biCompression 0 is
    BI_RGB (uncompressed DIB); otherwise it is a fourcc DWORD
    (e.g. 'MJPG').  Only a ``strf`` owned by a ``strh`` whose fccType is
    ``'vids'`` is accepted (ADVICE r9: in AVIs whose audio ``strl``
    precedes the video stream, the first ``strf`` is a WAVEFORMATEX and
    must not be misparsed as a BITMAPINFOHEADER).  The owning strh's
    fccHandler rides along so callers can cross-check the routing.
    Returns (-1, -1, -1, -1, b"") when no video strf exists — callers
    fall back to per-frame magic-byte dispatch."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    result = (-1, -1, -1, -1, b"")
    stream_type = b""
    stream_handler = b""

    def walk(start: int, end: int) -> None:
        nonlocal result, stream_type, stream_handler
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + ln > end:
                return
            if cid == b"LIST":
                kind = payload[body_start : body_start + 4]
                if kind in (b"hdrl", b"strl"):
                    if kind == b"strl":
                        # each stream list carries its own strh; never let a
                        # prior stream's type leak into a malformed strl
                        stream_type = b""
                        stream_handler = b""
                    walk(body_start + 4, body_start + ln)
            elif cid == b"strh" and ln >= 8:
                stream_type = payload[body_start : body_start + 4]
                stream_handler = payload[body_start + 4 : body_start + 8]
            elif (
                cid == b"strf"
                and ln >= 20
                and stream_type == b"vids"
                and result[0] == -1
            ):
                _size, w, h, _planes, bits = struct.unpack("<IiiHH", payload[body_start : body_start + 16])
                (comp,) = struct.unpack("<I", payload[body_start + 16 : body_start + 20])
                result = (comp, w, h, bits, stream_handler)
            pos = body_start + ln + (ln & 1)

    walk(12, min(len(payload), 12 + struct.unpack("<I", payload[4:8])[0] - 4))
    return result


def decode_dib_frame(body: bytes, width: int, height: int) -> bytes:
    """One BI_RGB 24-bit DIB frame body → top-down row-major RGB24 bytes.
    Rows are stored bottom-up with 4-byte stride padding, BGR order."""
    stride = (width * 3 + 3) & ~3
    if len(body) < stride * height:
        raise ValueError(f"DIB frame {len(body)} B < {stride}x{height} layout")
    out = bytearray(width * height * 3)
    for y in range(height):
        src = (height - 1 - y) * stride
        dst = y * width * 3
        for x in range(width):
            b, g, r = body[src + 3 * x : src + 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return bytes(out)


# ---------------------------------------------------------------------------
# raw YUV fourccs (r12): YUY2 (packed 4:2:2) and I420 (planar 4:2:0)
# ---------------------------------------------------------------------------
#
# Color math is the JFIF full-range BT.601 matrix in 8-bit fixed point —
# the forward rows sum to (256, 0, 0), so a GRAY pixel (R=G=B=v) maps to
# (Y=v, Cb=128, Cr=128) EXACTLY, and the inverse at Cb=Cr=128 returns
# R=G=B=Y exactly: gray content round-trips losslessly through either
# fourcc, which is what keeps the closed-form frame oracles invariant.
# Chroma planes/pairs use ceil-sized dimensions so odd geometries work.

YUY2_FOURCC = int.from_bytes(b"YUY2", "little")
I420_FOURCC = int.from_bytes(b"I420", "little")
#: r13: the semi-planar 4:2:0 pair — planar Y then ONE interleaved
#: chroma plane (NV12: UVUV…, NV21: VUVU…); same math, same exact-gray
#: property, just the hardware-decoder memory layout
NV12_FOURCC = int.from_bytes(b"NV12", "little")
NV21_FOURCC = int.from_bytes(b"NV21", "little")


def _rgb_to_yuv(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    cb = 128 + ((-43 * r - 85 * g + 128 * b + 128) >> 8)
    cr = 128 + ((128 * r - 107 * g - 21 * b + 128) >> 8)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _yuv_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + ((359 * (cr - 128) + 128) >> 8)
    g = y - ((88 * (cb - 128) + 183 * (cr - 128) + 128) >> 8)
    b = y + ((454 * (cb - 128) + 128) >> 8)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def decode_yuv_frame(body: bytes, width: int, height: int, fourcc: int) -> bytes:
    """One YUY2 or I420 frame body → top-down row-major RGB24 bytes."""
    out = bytearray(width * height * 3)
    if fourcc == YUY2_FOURCC:
        pairs = (width + 1) // 2
        if len(body) < pairs * 4 * height:
            raise ValueError(
                f"YUY2 frame {len(body)} B < {pairs * 4}x{height} layout"
            )
        for y in range(height):
            base = y * pairs * 4
            for x in range(width):
                mp = base + (x >> 1) * 4
                yy = body[mp + 2 * (x & 1)]
                cb, cr = body[mp + 1], body[mp + 3]
                out[3 * (y * width + x) : 3 * (y * width + x) + 3] = bytes(
                    _yuv_to_rgb(yy, cb, cr)
                )
        return bytes(out)
    if fourcc == I420_FOURCC:
        cw, ch = (width + 1) // 2, (height + 1) // 2
        need = width * height + 2 * cw * ch
        if len(body) < need:
            raise ValueError(f"I420 frame {len(body)} B < {need} B layout")
        uoff = width * height
        voff = uoff + cw * ch
        for y in range(height):
            for x in range(width):
                ci = (y >> 1) * cw + (x >> 1)
                out[3 * (y * width + x) : 3 * (y * width + x) + 3] = bytes(
                    _yuv_to_rgb(
                        body[y * width + x], body[uoff + ci], body[voff + ci]
                    )
                )
        return bytes(out)
    if fourcc in (NV12_FOURCC, NV21_FOURCC):
        cw, chh = (width + 1) // 2, (height + 1) // 2
        need = width * height + 2 * cw * chh
        if len(body) < need:
            raise ValueError(
                f"NV12/NV21 frame {len(body)} B < {need} B layout"
            )
        coff = width * height
        u_first = fourcc == NV12_FOURCC
        for y in range(height):
            for x in range(width):
                ci = coff + 2 * ((y >> 1) * cw + (x >> 1))
                a, b = body[ci], body[ci + 1]
                cb, cr = (a, b) if u_first else (b, a)
                out[3 * (y * width + x) : 3 * (y * width + x) + 3] = bytes(
                    _yuv_to_rgb(body[y * width + x], cb, cr)
                )
        return bytes(out)
    # PERMANENT pin (r14): MP4-era compressed video fourccs (H.26x,
    # MPEG-4 ASP, VPx, …) are out of scope by spec size and patent-era
    # complexity — the matrix covers raw DIB/YUV layouts and MJPEG;
    # anything else stays a loud seam, never a silent misdecode
    raise NotImplementedError(f"YUV fourcc {fourcc:#x} not supported")


def encode_avi_yuv(
    frames_rgb: list[bytes], width: int, height: int, fps: int = 25,
    fourcc: bytes = b"YUY2",
) -> bytes:
    """Minimal AVI wrapping raw YUY2 or I420 video.  Each input frame is
    top-down RGB24; chroma subsampling averages each pair/2×2 block with
    rounding (a no-op for gray content, which therefore stays exact)."""
    if fourcc not in (b"YUY2", b"I420", b"NV12", b"NV21"):
        raise ValueError(
            f"encode_avi_yuv supports YUY2/I420/NV12/NV21, got {fourcc!r}"
        )

    packed = []
    cw, chh = (width + 1) // 2, (height + 1) // 2
    for f in frames_rgb:
        if len(f) != width * height * 3:
            raise ValueError(f"frame size {len(f)} != {width}x{height}x3")
        yuv = [
            _rgb_to_yuv(f[3 * i], f[3 * i + 1], f[3 * i + 2])
            for i in range(width * height)
        ]
        if fourcc == b"YUY2":
            row_b = bytearray()
            for y in range(height):
                for px in range(cw):
                    x0 = 2 * px
                    x1 = min(x0 + 1, width - 1)
                    y0, cb0, cr0 = yuv[y * width + x0]
                    y1, cb1, cr1 = yuv[y * width + x1]
                    row_b += bytes(
                        (y0, (cb0 + cb1 + 1) >> 1, y1, (cr0 + cr1 + 1) >> 1)
                    )
            packed.append(bytes(row_b))
        else:
            yplane = bytes(v[0] for v in yuv)
            up = bytearray(cw * chh)
            vp = bytearray(cw * chh)
            for cy in range(chh):
                for cx in range(cw):
                    xs = [min(2 * cx + dx, width - 1) for dx in (0, 1)]
                    ys = [min(2 * cy + dy, height - 1) for dy in (0, 1)]
                    cbs = [yuv[yy * width + xx][1] for yy in ys for xx in xs]
                    crs = [yuv[yy * width + xx][2] for yy in ys for xx in xs]
                    up[cy * cw + cx] = (sum(cbs) + 2) >> 2
                    vp[cy * cw + cx] = (sum(crs) + 2) >> 2
            if fourcc == b"I420":
                packed.append(yplane + bytes(up) + bytes(vp))
            else:  # NV12 / NV21: one interleaved chroma plane
                first, second = (up, vp) if fourcc == b"NV12" else (vp, up)
                inter = bytearray(2 * cw * chh)
                inter[0::2] = first
                inter[1::2] = second
                packed.append(yplane + bytes(inter))
    n = len(packed)
    bits = 16 if fourcc == b"YUY2" else 12
    # biSizeImage from geometry, not packed[0] — valid for 0 frames too
    frame_size = (
        cw * 4 * height if fourcc == b"YUY2"
        else width * height + 2 * cw * chh
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        _US_PER_S // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    strh = b"vids" + fourcc + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0, 0
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits,
        int.from_bytes(fourcc, "little"), frame_size, 0, 0, 0, 0,
    )
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi" + b"".join(_chunk(b"00dc", f) for f in packed)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
