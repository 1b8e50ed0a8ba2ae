"""Raw-YUV AVI fourccs (YUY2/I420, r12): exact gray round-trips through
the fixed-point BT.601 matrix, container routing, and the frame query's
lane coverage."""

from __future__ import annotations

import pytest

def test_yuv_fourccs_round_trip_and_dispatch():
    """r12: YUY2/I420 — gray frames round-trip exactly (fixed-point
    BT.601 maps R=G=B=v to Y=v, Cb=Cr=128 and back); color content
    decodes within quantization; the frame query routes both fourccs."""
    import random

    from simsearch_spark.multimodal.avi import (
        I420_FOURCC,
        NV12_FOURCC,
        NV21_FOURCC,
        YUY2_FOURCC,
        decode_yuv_frame,
        encode_avi_yuv,
        parse_avi_frames,
        parse_avi_video_format,
    )

    rng = random.Random(17)
    for fourcc, fcc_int in [
        (b"YUY2", YUY2_FOURCC), (b"I420", I420_FOURCC),
        (b"NV12", NV12_FOURCC), (b"NV21", NV21_FOURCC),
    ]:
        for w, h in [(1, 1), (4, 3), (5, 2), (7, 5)]:
            frames = [
                bytes([rng.randrange(256)]) * (w * h * 3) for _ in range(3)
            ]
            blob = encode_avi_yuv(frames, w, h, fourcc=fourcc)
            comp, fw, fh, _bits, _handler = parse_avi_video_format(blob)
            assert (comp, fw, fh) == (fcc_int, w, h)
            _fps, idx = parse_avi_frames(blob)
            assert len(idx) == 3
            for f, (off, ln) in zip(frames, idx):
                got = decode_yuv_frame(blob[off : off + ln], w, h, comp)
                assert got == f, (fourcc, w, h)
    # non-gray content: decode is the documented fixed-point inverse
    px = bytes([200, 30, 60] * 4)  # 2x2 red-ish
    blob = encode_avi_yuv([px], 2, 2, fourcc=b"YUY2")
    comp, fw, fh, _b, _h2 = parse_avi_video_format(blob)
    _fps, idx = parse_avi_frames(blob)
    off, ln = idx[0]
    got = decode_yuv_frame(blob[off : off + ln], 2, 2, comp)
    for c_got, c_src in zip(got, px):
        assert abs(c_got - c_src) <= 8  # quantization + 4:2:2 averaging
    with pytest.raises(ValueError, match="YUY2 frame"):
        decode_yuv_frame(b"\x00", 4, 4, YUY2_FOURCC)
    with pytest.raises(ValueError, match="I420 frame"):
        decode_yuv_frame(b"\x00", 4, 4, I420_FOURCC)
    with pytest.raises(ValueError, match="supports YUY2/I420/NV12/NV21"):
        encode_avi_yuv([bytes(3)], 1, 1, fourcc=b"Y800")
    # r13: NV12 vs NV21 differ only in chroma order — swapping the
    # interleaved plane bytes converts one to the other exactly
    px = bytes([200, 30, 60] * 4)
    b12 = encode_avi_yuv([px], 2, 2, fourcc=b"NV12")
    b21 = encode_avi_yuv([px], 2, 2, fourcc=b"NV21")
    _f, i12 = parse_avi_frames(b12)
    _f, i21 = parse_avi_frames(b21)
    f12 = b12[i12[0][0] : i12[0][0] + i12[0][1]]
    f21 = b21[i21[0][0] : i21[0][0] + i21[0][1]]
    coff = 2 * 2
    sw = bytearray(f12)
    sw[coff::2], sw[coff + 1 :: 2] = f12[coff + 1 :: 2], f12[coff::2]
    assert bytes(sw) == f21
    assert decode_yuv_frame(f12, 2, 2, NV12_FOURCC) == decode_yuv_frame(
        f21, 2, 2, NV21_FOURCC
    )
    with pytest.raises(ValueError, match="NV12/NV21 frame"):
        decode_yuv_frame(b"\x00", 4, 4, NV12_FOURCC)


def test_frame_pixel_stats_routes_yuv_lanes(spark, sf_dir):
    from pyspark.sql import functions as F

    from simsearch_spark.queries.media import q_media_frame_pixel_stats

    rows = (
        q_media_frame_pixel_stats(spark, sf_dir)
        .where((F.col("media_id") % 8).isin(3, 7))
        .collect()
    )
    assert rows and all(r.decoded == "ok" for r in rows)
    for r in rows[:8]:
        d, i = int(r.media_id), int(r.frame_idx)
        assert r.channels == 3
        assert r.mean_c0 == float((d * 13 + i * 37) % 256)


def test_review_fixes_r12_session(spark):
    """Self-review regressions: (1) a YUY2 strf with biHeight==0 must
    surface as a bounded failure row, not a ZeroDivisionError killing the
    whole Arrow batch; (2) encode_avi_yuv with zero frames builds a valid
    container instead of raising IndexError."""
    import struct

    from simsearch_spark.multimodal.avi import encode_avi_yuv, parse_avi_frames
    from simsearch_spark.multimodal.binary import frame_pixel_stats

    blob = bytearray(encode_avi_yuv([bytes([7] * 12)], 2, 2, fourcc=b"YUY2"))
    i = bytes(blob).index(b"strf")
    struct.pack_into("<i", blob, i + 8 + 8, 0)  # biHeight = 0
    good = encode_avi_yuv([bytes([9] * 12)], 2, 2, fourcc=b"YUY2")
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(blob), "video/avi"),
            (2, "video", bytearray(good), "video/avi"),
        ],
        "media_id long, kind string, payload binary, mime string",
    )
    rows = {r.media_id: r for r in frame_pixel_stats(df).collect()}
    assert rows[1].decoded != "ok"          # bounded failure row
    assert rows[2].decoded == "ok"          # neighbors in the batch survive
    assert rows[2].mean_c0 == 9.0

    empty = encode_avi_yuv([], 3, 2, fourcc=b"I420")
    _fps, idx = parse_avi_frames(empty)
    assert idx == []
