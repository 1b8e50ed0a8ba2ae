"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Pixel decode is REAL (r6) for PNG (``multimodal/png.py``, RFC 2083, stdlib
zlib) and baseline JPEG (``multimodal/jpeg.py``, T.81 Huffman + exact IDCT,
numpy) via the ``decode_image`` magic-byte dispatcher, feeding
``pixel_stats`` / ``extract_pixel_features`` / ``resize_images`` below;
WAV PCM and AVI frame indexing are likewise real (wav.py / avi.py), and
MJPEG video frame PIXELS decode for real too (r7, ``frame_pixel_stats`` —
AVI index + per-frame JPEG entropy decode in one Arrow batch).
Progressive JPEG decodes for real since r8 (SOF2 multi-scan,
``multimodal/jpeg.py``) and FLAC since r9 (``multimodal/flac.py``, via the
``decode_audio`` dispatcher).  Remaining seams: arithmetic/hierarchical
JPEG, perceptual audio codecs (MP3/AAC/OGG), and frame pixel decode of
non-MJPEG video codecs (H.264 etc.) — each surfaces as a bounded
failure-reason row naming the family.  Feature extraction is
real pixels or nothing: a payload with no in-repo decoder gets a NULL
embedding for ``valid_embeddings`` to gate, never fabricated numbers
(the r6 byte-histogram sketch is retired).  The Spark-side contract — schema, batch iteration,
partition sizing — is identical on every path.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs partition
sizing; mapInPandas streams Arrow record batches, keeping peak executor
memory at batch granularity.  Feature extraction is shuffle-free; downstream
ANN over the produced embedding column reuses operators/ann.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        # r12: IFD-chain length for TIFF (multi-page), 1 for the other
        # single-image containers, 0 when the container is unknown/broken
        StructField("n_pages", IntegerType()),
    ]
)

# The bounded-exception contract: every per-row decode failure becomes a
# named failure row (or NULL embedding), never a task failure.  The codecs
# raise ValueError/NotImplementedError for recognized-but-unsupported input,
# but a TRUNCATED or corrupt payload can also surface as struct.error (a
# short struct.unpack slice in bmp/gif/tiff header parsing) or IndexError
# (GIF sub-block byte reads past end) — ADVICE r10: those must be caught on
# the image paths too, exactly as the audio handlers already did.
_DECODE_ERRORS = (ValueError, NotImplementedError, TypeError, struct.error, IndexError)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _sniff_header(payload: bytes) -> tuple[str, int, int]:
    """Dependency-free container sniffing: PNG IHDR / JPEG SOF0 / fallback.
    Real header parsing — not a stub — so metadata extraction works today."""
    if payload is None or len(payload) < 8:
        return ("unknown", -1, -1)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", int(w), int(h))
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 13:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", int(w), int(h))
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return ("bmp", int(w), abs(int(h)))
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from simsearch_spark.multimodal.tiff import parse_tiff_header

        try:
            w, h = parse_tiff_header(payload)
            return ("tiff", w, h)
        except (ValueError, struct.error, IndexError):
            return ("tiff", -1, -1)
    if payload[:1] == b"P" and payload[1:2] in b"1234567":
        from simsearch_spark.multimodal.netpbm import parse_netpbm_header

        try:
            w, h = parse_netpbm_header(payload)
            return ("netpbm", w, h)
        except (ValueError, NotImplementedError):
            return ("netpbm", -1, -1)
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", int(w), int(h))
            i += 2 + seg_len
        return ("jpeg", -1, -1)
    return ("unknown", -1, -1)


def _page_count(fmt: str, w: int, payload: bytes) -> int:
    """Container page count for the meta sniff: the TIFF IFD-chain length
    (multi-page, r12), 1 for recognized single-image containers, 0 for
    unknown or unwalkable payloads."""
    if fmt == "unknown" or w < 0:
        return 0
    if fmt != "tiff":
        return 1
    from simsearch_spark.multimodal.tiff import tiff_page_count

    try:
        return tiff_page_count(payload)
    except _DECODE_ERRORS:
        return 0


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas (Arrow
    batches; pure-Python header sniff, no decode)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmt_w_h = [_sniff_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [w for _f, w, _h in fmt_w_h],
                    "height": [h for _f, _w, h in fmt_w_h],
                    "format": [f for f, _w, _h in fmt_w_h],
                    "n_pages": [
                        _page_count(f, w, p)
                        for (f, w, _h), p in zip(fmt_w_h, pdf["payload"])
                    ],
                }
            )

    return df.mapInPandas(proc, META_SCHEMA)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("decoded", StringType()),  # ok | <failure reason>
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        # doubles, not floats: a 6-decimal mean at 0-255 scale needs ~9
        # significant digits, beyond float32 — and the SQL oracle compares
        # the rounded value exactly
        StructField("mean_c0", DoubleType()),
        StructField("mean_c1", DoubleType()),
        StructField("mean_c2", DoubleType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes to the real decoders: PNG (multimodal/png.py),
    baseline JPEG (multimodal/jpeg.py), GIF (multimodal/gif.py), BMP
    (multimodal/bmp.py), or baseline TIFF (multimodal/tiff.py).
    Raises ValueError for unknown containers, NotImplementedError for
    in-family unsupported variants."""
    from simsearch_spark.multimodal.bmp import decode_bmp
    from simsearch_spark.multimodal.gif import decode_gif
    from simsearch_spark.multimodal.jpeg import decode_jpeg
    from simsearch_spark.multimodal.png import decode_png
    from simsearch_spark.multimodal.tiff import decode_tiff

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    if payload[:1] == b"P" and payload[1:2] in b"1234567":
        from simsearch_spark.multimodal.netpbm import decode_netpbm

        return decode_netpbm(payload)
    raise ValueError("unknown image container")


def pixel_stats(df: DataFrame) -> DataFrame:
    """REAL pixel statistics for PNG and baseline-JPEG payloads
    (decode_image): per-channel means over the actual decoded pixel grid.
    Non-decodable payloads report the failure reason instead of fake
    numbers.  Arrow batches, shuffle-free — the same 100 TB shape as the
    header sniff."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "decoded", "width", "height", "channels",
                "mean_c0", "mean_c1", "mean_c2",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                try:
                    w, h, ch, pix = decode_image(bytes(p))
                    means = []
                    for c in range(min(ch, 3)):
                        means.append(round(sum(pix[c::ch]) / (w * h), 6))
                    means += [None] * (3 - len(means))
                    rows["media_id"].append(mid)
                    rows["decoded"].append("ok")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(ch)
                    rows["mean_c0"].append(means[0])
                    rows["mean_c1"].append(means[1])
                    rows["mean_c2"].append(means[2])
                except _DECODE_ERRORS as e:
                    rows["media_id"].append(mid)
                    rows["decoded"].append(str(e)[:80] or "undecodable")
                    rows["width"].append(-1)
                    rows["height"].append(-1)
                    rows["channels"].append(-1)
                    rows["mean_c0"].append(None)
                    rows["mean_c1"].append(None)
                    rows["mean_c2"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(proc, PIXEL_STATS_SCHEMA)


def extract_pixel_features(df: DataFrame, grid: int = 4) -> DataFrame:
    """REAL image features for PNG/baseline-JPEG payloads: a
    ``grid``×``grid`` block-mean luminance map (row-major, /255-normalized)
    — the classic tiny-thumbnail embedding that feeds dedup/ANN downstream.
    Non-decodable payloads (and NULLs) yield a NULL embedding — the same
    structural-failure contract as every other embedding producer: the
    documented downstream gate is ``operators/ann.py valid_embeddings``
    (r9 — this replaces the r6 byte-histogram sketch, the repo's last
    fake-number path; features are now real pixels or nothing)."""
    if grid * grid != FEATURE_DIM:
        raise ValueError(f"grid {grid}^2 != FEATURE_DIM {FEATURE_DIM}")

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                if p is None:
                    embs.append(None)
                    continue
                try:
                    w, h, ch, pix = decode_image(bytes(p))
                    cells = [[0, 0] for _ in range(FEATURE_DIM)]  # (sum, count)
                    for y in range(h):
                        gy = y * grid // h
                        base = y * w * ch
                        for x in range(w):
                            gx = x * grid // w
                            o = base + x * ch
                            # luminance channels only: gray for ch<3 (a
                            # 2-channel gray+alpha image must not let the
                            # alpha plane contaminate the embedding,
                            # ADVICE r6), RGB mean for ch>=3
                            nch = 1 if ch < 3 else 3
                            lum = sum(pix[o : o + nch]) / nch
                            cell = cells[gy * grid + gx]
                            cell[0] += lum
                            cell[1] += 1
                    embs.append(
                        [round(s / (n or 1) / 255.0, 6) for s, n in cells]
                    )
                except _DECODE_ERRORS:
                    embs.append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": embs})

    return df.mapInPandas(proc, FEATURE_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("decoded", StringType()),  # ok | <failure reason>
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)



def decode_audio(payload: bytes) -> tuple[int, int, list[int]]:
    """Audio codec dispatcher: RIFF/WAVE -> PCM decode (multimodal/wav.py),
    fLaC -> FLAC decode (multimodal/flac.py, lossless so downstream math is
    codec-invariant).  Anything else (MP3/AAC/OGG frames, raw PCM, ...) is a
    documented seam: NotImplementedError with the family named, surfacing as
    a bounded failure-reason row in audio_stats/audio_spectral."""
    if payload[:4] == b"RIFF":
        from simsearch_spark.multimodal.wav import decode_wav

        return decode_wav(payload)
    if payload[:4] == b"fLaC":
        from simsearch_spark.multimodal.flac import decode_flac

        return decode_flac(payload)
    if payload[:4] == b"FORM":
        from simsearch_spark.multimodal.aiff import decode_aiff

        return decode_aiff(payload)
    if payload[:4] == b".snd":
        from simsearch_spark.multimodal.au import decode_au

        return decode_au(payload)
    raise NotImplementedError(
        "audio codec not supported (PCM/G.711/ADPCM WAV incl. extensible, "
        "FLAC, AIFF, AU implemented; MP3/AAC/OGG are documented seams)"
    )


def audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio statistics for WAV and FLAC payloads (decode_audio):
    duration, RMS amplitude, zero-crossing count over the actual PCM
    samples.  Same Arrow-batch, shuffle-free shape as pixel_stats; rounding
    to 6 decimals pins the one float reduction (sum of squares) for the
    closed-form oracle."""
    import math

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "decoded", "sample_rate", "channels", "n_samples",
                "duration_s", "rms", "zero_crossings",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                try:
                    rate, ch, samples = decode_audio(bytes(p))
                    n = len(samples)
                    rms = round(math.sqrt(sum(s * s for s in samples) / max(n, 1)), 6)
                    zc = sum(
                        1
                        for a, b in zip(samples, samples[1:])
                        if (a >= 0) != (b >= 0)
                    )
                    rows["media_id"].append(mid)
                    rows["decoded"].append("ok")
                    rows["sample_rate"].append(rate)
                    rows["channels"].append(ch)
                    rows["n_samples"].append(n)
                    rows["duration_s"].append(round(n / (rate * ch), 6))
                    rows["rms"].append(rms)
                    rows["zero_crossings"].append(zc)
                except _DECODE_ERRORS as e:
                    rows["media_id"].append(mid)
                    rows["decoded"].append(str(e)[:80] or "undecodable")
                    rows["sample_rate"].append(-1)
                    rows["channels"].append(-1)
                    rows["n_samples"].append(-1)
                    rows["duration_s"].append(None)
                    rows["rms"].append(None)
                    rows["zero_crossings"].append(-1)
            yield pd.DataFrame(rows)

    return df.mapInPandas(proc, AUDIO_STATS_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("decoded", StringType()),
        StructField("n_samples", LongType()),
        StructField("dominant_bin", IntegerType()),
        StructField("dominant_hz", DoubleType()),
    ]
)


def audio_spectral(df: DataFrame) -> DataFrame:
    """REAL frequency analysis for WAV/FLAC payloads: rFFT over the decoded PCM
    samples, dominant non-DC bin by magnitude (lowest bin on ties), and its
    frequency in Hz — the fundamental-pitch probe an audio curation
    pipeline runs (language/music/noise triage, clipping detection feeds).
    Same shuffle-free Arrow-batch shape as ``audio_stats``; for a signal
    with an exact integer number of cycles the dominant bin is the cycle
    count, so synthesized fixtures give the oracle a closed form."""
    import numpy as np

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "decoded", "n_samples", "dominant_bin", "dominant_hz",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                try:
                    rate, ch, samples = decode_audio(bytes(p))
                    if ch > 1:
                        # decode_wav returns interleaved L/R/...: FFT over the
                        # interleaved stream mixes channels and scales every
                        # frequency by `ch`. Deinterleave channel 0 so the
                        # spectrum (and the Hz conversion below, which uses the
                        # per-channel frame count) is of one real signal.
                        samples = samples[0::ch]
                    n = len(samples)
                    if n < 2 or rate <= 0:
                        raise ValueError("too few samples for spectrum")
                    mag = np.abs(np.fft.rfft(np.asarray(samples, dtype=np.float64)))
                    # skip DC; first-occurrence argmax == lowest bin on ties
                    dom = int(np.argmax(mag[1:])) + 1
                    rows["media_id"].append(mid)
                    rows["decoded"].append("ok")
                    rows["n_samples"].append(n)
                    rows["dominant_bin"].append(dom)
                    rows["dominant_hz"].append(round(dom * rate / n, 6))
                except _DECODE_ERRORS as e:
                    rows["media_id"].append(mid)
                    rows["decoded"].append(str(e)[:80] or "undecodable")
                    rows["n_samples"].append(-1)
                    rows["dominant_bin"].append(-1)
                    rows["dominant_hz"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(proc, AUDIO_SPECTRAL_SCHEMA)


FRAME_PIXEL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("decoded", StringType()),  # ok | <failure reason>
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_c0", DoubleType()),
    ]
)


def frame_pixel_stats(df: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL video frame PIXEL decode for MJPEG AVIs: parse the container's
    frame index (multimodal/avi.py), take every ``every_n``-th frame, and
    entropy-decode its bytes as an image (`decode_image` — MJPEG frames
    are baseline JPEGs), emitting per-frame dimensions and channel-0 mean.

    Closes the r6 seam 'frame pixel decode for video' for the MJPEG case
    — and, since r9, the UNCOMPRESSED case: containers whose strf declares
    BI_RGB 24-bit route to the raw DIB frame decoder (bottom-up BGR with
    4-byte stride, multimodal/avi.py decode_dib_frame); MJPG (or an
    unparseable strf) routes per-frame to decode_image; any other declared
    codec (H.264 etc.) yields per-frame failure rows NAMING the fourcc.
    Container slicing AND pixel decode happen inside one Arrow batch —
    frames never leave the task, no shuffle, the same row-local fan-out
    contract as `frame_sample`.  A frame that fails image decode yields a
    failure-reason row (bounded-exception contract); a payload that fails
    container parse yields one such row for the whole video."""
    from simsearch_spark.multimodal.avi import (
        I420_FOURCC,
        NV12_FOURCC,
        NV21_FOURCC,
        YUY2_FOURCC,
        decode_dib_frame,
        decode_yuv_frame,
        parse_avi_frames,
        parse_avi_video_format,
    )

    cols = ("media_id", "decoded", "n_frames", "frame_idx", "width",
            "height", "channels", "mean_c0")

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in cols}

            def emit(mid, decoded, nf=-1, fi=-1, w=-1, h=-1, ch=-1, mean=None):
                for k, v in zip(cols, (mid, decoded, nf, fi, w, h, ch, mean)):
                    rows[k].append(v)

            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                b = bytes(p)
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF route (r11): composited frames from
                    # multimodal/gif.py decode_gif_frames — same sampling,
                    # same bounded-failure contract as the AVI route
                    from simsearch_spark.multimodal.gif import decode_gif_frames

                    try:
                        gw, gh, gch, gframes = decode_gif_frames(b)
                        for i in range(0, len(gframes), every_n):
                            _delay, pix = gframes[i]
                            gmean = round(sum(pix[0::gch]) / (gw * gh), 6)
                            emit(mid, "ok", len(gframes), i, gw, gh, gch, gmean)
                    except _DECODE_ERRORS as e:
                        emit(mid, str(e)[:80] or "undecodable")
                    continue
                try:
                    _fps, frames = parse_avi_frames(b)
                except _DECODE_ERRORS as e:
                    emit(mid, str(e)[:80] or "undecodable")
                    continue
                if not frames:
                    # A parseable AVI that indexes zero frames must still
                    # appear in the output (ADVICE r7): one status row,
                    # like every other bounded failure mode here.
                    emit(mid, "no frames", 0)
                    continue
                comp, fw, fh, bits, handler = parse_avi_video_format(b)
                dib_header = comp == 0 and bits == 24 and fw > 0 and fh > 0
                dib_handler = handler in (b"DIB ", b"\x00\x00\x00\x00", b"")
                stride = ((fw * 3 + 3) & ~3) if fw > 0 else -1
                mjpg = comp in (-1, int.from_bytes(b"MJPG", "little"))
                for i in range(0, len(frames), every_n):
                    off, ln = frames[i]
                    frame = b[off : off + ln]
                    # ADVICE r9: a BI_RGB strf alone must not route frames
                    # to the raw decoder — pre-r9 encode_avi_mjpeg wrote
                    # biCompression=0 around JPEG frames, and a JPEG body
                    # >= stride*height would silently decode to garbage
                    # marked 'ok'.  Require the owning strh to claim an
                    # uncompressed handler, or exact chunk-size agreement
                    # with the DIB layout AND no JPEG SOI magic; everything
                    # else falls back to magic-byte dispatch.
                    raw_dib = dib_header and (
                        dib_handler
                        or (ln == stride * fh and frame[:2] != b"\xff\xd8")
                    )
                    try:
                        if raw_dib:
                            w, h, ch = fw, fh, 3
                            pix = decode_dib_frame(frame, fw, fh)
                        elif (
                            comp in (
                                YUY2_FOURCC, I420_FOURCC,
                                NV12_FOURCC, NV21_FOURCC,
                            )
                            and fw > 0
                            and fh > 0  # fh==0 would divide by zero below
                        ):
                            # r12: raw-YUV fourccs through the fixed-point
                            # BT.601 inverse (exact for gray content)
                            w, h, ch = fw, fh, 3
                            pix = decode_yuv_frame(frame, fw, fh, comp)
                        elif mjpg or frame[:2] == b"\xff\xd8":
                            w, h, ch, pix = decode_image(frame)
                        else:
                            if comp == 0:
                                raise ValueError(
                                    f"BI_RGB frame size {ln} != DIB layout "
                                    f"{stride}x{fh} (handler {handler!r})"
                                )
                            fourcc = comp.to_bytes(4, "little").decode(
                                "ascii", "replace"
                            )
                            raise NotImplementedError(
                                f"video codec {fourcc!r} not supported "
                                "(MJPG, BI_RGB DIB, YUY2, I420 implemented)"
                            )
                        mean = round(sum(pix[0::ch]) / (w * h), 6)
                        emit(mid, "ok", len(frames), i, w, h, ch, mean)
                    except _DECODE_ERRORS as e:
                        emit(mid, str(e)[:80] or "undecodable", len(frames), i)
            yield pd.DataFrame(rows)

    return df.mapInPandas(proc, FRAME_PIXEL_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("dst_width", IntegerType()),
        StructField("dst_height", IntegerType()),
        StructField("resized", StringType()),
    ]
)


def resize_images(df: DataFrame, max_w: int = 512, max_h: int = 512) -> DataFrame:
    """Aspect-preserving bounded resize over binary image payloads.

    The TARGET-geometry computation is real (min-scale fit into
    ``max_w × max_h``, never upscales, parsed from the actual container
    header), and the resample is REAL for every container
    ``decode_image`` handles (r6 PNG; by r12 that is PNG/JPEG incl.
    progressive and CMYK/GIF/BMP/TIFF/Netpbm at every supported depth):
    nearest-neighbor over the decoded grid, re-encoded as PNG — lossless
    output regardless of input container.  Other cases record why
    (``'pass-through'`` when already within bounds, ``'stub'`` for
    payloads only a named-seam decoder could resample — e.g. CCITT TIFF,
    truncated containers — ``'unknown'`` when the header is not
    parseable).  Schema, Arrow batching, and the per-row geometry
    contract are identical on every path.
    """
    from simsearch_spark.multimodal.png import encode_png

    def _nn_resize(p: bytes, dw: int, dh: int) -> bytes:
        w, h, ch, pix = decode_image(bytes(p))
        out = bytearray(dw * dh * ch)
        for y in range(dh):
            sy = y * h // dh
            src_base = sy * w * ch
            dst_base = y * dw * ch
            for x in range(dw):
                sx = x * w // dw
                out[dst_base + x * ch : dst_base + (x + 1) * ch] = pix[
                    src_base + sx * ch : src_base + (sx + 1) * ch
                ]
        return encode_png(dw, dh, ch, bytes(out))

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "payload", "src_width", "src_height",
                                   "dst_width", "dst_height", "resized")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt, w, h = _sniff_header(p)
                if w <= 0 or h <= 0:
                    dw, dh, tag = -1, -1, "unknown"
                elif w <= max_w and h <= max_h:
                    dw, dh, tag = w, h, "pass-through"
                else:
                    scale = min(max_w / w, max_h / h)
                    dw, dh = max(int(w * scale), 1), max(int(h * scale), 1)
                    try:
                        p = _nn_resize(p, dw, dh)
                        tag = "resized"
                    except _DECODE_ERRORS:
                        tag = "stub"  # header-only / progressive / exotic
                out["media_id"].append(mid)
                out["payload"].append(p)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["dst_width"].append(dw)
                out["dst_height"].append(dh)
                out["resized"].append(tag)
            yield pd.DataFrame(out)

    return df.mapInPandas(proc, RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes (media_id, frame_idx) pairs for
    downstream decode.  Frame count is stubbed from payload size; the
    explode/partition shape is the real contract.  For AVI payloads prefer
    ``frame_sample`` below, which indexes REAL frame boundaries."""
    est_frames = F.greatest((F.length("payload") / F.lit(1024)).cast("int"), F.lit(1))
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), est_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("decoded", StringType()),  # ok | <failure reason>
        StructField("fps", DoubleType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL video frame sampling for AVI payloads (multimodal/avi.py):
    parse the container's frame index and emit every ``every_n``-th frame's
    ACTUAL bytes (MJPEG frames are JPEGs — ready for the header sniff or a
    future entropy decoder).  Undecodable payloads yield one row with the
    failure reason and a NULL frame.  Row-local fan-out, shuffle-free; the
    container is sliced inside the Arrow batch, never re-shipped per
    frame."""
    from simsearch_spark.multimodal.avi import parse_avi_frames

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "decoded", "fps", "n_frames",
                                    "frame_idx", "frame")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                try:
                    b = bytes(p)
                    fps, frames = parse_avi_frames(b)
                    for i in range(0, len(frames), every_n):
                        off, ln = frames[i]
                        rows["media_id"].append(mid)
                        rows["decoded"].append("ok")
                        rows["fps"].append(round(fps, 6))
                        rows["n_frames"].append(len(frames))
                        rows["frame_idx"].append(i)
                        rows["frame"].append(b[off : off + ln])
                except _DECODE_ERRORS as e:
                    rows["media_id"].append(mid)
                    rows["decoded"].append(str(e)[:80] or "undecodable")
                    rows["fps"].append(None)
                    rows["n_frames"].append(-1)
                    rows["frame_idx"].append(-1)
                    rows["frame"].append(None)
            yield pd.DataFrame(rows)

    return df.mapInPandas(proc, FRAME_SCHEMA)
