"""AIFF / AU / WAVE_FORMAT_EXTENSIBLE containers (r12): lossless PCM-16
round-trips through the ``decode_audio`` dispatcher, the 80-bit extended
sample-rate field exact for every integral rate, malformed containers as
``ValueError``, unsupported variants as named ``NotImplementedError``
seams — the contract the other codecs share."""

from __future__ import annotations

import random
import struct

import pytest

from simsearch_spark.multimodal.aiff import (
    _pack_extended,
    _unpack_extended,
    decode_aiff,
    encode_aiff,
)
from simsearch_spark.multimodal.au import decode_au, encode_au
from simsearch_spark.multimodal.binary import decode_audio
from simsearch_spark.multimodal.wav import decode_wav, encode_wav


def test_extended_float_exact_for_integer_rates():
    for r in (0, 1, 8000, 11025, 22050, 44100, 48000, 96000, 192000, 2**40 + 7):
        assert _unpack_extended(_pack_extended(r)) == r
    with pytest.raises(ValueError, match="negative"):
        _pack_extended(-1)
    # sign bit set → negative rate rejected
    raw = bytearray(_pack_extended(8000))
    raw[0] |= 0x80
    with pytest.raises(ValueError, match="negative"):
        _unpack_extended(bytes(raw))


def test_aiff_round_trip_and_dispatch():
    rng = random.Random(5)
    for channels in (1, 2):
        for n in (1, 7, 250):
            samples = [rng.randrange(-32768, 32768) for _ in range(n * channels)]
            blob = encode_aiff(samples, 44100, channels)
            assert decode_aiff(blob) == (44100, channels, samples)
            assert decode_audio(blob) == (44100, channels, samples)

    # SSND offset honored
    samples = [100, -200, 300]
    blob = bytearray(encode_aiff(samples, 8000))
    # rebuild with offset 4: splice 4 junk bytes after the 8-byte SSND hdr
    i = blob.index(b"SSND")
    (ln,) = struct.unpack(">L", blob[i + 4 : i + 8])
    body = blob[i + 8 : i + 8 + ln]
    new_body = struct.pack(">LL", 4, 0) + b"\xde\xad\xbe\xef" + body[8:]
    shifted = (
        bytes(blob[:i])
        + b"SSND" + struct.pack(">L", len(new_body)) + new_body
    )
    shifted = b"FORM" + struct.pack(">L", len(shifted) - 8) + shifted[8:]
    assert decode_aiff(shifted)[2] == samples

    # AIFC with a classic 18-byte COMM is malformed (no compressionType);
    # junk is malformed; 8-bit PCM is a named seam
    aifc = bytes(blob).replace(b"AIFF", b"AIFC", 1)
    with pytest.raises(ValueError, match="compressionType"):
        decode_aiff(aifc)
    with pytest.raises(ValueError, match="FORM/AIFF"):
        decode_aiff(b"FORMxxxxWAVE")
    comm8 = encode_aiff(samples, 8000)
    j = comm8.index(b"COMM") + 8 + 6
    bad = comm8[:j] + struct.pack(">h", 8) + comm8[j + 2 :]
    with pytest.raises(NotImplementedError, match="sample size"):
        decode_aiff(bad)


def test_aifc_variants():
    """r12: FORM/AIFC — NONE/twos (BE PCM) and sowt (LE PCM) round-trip
    losslessly; ulaw/alaw compand through G.711 (idempotent on the
    representable levels); unknown compression types are the seam."""
    rng = random.Random(9)
    for ctype in ("NONE", "twos", "sowt"):
        for channels in (1, 2):
            samples = [rng.randrange(-32768, 32768) for _ in range(6 * channels)]
            blob = encode_aiff(samples, 22050, channels, aifc=ctype)
            assert blob[8:12] == b"AIFC" and b"FVER" in blob[:24]
            assert decode_aiff(blob) == (22050, channels, samples), ctype
            assert decode_audio(blob) == (22050, channels, samples)
    # G.711: representable levels survive the compand round trip exactly
    from simsearch_spark.multimodal.g711 import (
        alaw_decode, alaw_encode, ulaw_decode, ulaw_encode,
    )

    levels_u = sorted({ulaw_decode(c) for c in range(256)})
    samples = [levels_u[i] for i in (0, 17, 99, 200, len(levels_u) - 1)]
    blob = encode_aiff(samples, 8000, aifc="ulaw")
    assert decode_aiff(blob) == (8000, 1, samples)
    levels_a = sorted({alaw_decode(c) for c in range(256)})
    samples = [levels_a[i] for i in (3, 64, 128, 230)]
    blob = encode_aiff(samples, 8000, aifc="alaw")
    assert decode_aiff(blob) == (8000, 1, samples)
    # G.711 writers may record sampleSize 8 (the stored width) — accepted
    j = blob.index(b"COMM") + 8 + 6
    blob8 = blob[:j] + struct.pack(">h", 8) + blob[j + 2 :]
    assert decode_aiff(blob8)[2] == samples
    # unknown compression type = the named seam (r13: ima4 decodes now,
    # so MACE 3:1 plays the unknown here)
    mac = blob.replace(b"alaw", b"MAC3", 1)
    with pytest.raises(NotImplementedError, match="MAC3"):
        decode_aiff(mac)
    with pytest.raises(ValueError, match="AIFC encode supports"):
        encode_aiff([0], 8000, aifc="MAC3")
    # exercise round-trip through an encoder-side compand
    assert decode_aiff(encode_aiff([1000], 8000, aifc="ulaw"))[2] == [
        ulaw_decode(ulaw_encode(1000))
    ]
    assert decode_aiff(encode_aiff([1000], 8000, aifc="alaw"))[2] == [
        alaw_decode(alaw_encode(1000))
    ]


def test_au_round_trip_and_dispatch():
    rng = random.Random(6)
    samples = [rng.randrange(-32768, 32768) for _ in range(333)]
    blob = encode_au(samples, 8000)
    assert decode_au(blob) == (8000, 1, samples)
    assert decode_audio(blob) == (8000, 1, samples)

    # μ-law round-trips exactly on representable levels (G.711 closed form)
    levels = [((8 * m + 132) << e) - 132 for m in range(1, 16) for e in range(8)][:50]
    wave = [lv if i % 2 == 0 else -lv for i, lv in enumerate(levels)]
    assert decode_au(encode_au(wave, 8000, codec="ulaw"))[2] == wave

    # unknown-size sentinel reads to end of payload
    hdr = bytearray(blob[:24])
    struct.pack_into(">I", hdr, 8, 0xFFFFFFFF)
    assert decode_au(bytes(hdr) + blob[24:])[2] == samples

    # annotation field honored via the data offset
    ann = struct.pack(">4sIIIII", b".snd", 32, len(samples) * 2, 3, 8000, 1)
    ann += b"note\x00\x00\x00\x00" + blob[24:]
    assert decode_au(ann)[2] == samples

    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"RIFFxxxx")
    with pytest.raises(NotImplementedError, match="AU encoding"):
        bad = bytearray(blob)
        struct.pack_into(">I", bad, 12, 23)  # ADPCM G.721: a seam
        decode_au(bytes(bad))
    # encoding 27 (A-law, r12) and 6/7 (IEEE float, r12) decode
    levels_a = sorted(
        {__import__("simsearch_spark.multimodal.g711", fromlist=["x"]).alaw_decode(c) for c in range(256)}
    )
    wave_a = [levels_a[i] for i in (5, 99, 200)]
    assert decode_au(encode_au(wave_a, 8000, codec="alaw"))[2] == wave_a
    for codec in ("float32", "float64"):
        assert decode_au(encode_au(samples, 8000, codec=codec)) == (
            8000, 1, samples,
        ), codec
        assert decode_audio(encode_au(samples, 8000, codec=codec))[2] == samples
    with pytest.raises(ValueError, match="offset"):
        bad = bytearray(blob)
        struct.pack_into(">I", bad, 4, len(blob) + 99)
        decode_au(bytes(bad))


def test_wav_extensible_round_trip():
    rng = random.Random(7)
    for channels in (1, 2):
        samples = [rng.randrange(-32768, 32768) for _ in range(100 * channels)]
        blob = encode_wav(samples, 16000, channels, extensible=True)
        # the fmt chunk really is the 0xFFFE wrapper, 40 bytes
        i = blob.index(b"fmt ")
        (ln,) = struct.unpack("<I", blob[i + 4 : i + 8])
        (tag,) = struct.unpack("<H", blob[i + 8 : i + 10])
        assert (ln, tag) == (40, 0xFFFE)
        assert decode_wav(blob) == (16000, channels, samples)
        assert decode_audio(blob) == (16000, channels, samples)

    # a GUID that is not KSDATAFORMAT is malformed, not silently PCM
    blob = bytearray(encode_wav([1, 2, 3], 8000, extensible=True))
    i = bytes(blob).index(b"fmt ")
    blob[i + 8 + 30] ^= 0xFF  # corrupt the GUID tail
    with pytest.raises(ValueError, match="SubFormat"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="extensible"):
        encode_wav([1], 8000, codec="ulaw", extensible=True)
    # a truncated extensible fmt chunk is malformed
    short = bytearray(encode_wav([1, 2], 8000, extensible=True))
    i = bytes(short).index(b"fmt ")
    struct.pack_into("<I", short, i + 4, 16)  # lie: claim 16-byte fmt
    cut = bytes(short[: i + 8 + 16]) + bytes(short[i + 8 + 40 :])
    with pytest.raises(ValueError, match="40 bytes"):
        decode_wav(cut)


def test_wav_pcm_widths():
    """r12: 8/24/32-bit integer PCM WAVs reduce to the int16 contract —
    24/32-bit exactly (top-byte widening), 8-bit on multiples of 256."""
    from simsearch_spark.multimodal.wav import decode_wav, encode_wav

    rng = random.Random(13)
    for channels in (1, 2):
        samples = [rng.randrange(-32768, 32768) for _ in range(8 * channels)]
        for codec, bits in [("pcm24", 24), ("pcm32", 32)]:
            blob = encode_wav(samples, 16000, channels, codec=codec)
            assert struct.unpack("<H", blob[34:36])[0] == bits
            assert decode_wav(blob) == (16000, channels, samples), codec
            assert decode_audio(blob) == (16000, channels, samples)
    # 8-bit: exact on the 256-aligned level set (unsigned, midpoint 128)
    samples = [-32768, -256, 0, 256, 32512]
    blob = encode_wav(samples, 8000, codec="pcm8")
    assert struct.unpack("<H", blob[34:36])[0] == 8
    assert decode_wav(blob) == (8000, 1, samples)
    # silence encodes to 0x80 bytes per spec
    assert encode_wav([0, 0], 8000, codec="pcm8")[-2:] == b"\x80\x80"
    # unsupported float width stays the named seam
    bad = bytearray(encode_wav(samples, 8000))
    struct.pack_into("<H", bad, 34, 64)
    with pytest.raises(NotImplementedError, match="bit depth 64"):
        decode_wav(bytes(bad))


def test_float_audio_exact():
    """r12: IEEE-float WAV (tag 3) and AIFC fl32 — s/32768.0 is exactly
    representable in float32 for every int16, so round trips are
    lossless; out-of-range floats clamp."""
    rng = random.Random(23)
    for channels in (1, 2):
        samples = [rng.randrange(-32768, 32768) for _ in range(9 * channels)]
        for codec in ("float32", "float64"):
            blob = encode_wav(samples, 48000, channels, codec=codec)
            (tag,) = struct.unpack("<H", blob[20:22])
            (bits,) = struct.unpack("<H", blob[34:36])
            assert (tag, bits) == (3, 32 if codec == "float32" else 64)
            assert decode_wav(blob) == (48000, channels, samples), codec
            assert decode_audio(blob) == (48000, channels, samples)
        blob = encode_aiff(samples, 48000, channels, aifc="fl32")
        assert decode_aiff(blob) == (48000, channels, samples)
        assert decode_audio(blob) == (48000, channels, samples)
    # the SoundManager spelling decodes too
    blob = encode_aiff([100, -100], 8000, aifc="FL32")
    assert decode_aiff(blob)[2] == [100, -100]
    # +1.5 full scale clamps to int16 max
    over = encode_wav([0], 8000, codec="float32")
    over = over[:-4] + struct.pack("<f", 1.5)
    assert decode_wav(over)[2] == [32767]
    # float WAV with a non-32/64 width is malformed
    bad = bytearray(encode_wav([0, 0], 8000, codec="float32"))
    struct.pack_into("<H", bad, 34, 16)
    with pytest.raises(ValueError, match="float WAV"):
        decode_wav(bytes(bad))


def test_extensible_float_wav():
    """WAVE_FORMAT_EXTENSIBLE whose SubFormat GUID carries tag 3 (IEEE
    float) routes through the float path."""
    base = encode_wav([100, -200, 300], 8000, codec="float32")
    i = base.index(b"fmt ")
    (ln,) = struct.unpack("<I", base[i + 4 : i + 8])
    fmt = base[i + 8 : i + 8 + ln]
    tag, ch, rate, br, ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    guid_tail = bytes(
        [0, 0, 0, 0, 0x10, 0, 0x80, 0, 0, 0xAA, 0, 0x38, 0x9B, 0x71]
    )
    ext = (
        struct.pack("<HHIIHHHHI", 0xFFFE, ch, rate, br, ba, bits, 22, bits, 0)
        + struct.pack("<H", 3)
        + guid_tail
    )
    blob = (
        base[:i] + b"fmt " + struct.pack("<I", len(ext)) + ext
        + base[i + 8 + ln :]
    )
    blob = b"RIFF" + struct.pack("<I", len(blob) - 8) + blob[8:]
    assert decode_wav(blob) == (8000, 1, [100, -200, 300])


def test_float_decode_bounded_on_inf_nan():
    """Self-review r12: ±inf/NaN float samples (encodable in a corrupt
    payload) must clamp/zero, not raise OverflowError past the codecs'
    bounded-exception contract."""
    import math

    from simsearch_spark.multimodal.pcm import float_to_int16

    assert float_to_int16(math.inf) == 32767
    assert float_to_int16(-math.inf) == -32768
    assert float_to_int16(math.nan) == 0
    blob = encode_wav([0, 0, 0], 8000, codec="float32")
    body = struct.pack("<fff", math.inf, -math.inf, math.nan)
    blob = blob[: len(blob) - 12] + body
    assert decode_wav(blob)[2] == [32767, -32768, 0]


def test_aifc_ima4():
    """r13 (closes the ima4 seam): QuickTime IMA ADPCM in AIFF-C — 34-byte
    packets (2-byte state checkpoint + 64 low-nibble-first samples) per
    channel, channel-interleaved per frame group, through the SAME IMA
    core audioop pinned for the WAV tag-0x11 path.  Lossy: the coded
    stream round-trips exactly (decode∘encode is a fixed point of
    encode∘decode), reconstruction error is step-bounded on smooth
    signals, and packet headers make decode restartable."""
    import math

    from simsearch_spark.multimodal.adpcm import (
        IMA4_PACKET_BYTES,
        ima_qt_decode,
        ima_qt_encode,
        ima_qt_decode_packet,
    )

    for channels in (1, 2):
        n = 200  # not a multiple of 64: exercises the hold-last padding
        samples = [
            int(4000 * math.sin(i / 20.0)) for i in range(n * channels)
        ]
        blob = encode_aiff(samples, 22050, channels, aifc="ima4")
        assert blob[8:12] == b"AIFC"
        rate, ch, out = decode_aiff(blob)
        assert (rate, ch, len(out)) == (22050, channels, n * channels)
        err = max(abs(a - b) for a, b in zip(samples, out))
        assert err <= 1500, err  # smooth signal: step-table-bounded
        # coded-stream fixed point: re-encoding the decode reproduces it
        assert ima_qt_encode(
            ima_qt_decode(ima_qt_encode(list(samples), channels), channels),
            channels,
        ) == ima_qt_encode(list(samples), channels)
        assert decode_audio(blob) == (rate, ch, out)

    # packets are independently decodable from their headers: decoding
    # packet k alone equals samples 64k..64k+63 of the full stream
    samples = [int(8000 * math.sin(i / 5.0)) for i in range(192)]
    stream = ima_qt_encode(list(samples), 1)
    full = ima_qt_decode(stream, 1)
    for k in range(3):
        pkt = stream[k * IMA4_PACKET_BYTES : (k + 1) * IMA4_PACKET_BYTES]
        assert ima_qt_decode_packet(pkt) == full[k * 64 : (k + 1) * 64]

    # malformed: partial packet group
    with pytest.raises(ValueError, match="whole packet group"):
        ima_qt_decode(stream[:-1], 1)


def test_au_g72x_family_is_a_declined_seam():
    """r13 PERMANENT pin: AU encodings 23-26 (G.721/G.723 ADPCM) stay a
    named decline — a full adaptive-predictor recommendation, the
    arithmetic-JPEG rationale."""
    from simsearch_spark.multimodal.au import decode_au, encode_au

    blob = bytearray(encode_au([0, 100, -100], 8000))
    blob[12:16] = struct.pack(">I", 23)  # G.721 4-bit ADPCM
    with pytest.raises(NotImplementedError, match="G.721/G.723"):
        decode_au(bytes(blob))


def test_au_pcm_widths():
    """r13: AU encodings 2/4/5 — 8-bit SIGNED linear (the spec's
    difference from WAV's offset-128), 24/32-bit exact widening; same
    reduction conventions as the WAV widths."""
    import random as _random

    rng = _random.Random(31)
    samples = [rng.randrange(-32768, 32768) for _ in range(97)]
    # 24/32-bit: exact round trip for every int16
    for codec in ("pcm24", "pcm32"):
        blob = encode_au(samples, 16000, codec=codec)
        assert decode_au(blob) == (16000, 1, samples), codec
        assert decode_audio(blob) == (16000, 1, samples)
    # 8-bit: exact on the high-byte level set
    hi = [(v >> 8) << 8 for v in samples]
    blob = encode_au(hi, 8000, codec="pcm8")
    assert decode_au(blob) == (8000, 1, hi)
    # signedness pinned: sample -256 stores as byte 0xFF, not 0x7F
    one = encode_au([-256], 8000, codec="pcm8")
    assert one[24] == 0xFF
