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

    # AIFC is a named seam; junk is malformed; 8-bit is a named seam
    aifc = bytes(blob).replace(b"AIFF", b"AIFC", 1)
    with pytest.raises(NotImplementedError, match="AIFF-C"):
        decode_aiff(aifc)
    with pytest.raises(ValueError, match="FORM/AIFF"):
        decode_aiff(b"FORMxxxxWAVE")
    comm8 = encode_aiff(samples, 8000)
    j = comm8.index(b"COMM") + 8 + 6
    bad = comm8[:j] + struct.pack(">h", 8) + comm8[j + 2 :]
    with pytest.raises(NotImplementedError, match="sample size"):
        decode_aiff(bad)


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
        struct.pack_into(">I", bad, 12, 27)  # ADPCM G.721: a seam
        decode_au(bytes(bad))
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
