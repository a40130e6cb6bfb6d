"""PNG codec tests: real decode on stdlib zlib (VERDICT r01 item 6).

The encoder cycles all five scanline filters, so a single >=5-row image
exercises every unfilter branch; corruption tests prove the decoder
actually validates structure instead of pattern-matching the encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from modape_spark.operators.multimodal import (
    decode_png_gray,
    encode_png_gray,
    synth_pixels,
)


@pytest.mark.parametrize("doc_id", [0, 1, 42, 9999, 123456])
def test_png_roundtrip(doc_id):
    px = synth_pixels(doc_id)
    assert px.shape == (doc_id % 61 + 16, doc_id % 97 + 16)
    got = decode_png_gray(encode_png_gray(px))
    assert np.array_equal(got, px)


def test_png_roundtrip_adversarial_pixels():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert np.array_equal(decode_png_gray(encode_png_gray(px)), px)
    # constant and extreme images (filter deltas all-zero / wrapping)
    for fill in (0, 255):
        img = np.full((11, 13), fill, dtype=np.uint8)
        assert np.array_equal(decode_png_gray(encode_png_gray(img)), img)


def test_png_rejects_bad_signature():
    blob = encode_png_gray(synth_pixels(5))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_gray(b"GIF89a" + blob[6:])


def test_png_rejects_corrupt_crc():
    blob = bytearray(encode_png_gray(synth_pixels(5)))
    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = bytes(blob).index(b"IDAT")
    blob[idat_at + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png_gray(bytes(blob))


def test_png_rejects_unsupported_color_type():
    px = synth_pixels(3)
    blob = bytearray(encode_png_gray(px))
    ihdr_at = bytes(blob).index(b"IHDR")
    body = bytearray(blob[ihdr_at + 4:ihdr_at + 17])
    body[9] = 2  # RGB color type
    blob[ihdr_at + 4:ihdr_at + 17] = body
    # re-seal CRC so the failure is the color-type check, not CRC
    crc = zlib.crc32(bytes(blob[ihdr_at:ihdr_at + 17]))
    blob[ihdr_at + 17:ihdr_at + 21] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="grayscale"):
        decode_png_gray(bytes(blob))


def test_every_filter_type_present_in_stream():
    """The encoder must emit all 5 filter types (else the oracle gate only
    proves a subset of the decoder)."""
    px = synth_pixels(77)  # >= 5 rows
    blob = encode_png_gray(px)
    idat_at = blob.index(b"IDAT")
    (length,) = struct.unpack(">I", blob[idat_at - 4:idat_at])
    raw = zlib.decompress(blob[idat_at + 4:idat_at + 4 + length])
    stride = px.shape[1] + 1
    ftypes = {raw[y * stride] for y in range(px.shape[0])}
    assert ftypes == {0, 1, 2, 3, 4}


def test_wav_roundtrip_and_chunk_walk():
    """decode(encode(pcm)) is exact, the parser walks past the deliberate
    LIST chunk by its length field, and malformed containers raise."""
    import numpy as np
    import pytest

    from modape_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_pcm,
    )

    for d in (0, 7, 123, 10**12 + 5):
        pcm, sr0 = synth_pcm(d)
        sr, out = decode_wav(encode_wav(pcm, sr0))
        assert sr == sr0
        assert np.array_equal(out, pcm)
    blob = encode_wav(*synth_pcm(3)[::1])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="length mismatch"):
        decode_wav(blob[:-2])


def test_frame_sampler_skips_by_length():
    """Every 3rd frame decodes exactly; skipped frames and the trailing
    metadata record are seeked over by their length prefixes."""
    import numpy as np
    import pytest

    from modape_spark.operators.multimodal import (
        encode_frames,
        sample_frames,
        synth_frame,
    )

    d = 42
    blob = encode_frames(d)
    w, h, frames = sample_frames(blob, 3)
    n_frames = 4 + d % 5
    assert [f for f, _ in frames] == [f for f in range(n_frames) if f % 3 == 0]
    for f, px in frames:
        assert np.array_equal(px, synth_frame(d, f, w, h))
    with pytest.raises(ValueError, match="FRMS"):
        sample_frames(b"XXXX" + blob[4:], 3)


def test_png_unfilter_c_matches_python(monkeypatch):
    """The C unfilter (ckernel.png_unfilter) is byte-identical to the
    pure-Python fallback on images whose encoder cycles all five filter
    types, including non-square and tiny shapes."""
    from modape_spark import ckernel
    from modape_spark.operators import multimodal as mm

    if ckernel.get_lib() is None:
        pytest.skip("C kernel unavailable")
    for d in (0, 7, 96, 123, 4096, 99991):
        px = mm.synth_pixels(d)
        blob = mm.encode_png_gray(px)
        c_dec = mm.decode_png_gray(blob)
        monkeypatch.setattr(ckernel, "png_unfilter_c", lambda *a: None)
        py_dec = mm.decode_png_gray(blob)
        monkeypatch.undo()
        assert np.array_equal(c_dec, px), d
        assert np.array_equal(py_dec, px), d


def test_wav_rejects_overrunning_chunk():
    """A chunk whose declared length overruns the blob raises instead of
    silently truncating samples (round-3 review)."""
    from modape_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_pcm,
    )

    pcm, sr = synth_pcm(5)
    blob = bytearray(encode_wav(pcm, sr))
    # find the data chunk and inflate its length field without growing
    # the blob; keep the RIFF length consistent so only the inner check
    # can catch it
    ix = blob.index(b"data")
    clen = struct.unpack("<I", blob[ix + 4:ix + 8])[0]
    blob[ix + 4:ix + 8] = struct.pack("<I", clen + 64)
    riff_len = struct.unpack("<I", blob[4:8])[0]
    with pytest.raises(ValueError, match="overruns"):
        decode_wav(bytes(blob))
    # short fmt chunk raises the module's ValueError, not struct.error
    blob2 = bytearray(encode_wav(pcm, sr))
    ix = blob2.index(b"fmt ")
    blob2[ix + 4:ix + 8] = struct.pack("<I", 8)
    with pytest.raises(ValueError):
        decode_wav(bytes(blob2))
