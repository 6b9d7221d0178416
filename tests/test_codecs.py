"""Codec parity tests (SURVEY.md §5.2 item 1-2).

Gates from BASELINE.json input_hint: bit-exact for deflate/lzw/png,
PSNR >= 40 dB for the lossy 'jpeg' stand-in.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cloudtiff_spark import codecs


def _img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


RNG = np.random.default_rng(7)


class TestLZW:
    def test_roundtrip_random(self):
        for n in [0, 1, 7, 256, 5000, 70000]:
            data = RNG.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            assert codecs.lzw_decode(codecs.lzw_encode(data)) == data

    def test_roundtrip_repetitive(self):
        data = b"abcabcabcabc" * 4000  # forces table resets past 4094 codes
        assert codecs.lzw_decode(codecs.lzw_encode(data)) == data

    def test_compresses_repetitive(self):
        data = b"\x00" * 10000
        assert len(codecs.lzw_encode(data)) < 400

    @given(st.binary(min_size=0, max_size=2000))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip_property(self, data):
        assert codecs.lzw_decode(codecs.lzw_encode(data)) == data

    def test_end_of_stream_early_change(self):
        # regression: streams whose FINAL data code lands the decoder table
        # exactly on a width boundary (2^w - 2) must widen before EOI.
        # fixtures.gen_image(4403) produced such a stream (24578 != 24576).
        from cloudtiff_spark import fixtures

        row = fixtures.gen_image(4403)
        assert row["fmt"] == "lzw_raw"

    def test_known_vector(self):
        # Hand-computed: encode of b"\x07\x07\x07" (TIFF style):
        # CLEAR(256)@9b, 7@9b, 258(="\x07\x07")@9b, EOI(257)@9b
        enc = codecs.lzw_encode(b"\x07\x07\x07")
        bits = "".join(f"{b:08b}" for b in enc)
        codes = [int(bits[i : i + 9], 2) for i in range(0, 36, 9)]
        assert codes == [256, 7, 258, 257]


class TestPNG:
    def test_roundtrip(self):
        img = _img(RNG, 33, 70)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)

    def test_decoder_handles_filters(self):
        # build a PNG with filter-2 (Up) rows by hand and check decode
        import struct
        import zlib

        img = _img(RNG, 8, 8)
        rows = []
        prev = np.zeros(8 * 3, np.int16)
        for y in range(8):
            line = img[y].reshape(-1).astype(np.int16)
            rows.append(bytes([2]) + ((line - prev) & 0xFF).astype(np.uint8).tobytes())
            prev = line
        ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
        png = (
            codecs._PNG_SIG
            + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codecs._chunk(b"IEND", b"")
        )
        assert np.array_equal(codecs.decode_png(png), img)


class TestFakeJpeg:
    def test_psnr_gate(self):
        img = _img(RNG, 128, 96)
        out = codecs.decode_fakejpeg(codecs.encode_fakejpeg(img))
        assert codecs.psnr(img, out) >= 40.0  # BASELINE.json lossy gate

    def test_deterministic(self):
        img = _img(RNG, 16, 16)
        assert codecs.encode_fakejpeg(img) == codecs.encode_fakejpeg(img)


class TestPredictor:
    def test_roundtrip_matches_cumsum(self):
        img = _img(RNG, 5, 9)
        enc = codecs.predictor2_encode(img)
        assert np.array_equal(codecs.predictor2_decode(enc), img)

    def test_wrapping(self):
        # wrapping_add semantics (compression.rs:313-325)
        row = np.array([[[250], [10], [10]]], dtype=np.uint8)  # 250,+10->4,+10->14
        dec = codecs.predictor2_decode(row)
        assert dec.reshape(-1).tolist() == [250, 4, 14]


class TestUnified:
    @pytest.mark.parametrize("fmt", ["deflate_raw", "lzw_raw", "png"])
    def test_lossless_bit_exact(self, fmt):
        img = _img(RNG, 96, 64)
        data = codecs.encode_image(img, fmt)
        assert np.array_equal(codecs.decode_image(data, fmt, 64, 96), img)

    def test_unsupported_fmt_raises(self):
        with pytest.raises(ValueError, match="CompressionNotSupported"):
            codecs.encode_image(np.zeros((2, 2, 3), np.uint8), "webp")
