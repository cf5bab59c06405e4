"""Pure-python BMP/WAV codecs: byte-level goldens, round-trips, and
the multimodal real-decode branch running them in CI (no PIL /
soundfile in this container — these paths are REAL regardless)."""

import struct

import numpy as np
import pytest

from lantern_spark.operators.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    is_bmp,
    is_wav,
)

# A 2x2 24-bit BMP written out by hand, byte for byte:
# pixels (top-down logical): (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
# stored bottom-up, BGR, rows padded 6 → 8 bytes.
HAND_BMP = (
    b"BM"                       # magic
    + struct.pack("<I", 14 + 40 + 16)  # file size
    + b"\x00\x00\x00\x00"       # reserved
    + struct.pack("<I", 54)     # pixel data offset
    + struct.pack("<I", 40)     # BITMAPINFOHEADER size
    + struct.pack("<ii", 2, 2)  # width, height (bottom-up)
    + struct.pack("<HH", 1, 24)  # planes, bpp
    + struct.pack("<I", 0)      # BI_RGB
    + struct.pack("<I", 16)     # image size
    + struct.pack("<iiII", 2835, 2835, 0, 0)
    # bottom row first: (0,0,255)->BGR ff 00 00, (255,255,255)->ff ff ff
    + bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # row pad
    # top row: (255,0,0)->BGR 00 00 ff, (0,255,0)->00 ff 00
    + bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
)
HAND_BMP_PIXELS = np.array(
    [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [255, 255, 255]],
    ],
    dtype=np.uint8,
)


class TestBMP:
    def test_hand_written_golden_byte_for_byte(self):
        assert is_bmp(HAND_BMP)
        out = decode_bmp(HAND_BMP)
        assert out.shape == (2, 2, 3)
        assert (out == HAND_BMP_PIXELS).all()

    def test_encode_matches_hand_bytes(self):
        """The encoder reproduces the hand-written stream exactly."""
        assert encode_bmp(HAND_BMP_PIXELS) == HAND_BMP

    def test_roundtrip_arbitrary_sizes(self):
        rng = np.random.RandomState(7)
        for h, w in [(1, 1), (3, 5), (8, 8), (5, 3)]:
            px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            out = decode_bmp(encode_bmp(px))
            assert (out == px).all(), f"{h}x{w} roundtrip"

    def test_top_down_bmp(self):
        """Negative height stores rows top-down — decode must not
        flip."""
        buf = bytearray(encode_bmp(HAND_BMP_PIXELS))
        struct.pack_into("<ii", buf, 18, 2, -2)  # height := -2
        out = decode_bmp(bytes(buf))
        assert (out == HAND_BMP_PIXELS[::-1]).all()

    def test_32bit_bmp(self):
        """BGRA pixels: alpha dropped, no row padding needed."""
        px = HAND_BMP_PIXELS
        rows = []
        for r in px[::-1]:  # bottom-up
            for p in r:
                rows += [p[2], p[1], p[0], 0x7F]  # BGRA
        body = bytes(rows)
        buf = (
            b"BM" + struct.pack("<I", 54 + len(body)) + b"\0\0\0\0"
            + struct.pack("<I", 54) + struct.pack("<I", 40)
            + struct.pack("<ii", 2, 2) + struct.pack("<HH", 1, 32)
            + struct.pack("<I", 0) + struct.pack("<I", len(body))
            + struct.pack("<iiII", 0, 0, 0, 0) + body
        )
        assert (decode_bmp(buf) == px).all()

    def test_error_paths(self):
        with pytest.raises(ValueError, match="magic"):
            decode_bmp(b"PNG....")
        with pytest.raises(ValueError, match="truncated BMP pixel"):
            decode_bmp(HAND_BMP[:-4])
        rle = bytearray(HAND_BMP)
        struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="compression"):
            decode_bmp(bytes(rle))


class TestWAV:
    def test_hand_written_pcm16_golden(self):
        """Hand-assembled RIFF stream with 4 known mono samples."""
        samples = np.array([0, 16384, -16384, -32768], dtype="<i2")
        data = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        buf = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        assert is_wav(buf)
        frames, rate = decode_wav(buf)
        assert rate == 8000
        assert frames.shape == (4, 1)
        assert np.allclose(frames[:, 0], [0.0, 0.5, -0.5, -1.0])

    def test_roundtrip_16_and_32_bit(self):
        rng = np.random.RandomState(11)
        x = (rng.standard_normal(200) * 0.5).clip(-1, 1)
        # decode returns float32 (24-bit mantissa), so 32-bit PCM
        # round-trips to float32 precision, not int32 precision
        for bits, tol in [(16, 1 / 32768), (32, 2 ** -23)]:
            frames, rate = decode_wav(encode_wav(x, rate=16000, bits=bits))
            assert rate == 16000
            assert frames.shape == (200, 1)
            assert np.abs(frames[:, 0] - x).max() <= tol + 1e-12

    def test_stereo_roundtrip(self):
        x = np.stack(
            [np.linspace(-1, 1, 50), np.linspace(1, -1, 50)], axis=1
        )
        frames, _ = decode_wav(encode_wav(x, bits=16))
        assert frames.shape == (50, 2)
        assert np.abs(frames - x).max() <= 1 / 32768 + 1e-12

    def test_ieee_float_and_u8(self):
        x = np.array([0.25, -0.75, 1.0], dtype="<f4")
        fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
        data = x.tobytes()
        buf = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        frames, rate = decode_wav(buf)
        assert rate == 44100
        assert np.allclose(frames[:, 0], x)
        # 8-bit PCM is unsigned with midpoint 128
        fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        d8 = bytes([128, 255, 0])
        buf8 = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt8) + 8 + len(d8))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
            + b"data" + struct.pack("<I", len(d8)) + d8
        )
        frames8, _ = decode_wav(buf8)
        assert np.allclose(frames8[:, 0], [0.0, 127 / 128, -1.0])

    def test_extra_chunks_tolerated(self):
        """LIST/fact chunks between fmt and data must be skipped."""
        base = encode_wav(np.array([0.5, -0.5]), bits=16)
        # splice a LIST chunk right after 'WAVE'
        junk = b"LIST" + struct.pack("<I", 6) + b"INFOxx"
        buf = base[:12] + junk + base[12:]
        frames, _ = decode_wav(buf)
        assert frames.shape == (2, 1)

    def test_error_paths(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"OggS....")
        with pytest.raises(ValueError, match="fmt / data"):
            decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


class TestMultimodalRealDecode:
    """The real-decode branch of the multimodal kernels runs the pure
    codecs in CI — fakes are only for codec-gated formats now."""

    def test_image_features_decode_real_bmp(self, spark):
        from lantern_spark.operators.multimodal import (
            image_features,
            media_schema,
        )

        # two solid-color 4x4 BMPs with known channel means
        red = np.zeros((4, 4, 3), np.uint8)
        red[:, :, 0] = 200
        grey = np.full((4, 4, 3), 100, np.uint8)
        rows = [
            (1, bytearray(encode_bmp(red)), ("image", "bmp", 4, 4, None)),
            (2, bytearray(encode_bmp(grey)), ("image", "bmp", 4, 4, None)),
        ]
        df = spark.createDataFrame(rows, media_schema())
        out = {
            r["media_id"]: r["features"]
            for r in image_features(df, dim=6).collect()
        }
        # features = [mean_R, mean_G, mean_B, std_R, std_G, std_B]
        assert np.allclose(out[1], [200.0, 0.0, 0.0, 0.0, 0.0, 0.0])
        assert np.allclose(out[2], [100.0, 100.0, 100.0, 0.0, 0.0, 0.0])

    def test_audio_features_decode_real_wav(self, spark):
        from lantern_spark.operators.multimodal import (
            audio_features,
            media_schema,
        )

        t = np.arange(1600) / 16000.0
        tone = np.sin(2 * np.pi * 440.0 * t) * 0.5
        silence = np.zeros(1600)
        rows = [
            (1, bytearray(encode_wav(tone)), ("audio", "wav", None, None, 100)),
            (2, bytearray(encode_wav(silence)), ("audio", "wav", None, None, 100)),
        ]
        df = spark.createDataFrame(rows, media_schema())
        out = {
            r["media_id"]: np.asarray(r["audio_features"])
            for r in audio_features(df, n_bands=4, n_frames=2).collect()
        }
        # a real tone has energy; real silence has exactly none — the
        # hash-seeded fake could never produce an all-zero vector
        assert out[1].sum() > 0
        assert np.allclose(out[2], 0.0)


class TestCorruptionRaises:
    """Corrupt streams raise plain ValueError (never silently decode);
    valid-but-unimplemented variants raise UnsupportedCodecFeature."""

    def test_truncated_wav_data_chunk_raises(self):
        import numpy as np
        import pytest

        from lantern_spark.operators.codecs import decode_wav, encode_wav

        wav = encode_wav(np.linspace(-0.5, 0.5, 256), rate=8000)
        cut = wav[: len(wav) - 100]  # interrupted upload
        with pytest.raises(ValueError, match="truncated WAV"):
            decode_wav(cut)

    def test_partial_final_frame_raises(self):
        import struct

        import numpy as np
        import pytest

        from lantern_spark.operators.codecs import decode_wav, encode_wav

        # stereo WAV whose data chunk drops one sample (half a frame):
        # rebuild the container with a consistent but odd sample count
        stereo = np.zeros((10, 2), dtype=np.float64)
        wav = bytearray(encode_wav(stereo, rate=8000))
        di = bytes(wav).rindex(b"data")
        size = struct.unpack_from("<I", wav, di + 4)[0]
        struct.pack_into("<I", wav, di + 4, size - 2)  # drop 1 int16
        truncated = bytes(wav[: di + 8 + size - 2])
        # fix RIFF size so chunk walk stays in bounds
        struct.pack_into("<I", truncated and wav, 4, len(truncated) - 8)
        with pytest.raises(ValueError, match="partial final frame"):
            decode_wav(bytes(wav[: di + 8 + size - 2]))

    def test_unsupported_is_subclass_for_fallthrough(self):
        from lantern_spark.operators.codecs import UnsupportedCodecFeature

        assert issubclass(UnsupportedCodecFeature, ValueError)
