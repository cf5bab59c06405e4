"""Pure-python media codecs: BMP (BI_RGB) and WAV (PCM / IEEE float).

Both formats are uncompressed containers, so decode is header parsing
plus a numpy reshape — REAL codecs with zero external dependencies.
They make the multimodal real-decode branch executable in any
container: ``_decode_image`` / ``_decode_audio`` sniff these formats
first and only fall back to PIL/soundfile (gated) or the
deterministic fake for formats that genuinely need external codecs
(JPEG, MP3, …).

Encoders are provided too so tests can build byte-exact fixtures and
pin decode → encode → decode round-trips.

Layout references are the public format specs:
- BMP: BITMAPFILEHEADER (14 bytes, magic 'BM') + BITMAPINFOHEADER
  (40 bytes); 24/32-bit BI_RGB pixels, rows bottom-up (top-down when
  height < 0), each row padded to a 4-byte boundary, BGR(A) order.
- WAV: RIFF/WAVE chunks; 'fmt ' (PCM=1, IEEE float=3, extensible
  0xFFFE) + 'data'; interleaved frames.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"
BI_RGB = 0


class UnsupportedCodecFeature(ValueError):
    """A VALID stream using a feature this pure-python codec does
    not implement (paletted/RLE BMPs, 24-bit/a-law WAVs, …).
    Callers with a richer library (PIL/soundfile) catch THIS and
    fall through to it; corrupt streams keep raising plain
    ValueError so corruption is never silently decoded as a
    fake."""


def is_bmp(buf: bytes) -> bool:
    return len(buf) >= 2 and buf[:2] == BMP_MAGIC


def is_wav(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"


# -- BMP ----------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → (height, width, 3) uint8 RGB array.

    Supports the dominant on-disk variant: BITMAPINFOHEADER (or any
    later 40+-byte header), BI_RGB uncompressed, 24- or 32-bit pixels,
    bottom-up or top-down rows.
    """
    if not is_bmp(buf):
        raise ValueError("not a BMP stream (missing 'BM' magic)")
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    header_size = struct.unpack_from("<I", buf, 14)[0]
    if header_size < 40:
        raise UnsupportedCodecFeature(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != BI_RGB:
        raise UnsupportedCodecFeature(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise UnsupportedCodecFeature(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3  # 4-byte row padding
    need = data_offset + row_stride * height
    if len(buf) < need:
        raise ValueError(
            f"truncated BMP pixel data ({len(buf)} < {need} bytes)"
        )
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_stride * height, offset=data_offset
    ).reshape(height, row_stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB → 24-bit BI_RGB bottom-up BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {px.shape}")
    h, w, _ = px.shape
    row_stride = (w * 3 + 3) & ~3
    body = np.zeros((h, row_stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB→BGR
    pixel_bytes = body.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", BMP_MAGIC, file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, BI_RGB, len(pixel_bytes),
        2835, 2835, 0, 0,  # 72 DPI in px/metre
    )
    return file_header + info_header + pixel_bytes


# -- WAV ----------------------------------------------------------------

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}
WAVE_FORMAT_PCM = 1
WAVE_FORMAT_IEEE_FLOAT = 3
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(buf: bytes) -> tuple:
    """WAV bytes → ((n_frames, channels) float32 in [-1, 1], rate).

    Walks RIFF chunks (tolerating extra chunks like LIST/fact),
    supports PCM 8/16/32-bit and IEEE float32.
    """
    if not is_wav(buf):
        raise ValueError("not a WAV stream (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # declared chunk size exceeds the buffer (interrupted
            # upload): corruption must raise, never silently decode a
            # clamped waveform (decode_bmp's `truncated pixel data`
            # twin)
            raise ValueError(
                f"truncated WAV {cid!r} chunk ({len(body)} < {size} bytes)"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt / data chunk")
    tag, channels, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag == WAVE_FORMAT_EXTENSIBLE and len(fmt) >= 26:
        tag = struct.unpack_from("<H", fmt, 24)[0]  # SubFormat leading u16
    if channels < 1:
        raise ValueError("WAV has zero channels")
    if tag == WAVE_FORMAT_IEEE_FLOAT:
        if bits != 32:
            raise UnsupportedCodecFeature(f"unsupported float WAV bit depth {bits}")
        samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif tag == WAVE_FORMAT_PCM:
        if bits not in _PCM_DTYPES:
            raise UnsupportedCodecFeature(f"unsupported PCM bit depth {bits}")
        raw = np.frombuffer(data, dtype=np.dtype(_PCM_DTYPES[bits]).newbyteorder("<"))
        if bits == 8:  # unsigned, midpoint 128
            samples = (raw.astype(np.float32) - 128.0) / 128.0
        else:
            samples = raw.astype(np.float32) / float(2 ** (bits - 1))
    else:
        raise UnsupportedCodecFeature(f"unsupported WAV format tag {tag}")
    if len(samples) % channels != 0:
        raise ValueError(
            f"WAV data holds {len(samples)} samples, not a multiple of "
            f"{channels} channels (partial final frame — truncated?)"
        )
    return samples.reshape(-1, channels), int(rate)


def encode_wav(
    samples: np.ndarray, rate: int = 16000, bits: int = 16
) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) → PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2:
        raise ValueError(f"expected 1-D or (n, ch) samples, got {x.shape}")
    channels = x.shape[1]
    if bits == 16:
        pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    elif bits == 32:
        pcm = np.clip(
            np.round(x * 2147483648.0), -2147483648, 2147483647
        ).astype("<i4")
    else:
        raise ValueError(f"unsupported encode bit depth {bits}")
    data = pcm.tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", WAVE_FORMAT_PCM, channels, rate,
        rate * block_align, block_align, bits,
    )
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
