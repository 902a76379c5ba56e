"""Optional real-codec integrations for the multimodal operators.

The multimodal operators (:mod:`matcha_spark.operators.multimodal`)
treat decode as a pluggable seam: ``image_features(decoder=...)`` /
``audio_features(decoder=...)`` accept any ``bytes -> np.ndarray``
callable, and default to deterministic fakes so the distributed
plumbing stays testable without codec libraries.  This module supplies
the *real* decoders for environments that have the libraries — all
imports are guarded, nothing here is a hard dependency:

- :func:`pillow_decode_image` — Pillow (``PIL``), any format Pillow
  reads (PNG/JPEG/WebP/...), decoded to a grayscale float64 array;
- :func:`soundfile_decode_audio` — ``soundfile`` (libsndfile), any
  format it reads (WAV/FLAC/OGG/...), decoded to a mono float64
  waveform;
- :func:`available` — which real codecs this environment offers;
- :func:`default_image_decoder` / :func:`default_audio_decoder` — the
  real decoder when its library is importable, else the deterministic
  fake (explicit opt-in call, never a silent default of the operators
  themselves).

Library-free pure-struct codecs (no optional dependency at all):
:func:`png_decode_image` / :func:`write_png` (8-bit non-interlaced
PNG), :func:`wav_decode_audio` / :func:`write_wav` (PCM RIFF/WAVE),
and — r11 — :func:`jpeg_decode_image` / :func:`write_jpeg` (baseline
sequential JPEG per ITU-T T.81, greyscale or YCbCr-luma, restart
markers included).  :func:`sniff_decode_image` routes by magic bytes
across all of them before falling back to Pillow.

Executor-side note: the decoder callable is pickled into the
``mapInPandas`` kernel, so the codec library must be importable on the
*executors*, not just the driver.  The lazy in-function imports below
make the pickle carry only the function body — the import resolves on
whichever worker runs the batch.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


def available() -> dict:
    """Which optional codec libraries are importable here."""
    return {
        "pillow": _try_import("PIL") is not None,
        "soundfile": _try_import("soundfile") is not None,
    }


def pillow_decode_image(payload: bytes) -> np.ndarray:
    """Decode any Pillow-readable image to a 2-D grayscale float64
    array — drop-in for ``image_features(decoder=...)``.  Raises
    ImportError with a clear message where Pillow is absent."""
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env without Pillow
        raise ImportError(
            "pillow_decode_image requires Pillow (pip install pillow) "
            "on driver AND executors"
        ) from e
    return np.asarray(
        Image.open(io.BytesIO(payload)).convert("L"), dtype=np.float64
    )


def soundfile_decode_audio(payload: bytes) -> np.ndarray:
    """Decode any libsndfile-readable clip to a mono float64 waveform —
    drop-in for ``audio_features(decoder=...)``.  Multi-channel input
    is averaged to mono (feature ops expect one channel)."""
    import io

    try:
        import soundfile as sf
    except ImportError as e:  # pragma: no cover - env without soundfile
        raise ImportError(
            "soundfile_decode_audio requires soundfile (pip install "
            "soundfile) on driver AND executors"
        ) from e
    data, _rate = sf.read(io.BytesIO(payload), dtype="float64")
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data


def default_image_decoder() -> Callable[[bytes], np.ndarray]:
    """The real image decoder when Pillow is importable, else the
    deterministic fake (same seam, stable outputs)."""
    if _try_import("PIL") is not None:
        return pillow_decode_image
    from .multimodal import fake_decode_image

    return fake_decode_image


def default_audio_decoder() -> Callable[[bytes], np.ndarray]:
    """The real audio decoder when soundfile is importable, else the
    deterministic fake."""
    if _try_import("soundfile") is not None:
        return soundfile_decode_audio
    from .multimodal import fake_decode_audio

    return fake_decode_audio


def wav_decode_audio(payload: bytes) -> np.ndarray:
    """Pure-struct RIFF/WAVE PCM decoder (r10) — like the MP4 demuxer,
    this needs NO media libraries: the WAV container is public-spec
    structure (RIFF chunks; ``fmt `` carries the sample format, ``data``
    the frames), and PCM samples decode with one ``np.frombuffer``.
    Supports integer PCM (8-bit unsigned, 16/32-bit signed) and IEEE
    float (format 3, 32/64-bit); multi-channel input is averaged to
    mono; integers normalize to [-1, 1).  Compressed formats raise with
    a pointer at the soundfile-gated decoder — this is the real decode
    path for the overwhelmingly common uncompressed case, not a fake.
    """
    import struct

    buf = bytes(payload)
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE payload")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, off)
        body = buf[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, channels, _rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the GUID's first word
        audio_format = struct.unpack_from("<H", fmt, 24)[0]
    if audio_format == 1:
        if bits == 8:
            wave = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            wave = (wave - 128.0) / 128.0
        elif bits == 16:
            wave = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            wave = (
                np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
            )
        else:
            raise ValueError(f"wav: unsupported PCM bit depth {bits}")
    elif audio_format == 3:
        dt = "<f4" if bits == 32 else "<f8" if bits == 64 else None
        if dt is None:
            raise ValueError(f"wav: unsupported float bit depth {bits}")
        wave = np.frombuffer(data, dtype=dt).astype(np.float64)
    else:
        raise ValueError(
            f"wav: compressed/unknown format {audio_format} — use "
            "soundfile_decode_audio (optional libsndfile) for non-PCM"
        )
    if channels > 1:
        n = (len(wave) // channels) * channels
        wave = wave[:n].reshape(-1, channels).mean(axis=1)
    return wave


def write_wav(
    wave: "np.ndarray", sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Mono PCM WAV writer — the structural inverse of
    :func:`wav_decode_audio` for round-trips (16-bit signed: values in
    [-1, 1) quantize to int16; exact k/32768 inputs round-trip
    bit-exactly)."""
    import struct

    if bits != 16:
        raise ValueError("write_wav: only 16-bit PCM supported")
    w = np.asarray(wave, dtype=np.float64)
    pcm = np.clip(np.round(w * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def png_decode_image(payload: bytes) -> np.ndarray:
    """Pure-struct PNG decoder (r10) — stdlib ``zlib`` only: walks the
    chunk stream (IHDR/IDAT/IEND, CRC-carrying but CRCs not re-verified
    — corrupt streams fail structurally instead), inflates the IDAT
    concatenation, and inverts the per-scanline filters (None/Sub/Up/
    Average/Paeth, PNG spec §9) for 8-bit greyscale, grey+alpha, RGB
    and RGBA, non-interlaced.  Colour converts to Rec.601 luma; alpha
    is ignored.  Returns the 2-D float64 grey array the multimodal
    decoder seam expects.

    Honesty note on speed: the Sub/Average/Paeth inversions carry a
    per-pixel left-dependency, implemented as plain loops — correct
    and library-free, not fast.  Filter-0/Up scanlines (what
    :func:`write_png` and many encoders emit) invert vectorized; for
    throughput-critical real corpora plug Pillow in through the same
    ``decoder=`` seam (:func:`pillow_decode_image`)."""
    import struct
    import zlib

    buf = bytes(payload)
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("png: bad signature")
    off, ihdr, idat = 8, None, []
    while off + 8 <= len(buf):
        ln, ctype = struct.unpack_from(">I4s", buf, off)
        data = buf[off + 8 : off + 8 + ln]
        if len(data) < ln:
            raise ValueError("png: truncated chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        off += 12 + ln  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"png: unsupported parameters (depth={depth}, interlace="
            f"{interlace}) — use pillow_decode_image for the long tail"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_)
    if channels is None:
        raise ValueError(f"png: unsupported colour type {ctype_}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("png: inflated data shorter than the image")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        cur = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up
            rec = (cur + prev) & 255
        elif ft == 1:  # Sub
            rec = cur.copy()
            for i in range(channels, stride):
                rec[i] = (rec[i] + rec[i - channels]) & 255
        elif ft == 3:  # Average
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - channels] if i >= channels else 0
                rec[i] = (rec[i] + ((a + prev[i]) >> 1)) & 255
        elif ft == 4:  # Paeth
            rec = cur.copy()
            for i in range(stride):
                a = rec[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 255
        else:
            raise ValueError(f"png: unknown filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    arr = out.reshape(h, w, channels).astype(np.float64)
    if ctype_ == 0:
        return arr[:, :, 0]
    if ctype_ == 4:
        return arr[:, :, 0]
    return 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]


def write_png(gray: "np.ndarray") -> bytes:
    """Minimal greyscale PNG writer (8-bit, filter 0, one IDAT) — the
    structural inverse of :func:`png_decode_image` for library-free
    round-trips."""
    import struct
    import zlib

    a = np.asarray(gray)
    if a.ndim != 2:
        raise ValueError("write_png: need a 2-D greyscale array")
    a = np.clip(np.round(a), 0, 255).astype(np.uint8)
    h, w = a.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def sniff_decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte routing image decoder (r10): PNG goes through the
    library-free :func:`png_decode_image`; every other format needs
    Pillow.  Deliberately never falls back to the deterministic fake —
    silently hashing fake pixels for real data would corrupt features;
    absence of a decoder should fail loudly."""
    buf = bytes(payload or b"")
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            return png_decode_image(buf)
        except Exception:
            # ANY struct-decoder failure (ValueError, zlib.error,
            # struct.error) falls through to the capable library when
            # one exists; only re-raise when nothing else can try
            if _try_import("PIL") is None:
                raise
    if buf[:2] == b"\xFF\xD8":
        try:
            return jpeg_decode_image(buf)
        except Exception:
            # progressive / arithmetic / 12-bit fall through to Pillow
            if _try_import("PIL") is None:
                raise
    if _try_import("PIL") is None:
        raise ValueError(
            "sniff_decode_image: format needs Pillow (pip install pillow) "
            "— only 8-bit non-interlaced PNG and baseline JPEG decode "
            "library-free"
        )
    return pillow_decode_image(buf)


def sniff_decode_audio(payload: bytes) -> np.ndarray:
    """Magic-byte routing audio decoder (r10): PCM RIFF/WAVE goes
    through the library-free :func:`wav_decode_audio`, fLaC streams
    (r12) through :func:`flac_decode_audio`; compressed WAV, predicted
    FLAC subframes, and every other container need soundfile.  Same
    no-silent-fake policy as :func:`sniff_decode_image`."""
    buf = bytes(payload or b"")
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        try:
            return wav_decode_audio(buf)
        except Exception:
            # same breadth as the image router: struct.error from a
            # short fmt chunk must not bypass an installed soundfile
            if _try_import("soundfile") is None:
                raise
    if buf[:4] == b"fLaC":
        try:
            return flac_decode_audio(buf)
        except Exception:
            # FIXED/LPC subframes are outside the pure-struct subset —
            # fall through to soundfile when it exists
            if _try_import("soundfile") is None:
                raise
    if _try_import("soundfile") is None:
        raise ValueError(
            "sniff_decode_audio: format needs soundfile (pip install "
            "soundfile) — only PCM WAV decodes library-free"
        )
    return soundfile_decode_audio(buf)


# ---------------------------------------------------------------------------
# Baseline JPEG (r11) — pure-struct, stdlib-only, per ITU-T T.81
# ---------------------------------------------------------------------------

# Annex K.1 luminance quantization table (zig-zag order applied later)
_JPEG_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K.3 standard Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


_DCT_MAT_MEMO: "np.ndarray | None" = None


def _dct_mat() -> "np.ndarray":
    # memoized (r19): rebuilt per encode/decode call before, which at
    # tens of thousands of tiny tiles per run is pure overhead; the
    # matrix is a constant
    global _DCT_MAT_MEMO
    if _DCT_MAT_MEMO is None:
        n = np.arange(8)
        m = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
        m[0] *= 1 / np.sqrt(2)
        _DCT_MAT_MEMO = m * 0.5  # orthonormal scale folded in
    return _DCT_MAT_MEMO


def _huff_encode_table(bits, vals):
    """BITS/HUFFVAL → {symbol: (code, length)} per T.81 Annex C."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """BITS/HUFFVAL → {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# flat 16-bit-peek decode LUTs, memoized per (BITS, HUFFVAL) pair —
# JPEG streams from the same encoder reuse identical tables, and the
# multimodal operators decode tens of thousands of tiny tiles per run,
# so the per-image dict walk (one dict probe PER BIT) was the hot loop
# (r19, guide §4.2).  lut[peek16] = (symbol << 5) | code_length, 0 for
# an invalid prefix — exactly the canonical T.81 Annex C assignment
# _huff_decode_table builds, just resolved 16 bits at a time.
_HUFF_LUT_MEMO: dict = {}


def _huff_lut(bits, vals):
    key = (bytes(bits), bytes(vals))
    lut = _HUFF_LUT_MEMO.get(key)
    if lut is None:
        arr = np.zeros(1 << 16, dtype=np.int32)
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                span = 16 - ln
                base = code << span
                arr[base : base + (1 << span)] = (int(vals[k]) << 5) | ln
                code += 1
                k += 1
            code <<= 1
        lut = arr.tolist()
        _HUFF_LUT_MEMO[key] = lut
    return lut


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8

    def align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec

    def raw(self, data: bytes) -> None:
        assert self.n == 0, "raw() requires byte alignment"
        self.buf += data

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size, size-bit code)."""
    if v == 0:
        return 0, 0
    a, size = abs(v), 0
    while a:
        a >>= 1
        size += 1
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def write_jpeg(
    gray: "np.ndarray",
    quality: int = 90,
    color: bool = False,
    restart_every: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder (ITU-T T.81 sequential DCT, 8-bit,
    Annex K tables): greyscale single-component by default;
    ``color=True`` wraps the same luma in a YCbCr 4:4:4 frame with
    constant neutral chroma (Cb = Cr = 128 → all-zero chroma blocks) so
    the 3-component decode path can be exercised without a colour
    source.  The structural inverse of :func:`jpeg_decode_image` —
    lossy by nature (quantization), so round-trips are near-equal, not
    bit-equal.  ``restart_every`` emits a DRI segment and RSTn markers
    every N MCUs (DC prediction reset + byte-aligned marker — the
    error-resilience feature real encoders use on big images), giving
    the decoder's restart path a genuine producer."""
    import struct

    a = np.asarray(gray, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("write_jpeg: need a 2-D greyscale array")
    a = np.clip(np.round(a), 0, 255)
    h, w = a.shape
    q = max(1, min(100, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    qt = np.clip(np.floor((_JPEG_QUANT_LUMA * scale + 50) / 100), 1, 255)

    # pad to 8x8 blocks by edge replication
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.empty((H, W))
    pad[:h, :w] = a
    pad[h:, :w] = a[-1:, :]
    pad[:h, w:] = pad[:h, w - 1 : w]
    pad[h:, w:] = pad[h - 1, w - 1]

    m = _dct_mat()
    dc_tab = _huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_tab = _huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    prev_dc = 0
    # with color=True the chroma blocks are all-zero: DC diff 0 + EOB
    dc0_code = dc_tab[0]
    eob = ac_tab[0x00]
    ri = max(0, int(restart_every))
    mcu = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if ri and mcu and mcu % ri == 0:
                bw.align()
                bw.raw(bytes([0xFF, 0xD0 + (mcu // ri - 1) % 8]))
                prev_dc = 0
            mcu += 1
            blk = pad[by : by + 8, bx : bx + 8] - 128.0
            coef = m @ blk @ m.T
            qz = np.round(coef / qt).astype(np.int64).ravel()[_ZIGZAG]
            diff = int(qz[0]) - prev_dc
            prev_dc = int(qz[0])
            size, code = _magnitude(diff)
            hc, hl = dc_tab[size]
            bw.put(hc, hl)
            if size:
                bw.put(code, size)
            run = 0
            last = 63
            while last > 0 and qz[last] == 0:
                last -= 1
            for i in range(1, last + 1):
                v = int(qz[i])
                if v == 0:
                    run += 1
                    if run == 16:
                        hc, hl = ac_tab[0xF0]  # ZRL
                        bw.put(hc, hl)
                        run = 0
                    continue
                size, code = _magnitude(v)
                hc, hl = ac_tab[(run << 4) | size]
                bw.put(hc, hl)
                bw.put(code, size)
                run = 0
            if last < 63:
                bw.put(*eob)
            if color:
                for _ in range(2):  # Cb, Cr: zero block each
                    bw.put(*dc0_code)
                    bw.put(*eob)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_qt = bytes(int(qt.ravel()[_ZIGZAG][i]) for i in range(64))
    out = [b"\xFF\xD8"]  # SOI
    out.append(seg(0xFFDB, b"\x00" + zz_qt))  # DQT, table 0, 8-bit
    if ri:
        out.append(seg(0xFFDD, struct.pack(">H", ri)))  # DRI
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # h1v1, quant table 0
    out.append(seg(0xFFC0, sof))  # SOF0 baseline
    out.append(seg(0xFFC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS)))
    out.append(seg(0xFFC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS)))
    sos = struct.pack(">B", ncomp)
    for cid in range(1, ncomp + 1):
        sos += struct.pack(">BB", cid, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3F\x00"
    out.append(seg(0xFFDA, sos))
    out.append(scan)
    out.append(b"\xFF\xD9")  # EOI
    return b"".join(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        # trim consumed high bits first: the accumulator otherwise keeps
        # every byte ever read and the left-shifts go quadratic on long
        # scans (r19)
        self.acc &= (1 << self.n) - 1
        while self.n <= 24:
            if self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0xFF  # pad past EOI
                self.n += 8
                continue
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # a real marker (RSTn handled by the caller before
                    # reading on); pad — the scan is over
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        # MSB-first batch read — consumes the identical bit sequence the
        # old per-bit loop did (r19: one fill + one mask instead of k
        # function calls).  _fill tops the buffer up to >= 25 bits, so
        # wider reads recurse in MSB-first halves.
        if k <= 0:
            return 0
        if k > 16:
            hi = self.bits(k - 16)
            return (hi << 16) | self.bits(16)
        if self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def huff(self, table: dict) -> int:
        code, ln = 0, 0
        for _ in range(16):
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def huff_lut(self, lut: list) -> int:
        # table-driven decode: peek 16 bits (padding past scan end the
        # same way _fill pads for bit()), one flat-list probe, consume
        # the matched code's length — canonical-code-identical to the
        # per-bit ``huff`` walk above (r19, guide §4.2)
        if self.n < 16:
            self._fill()
        v = lut[(self.acc >> (self.n - 16)) & 0xFFFF]
        if v == 0:
            raise ValueError("jpeg: invalid Huffman code")
        self.n -= v & 31
        return v >> 5

    def align_and_expect_rst(self, k: int) -> None:
        self.acc = 0
        self.n = 0
        if self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF:
            m = self.d[self.pos + 1]
            if 0xD0 <= m <= 0xD7:
                if (m - 0xD0) != k % 8:
                    raise ValueError("jpeg: restart marker out of sequence")
                self.pos += 2
                return
        raise ValueError("jpeg: expected restart marker")


def _extend(code: int, size: int) -> int:
    if size == 0:
        return 0
    return code if code >= (1 << (size - 1)) else code - (1 << size) + 1


def jpeg_decode_image(payload: bytes) -> np.ndarray:
    """Pure-struct baseline JPEG decoder (ITU-T T.81, stdlib + numpy
    only): marker walk (DQT/DHT/SOF0/DRI/SOS), Huffman entropy decode
    with byte-unstuffing and restart markers, dequantize + orthonormal
    IDCT.  Supports 8-bit baseline sequential, greyscale or
    YCbCr — LUMA ONLY on colour images: chroma blocks are entropy-
    decoded (the stream cannot be advanced otherwise) but skip the
    IDCT, and the returned array is the full-resolution Y plane, which
    is exactly what the pHash/feature operators consume.  Progressive
    (SOF2), arithmetic coding, and 12-bit inputs raise with a pointer
    at Pillow.

    Honesty note on speed: the Huffman bit reader is a Python loop —
    correct and library-free, not fast; for throughput-critical real
    corpora plug Pillow in through the same ``decoder=`` seam."""
    import struct

    buf = bytes(payload)
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: bad SOI")
    try:
        return _jpeg_decode(buf)
    except (IndexError, KeyError, StopIteration, struct.error) as e:
        # short reads / mangled component ids inside a truncated or
        # corrupt stream surface as container errors, not raw index
        # faults or StopIteration (fuzz findings)
        raise ValueError(f"jpeg: truncated or corrupt stream ({e})") from e


def _jpeg_decode(buf: bytes) -> np.ndarray:
    import struct

    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
            pos += 2  # standalone markers / fill bytes carry no length
            continue
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, o).astype(np.float64)
                    o += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, o).astype(np.float64)
                    o += 128
                full = np.empty(64)
                full[_ZIGZAG] = tbl
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                o += 17 + nv
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_lut(
                    bits, vals
                )
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit baseline (use Pillow)")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq_))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: non-baseline frame (use Pillow)")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = struct.unpack_from(">BB", body, 1 + 2 * i)
                sel.append((cs, tt >> 4, tt & 0x0F))
            h, w, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            m = _dct_mat()
            # luma = component with the max sampling factors (or the
            # only one); its plane is emitted
            luma_idx = next(
                i for i, c in enumerate(comps) if c[1] == hmax and c[2] == vmax
            )
            ly, lx = comps[luma_idx][2], comps[luma_idx][1]
            plane = np.zeros((mcuy * ly * 8, mcux * lx * 8))
            br = _BitReader(buf[pos:])
            prev = [0] * len(comps)
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and mcu_count and mcu_count % restart == 0:
                        br.align_and_expect_rst(mcu_count // restart - 1)
                        prev = [0] * len(comps)
                    for ci, (cid, ch, cv, ctq) in enumerate(comps):
                        _, tdc, tac = next(s for s in sel if s[0] == cid)
                        for v in range(cv):
                            for u in range(ch):
                                size = br.huff_lut(huff_dc[tdc])
                                diff = _extend(br.bits(size), size)
                                prev[ci] += diff
                                zz = np.zeros(64)
                                zz[0] = prev[ci]
                                k = 1
                                while k < 64:
                                    rs = br.huff_lut(huff_ac[tac])
                                    if rs == 0x00:  # EOB
                                        break
                                    if rs == 0xF0:  # ZRL
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    if k > 63:
                                        raise ValueError("jpeg: AC overrun")
                                    zz[k] = _extend(br.bits(rs & 0x0F), rs & 0x0F)
                                    k += 1
                                if ci != luma_idx:
                                    continue  # chroma: advance only
                                coef = np.empty(64)
                                coef[_ZIGZAG] = zz
                                blk = (
                                    m.T @ (coef.reshape(8, 8) * qt[ctq]) @ m
                                ) + 128.0
                                y0 = (my * cv + v) * 8
                                x0 = (mx * ch + u) * 8
                                plane[y0 : y0 + 8, x0 : x0 + 8] = blk
                    mcu_count += 1
            return np.clip(plane[:h, :w], 0, 255)
        # APPn / COM / others: skipped via the generic length walk
    raise ValueError("jpeg: no scan data")


# ---------------------------------------------------------------------------
# FLAC (r12) — pure-struct, stdlib-only, per the public xiph.org spec
# ---------------------------------------------------------------------------
# The audio family's third real container (after RIFF/WAVE PCM and the
# MP4 demuxer): a genuine fLaC stream — STREAMINFO metadata block,
# CRC-8-guarded frame headers, UTF-8-coded frame numbers, CRC-16 frame
# footers — carrying CONSTANT and VERBATIM subframes.  That subset is
# lossless PCM in real FLAC framing, so documents round-trip bit-exactly
# through a container every audio tool can also read, with no codec
# dependencies.  Predicted subframes (FIXED/LPC: rice residuals) raise
# with a pointer at the soundfile-gated decoder — the same documented
# subset policy as wav_decode_audio's compressed-format raise.


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc16_slice_tables() -> list[list[int]]:
    """Slice-by-4 companion tables: ``Tk`` advances ``T(k-1)``'s value
    by one zero byte, so four input bytes fold into four independent
    lookups per iteration (r19 — the per-byte loop was 90 % of FLAC
    decode time at suite scale; bit-exactness pinned by the fuzz
    differential in tests)."""
    t0 = _CRC16_TABLE
    tables = [t0]
    for _ in range(3):
        prev = tables[-1]
        tables.append(
            [t0[v >> 8] ^ ((v << 8) & 0xFFFF) for v in prev]
        )
    return tables


_CRC16_T0, _CRC16_T1, _CRC16_T2, _CRC16_T3 = _crc16_slice_tables()


def _crc8_flac(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame headers."""
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16_flac(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — FLAC frame footers.  Slice-by-4:
    identical value to the canonical per-byte table walk, one quarter
    the loop iterations."""
    crc = 0
    n4 = len(data) & ~3
    t0, t1, t2, t3 = _CRC16_T0, _CRC16_T1, _CRC16_T2, _CRC16_T3
    for i in range(0, n4, 4):
        crc = (
            t3[data[i] ^ (crc >> 8)]
            ^ t2[data[i + 1] ^ (crc & 0xFF)]
            ^ t1[data[i + 2]]
            ^ t0[data[i + 3]]
        )
    for i in range(n4, len(data)):
        crc = _CRC16_TABLE[((crc >> 8) ^ data[i]) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _FlacBitW:
    """MSB-first bit packer (no byte stuffing — FLAC is plain)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _FlacBitR:
    """MSB-first bit reader over a byte window."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated frame")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        out = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def align(self) -> None:
        self.acc = 0
        self.n = 0


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    lead = (0xFF00 >> nbytes) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    return bytes(reversed(out))


def _utf8_decode(r: "_FlacBitR") -> int:
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.bits(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def write_flac(
    wave: "np.ndarray", sample_rate: int = 16000, block_size: int = 4096
) -> bytes:
    """Mono 16-bit FLAC writer (r12) — the structural inverse of
    :func:`flac_decode_audio`: real fLaC framing with CONSTANT
    subframes for flat blocks and VERBATIM subframes otherwise
    (lossless; values of the form k/32768 round-trip bit-exactly,
    like :func:`write_wav`).

    ``block_size`` must be ≥ 16: the FLAC spec forbids a STREAMINFO
    min/max blocksize below 16 (r12 advice — sub-16 streams round-trip
    through our own decoder but external decoders may reject them).  A
    FINAL frame shorter than 16 samples is legal and still written."""
    import struct

    if block_size < 16:
        raise ValueError(
            f"write_flac: block_size must be >= 16 (FLAC spec minimum "
            f"for STREAMINFO blocksize), got {block_size}"
        )
    w = np.asarray(wave, dtype=np.float64)
    pcm = np.clip(np.round(w * 32768.0), -32768, 32767).astype(np.int64)
    n_total = len(pcm)
    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata flag set, type 0, length 34
    out += struct.pack(">BBH", 0x80, 0, 34)[:1] + b"\x00" + struct.pack(">H", 34)[0:2]
    si = _FlacBitW()
    si.put(block_size, 16)  # min blocksize
    si.put(block_size, 16)  # max blocksize
    si.put(0, 24)  # min framesize unknown
    si.put(0, 24)  # max framesize unknown
    si.put(sample_rate, 20)
    si.put(0, 3)  # channels - 1
    si.put(15, 5)  # bits per sample - 1
    si.put(n_total, 36)
    out += si.bytes() + b"\x00" * 16  # md5 unset (legal: all zero)
    # an empty wave is a legal stream: fLaC + STREAMINFO(total=0), no frames
    for fi in range((n_total + block_size - 1) // block_size):
        blk = pcm[fi * block_size : (fi + 1) * block_size]
        hdr = _FlacBitW()
        hdr.put(0b11111111111110, 14)  # sync
        hdr.put(0, 1)  # reserved
        hdr.put(0, 1)  # fixed blocking: coded number = frame index
        hdr.put(0b0111, 4)  # blocksize: 16-bit value - 1 at header end
        hdr.put(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.put(0b0000, 4)  # channel assignment: mono
        hdr.put(0b100, 3)  # sample size: 16 bits
        hdr.put(0, 1)  # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_code(fi) + struct.pack(">H", len(blk) - 1)
        head += bytes([_crc8_flac(head)])
        # the frame header is byte-aligned after its CRC-8 and the
        # subframe header is exactly 8 bits, so 16-bit sample payloads
        # are byte-aligned too — one numpy big-endian pack, no bit loop
        if len(blk) and (blk == blk[0]).all():
            body = b"\x00" + struct.pack(">h", int(blk[0]))  # CONSTANT
        else:
            body = b"\x02" + blk.astype(">i2").tobytes()  # VERBATIM
        frame = head + body
        frame += struct.pack(">H", _crc16_flac(frame))
        out += frame
    return bytes(out)


_FLAC_BLOCKSIZES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}


def flac_decode_audio(payload: bytes) -> np.ndarray:
    """Pure-struct FLAC decoder (r12) for the CONSTANT/VERBATIM
    subframe subset :func:`write_flac` emits — real fLaC container
    walking: metadata blocks, CRC-8-validated frame headers,
    UTF-8-coded frame numbers, CRC-16 frame footers.  Mono 16-bit;
    predicted subframes (FIXED/LPC) and multi-channel streams raise
    with a pointer at the soundfile-gated decoder, the same subset
    policy as :func:`wav_decode_audio`'s compressed-format raise."""
    import struct

    buf = bytes(payload)
    if buf[:4] != b"fLaC":
        raise ValueError("flac: not a fLaC stream")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            streaminfo = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("flac: missing STREAMINFO")
    r = _FlacBitR(streaminfo, 10)
    sr = r.bits(20)
    channels = r.bits(3) + 1
    bps = r.bits(5) + 1
    n_total = r.bits(36)
    if channels != 1 or bps != 16:
        raise ValueError(
            f"flac: {channels}ch/{bps}bit not in the pure-struct subset — "
            "use soundfile_decode_audio (optional libsndfile)"
        )
    samples: list = []
    n_got = 0
    # n_total == 0 means an empty stream from our writer but "unknown"
    # in the wild — decode frames until the buffer ends either way
    while pos < len(buf) and (n_total == 0 or n_got < n_total):
        frame_start = pos
        r = _FlacBitR(buf, pos)
        if r.bits(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        r.bits(1)  # reserved
        r.bits(1)  # blocking strategy
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        chan = r.bits(4)
        ss_code = r.bits(3)
        r.bits(1)  # reserved
        _utf8_decode(r)
        if bs_code == 0b0110:
            n = r.bits(8) + 1
        elif bs_code == 0b0111:
            n = r.bits(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            n = _FLAC_BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"flac: reserved blocksize code {bs_code}")
        if sr_code == 0b1100:
            r.bits(8)
        elif sr_code in (0b1101, 0b1110):
            r.bits(16)
        if chan != 0:
            raise ValueError("flac: only mono in the pure-struct subset")
        if ss_code != 0b100:
            raise ValueError("flac: only 16-bit in the pure-struct subset")
        hdr_crc = r.bits(8)
        if _crc8_flac(buf[frame_start : r.pos - 1]) != hdr_crc:
            raise ValueError("flac: frame header CRC-8 mismatch")
        if r.bits(1) != 0:
            raise ValueError("flac: bad subframe padding bit")
        stype = r.bits(6)
        if r.bits(1) != 0:
            raise ValueError("flac: wasted bits not in the pure-struct subset")
        n_this = min(n, n_total - n_got) if n_total else n
        if stype == 0b000000:  # CONSTANT
            v = r.bits(16)
            v = v - 65536 if v >= 32768 else v
            samples.append(np.full(n_this, v, dtype=np.int64))
        elif stype == 0b000001:  # VERBATIM
            # byte-aligned by the same argument as the writer
            assert r.n == 0
            end = r.pos + 2 * n
            if end > len(buf):
                raise ValueError("flac: truncated frame")
            blk = np.frombuffer(buf, dtype=">i2", count=n, offset=r.pos)
            samples.append(blk[:n_this].astype(np.int64))
            r.pos = end
        else:
            raise ValueError(
                "flac: FIXED/LPC subframes not in the pure-struct subset — "
                "use soundfile_decode_audio (optional libsndfile)"
            )
        n_got += n_this
        r.align()
        if r.pos + 2 > len(buf):
            raise ValueError("flac: truncated frame footer")
        crc = struct.unpack_from(">H", buf, r.pos)[0]
        if _crc16_flac(buf[frame_start : r.pos]) != crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.pos + 2
    if not samples:
        return np.zeros(0, dtype=np.float64)
    return np.concatenate(samples).astype(np.float64) / 32768.0
