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
    if _try_import("PIL") is None:
        raise ValueError(
            "sniff_decode_image: format needs Pillow (pip install pillow) "
            "— only 8-bit non-interlaced PNG decodes library-free"
        )
    return pillow_decode_image(buf)


def sniff_decode_audio(payload: bytes) -> np.ndarray:
    """Magic-byte routing audio decoder (r10): PCM RIFF/WAVE goes
    through the library-free :func:`wav_decode_audio`; compressed WAV
    and every other container need soundfile.  Same no-silent-fake
    policy as :func:`sniff_decode_image`."""
    buf = bytes(payload or b"")
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        try:
            return wav_decode_audio(buf)
        except Exception:
            # same breadth as the image router: struct.error from a
            # short fmt chunk must not bypass an installed soundfile
            if _try_import("soundfile") is None:
                raise
    if _try_import("soundfile") is None:
        raise ValueError(
            "sniff_decode_audio: format needs soundfile (pip install "
            "soundfile) — only PCM WAV decodes library-free"
        )
    return soundfile_decode_audio(buf)
