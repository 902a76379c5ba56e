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
