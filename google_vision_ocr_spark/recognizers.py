"""Pluggable text-recognition engines.

The reference calls Google Cloud Vision ``text_detection`` per image
(``ocr_service.py:18-47``: client at :30, call at :33, extraction of
``texts[0].description`` at :36-41, empty string when nothing detected).
Here recognition is a protocol — ``batch(images) -> texts`` — with two
implementations:

- :class:`StubRecognizer` — deterministic decoder of the synthetic page
  payloads (``formats.py``).  It *requires* 8-bit grayscale input
  (PNG or BMP), which pins the preprocessing chain: a pipeline that
  skips grayscale conversion (``ocr_service.py:84``) or skips GIF→PNG
  normalization (``ocr_service.py:177``) feeds the recognizer RGB/GIF
  bytes and gets an error, which byte-identity tests then surface.
- :class:`GoogleVisionRecognizer` — the real client, gated behind an
  import-try; never exercised in this sandbox.

Both are picklable so executors can construct them cheaply.
"""

from __future__ import annotations

from . import formats


class RecognitionError(ValueError):
    """Raised when a payload cannot be recognized (bad format/corrupt)."""


class StubRecognizer:
    """Deterministic recognizer over synthetic grayscale page images."""

    def recognize(self, payload: bytes) -> str:
        fmt = formats.sniff_format(payload)
        if fmt == "PNG":
            color_type, arr = formats.decode_png(payload)
            if color_type != 0:
                raise RecognitionError("recognizer requires grayscale input, got RGB PNG")
            return formats.read_text_from_gray(arr)
        if fmt == "BMP":
            return formats.read_text_from_gray(formats.decode_bmp_gray(payload))
        # JPEG/TIFF arrive untouched via the keep-format rule
        # (ocr_service.py:177); the Vision client accepts them natively,
        # so the stub does too.
        if fmt == "JPEG":
            return formats.read_text_from_gray(formats.decode_jpeg_gray(payload))
        if fmt == "TIFF":
            return formats.read_text_from_gray(formats.decode_tiff_gray(payload))
        raise RecognitionError(f"unsupported recognizer input format: {fmt}")

    def batch(self, payloads: list[bytes]) -> list[str]:
        return [self.recognize(p) for p in payloads]


class GoogleVisionRecognizer:  # pragma: no cover - needs network + creds
    """Real Google Cloud Vision client (reference ``ocr_service.py:18-47``)."""

    def __init__(self) -> None:
        try:
            from google.cloud import vision  # type: ignore
        except ImportError as e:
            raise RuntimeError("google-cloud-vision is not installed in this environment") from e
        self._vision = vision
        self._client = None

    def recognize(self, payload: bytes) -> str:
        if self._client is None:
            self._client = self._vision.ImageAnnotatorClient()
        image = self._vision.Image(content=payload)
        response = self._client.text_detection(image=image)
        texts = response.text_annotations
        return texts[0].description if texts else ""

    def batch(self, payloads: list[bytes]) -> list[str]:
        return [self.recognize(p) for p in payloads]


class FlakyStubRecognizer(StubRecognizer):
    """Test double: the first attempt on each distinct payload raises a
    *retryable* error (plain RuntimeError, not RecognitionError), the
    retry succeeds — exercises the backoff path deterministically."""

    def __init__(self) -> None:
        self._seen: set[int] = set()

    def recognize(self, payload: bytes) -> str:
        key = hash(bytes(payload[:64]))
        if key not in self._seen:
            self._seen.add(key)
            raise RuntimeError("transient recognition failure (injected)")
        return super().recognize(payload)


def get_recognizer(name: str = "stub"):
    if name == "stub":
        return StubRecognizer()
    if name == "flaky-stub":
        return FlakyStubRecognizer()
    if name == "google-vision":
        return GoogleVisionRecognizer()
    raise ValueError(f"unknown recognizer: {name}")
