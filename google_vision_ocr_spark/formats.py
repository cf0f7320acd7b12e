"""Synthetic payload codecs for the extraction engine.

The container has no PDF/image libraries (no poppler, PIL, cv2), so the
pipeline's payloads are deterministic synthetic stand-ins with the same
*shape* as the reference's inputs:

- ``SPDF``  — a multi-page "PDF" container (magic ``%SPDF``) holding one
  UTF-8 text record per page.  The rasterizer decodes it page-by-page
  into RGB rasters, mirroring ``pdf2image.convert_from_path``
  (reference: ``epub_processor.py:41-51``, ``ocr_service.py:106``).
- ``SIMG``  — a raw in-flight raster (magic ``SIMG``): channels, width,
  height, row-major pixel bytes.  Plays the role of the PIL image object
  carried inside reference rows (``dtos.py:5-13``).
- ``PNG``   — real 8-bit grayscale / RGB PNG, encoded and decoded with
  numpy + stdlib zlib.  This is the wire format handed to the
  recognizer, mirroring ``ocr_service.py:83-86`` (PNG re-encode before
  the Vision call).
- ``BMP``   — real 8-bit grayscale BMP (palette), one of the formats the
  reference keeps as-is (``ocr_service.py:177-179``).
- ``GIF``   — a GIF-magic stub the recognizer rejects, so the
  format-normalization rule (keep {PNG,JPEG,BMP,TIFF} else re-encode to
  PNG, ``ocr_service.py:177``) is pinned by tests.
- ``TIFF``  — a *real* baseline TIFF (little-endian, 8-bit gray,
  Compression=1, single strip): one of the reference's keep-as-is
  formats (``ocr_service.py:177``) and accepted by its extension filter
  (``ocr_service.py:144-147``).  Fully valid — any TIFF reader opens it.
- ``JPEG``  — a JFIF-framed stand-in (real SOI/APP0/COM/EOI segment
  structure; the gray raster rides in COM segments because the container
  has no libjpeg for entropy coding).  Sniffs as JPEG by magic
  (``\\xFF\\xD8\\xFF``) and passes through the keep-format rule
  unchanged, exactly as the reference hands JPEG bytes to the Vision
  client untouched.

Everything here is pure numpy + stdlib and fully deterministic; the
pure-Python oracle (``oracle.py``) and the Spark pipeline share these
codecs so byte-identity tests exercise the *pipeline*, not the codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SPDF_MAGIC = b"%SPDF"
SIMG_MAGIC = b"SIMG"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"
GIF_MAGIC = b"GIF87a"
JPEG_MAGIC = b"\xff\xd8\xff"
TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

PAGE_WIDTH = 64  # raster width of synthetic pages

# ---------------------------------------------------------------------------
# SPDF multi-page container
# ---------------------------------------------------------------------------


def encode_spdf(page_texts: list[str]) -> bytes:
    """Pack page texts into a ``%SPDF`` container."""
    out = [SPDF_MAGIC, struct.pack("<I", len(page_texts))]
    for text in page_texts:
        data = text.encode("utf-8")
        out.append(struct.pack("<I", len(data)))
        out.append(data)
    return b"".join(out)


def decode_spdf(payload: bytes) -> list[str]:
    """Unpack a ``%SPDF`` container into its page texts."""
    if payload[: len(SPDF_MAGIC)] != SPDF_MAGIC:
        raise ValueError("not an SPDF payload")
    (n_pages,) = struct.unpack_from("<I", payload, len(SPDF_MAGIC))
    off = len(SPDF_MAGIC) + 4
    texts = []
    for _ in range(n_pages):
        (n,) = struct.unpack_from("<I", payload, off)
        off += 4
        texts.append(payload[off : off + n].decode("utf-8"))
        off += n
    return texts


def is_spdf(payload: bytes | None) -> bool:
    return payload is not None and payload[: len(SPDF_MAGIC)] == SPDF_MAGIC


# ---------------------------------------------------------------------------
# Page rasterization (the pdf2image stand-in)
# ---------------------------------------------------------------------------


def render_page_rgb(text: str) -> np.ndarray:
    """Render one page's text into an RGB raster (H, W, 3).

    The text bytes ride in the leading pixels as *gray* values
    (R=G=B=byte), prefixed by a little-endian u32 length; the remainder
    of the raster is a deterministic *colored* pattern.  Gray pixels
    survive RGB→gray conversion exactly (see :func:`rgb_to_gray`), while
    the colored filler genuinely changes — so a recognizer that demands
    grayscale input pins the preprocessing chain's presence and order
    (reference chain: ``ocr_service.py:83-86``).
    """
    data = text.encode("utf-8")
    header = struct.pack("<I", len(data))
    payload = np.frombuffer(header + data, dtype=np.uint8)
    total = payload.size
    h = max(8, -(-total // PAGE_WIDTH))
    n_px = h * PAGE_WIDTH
    idx = np.arange(n_px, dtype=np.uint32)
    rgb = np.empty((n_px, 3), dtype=np.uint8)
    rgb[:, 0] = (idx * 7 + 31) % 256
    rgb[:, 1] = (idx * 13 + 59) % 256
    rgb[:, 2] = (idx * 3 + 97) % 256
    rgb[:total, 0] = payload
    rgb[:total, 1] = payload
    rgb[:total, 2] = payload
    return rgb.reshape(h, PAGE_WIDTH, 3)


def read_text_from_gray(gray: np.ndarray) -> str:
    """Inverse of :func:`render_page_rgb` after grayscale conversion."""
    flat = gray.reshape(-1)
    (n,) = struct.unpack("<I", flat[:4].tobytes())
    if n > flat.size - 4:
        raise ValueError("corrupt page raster: length exceeds raster size")
    return flat[4 : 4 + n].tobytes().decode("utf-8")


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma with OpenCV's fixed-point arithmetic.

    Matches ``cv2.cvtColor(x, cv2.COLOR_RGB2GRAY)`` bit-for-bit
    (reference preprocessing: ``ocr_service.py:61-63``):
    ``Y = (R*4899 + G*9617 + B*1868 + 8192) >> 14``.  For gray pixels
    (R=G=B=v) this yields exactly ``v``.
    """
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


# ---------------------------------------------------------------------------
# SIMG raw raster container (in-flight between stages)
# ---------------------------------------------------------------------------


def encode_simg(arr: np.ndarray) -> bytes:
    """Pack an (H, W) gray or (H, W, 3) RGB uint8 array."""
    if arr.ndim == 2:
        ch, (h, w) = 1, arr.shape
    else:
        h, w, ch = arr.shape
    return SIMG_MAGIC + struct.pack("<BHH", ch, w, h) + arr.tobytes()


def decode_simg(payload: bytes) -> np.ndarray:
    if payload[:4] != SIMG_MAGIC:
        raise ValueError("not a SIMG payload")
    ch, w, h = struct.unpack_from("<BHH", payload, 4)
    arr = np.frombuffer(payload, dtype=np.uint8, offset=9)
    return arr.reshape((h, w) if ch == 1 else (h, w, ch))


# ---------------------------------------------------------------------------
# PNG (real format; numpy + zlib)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 as a real PNG.

    Filter type 0 on every scanline; zlib level fixed for determinism.
    """
    if arr.ndim == 2:
        color_type, h, w = 0, arr.shape[0], arr.shape[1]
        rows = arr.reshape(h, w)
    else:
        color_type, (h, w, _) = 2, arr.shape
        rows = arr.reshape(h, w * 3)
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), rows], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PNG produced by :func:`encode_png`.

    Returns ``(color_type, array)`` — array is (H, W) for gray,
    (H, W, 3) for RGB.  Only filter type 0 is supported (all we emit).
    """
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    off = 8
    width = height = color_type = None
    idat = []
    while off < len(payload):
        (length,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            width, height, bitdepth, color_type = struct.unpack_from(">IIBB", data)
            if bitdepth != 8 or color_type not in (0, 2):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    n_ch = 1 if color_type == 0 else 3
    stride = 1 + width * n_ch
    rows = raw.reshape(height, stride)
    if np.any(rows[:, 0] != 0):
        raise ValueError("unsupported PNG filter type")
    pixels = rows[:, 1:]
    if color_type == 0:
        return 0, pixels.copy()
    return 2, pixels.reshape(height, width, 3).copy()


# ---------------------------------------------------------------------------
# BMP (real format; 8-bit gray with palette)
# ---------------------------------------------------------------------------


def encode_bmp_gray(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    row_size = (w + 3) & ~3
    padded = np.zeros((h, row_size), dtype=np.uint8)
    padded[:, :w] = arr
    pixel_data = padded[::-1].tobytes()  # bottom-up
    palette = bytes(bytearray(v for i in range(256) for v in (i, i, i, 0)))
    data_offset = 14 + 40 + len(palette)
    file_size = data_offset + len(pixel_data)
    header = struct.pack("<2sIHHI", BMP_MAGIC, file_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixel_data), 2835, 2835, 256, 0)
    return header + info + palette + pixel_data


def decode_bmp_gray(payload: bytes) -> np.ndarray:
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 8:
        raise ValueError("unsupported BMP bit depth")
    row_size = (w + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, offset=data_offset, count=row_size * h)
    return raw.reshape(h, row_size)[::-1, :w].copy()


# ---------------------------------------------------------------------------
# GIF stub (magic only; recognizer rejects it → must be normalized to PNG)
# ---------------------------------------------------------------------------


def encode_gif_gray(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return GIF_MAGIC + struct.pack("<HH", w, h) + arr.tobytes()


def decode_gif_gray(payload: bytes) -> np.ndarray:
    if payload[:6] != GIF_MAGIC:
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    return np.frombuffer(payload, dtype=np.uint8, offset=10).reshape(h, w).copy()


# ---------------------------------------------------------------------------
# JPEG (JFIF segment structure; gray raster in COM segments — see module doc)
# ---------------------------------------------------------------------------

_JFIF_APP0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
_COM_CHUNK = 60_000  # segment payload cap (length field is u16, ≤65533)


def encode_jpeg_gray(arr: np.ndarray) -> bytes:
    """Pack an (H, W) gray uint8 array into a JFIF-framed JPEG stand-in.

    Includes a genuine SOF0 (baseline, 8-bit, 1 component) segment with
    the true dimensions, so header-level readers — including
    :func:`jpeg_dimensions`, which also works on real libjpeg output —
    see a structurally correct stream.
    """
    h, w = arr.shape
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    simg = encode_simg(arr)
    segs = [b"\xff\xd8", _JFIF_APP0, sof0]
    for off in range(0, len(simg), _COM_CHUNK):
        chunk = simg[off : off + _COM_CHUNK]
        segs.append(b"\xff\xfe" + struct.pack(">H", len(chunk) + 2) + chunk)
    segs.append(b"\xff\xd9")
    return b"".join(segs)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    if payload[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    off = 2
    com: list[bytes] = []
    while off + 2 <= len(payload):
        marker = payload[off : off + 2]
        if marker == b"\xff\xd9":
            break
        (ln,) = struct.unpack_from(">H", payload, off + 2)
        if marker == b"\xff\xfe":
            com.append(payload[off + 4 : off + 2 + ln])
        off += 2 + ln
    arr = decode_simg(b"".join(com))
    if arr.ndim != 2:
        raise ValueError("expected grayscale JPEG stand-in")
    return arr


_SOF_MARKERS = frozenset(
    bytes([m]) for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


def jpeg_dimensions(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from a JPEG's SOF segment.

    Pure header scan — no entropy decode — so it reads *real* JPEG files
    (libjpeg/camera output) as well as this module's stand-ins.
    """
    if payload[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    off = 2
    while off + 4 <= len(payload):
        if payload[off : off + 1] != b"\xff":
            raise ValueError("corrupt JPEG segment stream")
        marker = payload[off + 1 : off + 2]
        if marker == b"\xd9":  # EOI
            break
        if marker == b"\xda":  # SOS: entropy data follows, stop scanning
            break
        (ln,) = struct.unpack_from(">H", payload, off + 2)
        if marker in _SOF_MARKERS:
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, off + 4)
            return w, h, ncomp
        off += 2 + ln
    raise ValueError("no SOF segment found")


# ---------------------------------------------------------------------------
# TIFF (real format; baseline little-endian, 8-bit gray, uncompressed)
# ---------------------------------------------------------------------------


def encode_tiff_gray(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    pixel = arr.tobytes()
    header = TIFF_MAGIC_LE + struct.pack("<I", 8 + len(pixel))  # IFD after pixels

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # type 3 = SHORT, 4 = LONG; LE left-justifies short values in the
        # 4-byte value field, so packing as <I is correct for both
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        entry(256, 3, 1, w),            # ImageWidth
        entry(257, 3, 1, h),            # ImageLength
        entry(258, 3, 1, 8),            # BitsPerSample
        entry(259, 3, 1, 1),            # Compression = none
        entry(262, 3, 1, 1),            # PhotometricInterpretation = BlackIsZero
        entry(273, 4, 1, 8),            # StripOffsets (pixels start at byte 8)
        entry(277, 3, 1, 1),            # SamplesPerPixel
        entry(278, 3, 1, h),            # RowsPerStrip (single strip)
        entry(279, 4, 1, len(pixel)),   # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    return header + pixel + ifd


def _tiff_tags(payload: bytes) -> dict[int, int]:
    """Parse the first IFD's SCALAR tags (endian-aware; real-TIFF layout).

    Only ``count == 1`` entries whose value fits the inline 4-byte field
    are scalars; array-valued tags (multi-strip ``StripOffsets``,
    per-sample ``BitsPerSample``, …) store an offset there instead and
    raise ``ValueError`` rather than being silently misread as inline
    scalars."""
    if payload[:4] == TIFF_MAGIC_LE:
        e = "<"
    elif payload[:4] == TIFF_MAGIC_BE:
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n,) = struct.unpack_from(e + "H", payload, ifd_off)
    # bytes per element for the types we read inline (BYTE/SHORT/LONG)
    type_width = {1: 1, 3: 2, 4: 4}
    tags: dict[int, int] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, base)
        width = type_width.get(typ)
        if width is None:
            continue  # RATIONAL/ASCII/… — not needed by any caller
        if cnt != 1 or width > 4:
            raise ValueError(
                f"TIFF tag {tag} has count {cnt} (type {typ}) — array-valued "
                "tags (multi-strip layout, per-sample bits) are unsupported"
            )
        if typ == 3:
            (val,) = struct.unpack_from(e + "H", payload, base + 8)
        elif typ == 1:
            val = payload[base + 8]
        else:
            (val,) = struct.unpack_from(e + "I", payload, base + 8)
        tags[tag] = val
    return tags


def tiff_dimensions(payload: bytes) -> tuple[int, int, int]:
    """(width, height, samples-per-pixel) from a TIFF's IFD — header-only
    scan for single-IFD, single-strip, scalar-tag TIFFs (multi-strip /
    multi-sample files raise rather than yield garbage)."""
    tags = _tiff_tags(payload)
    return tags[256], tags[257], tags.get(277, 1)


def decode_tiff_gray(payload: bytes) -> np.ndarray:
    tags = _tiff_tags(payload)
    if tags.get(259, 1) != 1 or tags.get(258, 8) != 8 or tags.get(277, 1) != 1:
        raise ValueError("unsupported TIFF variant")
    w, h = tags[256], tags[257]
    arr = np.frombuffer(payload, dtype=np.uint8, offset=tags[273], count=tags[279])
    return arr.reshape(h, w).copy()


def sniff_format(payload: bytes | None) -> str:
    """Detect a payload's container format by magic bytes."""
    if payload is None:
        return "none"
    if payload[:5] == SPDF_MAGIC:
        return "SPDF"
    if payload[:8] == PNG_MAGIC:
        return "PNG"
    if payload[:2] == BMP_MAGIC:
        return "BMP"
    if payload[:6] == GIF_MAGIC:
        return "GIF"
    if payload[:4] == SIMG_MAGIC:
        return "SIMG"
    if payload[:3] == JPEG_MAGIC:
        return "JPEG"
    if payload[:4] in (TIFF_MAGIC_LE, TIFF_MAGIC_BE):
        return "TIFF"
    if payload[:5].lower() in (b"<!doc", b"<html") or payload[:1] == b"<":
        return "HTML"
    return "UNKNOWN"
