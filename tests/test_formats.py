"""Codec round-trips and the grayscale-luma contract (M0)."""

import numpy as np
import pytest

from google_vision_ocr_spark import formats


def test_spdf_roundtrip():
    texts = ["page one", "página dos\nwith newline", "第三页 テキスト", ""]
    assert formats.decode_spdf(formats.encode_spdf(texts)) == texts


def test_render_read_roundtrip():
    text = "hello wörld 한국어 текст"
    rgb = formats.render_page_rgb(text)
    assert rgb.ndim == 3 and rgb.shape[2] == 3
    gray = formats.rgb_to_gray(rgb)
    assert formats.read_text_from_gray(gray) == text


def test_gray_preserves_gray_pixels_exactly():
    # cv2 fixed-point luma must be identity on R=G=B pixels
    v = np.arange(256, dtype=np.uint8)
    rgb = np.stack([v, v, v], axis=-1).reshape(16, 16, 3)
    assert np.array_equal(formats.rgb_to_gray(rgb), rgb[..., 0])


def test_gray_changes_colored_pixels():
    rgb = formats.render_page_rgb("x")
    gray = formats.rgb_to_gray(rgb)
    # filler region is colored; R channel alone differs from luma somewhere
    assert not np.array_equal(gray, rgb[..., 0])


def test_png_roundtrip_gray_and_rgb():
    gray = formats.rgb_to_gray(formats.render_page_rgb("png test"))
    ct, decoded = formats.decode_png(formats.encode_png(gray))
    assert ct == 0 and np.array_equal(decoded, gray)
    rgb = formats.render_page_rgb("rgb test")
    ct, decoded = formats.decode_png(formats.encode_png(rgb))
    assert ct == 2 and np.array_equal(decoded, rgb)


def test_bmp_gif_roundtrip():
    gray = formats.rgb_to_gray(formats.render_page_rgb("bmp/gif"))
    assert np.array_equal(formats.decode_bmp_gray(formats.encode_bmp_gray(gray)), gray)
    assert np.array_equal(formats.decode_gif_gray(formats.encode_gif_gray(gray)), gray)


def test_simg_roundtrip():
    rgb = formats.render_page_rgb("simg")
    assert np.array_equal(formats.decode_simg(formats.encode_simg(rgb)), rgb)
    gray = formats.rgb_to_gray(rgb)
    assert np.array_equal(formats.decode_simg(formats.encode_simg(gray)), gray)


def test_sniff_format():
    gray = formats.rgb_to_gray(formats.render_page_rgb("s"))
    assert formats.sniff_format(formats.encode_spdf(["a"])) == "SPDF"
    assert formats.sniff_format(formats.encode_png(gray)) == "PNG"
    assert formats.sniff_format(formats.encode_bmp_gray(gray)) == "BMP"
    assert formats.sniff_format(formats.encode_gif_gray(gray)) == "GIF"
    assert formats.sniff_format(b"<!DOCTYPE html><p>x</p>") == "HTML"
    assert formats.sniff_format(None) == "none"


def test_decode_spdf_rejects_garbage():
    with pytest.raises(ValueError):
        formats.decode_spdf(b"not a pdf")


def test_jpeg_tiff_roundtrip():
    gray = formats.rgb_to_gray(formats.render_page_rgb("jpeg/tiff payload"))
    assert np.array_equal(formats.decode_jpeg_gray(formats.encode_jpeg_gray(gray)), gray)
    assert np.array_equal(formats.decode_tiff_gray(formats.encode_tiff_gray(gray)), gray)


def test_sniff_jpeg_tiff_magics():
    gray = formats.rgb_to_gray(formats.render_page_rgb("s"))
    assert formats.sniff_format(formats.encode_jpeg_gray(gray)) == "JPEG"
    assert formats.sniff_format(formats.encode_tiff_gray(gray)) == "TIFF"
    # big-endian TIFF magic is sniffed too (we only emit little-endian)
    assert formats.sniff_format(b"MM\x00*" + b"\x00" * 8) == "TIFF"
    # a real libjpeg-produced file starts FF D8 FF E0/E1/DB...; any third
    # byte after FF D8 FF sniffs as JPEG
    assert formats.sniff_format(b"\xff\xd8\xff\xdb" + b"\x00" * 8) == "JPEG"


def test_keep_format_passes_jpeg_tiff_bytes_through_unchanged():
    """ocr_service.py:177 keeps {PNG,JPEG,BMP,TIFF} as-is — byte identity."""
    from google_vision_ocr_spark import oracle

    gray = formats.rgb_to_gray(formats.render_page_rgb("keep me"))
    for enc in (formats.encode_jpeg_gray, formats.encode_tiff_gray):
        payload = enc(gray)
        assert oracle.normalize_image_payload(payload) == payload


def test_recognizer_reads_jpeg_tiff():
    from google_vision_ocr_spark.recognizers import StubRecognizer

    gray = formats.rgb_to_gray(formats.render_page_rgb("hello jpeg"))
    r = StubRecognizer()
    assert r.recognize(formats.encode_jpeg_gray(gray)) == "hello jpeg"
    assert r.recognize(formats.encode_tiff_gray(gray)) == "hello jpeg"


def test_jpeg_tiff_dimension_headers():
    import struct

    gray = formats.rgb_to_gray(formats.render_page_rgb("dims"))
    h, w = gray.shape
    assert formats.jpeg_dimensions(formats.encode_jpeg_gray(gray)) == (w, h, 1)
    assert formats.tiff_dimensions(formats.encode_tiff_gray(gray)) == (w, h, 1)
    # a libjpeg-style stream: SOI, APP0, DQT, SOF0(3 components), SOS
    real = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
        + b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 480, 640, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        + b"\xff\xda" + struct.pack(">H", 12) + bytes(10)
    )
    assert formats.sniff_format(real) == "JPEG"
    assert formats.jpeg_dimensions(real) == (640, 480, 3)


def test_tiff_tags_reject_array_valued_entries():
    """A multi-strip TIFF stores an OFFSET in StripOffsets' value field;
    reading it as an inline scalar would hand decode_tiff_gray a garbage
    pixel pointer.  count != 1 must raise, not misread."""
    import struct
    import numpy as np
    import pytest
    from google_vision_ocr_spark import formats

    base = formats.encode_tiff_gray(np.zeros((4, 4), dtype=np.uint8))
    # rewrite the StripOffsets entry (tag 273) to claim count=2
    (ifd_off,) = struct.unpack_from("<I", base, 4)
    (n,) = struct.unpack_from("<H", base, ifd_off)
    buf = bytearray(base)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from("<HHI", buf, off)
        if tag == 273:
            struct.pack_into("<HHI", buf, off, tag, typ, 2)
    with pytest.raises(ValueError, match="count 2"):
        formats.tiff_dimensions(bytes(buf))
