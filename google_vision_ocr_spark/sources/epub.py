"""S6: EPUB sink — a real EPUB3 container via stdlib ``zipfile``.

Reference: ``epub_processor.py:181-280`` assembles text/image chapters
with ``ebooklib`` and writes one ``.epub``.  Per SURVEY.md §2 S6 the
*grouping* feeding this sink (W1 islands + A2 merged chapters) is the
distributed part; the single-file artifact itself is driver-side.  This
writer takes the collected output of
``operators.assemble.chapter_islands`` for one document and emits a
spec-shaped EPUB: ``mimetype`` (stored, first entry),
``META-INF/container.xml``, package document, nav, one XHTML file per
chapter, embedded images.

No external deps; deterministic output for fixed inputs (fixed
timestamps in the zip entries).
"""

from __future__ import annotations

import zipfile
from html import escape

_CONTAINER_XML = """<?xml version="1.0" encoding="UTF-8"?>
<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
  <rootfiles>
    <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
  </rootfiles>
</container>
"""

_XHTML = """<?xml version="1.0" encoding="utf-8"?>
<!DOCTYPE html>
<html xmlns="http://www.w3.org/1999/xhtml"><head><title>{title}</title></head>
<body>{body}</body></html>
"""

_FIXED_DATE = (2024, 1, 1, 0, 0, 0)


def write_epub(
    path: str,
    title: str,
    author: str,
    language: str,
    chapters: list[dict],
    images: dict[int, bytes] | None = None,
) -> str:
    """``chapters``: rows of ``chapter_islands`` (dicts with kind,
    first_page, n_pages, html), ordered by ``first_page``.
    ``images``: first_page → PNG bytes for image chapters."""
    images = images or {}
    chapters = sorted(chapters, key=lambda c: c["first_page"])
    manifest, spine, files = [], [], []
    for i, ch in enumerate(chapters, start=1):
        cid = f"ch{i:04d}"
        fname = f"{cid}.xhtml"
        if ch["kind"] == "image":
            img_name = f"img{ch['first_page']:05d}.png"
            body = f'<h1>Illustration {ch["first_page"]}</h1>' \
                   f'<img src="{img_name}" alt="page {ch["first_page"]}"/>'
            if ch["first_page"] in images:
                files.append((f"OEBPS/{img_name}", images[ch["first_page"]]))
                manifest.append(
                    f'<item id="i{cid}" href="{img_name}" media-type="image/png"/>'
                )
            chap_title = f"Illustration {ch['first_page']}"
        else:
            body = ch["html"] or ""
            chap_title = f"Page {ch['first_page']}"
        files.append(
            (f"OEBPS/{fname}",
             _XHTML.format(title=escape(chap_title), body=body).encode("utf-8"))
        )
        manifest.append(
            f'<item id="{cid}" href="{fname}" '
            f'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="{cid}"/>')

    nav_lis = "".join(
        f'<li><a href="ch{i:04d}.xhtml">{escape("Chapter " + str(i))}</a></li>'
        for i in range(1, len(chapters) + 1)
    )
    nav = _XHTML.format(
        title="nav",
        body=f'<nav epub:type="toc" xmlns:epub="http://www.idpf.org/2007/ops">'
             f"<ol>{nav_lis}</ol></nav>",
    ).encode("utf-8")
    opf = f"""<?xml version="1.0" encoding="utf-8"?>
<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
  <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
    <dc:identifier id="uid">urn:doc:{escape(title)}</dc:identifier>
    <dc:title>{escape(title)}</dc:title>
    <dc:creator>{escape(author)}</dc:creator>
    <dc:language>{escape(language)}</dc:language>
  </metadata>
  <manifest>
    <item id="nav" href="nav.xhtml" media-type="application/xhtml+xml" properties="nav"/>
    {"".join(manifest)}
  </manifest>
  <spine>{"".join(spine)}</spine>
</package>
""".encode("utf-8")

    with zipfile.ZipFile(path, "w") as z:
        mi = zipfile.ZipInfo("mimetype", date_time=_FIXED_DATE)
        z.writestr(mi, b"application/epub+zip", compress_type=zipfile.ZIP_STORED)
        for name, data in (
            [("META-INF/container.xml", _CONTAINER_XML.encode("utf-8")),
             ("OEBPS/content.opf", opf), ("OEBPS/nav.xhtml", nav)] + files
        ):
            zi = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            z.writestr(zi, data, compress_type=zipfile.ZIP_DEFLATED)
    return path
