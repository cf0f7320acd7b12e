"""S4/S5: per-document ``.txt`` sinks — the reference's file artifacts.

Reference: ``ocr_service.py:109-123`` writes one UTF-8 ``.txt`` per PDF
(framed pages); ``ocr_service.py:184-190`` one raw ``.txt`` per image,
named stem+``.txt``.  At scale the engine's real sink is the
``(url, text, spans)`` table; this writer exists for artifact-level
parity — it materializes per-document files from the output frame via
``foreachPartition`` (each executor writes its partition's documents;
no driver collect).

Note: the reference artifact in ``result/MergedTest.pdf.txt`` carries
CRLF newlines because the original script ran on Windows (text-mode
``'w'`` translates ``\\n``); the canonical bytes — what
``text_file.write`` received — use ``\\n``, which is what this sink
writes on POSIX exactly like the reference would.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

_SAFE = re.compile(r"[^A-Za-z0-9._-]+")


def _file_name_for(url: str) -> str:
    base = url.rstrip("/").rsplit("/", 1)[-1] or "doc"
    return _SAFE.sub("_", base) + ".txt"


def write_txt_per_document(df: DataFrame, output_dir: str,
                           url_col: str = "url", text_col: str = "text") -> None:
    """One UTF-8 ``.txt`` per row of ``df`` under ``output_dir``."""
    os.makedirs(output_dir, exist_ok=True)

    def write_partition(rows) -> None:
        for row in rows:
            path = os.path.join(output_dir, _file_name_for(row[url_col]))
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:  # ocr_service.py:111
                f.write(row[text_col])
            os.replace(tmp, path)  # idempotent overwrite

    df.select(url_col, text_col).foreachPartition(write_partition)
