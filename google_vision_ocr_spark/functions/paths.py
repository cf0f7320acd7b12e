"""T7/T9: path normalization and user-input parsing utilities.

- :func:`normalize_path` — the reference normalizes user/illustration
  paths with ``os.path.normpath`` before membership checks
  (``epub_processor.py:30,61,155``); here both a driver-side function
  and a column expression, so the F3 semi-join key is canonical on both
  sides.
- :func:`parse_illustration_pages` — ``"1,5,10"`` → ``[1, 5, 10]``,
  digits only, as the GUI does (``main_gui.py:264-270``).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_path(path: str) -> str:
    return os.path.normpath(path)


def normalize_path_col(col: str | Column) -> Column:
    """Column twin of :func:`normalize_path` for URL-style paths:
    collapse ``//`` runs (not after a scheme), resolve ``/./`` and
    trailing ``/.``, drop trailing slashes."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?<!:)/{2,}", "/")
    c = F.regexp_replace(c, r"/\./", "/")
    c = F.regexp_replace(c, r"/\.$", "")
    c = F.regexp_replace(c, r"(.)/$", "$1")
    return c


def parse_illustration_pages(raw: str | None) -> list[int]:
    """``"1, 5,10x,,7"`` → ``[1, 5, 7]`` (digit-only entries, as
    ``main_gui.py:264-270``); deduplicated, sorted."""
    if not raw:
        return []
    out = {int(tok) for tok in re.split(r"[,\s]+", raw.strip()) if tok.isdigit()}
    return sorted(out)
