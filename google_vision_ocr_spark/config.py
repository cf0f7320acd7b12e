"""S9: job configuration — the reference's JSON config, Spark-shaped.

Reference: ``config_manager.py:27-48`` loads ``config.json``, merges
with defaults (``config_manager.py:7-14``), auto-creates when missing.
In a Spark job the equivalents are (in precedence order) explicit
kwargs > ``spark.conf`` (``spark.gvos.*`` keys, settable via
``spark-submit --conf``) > environment > defaults.  The dataclass
ships to executors via ``--py-files`` with the rest of the package.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, fields

_DEFAULTS = {  # mirrors config_manager.py:7-14 where meaningful here
    "recognizer": "stub",
    "default_epub_language": "jp",   # config.json:4
    "max_ocr_workers": 4,            # config.json:5 (honored here, unlike ocr_service.py:112)
    "rate_limit_qps": 0.0,           # 0 = unlimited
    "max_retries": 3,
    "backoff_base_s": 0.05,
    "salt_partitions": 0,            # 0 = no input salt
    "page_level_salt": False,
    "otsu": False,
    "deskew": False,
    "dpi_normalize": False,
}


@dataclass
class ExtractConfig:
    recognizer: str = "stub"
    default_epub_language: str = "jp"
    max_ocr_workers: int = 4
    rate_limit_qps: float = 0.0
    max_retries: int = 3
    backoff_base_s: float = 0.05
    salt_partitions: int = 0
    page_level_salt: bool = False
    otsu: bool = False
    deskew: bool = False
    dpi_normalize: bool = False

    @classmethod
    def load(cls, spark=None, json_path: str | None = None, **overrides) -> "ExtractConfig":
        """defaults ← json file ← spark.conf (spark.gvos.*) ← env
        (GVOS_*) ← explicit overrides."""
        merged = dict(_DEFAULTS)
        if json_path and os.path.exists(json_path):
            with open(json_path) as f:
                merged.update({k: v for k, v in json.load(f).items() if k in merged})
        field_types = {f.name: f.type for f in fields(cls)}
        if spark is not None:
            for k in merged:
                v = spark.conf.get(f"spark.gvos.{k}", None)
                if v is not None:
                    merged[k] = _coerce(v, merged[k])
        for k in merged:
            v = os.environ.get(f"GVOS_{k.upper()}")
            if v is not None:
                merged[k] = _coerce(v, merged[k])
        merged.update({k: v for k, v in overrides.items() if k in field_types})
        return cls(**merged)

    def extract_kwargs(self) -> dict:
        """kwargs for ``plans.fused.extract_fused``."""
        return {
            "recognizer": self.recognizer,
            "rate_limit_qps": self.rate_limit_qps or None,
            "max_retries": self.max_retries,
            "backoff_base_s": self.backoff_base_s,
            "salt_partitions": self.salt_partitions or None,
            "page_level_salt": self.page_level_salt,
            "otsu": self.otsu,
            "do_deskew": self.deskew,
            "dpi": self.dpi_normalize,
        }

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


def _coerce(value: str, default):
    if isinstance(default, bool):
        return str(value).lower() in ("1", "true", "yes")
    if isinstance(default, int):
        return int(value)
    if isinstance(default, float):
        return float(value)
    return value
