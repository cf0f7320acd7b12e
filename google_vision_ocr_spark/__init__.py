"""PySpark-native document-text extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference desktop OCR pipeline (Gotti0/Google-Vision-OCR, surveyed in
SURVEY.md): scan → route → rasterize → preprocess → recognize →
order-restoring framed concatenation, re-expressed as DataFrame plans
with vectorized Arrow stages — plus the dedup / similarity / text
analysis operators a web-scale training-data pipeline needs.
"""

__version__ = "0.1.0"
