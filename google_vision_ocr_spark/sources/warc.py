"""WARC source/sink — the container Common Crawl actually ships.

The north-rule input table is "Common-Crawl-style web pages"; real CC
data arrives as WARC segments (~64k files per crawl, ~1 GB each,
per-record gzip members).  This module turns WARC segments into the
engine's input-table rows ``(url, warc_ts, html, text, lang)``:

- :func:`iter_warc_records` / :func:`encode_warc` — pure-Python WARC/1.0
  record codec (stdlib only; gzip multi-member streams supported).
  The encoder doubles as an archival sink primitive and as the test
  fixture writer.
- :func:`read_warc` — ``binaryFile`` scan + ``mapInArrow`` parse.
  **The unit of parallelism is the WARC file**, matching how CC is
  laid out: one task per segment, no intra-file splitting needed when
  there are 64k segments for at most a few thousand executors.  The
  parse emits Arrow batches incrementally, so one task never holds
  more than a batch of decoded records beyond the raw segment bytes.

Only ``response`` records are emitted (warcinfo/request/metadata
records are skipped, like every CC consumer does).  The HTTP response
envelope is stripped; ``html`` carries the raw body bytes, which is
exactly what the extraction plans' magic-byte routing expects.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

WARC_VERSION = b"WARC/1.0"

INPUT_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress (possibly multi-member, as CC writes one member per
    record) gzip streams; pass plain WARC through."""
    if data[:2] != b"\x1f\x8b":
        return data
    return gzip.decompress(data)  # stdlib handles concatenated members


def iter_warc_records(data: bytes):
    """Yield ``(headers: dict, block: bytes)`` per WARC record."""
    data = _maybe_gunzip(data)
    off = 0
    n = len(data)
    while off < n:
        # tolerate inter-record CRLF padding
        while off < n and data[off : off + 2] == b"\r\n":
            off += 2
        if off >= n:
            break
        if not data.startswith(WARC_VERSION, off):
            raise ValueError(f"bad WARC record header at offset {off}")
        hdr_end = data.find(b"\r\n\r\n", off)
        if hdr_end < 0:
            raise ValueError("truncated WARC header")
        headers: dict[str, str] = {}
        for line in data[off:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        raw_len = headers.get("content-length")
        if raw_len is None or not raw_len.isdigit():
            raise ValueError(
                f"WARC record at offset {off}: missing or malformed "
                f"Content-Length {raw_len!r}"
            )
        length = int(raw_len)
        if hdr_end + 4 + length > n:
            raise ValueError(
                f"WARC record at offset {off}: Content-Length {length} "
                f"overruns segment ({n - hdr_end - 4} bytes left)"
            )
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        yield headers, block
        off = hdr_end + 4 + length


def split_http_response(block: bytes) -> bytes:
    """Return the body of an HTTP response block (headers stripped)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block[:5].upper().startswith(b"HTTP/"):
        return block  # not HTTP-enveloped: raw payload record
    return block[sep + 4 :]


def _parse_warc_date(s: str | None) -> datetime | None:
    if not s:
        return None
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)


def encode_warc(records: list[dict], gzipped: bool = False) -> bytes:
    """Encode ``[{url, ts (datetime), body (bytes)}, ...]`` as WARC
    response records with an HTTP envelope — one gzip member per record
    when ``gzipped`` (the CC layout, which keeps records seekable)."""
    out = []
    for r in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n"
            b"Content-Length: " + str(len(r["body"])).encode() + b"\r\n\r\n" + r["body"]
        )
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (
            WARC_VERSION + b"\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + ts.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        out.append(gzip.compress(rec) if gzipped else rec)
    return b"".join(out)


def warc_bytes_to_rows(data: bytes) -> list[dict]:
    """Parse one segment's bytes into input-table row dicts."""
    rows = []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        rows.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": _parse_warc_date(headers.get("warc-date")),
                "html": split_http_response(block),
                "text": None,
                "lang": None,
            }
        )
    return rows


def read_warc(spark: SparkSession, path: str, batch_rows: int = 1024) -> DataFrame:
    """Scan ``*.warc`` / ``*.warc.gz`` segments into input-table rows.

    One task per segment file (``binaryFile`` source); record parsing
    streams out of ``mapInArrow`` in bounded batches.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
    )

    def parse(batches):
        buf: list[dict] = []

        def flush():
            nonlocal buf
            tbl = pa.RecordBatch.from_pylist(buf, schema=_ARROW_SCHEMA)
            buf = []
            return tbl

        for rb in batches:
            for seg in rb.column(0).to_pylist():
                for row in warc_bytes_to_rows(bytes(seg)):
                    buf.append(row)
                    if len(buf) >= batch_rows:
                        yield flush()
        if buf:
            yield flush()

    return files.mapInArrow(parse, INPUT_SCHEMA)


def write_warc_file(path: str, records: list[dict], gzipped: bool | None = None) -> None:
    """Archive rows to one WARC segment (fixture writer / sink primitive)."""
    if gzipped is None:
        gzipped = path.endswith(".gz")
    with open(path, "wb") as f:
        f.write(encode_warc(records, gzipped=gzipped))
