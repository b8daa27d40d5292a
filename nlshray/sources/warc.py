"""WARC source: read Common-Crawl-style web archives as a pages Dataset.

The north-star input is "Common-Crawl-style web pages"; Common Crawl
ships them as WARC (ISO 28500) — a sequence of records, each a small
header block (``WARC/1.0`` + ``Key: Value`` lines, ``\\r\\n\\r\\n``
terminated) followed by ``Content-Length`` payload bytes. The ``.gz``
convention compresses EACH record as its own gzip member so a reader
can start anywhere; stdlib ``gzip`` reads concatenated members
transparently, which is all this parser needs.

``read_warc`` is a real Ray Data ``FileBasedDatasource``: one read task
per file (Common Crawl publishes ~1 GB shards — the file IS the natural
block unit), streaming record parse (never the whole file in memory),
rows batched into Arrow blocks of ``rows_per_block`` so the streaming
executor can pipeline extraction behind the read. Output schema matches
the pages table exactly — (url, warc_ts, html, lang) — so
``dedup_pages`` / ``extract_stage`` run unchanged on WARC input:

    pages = read_warc("s3://.../segments/.../warc/")
    result = dedup_pages(pages, cfg)

Only ``WARC-Type: response`` records are emitted (request/metadata/
warcinfo records are skipped, as every CC consumer does); HTTP envelope
headers are stripped so ``html`` is the raw body bytes. ``encode_warc``
is the inverse (used for round-trip tests and fixture generation).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pyarrow as pa

import ray.data
from ray.data.datasource.file_based_datasource import FileBasedDatasource

_CRLF = b"\r\n"


class _RawAdapter(io.RawIOBase):
    """Minimal RawIOBase over a pyarrow NativeFile so stdlib buffered /
    gzip readers (which need ``readinto``) can wrap it."""

    def __init__(self, f):
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._f.read(len(b))
        n = len(data)
        b[:n] = data
        return n


def _parse_warc_date(value: str):
    # WARC-Date is ISO-8601 UTC: 2017-03-22T17:01:35Z (optional .ffffff)
    v = value.strip()
    if v.endswith("Z"):
        v = v[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(v)
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def iter_warc_records(fp) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per record from a buffered binary
    stream of WARC/1.0/1.1 records. Header keys are lower-cased."""
    while True:
        line = fp.readline()
        while line in (_CRLF, b"\n"):  # inter-record blank lines
            line = fp.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            line = fp.readline()
            if line in (_CRLF, b"\n", b""):
                break
            key, _, val = line.partition(b":")
            headers[key.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace")
            )
        length = int(headers.get("content-length", "0"))
        payload = fp.read(length)
        if len(payload) != length:
            raise ValueError("truncated WARC record payload")
        yield headers, payload


def _strip_http_envelope(payload: bytes) -> tuple[bytes, str]:
    """(body, content-language) from an HTTP response payload."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep or not head.startswith(b"HTTP/"):
        return payload, ""
    lang = ""
    for hline in head.split(_CRLF)[1:]:
        k, _, v = hline.partition(b":")
        if k.strip().lower() == b"content-language":
            lang = v.strip().decode("ascii", "replace")
    return body, lang


_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
    ]
)


class WARCDatasource(FileBasedDatasource):
    """Response records of WARC / per-record-gzip WARC files."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, rows_per_block: int = 256, **kwargs):
        super().__init__(paths, **kwargs)
        self._rows_per_block = int(rows_per_block)

    def _read_stream(self, f, path: str):
        buffered = io.BufferedReader(_RawAdapter(f), buffer_size=1 << 20)
        if buffered.peek(2)[:2] == b"\x1f\x8b":
            # per-record gzip members; GzipFile reads them back-to-back
            stream = io.BufferedReader(
                _RawAdapter(gzip.GzipFile(fileobj=buffered, mode="rb")),
                buffer_size=1 << 20,
            )
        else:
            stream = buffered
        rows: list[tuple] = []
        for headers, payload in iter_warc_records(stream):
            if headers.get("warc-type", "").lower() != "response":
                continue
            if "application/http" in headers.get("content-type", ""):
                body, lang = _strip_http_envelope(payload)
            else:
                body, lang = payload, ""
            rows.append(
                (
                    headers.get("warc-target-uri", ""),
                    _parse_warc_date(headers.get("warc-date", "")),
                    body,
                    lang,
                )
            )
            if len(rows) >= self._rows_per_block:
                yield self._table(rows)
                rows = []
        if rows:
            yield self._table(rows)

    @staticmethod
    def _table(rows: list[tuple]) -> pa.Table:
        cols = list(zip(*rows))
        return pa.table(
            {
                "url": pa.array(cols[0], pa.string()),
                "warc_ts": pa.array(cols[1], pa.timestamp("us")),
                "html": pa.array(cols[2], pa.binary()),
                "lang": pa.array(cols[3], pa.string()),
            }
        )


def read_warc(
    paths,
    *,
    rows_per_block: int = 256,
    override_num_blocks: int | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """WARC file(s)/dir(s) -> pages Dataset (url, warc_ts, html, lang)."""
    return ray.data.read_datasource(
        WARCDatasource(paths, rows_per_block=rows_per_block, **kwargs),
        override_num_blocks=override_num_blocks,
    )


def encode_warc(
    records: list[tuple[str, datetime, bytes, str]],
    per_record_gzip: bool = False,
) -> bytes:
    """Inverse of the reader: (url, ts, html, lang) rows -> WARC bytes.

    Emits ``WARC-Type: response`` records with an HTTP/1.1 envelope
    (Content-Language carries ``lang``), per-record gzip members when
    ``per_record_gzip`` — the Common Crawl ``.warc.gz`` convention.
    """
    out = bytearray()
    for url, ts, html, lang in records:
        http = bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")
        if lang:
            http += b"Content-Language: " + lang.encode("ascii") + _CRLF
        http += b"Content-Length: " + str(len(html)).encode() + _CRLF
        http += _CRLF + html
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF +
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + _CRLF +
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
        )
        record = bytes(head) + bytes(http) + _CRLF + _CRLF
        out += gzip.compress(record) if per_record_gzip else record
    return bytes(out)
