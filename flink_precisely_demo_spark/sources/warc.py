"""WARC (Web ARChive, ISO 28500) record parsing — crawl ingestion.

Training corpora arrive as WARC: every Common-Crawl-style dump is a
stream of length-delimited records (warcinfo, request, response,
metadata), usually with each record gzip-compressed as its own
member so readers can split files without decompressing everything.
This module parses that format with the stdlib only:

- :func:`split_gzip_members` — walk concatenated gzip members
  (zlib with ``wbits=31`` consumes exactly one member and reports
  ``unused_data``, which is the next member).
- :func:`parse_warc` — record framing: ``WARC/1.x`` version line,
  CRLF header block, ``Content-Length`` octets of payload, CRLF CRLF
  separator; tolerant of trailing garbage (surfaced as a count, not
  a crash).
- :func:`parse_http_response` — minimal status-line + header split
  for ``application/http; msgtype=response`` payloads.
- :func:`warc_records` — the Spark operator: binary WARC payloads ->
  one row per record with type, target URI, HTTP status, body bytes
  and body md5. ``mapInPandas`` over the payload column: a
  zero-shuffle scan-stage map, the same shape as the media decoders
  (at 100 TB each WARC file parses inside its scan partition; only
  the extracted metadata moves).

No counterpart in the reference (extension scope, SURVEY.md §2.3 —
the ingestion step FEEDING the documents table).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


# Per-member decompressed-size ceiling. Crawl input is adversarial: a
# gzip bomb must become a typed per-row error before it expands in
# executor memory, so decompression is chunked against this cap.
MAX_MEMBER_BYTES = 256 * 1024 * 1024


def split_gzip_members(payload: bytes,
                       max_member_bytes: int = MAX_MEMBER_BYTES,
                       ) -> list[bytes]:
    """Decompress a concatenation of gzip members into a list (one
    entry per member). Non-gzip input returns ``[payload]``. A member
    that inflates past ``max_member_bytes`` raises ``ValueError``
    (bounded: decompression is chunked, so a gzip bomb never
    materializes beyond the cap plus one chunk)."""
    if payload[:2] != b"\x1f\x8b":
        return [payload]
    out = []
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        chunks: list[bytes] = []
        size = 0
        data = rest
        while True:
            chunk = d.decompress(data, 1 << 20)
            chunks.append(chunk)
            size += len(chunk)
            if size > max_member_bytes:
                raise ValueError(
                    "warc: gzip member exceeds "
                    f"{max_member_bytes} decompressed bytes")
            if d.eof or not d.unconsumed_tail:
                break
            data = d.unconsumed_tail
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        out.append(b"".join(chunks))
        rest = d.unused_data
    if rest:
        raise ValueError("warc: trailing non-gzip bytes after members")
    return out


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
    return headers


def parse_warc(payload: bytes) -> tuple[list[dict], int]:
    """WARC bytes (plain or per-record gzip) -> (records, n_bad).

    Each record dict has ``warc_type``, ``target_uri``, ``headers``
    and ``payload`` (raw record block, e.g. an HTTP message).
    ``n_bad`` counts unparseable segments — data, not an abort."""
    records: list[dict] = []
    n_bad = 0
    for member in split_gzip_members(payload):
        pos = 0
        n = len(member)
        while pos < n:
            if member[pos:pos + 5] != b"WARC/":
                # resync: find the next version line or give up
                nxt = member.find(b"WARC/", pos + 1)
                n_bad += 1
                if nxt == -1:
                    break
                pos = nxt
            head_end = member.find(b"\r\n\r\n", pos)
            if head_end == -1:
                n_bad += 1
                break
            headers = _parse_headers(member[pos:head_end])
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                n_bad += 1
                pos = head_end + 4
                continue
            body = member[head_end + 4:head_end + 4 + length]
            if len(body) < length:
                n_bad += 1
                break
            records.append({
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri"),
                "headers": headers,
                "payload": body,
            })
            pos = head_end + 4 + length
            # the record separator (two CRLFs); tolerate its absence
            if member[pos:pos + 4] == b"\r\n\r\n":
                pos += 4
    return records, n_bad


def parse_http_response(payload: bytes) -> tuple[int | None, bytes]:
    """HTTP response bytes -> (status_code, body). A payload without
    an HTTP status line comes back as (None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end == -1:
        return None, payload
    status_line = payload.split(b"\r\n", 1)[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return None, payload
    return status, payload[head_end + 4:]


WARC_RECORDS_SCHEMA = ("media_id long, rec_idx int, warc_type string, "
                       "target_uri string, http_status int, "
                       "body_bytes long, body_md5 string, "
                       "n_bad_segments int, error string")


def warc_records(media: DataFrame, include_body: bool = False,
                 redistribute: bool = True) -> DataFrame:
    """Binary WARC payloads -> one row per record (see module doc).
    Per-payload parse failures are typed rows, never job aborts.

    ``include_body=True`` appends a ``body`` string column (utf-8,
    replacement-decoded) for downstream text extraction.
    ``redistribute=False`` skips the spreading repartition so the
    parse stays fused into the upstream scan stage — use it when the
    source is already well-partitioned and the consumer wants one
    narrow pass (e.g. the crawl-to-corpus pipeline)."""
    cols = ["media_id", "rec_idx", "warc_type", "target_uri",
            "http_status", "body_bytes", "body_md5",
            "n_bad_segments", "error"]
    schema = WARC_RECORDS_SCHEMA
    if include_body:
        cols = cols + ["body"]
        schema = schema + ", body string"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def row(*vals) -> tuple:
            return vals if include_body else vals[:-1]
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    recs, n_bad = parse_warc(bytes(payload))
                except Exception as e:               # noqa: BLE001
                    out.append(row(mid, None, None, None, None, None,
                                   None, None,
                                   f"{type(e).__name__}: {e}", None))
                    continue
                if not recs:
                    # zero records parsed is measured data, never a
                    # silent drop: one typed row keeps the file (and
                    # its bad-segment count) visible downstream
                    out.append(row(mid, None, None, None, None, None,
                                   None, n_bad, "NoRecordsParsed",
                                   None))
                    continue
                for i, r in enumerate(recs):
                    status, body = parse_http_response(r["payload"])
                    out.append(row(
                        mid, i, r["warc_type"], r["target_uri"],
                        status, len(body),
                        hashlib.md5(body).hexdigest(), n_bad, None,
                        body.decode("utf-8", "replace")))
            yield pd.DataFrame(out, columns=cols)

    if redistribute:
        n = media.sparkSession.sparkContext.defaultParallelism
        media = media.repartition(n, "media_id")
    return media.mapInPandas(compute, schema=schema)


def write_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records (dicts with warc_type, target_uri, payload,
    optional extra headers) into WARC bytes — the test/oracle twin of
    :func:`parse_warc`, not a production writer."""
    chunks = []
    for r in records:
        head = [b"WARC/1.0",
                b"WARC-Type: " + r["warc_type"].encode()]
        if r.get("target_uri"):
            head.append(b"WARC-Target-URI: " + r["target_uri"].encode())
        payload = r["payload"]
        head.append(b"Content-Length: " + str(len(payload)).encode())
        raw = b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            c = zlib.compressobj(wbits=31)
            raw = c.compress(raw) + c.flush()
        chunks.append(raw)
    return b"".join(chunks)
