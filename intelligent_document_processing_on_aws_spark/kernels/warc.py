"""From-scratch WARC (Web ARChive, ISO 28500) record parsing — stdlib.

Common Crawl — the canonical 100-TB webtext corpus — ships as
`.warc.gz` files with ONE GZIP MEMBER PER RECORD, so a reader can
stream records without decompressing the whole file. This module
implements the public WARC 1.0/1.1 format directly (no `warcio`
dependency in the container):

- `iter_warc_records`: record iterator over plain or gzipped bytes
  (multi-member per-record gzip, or one member for the whole file),
- `parse_http_response`: status line + headers + body split, with
  `Transfer-Encoding: chunked` de-chunking and `Content-Encoding:
  gzip/deflate` decompression (raw captured responses keep both),
- `decode_charset`: BOM -> Content-Type charset -> <meta charset> sniff
  -> strict UTF-8 -> cp1252 fallback, in that order (deterministic).

Scale note (100 TB): gzip WARCs are NOT byte-range splittable — the
parallel unit is the FILE (Common Crawl publishes ~1 GB files, ~80k per
crawl), which is exactly Spark's `binaryFile` partitioning model; see
sources/warc.py.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib


class WarcError(ValueError):
    """Malformed WARC payload."""


_CRLF = b"\r\n"
_VERSION_RE = re.compile(rb"^WARC/(\d+\.\d+)$")


def _split_gzip_members(data: bytes):
    """Yield decompressed gzip members in order (Common Crawl layout:
    one member per record). Uses zlib's unused_data to find member
    boundaries without guessing at magic bytes inside payloads."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
            out += d.flush()
        except zlib.error as e:
            raise WarcError(f"bad gzip member at offset {pos}: {e}") from e
        if not d.eof:
            raise WarcError(f"truncated gzip member at offset {pos}")
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("gzip member consumed no input")
        pos += consumed


def _parse_header_block(buf: bytes, start: int) -> tuple[dict[str, str], int]:
    """Parse the WARC header block starting at `start` (the `WARC/x.y`
    line). Returns (headers incl. '_version', offset just past the blank
    line)."""
    end = buf.find(_CRLF + _CRLF, start)
    if end < 0:
        raise WarcError("unterminated WARC header block")
    lines = buf[start:end].split(_CRLF)
    m = _VERSION_RE.match(lines[0])
    if not m:
        raise WarcError(f"bad WARC version line {lines[0][:40]!r}")
    headers: dict[str, str] = {"_version": m.group(1).decode()}
    last_key = None
    for ln in lines[1:]:
        if ln[:1] in (b" ", b"\t") and last_key:        # obs-fold continuation
            headers[last_key] += " " + ln.strip().decode("utf-8", "replace")
            continue
        k, sep, v = ln.partition(b":")
        if not sep:
            raise WarcError(f"bad WARC header line {ln[:40]!r}")
        last_key = k.strip().decode("utf-8", "replace").lower()
        headers[last_key] = v.strip().decode("utf-8", "replace")
    return headers, end + 4


def _iter_plain(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate stray newlines between records
        while pos < n and buf[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        headers, body_start = _parse_header_block(buf, pos)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcError("missing/bad Content-Length") from e
        body = buf[body_start:body_start + length]
        if len(body) != length:
            raise WarcError(
                f"truncated record body: {len(body)} < {length}")
        pos = body_start + length
        if buf[pos:pos + 4] != _CRLF + _CRLF:
            raise WarcError("missing record terminator")
        pos += 4
        yield headers, body


def iter_warc_records(data: bytes):
    """Yield (headers: dict, body: bytes) for each record. Accepts
    plain WARC bytes, a per-record-member `.warc.gz` (Common Crawl), or
    a single-member gzip of the whole file."""
    if data[:2] == b"\x1f\x8b":
        for member in _split_gzip_members(data):
            # one member may hold one record (CC) or the whole file
            yield from _iter_plain(member)
        return
    if not data.startswith(b"WARC/"):
        raise WarcError("not a WARC payload (no gzip magic or WARC/ line)")
    yield from _iter_plain(data)


def iter_warc_records_lenient(data: bytes):
    """Yield (headers | None, body | None, error | None) per record,
    isolating damage: in the per-record-gzip layout a malformed record
    (or a truncated tail) produces ONE error tuple and parsing continues
    with the next gzip member — the production contract for dirty
    crawl data (a bad record must never kill a 1 GB file, let alone the
    job). Plain (non-gzip) input degrades to one error tuple for the
    remainder of the buffer on first damage (no member boundaries to
    resync on)."""
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            try:
                member = d.decompress(data[pos:]) + d.flush()
                if not d.eof:
                    raise WarcError(f"truncated gzip member at offset {pos}")
            except (zlib.error, WarcError) as e:
                yield None, None, f"WarcError: {e}"[:200]
                return                              # cannot resync past damage
            consumed = (n - pos) - len(d.unused_data)
            if consumed <= 0:
                yield None, None, "WarcError: gzip member consumed no input"
                return
            pos += consumed
            try:
                for headers, body in _iter_plain(member):
                    yield headers, body, None
            except WarcError as e:
                yield None, None, f"WarcError: {e}"[:200]
        return
    try:
        for headers, body in iter_warc_records(data):
            yield headers, body, None
    except WarcError as e:
        yield None, None, f"WarcError: {e}"[:200]


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise WarcError("truncated chunked body")
        size_tok = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise WarcError(f"bad chunk size {size_tok[:16]!r}") from e
        pos = eol + 2
        if size == 0:
            return bytes(out)
        if pos + size > n:
            raise WarcError("chunk extends past body")
        out += body[pos:pos + size]
        pos += size + 2                             # skip trailing CRLF


def parse_http_response(body: bytes) -> tuple[int, dict[str, str], bytes]:
    """Raw captured HTTP response -> (status, headers, payload) with
    chunked transfer-encoding and gzip/deflate content-encoding undone
    (captured responses keep the wire form)."""
    sep = body.find(_CRLF + _CRLF)
    if sep < 0:
        raise WarcError("no HTTP header/body separator")
    head_lines = body[:sep].split(_CRLF)
    status_parts = head_lines[0].split(None, 2)
    if len(status_parts) < 2 or not status_parts[0].startswith(b"HTTP/"):
        raise WarcError(f"bad HTTP status line {head_lines[0][:40]!r}")
    try:
        status = int(status_parts[1])
    except ValueError as e:
        raise WarcError("non-numeric HTTP status") from e
    headers: dict[str, str] = {}
    for ln in head_lines[1:]:
        k, s, v = ln.partition(b":")
        if s:
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    payload = body[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    enc = headers.get("content-encoding", "").lower().strip()
    if enc == "gzip":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error) as e:
            raise WarcError(f"bad gzip content-encoding: {e}") from e
    elif enc == "deflate":
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            try:
                payload = zlib.decompress(payload, -15)   # raw deflate
            except zlib.error as e:
                raise WarcError(f"bad deflate content-encoding: {e}") from e
    return status, headers, payload


_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.I)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9_\-]+)", re.I)


def sniff_charset(payload: bytes, content_type: str | None) -> str:
    """Deterministic charset resolution: BOM > Content-Type param >
    <meta charset> in the first 1024 bytes > utf-8."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            return m.group(1).lower()
    m = _META_RE.search(payload[:1024])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return "utf-8"


def decode_charset(payload: bytes, content_type: str | None) -> tuple[str, str]:
    """-> (text, canonical_charset_used). The declared/sniffed charset is
    tried first; on failure (or an unknown label) the cp1252 fallback
    decodes anything byte-for-byte. The reported name is the canonical
    Python codec name (`windows-1252` -> `cp1252`) so downstream
    grouping keys are label-independent."""
    import codecs

    cs = sniff_charset(payload, content_type)
    try:
        canonical = codecs.lookup(cs).name
        return payload.decode(canonical), canonical
    except (UnicodeDecodeError, LookupError):
        return payload.decode("cp1252", errors="replace"), "cp1252"


def iter_warc_members(data: bytes):
    """Yield ``(offset, length, headers | None, body | None, err | None)``
    per gzip member of a per-record-layout ``.warc.gz`` — the byte spans
    a CDX index records and a ranged fetch re-reads.

    ``offset``/``length`` delimit the COMPRESSED member inside the file,
    so ``data[offset:offset + length]`` is a complete standalone gzip
    stream: exactly the slice an HTTP range request (or a local seek)
    retrieves, decodable by :func:`parse_member_bytes` with no other
    context.  A member holding several records (legal, non-CC layout)
    yields each record with the member's span.  Damage is isolated per
    member (one error tuple, parsing resyncs on the next member).  Plain
    non-gzip WARC input is indexed too: each record becomes one
    pseudo-member spanning its raw bytes in the uncompressed buffer.
    """
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            try:
                member = d.decompress(data[pos:]) + d.flush()
                if not d.eof:
                    raise WarcError(f"truncated gzip member at offset {pos}")
            except (zlib.error, WarcError) as e:
                yield pos, n - pos, None, None, f"WarcError: {e}"[:200]
                return                              # cannot resync past damage
            consumed = (n - pos) - len(d.unused_data)
            if consumed <= 0:
                yield pos, n - pos, None, None, \
                    "WarcError: gzip member consumed no input"
                return
            try:
                for headers, body in _iter_plain(member):
                    yield pos, consumed, headers, body, None
            except WarcError as e:
                yield pos, consumed, None, None, f"WarcError: {e}"[:200]
            pos += consumed
        return
    if not data.startswith(b"WARC/"):
        yield 0, len(data), None, None, \
            "WarcError: not a WARC payload (no gzip magic or WARC/ line)"
        return
    # plain layout: spans are record extents in the uncompressed stream
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        start = pos
        try:
            headers, body_start = _parse_header_block(data, pos)
            length = int(headers["content-length"])
            body = data[body_start:body_start + length]
            if len(body) != length:
                raise WarcError(
                    f"truncated record body: {len(body)} < {length}")
            pos = body_start + length
            if data[pos:pos + 4] != _CRLF + _CRLF:
                raise WarcError("missing record terminator")
            pos += 4
            yield start, pos - start, headers, body, None
        except (WarcError, KeyError, ValueError) as e:
            yield start, n - start, None, None, f"WarcError: {e}"[:200]
            return                                  # no boundaries to resync on


def parse_member_bytes(chunk: bytes):
    """Decode ONE ranged-fetched member slice -> (headers, body) records.

    Accepts what iter_warc_members spans denote: a standalone gzip
    member, or a plain record slice.  Raises WarcError on damage (the
    fetcher turns that into an error row — a corrupt span must never
    kill the fetch task)."""
    if chunk[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            buf = d.decompress(chunk) + d.flush()
        except zlib.error as e:
            raise WarcError(f"bad gzip member in fetched range: {e}") from e
        if not d.eof:
            raise WarcError("truncated gzip member in fetched range")
        return list(_iter_plain(buf))
    return list(_iter_plain(chunk))


def surt_urlkey(url: str) -> str:
    """Canonical SURT-form url key (the CDX sort key Common Crawl's
    index uses): scheme dropped, host lowercased + dot-reversed with
    commas, default ports stripped, ')/'-joined path+query lowercased.
    Simplified relative to full SURT (no session-param stripping) but
    deterministic and order-compatible for same-host grouping."""
    u = (url or "").strip()
    for pfx in ("https://", "http://"):
        if u.lower().startswith(pfx):
            u = u[len(pfx):]
            break
    host, sep, rest = u.partition("/")
    host = host.lower()
    if "@" in host:                                 # userinfo never keys
        host = host.rpartition("@")[2]
    for port in (":80", ":443"):
        if host.endswith(port):
            host = host[: -len(port)]
    parts = [p for p in host.split(".") if p]
    return ",".join(reversed(parts)) + ")/" + (rest.lower() if sep else "")


def build_conversion_record(
    url: str, text: str, date: str, refers_to: str | None = None
) -> bytes:
    """One WARC/1.0 ``conversion`` record (the WET layout Common Crawl
    distributes extracted text in), BYTE-DETERMINISTIC: the record id is
    uuid5 of (url, payload digest) — identical input always serializes
    to identical bytes, so WET outputs can be content-addressed and
    diffed across runs."""
    import base64
    import hashlib
    import uuid

    body = (text or "").encode("utf-8")
    digest = base64.b32encode(hashlib.sha1(body).digest()).decode()
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\x01sha1:{digest}")
    headers = [
        ("WARC-Type", "conversion"),
        ("WARC-Target-URI", url or ""),
        ("WARC-Date", date or "1970-01-01T00:00:00Z"),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("WARC-Block-Digest", f"sha1:{digest}"),
        # explicit charset: payloads are always utf-8, and declaring it
        # keeps the read-back decode off the html <meta> sniff (extracted
        # text can legitimately CONTAIN a literal meta-charset string)
        ("Content-Type", "text/plain; charset=utf-8"),
        ("Content-Length", str(len(body))),
    ]
    if refers_to:
        headers.insert(4, ("WARC-Refers-To", refers_to))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def build_metadata_record(url: str, date: str, payload: bytes) -> bytes:
    """One WARC/1.0 ``metadata`` record carrying a JSON envelope (the WAT
    layout Common Crawl distributes page metadata in), BYTE-DETERMINISTIC
    the same way build_conversion_record is: uuid5 record id over
    (url, payload digest), fixed header order."""
    import base64
    import hashlib
    import uuid

    digest = base64.b32encode(hashlib.sha1(payload).digest()).decode()
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\x01wat\x01sha1:{digest}")
    headers = [
        ("WARC-Type", "metadata"),
        ("WARC-Target-URI", url or ""),
        ("WARC-Date", date or "1970-01-01T00:00:00Z"),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("WARC-Block-Digest", f"sha1:{digest}"),
        ("Content-Type", "application/json"),
        ("Content-Length", str(len(payload))),
    ]
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
    )
    return head + b"\r\n" + payload + b"\r\n\r\n"


def gzip_member(record: bytes) -> bytes:
    """Compress one record as a standalone gzip member (zlib wbits=31
    writes MTIME=0 — deterministic bytes, unlike gzip.compress)."""
    c = zlib.compressobj(9, zlib.DEFLATED, 31)
    return c.compress(record) + c.flush()
