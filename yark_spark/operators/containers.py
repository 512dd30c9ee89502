"""Compressed/archival text containers (round 11): gzip members and
POSIX ustar tar shards, from scratch over the in-repo DEFLATE.

Why these two: web corpora ship as **gzip** (WARC/WET, most crawled
text), and multimodal training shards ship as **tar** (the WebDataset
convention: ``{key}.jpg`` + ``{key}.json`` members streamed
sequentially). Both are pure container formats — gzip is RFC 1952
framing around the DEFLATE stream ``operators/png`` already implements
from scratch (round 11's LZ77 + length-limited dynamic Huffman
encoder), and ustar is 512-byte headers with octal fields — so the
engine reads real-world shard bytes with no external library, same
design rules as the codecs (ship by value, typed ``ValueError`` on
malformed payloads, bomb guard via ``max_output``).

Reference parity note: the reference stores fetched bytes opaquely
(/root/reference/cmds/archive.py:88-91); shard ingest is mandate-side
training-pipeline surface.
"""

from __future__ import annotations

import re
import struct

from yark_spark.operators.png import crc32, inflate, zlib_compress, zlib_decompress

_MEMBER_KEY_RE = re.compile(r"^(\d+)")


def member_doc_id(name: str) -> "int | None":
    """WebDataset-style member key: the LEADING DIGITS of an archive
    member name (or a URI tail). Returns None for non-numeric names
    (README, PAX leftovers, checksum files) so one odd member cannot
    fail a whole shard listing - shared by the tar/zip/WARC listings
    (VERDICT r12 item #6)."""
    m = _MEMBER_KEY_RE.match(name)
    return int(m.group(1)) if m else None

__all__ = [
    "decompress_auto",
    "gzip_compress",
    "gzip_decompress",
    "gzip_members",
    "tar_build",
    "tar_members",
    "warc_build",
    "warc_records",
    "zstd_compress_member",
    "zstd_decompress_member",
]


# ---------------------------------------------------------------------------
# gzip (RFC 1952)
# ---------------------------------------------------------------------------

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def gzip_compress(raw: bytes, name: str | None = None, method: str = "dynamic") -> bytes:
    """Single-member gzip: fixed header (MTIME 0, OS 255), optional
    FNAME, the from-scratch deflate body (``stored`` / ``fixed`` /
    ``dynamic``), CRC-32 + ISIZE trailer. Interoperable with stdlib
    gzip (differential-tested)."""
    flg = _FNAME if name else 0
    out = bytearray(b"\x1f\x8b\x08" + bytes([flg]) + b"\x00\x00\x00\x00\x02\xff")
    if name:
        out += name.encode("utf-8") + b"\x00"
    # zlib_compress = 2-byte header + deflate body + 4-byte adler; strip both
    out += zlib_compress(raw, method=method)[2:-4]
    out += struct.pack("<II", crc32(raw), len(raw) & 0xFFFFFFFF)
    return bytes(out)


def _gzip_member(p: bytes, pos: int, max_output: int | None) -> tuple[bytes, int]:
    """Decode one gzip member starting at ``pos`` → (raw, next_pos).
    Walks all RFC 1952 optional fields; CRC-32 and ISIZE verified."""
    if pos + 18 > len(p):
        raise ValueError("gzip: payload too short")
    if p[pos : pos + 2] != b"\x1f\x8b":
        raise ValueError("gzip: bad magic")
    if p[pos + 2] != 8:
        raise ValueError(f"gzip: compression method {p[pos + 2]} is not deflate")
    flg = p[pos + 3]
    pos += 10
    if flg & _FEXTRA:
        if pos + 2 > len(p):
            raise ValueError("gzip: truncated FEXTRA")
        (xlen,) = struct.unpack_from("<H", p, pos)
        pos += 2 + xlen
    if flg & _FNAME:
        end = p.find(b"\x00", pos)
        if end < 0:
            raise ValueError("gzip: unterminated FNAME")
        pos = end + 1
    if flg & _FCOMMENT:
        end = p.find(b"\x00", pos)
        if end < 0:
            raise ValueError("gzip: unterminated FCOMMENT")
        pos = end + 1
    if flg & _FHCRC:
        pos += 2
    if pos >= len(p) - 8:
        raise ValueError("gzip: no deflate body")
    # memoryview: O(1) slice — a bytes slice here would copy the whole
    # remaining payload per member, quadratic over a multi-member shard
    raw, used = inflate(memoryview(p)[pos:], max_output=max_output, with_consumed=True)
    pos += used
    if pos + 8 > len(p):
        raise ValueError("gzip: truncated trailer")
    crc, isize = struct.unpack_from("<II", p, pos)
    if crc32(raw) != crc:
        raise ValueError("gzip: CRC-32 mismatch")
    if (len(raw) & 0xFFFFFFFF) != isize:
        raise ValueError("gzip: ISIZE mismatch")
    return raw, pos + 8


def gzip_decompress(payload: bytes, max_output: int | None = None) -> bytes:
    """Single-member gzip → raw bytes (trailing data raises — use
    ``gzip_members`` for concatenated streams like .warc.gz)."""
    p = bytes(payload)
    raw, end = _gzip_member(p, 0, max_output)
    if end != len(p):
        raise ValueError("gzip: trailing data after member (multi-member stream?)")
    return raw


def surt_key(uri: str) -> str:
    """SURT canonicalization (the CDX urlkey convention, round 13):
    scheme dropped, host lower-cased and dot-reversed with commas,
    default ports stripped, ``)`` before the path. Lives here (not in
    multimodal) so it ships by value with the container module to
    vanilla-session workers."""
    rest = uri.split("://", 1)[-1]
    host, _, path = rest.partition("/")
    host = host.lower()
    for suffix in (":80", ":443"):
        if host.endswith(suffix):
            host = host[: -len(suffix)]
    return ",".join(reversed(host.split("."))) + ")/" + path


def gzip_member_spans(payload: bytes) -> list[tuple[int, int]]:
    """Byte spans ``(start, end)`` of each member in a concatenated
    gzip stream — the offsets a CDX index records so a reader can
    range-request ONE record out of a multi-GB .warc.gz object
    (round 13). Members are walked (headers + deflate + trailer), not
    magic-scanned: ``1f 8b`` inside compressed data cannot fool it."""
    p = bytes(payload)
    spans = []
    pos = 0
    while pos < len(p):
        start = pos
        _raw, pos = _gzip_member(p, pos, None)
        spans.append((start, pos))
    if not spans:
        raise ValueError("gzip: empty stream")
    return spans


def gzip_members(payload: bytes, max_output: int | None = None) -> list[bytes]:
    """Concatenated gzip members → list of raw payloads. RFC 1952
    permits back-to-back members and the .warc.gz convention depends on
    it (one member per WARC record, so readers can seek); ``max_output``
    bounds EACH member."""
    p = bytes(payload)
    out = []
    pos = 0
    while pos < len(p):
        raw, pos = _gzip_member(p, pos, max_output)
        out.append(raw)
    if not out:
        raise ValueError("gzip: empty stream")
    return out


# ---------------------------------------------------------------------------
# POSIX ustar (the WebDataset shard container)
# ---------------------------------------------------------------------------


def _octal(n: int, width: int) -> bytes:
    return f"{n:0{width - 1}o}".encode() + b"\x00"


def _tar_header(name: str, size: int) -> bytes:
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError("tar: member name over 100 bytes (no prefix support needed)")
    if size >= 8**11:  # the 11-octal-digit ustar size field caps at 8 GiB
        raise ValueError("tar: member over 8 GiB exceeds the ustar size field")
    h = bytearray(512)
    h[0 : len(nb)] = nb
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime
    h[148:156] = b" " * 8  # checksum placeholder (spaces while summing)
    h[156] = ord("0")  # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def tar_build(members: list[tuple[str, bytes]]) -> bytes:
    """ustar archive from (name, bytes) members — the fixture/shard
    writer. 512-byte header + data padded to 512, two zero blocks at
    the end."""
    out = bytearray()
    for name, data in members:
        data = bytes(data)
        out += _tar_header(name, len(data))
        out += data
        pad = -len(data) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def tar_members(payload: bytes) -> list[tuple[str, bytes]]:
    """Parse a ustar/GNU tar stream → [(name, bytes)] of regular files
    (directories and PAX/GNU metadata entries are skipped; typeflag
    '0' or NUL only). Checksum-verified per header."""
    p = bytes(payload)
    out = []
    pos = 0
    while pos + 512 <= len(p):
        block = p[pos : pos + 512]
        if block == b"\x00" * 512:  # end-of-archive marker
            break
        stored = block[148:156]
        try:
            chk = int(stored.strip(b" \x00") or b"0", 8)
        except ValueError as exc:
            raise ValueError(f"tar: bad checksum field at offset {pos}") from exc
        calc = sum(block[:148]) + 8 * 32 + sum(block[156:])
        if chk != calc:
            raise ValueError(f"tar: header checksum mismatch at offset {pos}")
        size_field = block[124:136].strip(b" \x00")
        try:
            size = int(size_field or b"0", 8)
        except ValueError as exc:
            raise ValueError(f"tar: bad size field at offset {pos}") from exc
        name = block[:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        prefix = block[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        typeflag = block[156:157]
        pos += 512
        data_end = pos + size
        if data_end > len(p):
            raise ValueError(f"tar: truncated member {name!r}")
        if typeflag in (b"0", b"\x00"):
            out.append((name, p[pos:data_end]))
        pos = data_end + (-size % 512)
    else:
        if pos < len(p):
            raise ValueError("tar: trailing partial block")
    return out


# ---------------------------------------------------------------------------
# WARC (ISO 28500) — the Common Crawl record format
# ---------------------------------------------------------------------------


def warc_build(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize WARC/1.0 records: each dict needs ``type`` and
    ``block`` (bytes), plus optional extra headers (``uri``,
    ``record_id``, ...). ``per_record_gzip`` writes the .warc.gz
    convention — one gzip member per record, so a reader can seek to
    any record boundary and start inflating."""
    out = bytearray()
    for r in records:
        block = bytes(r["block"])
        lines = [b"WARC/1.0"]
        lines.append(b"WARC-Type: " + r["type"].encode())
        if "record_id" in r:
            lines.append(b"WARC-Record-ID: <" + r["record_id"].encode() + b">")
        if "uri" in r:
            lines.append(b"WARC-Target-URI: " + r["uri"].encode())
        for k, v in r.get("headers", {}).items():
            lines.append(f"{k}: {v}".encode())
        lines.append(b"Content-Length: " + str(len(block)).encode())
        rec = b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"
        out += gzip_compress(rec) if per_record_gzip else rec
    return bytes(out)


def warc_records(payload: bytes, max_output: int | None = None) -> list[dict]:
    """Parse a WARC stream (plain or .warc.gz — sniffed from the
    magic) → list of ``{version, headers (lower-cased keys), block}``.
    Content-Length is authoritative for the block; each record must be
    terminated by CRLF CRLF per ISO 28500."""
    p = bytes(payload)
    if p[:2] == b"\x1f\x8b":
        chunks = gzip_members(p, max_output=max_output)
    else:
        chunks = [p]
    out = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            # tolerate inter-record padding newlines
            while pos < len(chunk) and chunk[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= len(chunk):
                break
            head_end = chunk.find(b"\r\n\r\n", pos)
            if head_end < 0:
                raise ValueError("warc: unterminated header block")
            head = chunk[pos:head_end].decode("utf-8", "replace").split("\r\n")
            if not head[0].startswith("WARC/"):
                raise ValueError(f"warc: bad version line {head[0]!r}")
            headers: dict[str, str] = {}
            for line in head[1:]:
                k, sep, v = line.partition(":")
                if not sep:
                    raise ValueError(f"warc: malformed header line {line!r}")
                headers[k.strip().lower()] = v.strip()
            if "content-length" not in headers:
                raise ValueError("warc: missing Content-Length")
            n = int(headers["content-length"])
            block_start = head_end + 4
            if block_start + n > len(chunk):
                raise ValueError("warc: truncated record block")
            out.append(
                {
                    "version": head[0],
                    "headers": headers,
                    "block": chunk[block_start : block_start + n],
                }
            )
            pos = block_start + n
            if chunk[pos : pos + 4] not in (b"\r\n\r\n", b""):
                raise ValueError("warc: record not CRLF-CRLF terminated")
            pos += 4
    if not out:
        raise ValueError("warc: no records")
    return out


# ---------------------------------------------------------------------------
# zstd (RFC 8878) + magic-number dispatch (round 12)
# ---------------------------------------------------------------------------


_ZSTD = None  # bound by bind_zstd(); ships by value with this module


def bind_zstd():
    """Resolve the zstd codec module into a module global (imported
    lazily to keep containers importable standalone), so executors that
    receive THIS module by value carry the codec along instead of
    attempting a worker-side package import — the operators/zstd
    bind_encoder() pattern."""
    global _ZSTD
    if _ZSTD is None:
        from yark_spark.operators import zstd as _z

        _z.bind_encoder()
        _ZSTD = _z
    return _ZSTD


def zstd_compress_member(raw: bytes, method: str = "compressed") -> bytes:
    """One zstd frame for ``raw`` — the .jsonl.zst wire shape (see
    operators/zstd for the codec; content checksum always on)."""
    return bind_zstd().zstd_compress(raw, method=method)


def zstd_decompress_member(payload: bytes, max_output: int | None = None) -> bytes:
    """Single zstd frame → raw bytes (checksums verified; bomb guard)."""
    return bind_zstd().zstd_decompress(payload, max_output=max_output)


_BZ2 = None  # bound by bind_bzip2(); ships by value with this module


_BROTLI = None  # bound by bind_brotli(); ships by value with this module


def bind_brotli():
    """Also binds the extracted static dictionary + context tables so
    by-value shipping carries complete decode. Resolve the brotli
    codec module into a module global (the
    bind_zstd pattern) — the HTTP ``br`` content-coding (round 14)."""
    global _BROTLI
    if _BROTLI is None:
        from yark_spark.operators import brotli as _b

        _b.bind_dict()
        _b.bind_ctx()
        _BROTLI = _b
    return _BROTLI


def bind_bzip2():
    """Resolve the bzip2 codec module into a module global (the
    bind_zstd pattern)."""
    global _BZ2
    if _BZ2 is None:
        from yark_spark.operators import bzip2 as _b

        _BZ2 = _b
    return _BZ2


_XZ = None  # bound by bind_xz(); ships by value with this module


def bind_xz():
    """Resolve the xz/LZMA codec module into a module global (the
    bind_zstd pattern)."""
    global _XZ
    if _XZ is None:
        from yark_spark.operators import xz as _x

        _XZ = _x
    return _XZ


_LZ4 = None  # bound by bind_lz4(); ships by value with this module


def bind_lz4():
    """Resolve the LZ4 codec module into a module global (the bind_zstd
    pattern — lazy so containers stays importable standalone, bound so
    executors that receive THIS module by value carry the codec)."""
    global _LZ4
    if _LZ4 is None:
        from yark_spark.operators import lz4 as _l

        _LZ4 = _l
    return _LZ4


def decompress_auto(payload: bytes, max_output: int | None = None) -> bytes:
    """Magic-number dispatch over the compressed-text container formats
    the ingest path meets in the wild: gzip (1f 8b), zstd (28 b5 2f fd,
    plus skippable frames), LZ4 frames (04 22 4d 18, round 12), bzip2
    incl. multistream ('BZh' — the Wikipedia-dump layout, round 12),
    xz (fd '7zXZ' 00 — round 13, multi-stream via the codec itself),
    otherwise the bytes are taken as plain text. One entry point so a
    mixed corpus directory ( .gz / .zst / .lz4 / .bz2 / .xz / raw )
    ingests through a single map-only pass."""
    p = bytes(payload)
    if p[:2] == b"\x1f\x8b":
        return gzip_decompress(p, max_output=max_output)
    if p[:3] == b"BZh":
        kw = {} if max_output is None else {"max_output": max_output}
        return bind_bzip2().bz2_decompress(p, **kw)
    if p[:6] == b"\xfd7zXZ\x00":
        kw = {} if max_output is None else {"max_output": max_output}
        return bind_xz().xz_decompress(p, **kw)
    if len(p) >= 4:
        magic = struct.unpack_from("<I", p)[0]
        if magic == 0xFD2FB528 or 0x184D2A50 <= magic <= 0x184D2A5F:
            return b"".join(bind_zstd().zstd_frames(p, max_output=max_output))
        if magic == 0x184D2204:
            kw = {} if max_output is None else {"max_output": max_output}
            return bind_lz4().lz4_frame_decompress(p, **kw)
    return p


# ---------------------------------------------------------------------------
# HTTP/1.1 message framing (round 13, session 3)
# ---------------------------------------------------------------------------
# What a crawler actually stores inside a WARC response block is the
# HTTP MESSAGE as it crossed the wire (RFC 7230): status line, header
# fields, then a body that may be chunked (Transfer-Encoding) and/or
# content-coded (Content-Encoding: gzip/deflate/zstd). A WET pass that
# only strips to the first CRLF CRLF silently yields chunk framing or
# compressed bytes as "text" — the majority of real CC-MAIN responses.
# Decode order per the RFCs: Transfer-Encoding first (it framed the
# transfer), then Content-Encoding codings right-to-left.


def http_dechunk(body: bytes, max_output: int | None = None) -> bytes:
    """Reverse RFC 7230 §4.1 chunked framing: hex size lines (chunk
    extensions after ``;`` ignored), CRLF-delimited chunk data, a 0
    chunk, then optional trailer fields up to a blank line."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("http: truncated chunk-size line")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise ValueError(f"http: bad chunk size {size_token!r}") from None
        pos = eol + 2
        if size == 0:
            break
        if pos + size > n:
            raise ValueError("http: chunk data past end of body")
        out += body[pos : pos + size]
        if max_output is not None and len(out) > max_output:
            raise ValueError("http: de-chunked size exceeds bomb guard")
        pos += size
        if body[pos : pos + 2] != b"\r\n":
            raise ValueError("http: missing CRLF after chunk data")
        pos += 2
    # trailer section: header lines until the terminating blank line
    # (or exact end of body when the sender omitted the blank line).
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("http: truncated trailer section")
        if eol == pos:  # blank line — end of trailers
            pos = eol + 2
            break
        pos = eol + 2
    return bytes(out)


def _content_decode(coding: str, data: bytes, max_output: int | None) -> bytes:
    if coding in ("identity", ""):
        return data
    if coding in ("gzip", "x-gzip"):
        return gzip_decompress(data, max_output=max_output)
    if coding == "deflate":
        # RFC 7230 says zlib-wrapped, but a famous population of
        # servers ships RAW deflate under this token; sniff the zlib
        # CMF/FLG pair the way real clients do.
        if len(data) >= 2 and data[0] & 0x0F == 8 and (data[0] << 8 | data[1]) % 31 == 0:
            return zlib_decompress(data, max_output=max_output)
        return inflate(data, max_output=max_output)
    if coding == "zstd":
        return zstd_decompress_member(data, max_output=max_output)
    if coding == "br":
        # from-scratch RFC 7932 (round 14); streams referencing the
        # static dictionary or the UTF8/SIGNED context tables raise
        # typed NotImplementedError inside → quarantine, never mojibake
        out = bind_brotli().brotli_decompress(
            data, max_output=max_output if max_output else 1 << 28
        )
        if max_output is not None and len(out) > max_output:
            raise ValueError("http: brotli body exceeds bound")
        return out
    raise ValueError(f"http: unknown content-coding {coding!r}")


def http_message_decode(
    block: bytes, max_output: int | None = None
) -> tuple[int, dict[str, str], bytes]:
    """Parse one stored HTTP/1.x response message into
    ``(status_code, headers, body)`` with transfer- and content-codings
    reversed. Header names lowercase; duplicate names comma-joined
    (RFC 7230 §3.2.2). A block with no CRLF CRLF head is a bare body
    (status 0) — the lenient path for pre-HTTP WARC conversions."""
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0 or not block[:5].startswith(b"HTTP/"):
        return 0, {}, block
    head_lines = block[:head_end].split(b"\r\n")
    status_parts = head_lines[0].split(None, 2)
    if len(status_parts) < 2 or not status_parts[1].isdigit():
        raise ValueError(f"http: bad status line {head_lines[0]!r}")
    status = int(status_parts[1])
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        if line[:1] in (b" ", b"\t"):  # obs-fold: continuation of previous
            raise ValueError("http: obsolete header folding not supported")
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError(f"http: malformed header line {line!r}")
        key = name.decode("latin-1").strip().lower()
        val = value.decode("latin-1").strip()
        headers[key] = headers[key] + ", " + val if key in headers else val
    body = block[head_end + 4 :]
    te = [t.strip().lower() for t in headers.get("transfer-encoding", "").split(",") if t.strip()]
    if te:
        if te[-1] != "chunked" or len(te) != 1:
            raise NotImplementedError(
                f"http: transfer-encoding {headers['transfer-encoding']!r}"
            )
        body = http_dechunk(body, max_output=max_output)
    for coding in reversed(
        [c.strip().lower() for c in headers.get("content-encoding", "").split(",") if c.strip()]
    ):
        body = _content_decode(coding, body, max_output)
    return status, headers, body


def http_message_build(
    body: bytes,
    status: int = 200,
    content_type: str = "text/plain; charset=utf-8",
    transfer_chunked: bool = False,
    content_encoding: str | None = None,
    chunk_size: int = 100,
    extra_codings: "dict | None" = None,
) -> bytes:
    """Serialize an HTTP/1.1 response message the way an origin would
    have: optional content-coding (gzip/deflate/zstd via the in-repo
    encoders), then optional chunked framing (with a chunk extension
    on the first chunk and a trailer field, both of which parsers must
    tolerate). ``extra_codings`` maps a coding name to a callable
    ``body -> (wire_name, payload)`` so fixture builders can inject
    third-party encoders (e.g. genuine C brotli) without this module
    growing their dependency."""
    headers = [f"HTTP/1.1 {status} OK", f"Content-Type: {content_type}"]
    payload = body
    if content_encoding:
        enc = content_encoding.lower()
        if extra_codings and enc in extra_codings:
            content_encoding, payload = extra_codings[enc](payload)
        elif enc == "gzip":
            payload = gzip_compress(payload)
        elif enc == "deflate":
            payload = zlib_compress(payload)
        elif enc == "zstd":
            payload = zstd_compress_member(payload)
        elif enc == "br":
            payload = bind_brotli().brotli_compress(payload)
        else:
            raise ValueError(f"http-build: content-coding {enc!r}")
        headers.append(f"Content-Encoding: {content_encoding}")
    if transfer_chunked:
        headers.append("Transfer-Encoding: chunked")
        chunks = bytearray()
        first = True
        for i in range(0, len(payload), chunk_size):
            piece = payload[i : i + chunk_size]
            ext = ";yark=1" if first else ""
            chunks += f"{len(piece):x}{ext}\r\n".encode() + piece + b"\r\n"
            first = False
        chunks += b"0\r\nX-Trailer: done\r\n\r\n"
        body_wire = bytes(chunks)
    else:
        headers.append(f"Content-Length: {len(payload)}")
        body_wire = payload
    return ("\r\n".join(headers) + "\r\n\r\n").encode("latin-1") + body_wire
