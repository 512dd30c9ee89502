"""Email wire codecs from scratch (round 12): RFC 4648 base64 and RFC
2045 quoted-printable transfer encodings (both directions, MIME line
wrapping and soft breaks included), RFC 5322 message grammar (header
folding/unfolding, the empty-line header/body split), multipart/MIME
boundary walking, and the mbox container with mboxrd ``From ``
quoting — nothing imported.

Email archives are a classic LLM training corpus (the Enron corpus,
public mailing-list archives, Usenet dumps all ship as mbox), and
every message body crosses a transfer encoding: a pipeline that can't
undo base64/quoted-printable reads gibberish. This joins the
container family as the MESSAGE wire: mbox is to mail what WARC is to
crawls — a concatenation grammar with an in-band escape rule (body
lines beginning ``From `` are ``>``-quoted, the mboxrd convention,
exactly the trap WARC's length-prefixed records avoid).

Grammar notes (tested traps):
- Header folding: a header value continues onto lines starting with
  WSP; unfolding joins with a single space (RFC 5322 §2.2.3).
- quoted-printable: ``=XX`` escapes, literal printables, soft line
  breaks ``=\\n`` at the 76-char limit, trailing-space protection.
- base64: 76-char MIME line wrap, strict padding on decode.
- mboxrd: quoting is applied to ``>*From `` lines symmetrically, so
  the roundtrip is exact for ANY body (the mboxo corruption bug this
  convention exists to fix).

Decode raises typed ``ValueError`` on malformed input (bad base64
alphabet/padding, bad =XX escapes, headerless messages, missing
boundary) so the quarantine keeps corrupt rows as rows.

Oracle recipe: the container family's — body text through
encode → mbox → parse → decode must md5-match DuckDB's md5(text),
with the transfer encoding cycled 7bit/quoted-printable/base64 per
message so one SQL hash pins all three wires plus the header grammar
(the doc id rides in an ``X-Doc-Id`` header). Vectors + fuzz live in
tests/test_mime.py.
"""

from __future__ import annotations

__all__ = [
    "b64_encode",
    "b64_decode",
    "qp_encode",
    "qp_decode",
    "message_build",
    "message_parse",
    "multipart_build",
    "multipart_parse",
    "mbox_build",
    "mbox_messages",
]

_B64_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_B64_REV = {c: i for i, c in enumerate(_B64_ALPHABET)}


# ---------------------------------------------------------------------------
# base64 (RFC 4648) with MIME 76-column wrapping
# ---------------------------------------------------------------------------


def b64_encode(data: bytes, wrap: int = 76) -> str:
    out = []
    for i in range(0, len(data), 3):
        chunk = data[i : i + 3]
        n = int.from_bytes(chunk + b"\x00" * (3 - len(chunk)), "big")
        quad = [
            _B64_ALPHABET[(n >> 18) & 63],
            _B64_ALPHABET[(n >> 12) & 63],
            _B64_ALPHABET[(n >> 6) & 63] if len(chunk) > 1 else "=",
            _B64_ALPHABET[n & 63] if len(chunk) > 2 else "=",
        ]
        out.append("".join(quad))
    s = "".join(out)
    if wrap:
        s = "\n".join(s[i : i + wrap] for i in range(0, len(s), wrap))
    return s


def b64_decode(text: str) -> bytes:
    s = "".join(text.split())  # MIME line breaks / whitespace
    if len(s) % 4:
        raise ValueError("base64: length not a multiple of 4")
    out = bytearray()
    for i in range(0, len(s), 4):
        quad = s[i : i + 4]
        pad = quad.count("=")
        if pad and i + 4 != len(s):
            raise ValueError("base64: padding before end of stream")
        if pad > 2 or "=" in quad[: 4 - pad]:
            raise ValueError("base64: malformed padding")
        n = 0
        for c in quad[: 4 - pad]:
            if c not in _B64_REV:
                raise ValueError(f"base64: invalid character {c!r}")
            n = (n << 6) | _B64_REV[c]
        n <<= 6 * pad
        out += n.to_bytes(3, "big")[: 3 - pad]
    return bytes(out)


# ---------------------------------------------------------------------------
# quoted-printable (RFC 2045 §6.7)
# ---------------------------------------------------------------------------


def qp_encode(data: bytes, wrap: int = 76) -> str:
    pieces = []
    for i, b in enumerate(data):
        c = chr(b)
        if b in (9, 32):
            # literal unless at end of data or before a newline
            nxt = data[i + 1] if i + 1 < len(data) else None
            pieces.append(c if nxt not in (None, 0x0A) else f"={b:02X}")
        elif b == 0x0A:
            pieces.append("\n")  # hard break
        elif 33 <= b <= 126 and b != 0x3D:  # printable except '='
            pieces.append(c)
        else:
            pieces.append(f"={b:02X}")
    # soft-wrap each line to the 76-char limit ("=\n" continuation)
    out_lines = []
    for line in "".join(pieces).split("\n"):
        cur = []
        width = 0
        i = 0
        while i < len(line):
            tok = line[i : i + 3] if line[i] == "=" else line[i]
            if width + len(tok) > wrap - 1:  # leave room for the soft '='
                cur.append("=\n")
                width = 0
            cur.append(tok)
            width += len(tok)
            i += len(tok)
        out_lines.append("".join(cur))
    return "\n".join(out_lines)


def qp_decode(text: str) -> bytes:
    out = bytearray()
    lines = text.split("\n")
    for li, line in enumerate(lines):
        i = 0
        soft = False
        # transport may add trailing spaces; RFC says strip them
        line = line.rstrip(" \t") if not line.endswith("=") else line
        while i < len(line):
            c = line[i]
            if c == "=":
                if i + 1 == len(line):
                    soft = True  # soft break: continuation, no newline
                    i += 1
                    continue
                hx = line[i + 1 : i + 3]
                if len(hx) < 2 or any(h not in "0123456789ABCDEFabcdef" for h in hx):
                    raise ValueError(f"quoted-printable: bad escape ={hx!r}")
                out.append(int(hx, 16))
                i += 3
            else:
                out.append(ord(c))
                i += 1
        if li + 1 < len(lines) and not soft:
            out.append(0x0A)
    return bytes(out)


# ---------------------------------------------------------------------------
# RFC 5322 message: folded headers + body
# ---------------------------------------------------------------------------


def message_build(
    headers: list[tuple[str, str]], body: str, encoding: str = "7bit"
) -> str:
    """Serialize a single-part message; the body is transfer-encoded
    per ``encoding`` ∈ {7bit, quoted-printable, base64}. Long header
    values fold at commas/spaces past 78 chars."""
    lines = []
    for name, value in headers:
        line = f"{name}: {value}"
        if len(line) <= 78:
            lines.append(line)
        else:  # fold on spaces
            words = value.split(" ")
            cur = f"{name}: {words[0]}"
            for w in words[1:]:
                if len(cur) + 1 + len(w) > 78:
                    lines.append(cur)
                    cur = " " + w  # continuation starts with WSP
                else:
                    cur += " " + w
            lines.append(cur)
    lines.append(f"Content-Transfer-Encoding: {encoding}")
    if encoding == "7bit":
        if any(ord(c) > 127 for c in body):
            raise ValueError("mime: 7bit body must be ASCII")
        payload = body
    elif encoding == "quoted-printable":
        payload = qp_encode(body.encode("utf-8"))
    elif encoding == "base64":
        payload = b64_encode(body.encode("utf-8"))
    else:
        raise ValueError(f"mime: unknown transfer encoding {encoding!r}")
    return "\n".join(lines) + "\n\n" + payload


def message_parse(raw: str) -> tuple[dict, str]:
    """Parse a message into (headers, decoded_body). Header names
    lowercase in the dict; folded values unfold with a single space."""
    if "\n\n" in raw:
        head, body = raw.split("\n\n", 1)
    else:
        head, body = raw, ""
    headers: dict[str, str] = {}
    current: list[str] | None = None
    name = ""
    for line in head.split("\n"):
        if line[:1] in (" ", "\t"):
            if current is None:
                raise ValueError("mime: continuation line before any header")
            current.append(line.strip())
        else:
            if current is not None:
                headers[name] = " ".join(current)
            if ":" not in line:
                raise ValueError(f"mime: malformed header line {line!r}")
            name_part, _, value = line.partition(":")
            name = name_part.strip().lower()
            current = [value.strip()]
    if current is not None:
        headers[name] = " ".join(current)
    if not headers:
        raise ValueError("mime: message with no headers")
    encoding = headers.get("content-transfer-encoding", "7bit").lower()
    if encoding in ("7bit", "8bit", "binary"):
        decoded = body
    elif encoding == "quoted-printable":
        decoded = qp_decode(body).decode("utf-8")
    elif encoding == "base64":
        decoded = b64_decode(body).decode("utf-8")
    else:
        raise ValueError(f"mime: unknown transfer encoding {encoding!r}")
    return headers, decoded


# ---------------------------------------------------------------------------
# multipart/MIME
# ---------------------------------------------------------------------------


def multipart_build(parts: list[str], boundary: str) -> str:
    """Assemble a multipart body from serialized part messages."""
    chunks = []
    for part in parts:
        chunks.append(f"--{boundary}\n{part}")
    return "\n".join(chunks) + f"\n--{boundary}--\n"


def multipart_parse(body: str, boundary: str) -> list[str]:
    """Split a multipart body into its serialized parts (RFC 2046:
    delimiter = CRLF--boundary; preamble and epilogue discarded)."""
    delim = f"--{boundary}"
    if delim not in body:
        raise ValueError("mime: multipart boundary not found")
    # walk line-wise: a delimiter only counts at line start (RFC 2046).
    # The newline BEFORE each delimiter is the line separator the
    # builder's join adds — it belongs to the framing, not the part —
    # so rejoining the collected lines reconstructs the part exactly,
    # including any trailing newlines of its own.
    parts: list[str] = []
    lines = body.split("\n")
    current: list[str] | None = None
    for line in lines:
        if line == delim or line == delim + "--":
            if current is not None:
                parts.append("\n".join(current))
            if line.endswith("--"):
                return parts
            current = []
        elif current is not None:
            current.append(line)
    raise ValueError("mime: multipart terminator not found")


# ---------------------------------------------------------------------------
# mbox container (mboxrd quoting)
# ---------------------------------------------------------------------------

_MBOX_FROM = "From yark@localhost Thu Jan  1 00:00:00 1970"


def _quote_from(body: str) -> str:
    out = []
    for line in body.split("\n"):
        stripped = line.lstrip(">")
        if stripped.startswith("From "):
            out.append(">" + line)
        else:
            out.append(line)
    return "\n".join(out)


def _unquote_from(body: str) -> str:
    out = []
    for line in body.split("\n"):
        if line.startswith(">"):
            stripped = line.lstrip(">")
            if stripped.startswith("From "):
                out.append(line[1:])
                continue
        out.append(line)
    return "\n".join(out)


def mbox_build(messages: list[str]) -> str:
    """Concatenate serialized messages into an mbox: each message is
    followed by exactly ONE blank separator line (mboxrd quoting makes
    the From lines unambiguous; the single-blank framing makes
    trailing newlines in bodies round-trip exactly)."""
    chunks = []
    for msg in messages:
        chunks.append(_MBOX_FROM + "\n" + _quote_from(msg) + "\n")
    return "\n".join(chunks) + "\n"


def mbox_messages(payload: str, max_messages: int = 1_000_000) -> list[str]:
    """Split an mbox into serialized messages, undoing mboxrd quoting.
    Exactly ONE trailing blank line per message is consumed as the
    separator — a body that itself ends with newlines keeps them (the
    writer's single-blank framing makes this exact; foreign mboxes
    with extra separator blanks lose only those)."""
    lines = payload.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # the file's final newline, not a body line
    messages: list[str] = []
    current: list[str] | None = None

    def _close(chunk: list[str]) -> None:
        if chunk and chunk[-1] == "":
            chunk.pop()  # exactly one separator blank
        messages.append(_unquote_from("\n".join(chunk)))

    for line in lines:
        if line.startswith("From "):
            if current is not None:
                _close(current)
            if len(messages) >= max_messages:
                raise ValueError("mbox: message count exceeds bomb guard")
            current = []
        elif current is not None:
            current.append(line)
    if current is not None:
        _close(current)
    if not messages:
        raise ValueError("mbox: no From separator found")
    return messages
