"""Email wire codec tests (round 12): base64 differential vs stdlib,
quoted-printable roundtrips + stdlib-decodes-ours, wrap-limit
discipline, header folding/unfolding, multipart boundary walking,
the mboxrd From-quoting trap (the mboxo corruption bug), typed
errors, and fuzz."""

import base64 as std_b64
import quopri
import random

import pytest

from yark_spark.operators.mime import (
    b64_decode,
    b64_encode,
    mbox_build,
    mbox_messages,
    message_build,
    message_parse,
    multipart_build,
    multipart_parse,
    qp_decode,
    qp_encode,
)

# ---------------------------------------------------------------------------
# base64
# ---------------------------------------------------------------------------


def test_b64_rfc4648_vectors():
    for raw, enc in [
        (b"", ""),
        (b"f", "Zg=="),
        (b"fo", "Zm8="),
        (b"foo", "Zm9v"),
        (b"foob", "Zm9vYg=="),
        (b"fooba", "Zm9vYmE="),
        (b"foobar", "Zm9vYmFy"),
    ]:
        assert b64_encode(raw, wrap=0) == enc
        assert b64_decode(enc) == raw


def test_b64_differential_and_wrap():
    rng = random.Random(71)
    for _ in range(100):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        assert b64_encode(data, wrap=0) == std_b64.b64encode(data).decode()
        wrapped = b64_encode(data)
        assert all(len(ln) <= 76 for ln in wrapped.split("\n"))
        assert b64_decode(wrapped) == data
        assert std_b64.b64decode("".join(wrapped.split())) == data


def test_b64_errors():
    with pytest.raises(ValueError, match="multiple of 4"):
        b64_decode("abc")
    with pytest.raises(ValueError, match="invalid character"):
        b64_decode("ab!d")
    with pytest.raises(ValueError, match="padding"):
        b64_decode("Zg==Zm9v")
    with pytest.raises(ValueError, match="padding"):
        b64_decode("Z===")


# ---------------------------------------------------------------------------
# quoted-printable
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "body",
    [
        b"hello world",
        b"a=b=c",
        b"line1\nline2\n",
        b"trailing space \nnext",
        "héllo 中文".encode(),
        b"x" * 500,
        b"",
    ],
)
def test_qp_roundtrip_and_stdlib_decodes_ours(body):
    enc = qp_encode(body)
    assert all(len(ln) <= 76 for ln in enc.split("\n"))
    assert qp_decode(enc) == body
    assert quopri.decodestring(enc.encode()) == body


def test_qp_escapes_equals_and_nonascii():
    enc = qp_encode("=é".encode())
    assert enc.startswith("=3D")
    assert "=C3=A9" in enc


def test_qp_bad_escape():
    with pytest.raises(ValueError, match="escape"):
        qp_decode("abc=zx")


# ---------------------------------------------------------------------------
# message grammar
# ---------------------------------------------------------------------------


def test_header_folding_roundtrip():
    subject = "a very long subject line " * 8
    msg = message_build([("Subject", subject.strip())], "body", "7bit")
    assert any(ln.startswith(" ") for ln in msg.split("\n\n")[0].split("\n"))
    headers, body = message_parse(msg)
    assert headers["subject"] == subject.strip()
    assert body == "body"


@pytest.mark.parametrize("enc", ["7bit", "quoted-printable", "base64"])
def test_message_roundtrip_encodings(enc):
    headers, body = message_parse(
        message_build([("X-Doc-Id", "7")], "payload text\nsecond line", enc)
    )
    assert headers["x-doc-id"] == "7"
    assert body == "payload text\nsecond line"


def test_message_errors():
    with pytest.raises(ValueError, match="7bit body"):
        message_build([("A", "b")], "café", "7bit")
    with pytest.raises(ValueError, match="no headers|malformed"):
        message_parse("not a header line\n\nbody")
    with pytest.raises(ValueError, match="continuation"):
        message_parse(" folded first\n\nbody")
    with pytest.raises(ValueError, match="unknown transfer"):
        message_parse("Content-Transfer-Encoding: uuencode\n\nbody")


# ---------------------------------------------------------------------------
# multipart
# ---------------------------------------------------------------------------


def test_multipart_roundtrip():
    p1 = message_build([("Content-Type", "text/plain")], "part one", "base64")
    p2 = message_build([("Content-Type", "text/html")], "<b>two</b>", "quoted-printable")
    parts = multipart_parse(multipart_build([p1, p2], "B42"), "B42")
    assert [message_parse(p)[1] for p in parts] == ["part one", "<b>two</b>"]


def test_multipart_errors():
    with pytest.raises(ValueError, match="boundary"):
        multipart_parse("no delimiters here", "B42")
    with pytest.raises(ValueError, match="terminator"):
        multipart_parse("--B42\nContent-Type: text/plain\n\nx", "B42")


# ---------------------------------------------------------------------------
# mbox
# ---------------------------------------------------------------------------


def test_mboxrd_from_quoting_trap():
    """Bodies containing 'From ' and '>From ' lines — the exact case
    that corrupts mboxo archives — must roundtrip byte-exactly."""
    body = "From the start\n>From quoted\n>>From deeper\nFromNoSpace ok"
    m = message_build([("X-Doc-Id", "1")], body, "7bit")
    back = mbox_messages(mbox_build([m]))
    assert len(back) == 1
    assert message_parse(back[0])[1] == body


def test_mbox_multiple_messages():
    msgs = [
        message_build([("X-Doc-Id", str(i))], f"body {i}", "7bit") for i in range(5)
    ]
    back = mbox_messages(mbox_build(msgs))
    assert [message_parse(m)[0]["x-doc-id"] for m in back] == [str(i) for i in range(5)]


def test_mbox_errors():
    with pytest.raises(ValueError, match="From separator"):
        mbox_messages("just some text\nwith lines")
    box = mbox_build(
        [message_build([("A", "b")], "x", "7bit") for _ in range(5)]
    )
    with pytest.raises(ValueError, match="bomb"):
        mbox_messages(box, max_messages=3)


def test_fuzz_roundtrip():
    rng = random.Random(81)
    encodings = ["7bit", "quoted-printable", "base64"]
    for _ in range(30):
        bodies = []
        msgs = []
        for i in range(rng.randrange(1, 6)):
            words = " ".join(
                rng.choice(["alpha", "beta", "From", ">From", "=x="])
                for _ in range(rng.randrange(1, 20))
            )
            body = words.replace(" From", "\nFrom") if rng.random() < 0.5 else words
            enc = rng.choice(encodings)
            if enc == "7bit" and any(ord(c) > 127 for c in body):
                enc = "base64"
            bodies.append(body)
            msgs.append(message_build([("X-Doc-Id", str(i))], body, enc))
        back = mbox_messages(mbox_build(msgs))
        assert [message_parse(m)[1] for m in back] == bodies


def test_trailing_newlines_roundtrip_mbox():
    """Review finding: the reader popped ALL trailing blanks; bodies
    ending with newlines must survive the mbox framing exactly."""
    for body in ["hello\n", "hello\n\n", "hello", "a\n\nb\n"]:
        m = message_build([("X-Doc-Id", "1")], body, "7bit")
        back = mbox_messages(mbox_build([m]))
        assert message_parse(back[0])[1] == body, repr(body)


def test_multipart_part_trailing_newline_survives():
    """Review finding: the parser rstripped all trailing newlines; the
    delimiter consumes only the framing line separator."""
    p = message_build([("Content-Type", "text/plain")], "A\n", "7bit")
    parts = multipart_parse(multipart_build([p], "b9"), "b9")
    assert message_parse(parts[0])[1] == "A\n"

