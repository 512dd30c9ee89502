"""Extract the RFC 7932 UTF8/SIGNED literal-context tables from the
container's REAL brotli (round 14, session 3 — companion to
extract_brotli_dict.py).

The remaining brotli boundary after the static dictionary was the 512
entries of literal-context lookup: in UTF8/SIGNED context modes the
literal tree is picked by ``ctx(p1, p2)`` of the two previous output
bytes. Those values are OBSERVABLE through real C brotli
(``pyarrow.Codec('brotli')``) with a two-meta-block probe:

  * meta-block 1 (uncompressed): two bytes ``p2, p1`` — seeds the
    context without touching the compressed grammar;
  * meta-block 2 (compressed, MLEN=1): ONE literal under 64 literal
    trees with an IDENTITY context map, where tree *t*'s prefix code
    has the single symbol *t* — so the decoded byte EQUALS the
    context value the real decoder computed.

Sweeping all 65,536 ``(p1, p2)`` pairs per mode yields the full
tables; the factorizations ``ctx = LUT0[p1] | LUT1[p2]`` (UTF8) and
``ctx = (LUT[p1] << 3) | LUT[p2]`` (SIGNED) are then verified over
the complete sweep before the compact 256-entry tables are emitted
into ``yark_spark/operators/brotli_dict.py`` (appended — run
extract_brotli_dict.py first).

Usage::

    python scripts/extract_brotli_context.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa

from yark_spark.operators.brotli import (
    _COPY_BITS,
    _INSERT_BITS,
    _SIGNED,
    _UTF8,
    _Writer,
    _cmd_symbol,
    _copy_code,
    _insert_code,
    _put_code,
    _write_prefix_code,
)

CODEC = pa.Codec("brotli")


class _AlignWriter(_Writer):
    __slots__ = ()

    def align(self) -> None:
        if self.nbits % 8:
            self.write(0, 8 - self.nbits % 8)

    def write_bytes(self, data: bytes) -> None:
        for b in data:
            self.write(b, 8)


def _varlen_u8_write(w: _Writer, value: int) -> None:
    if value == 1:
        w.write(0, 1)
        return
    w.write(1, 1)
    if value == 2:
        w.write(0, 3)
        return
    for n in range(1, 8):
        lo = (1 << n) + 1
        if lo <= value < lo + (1 << n):
            w.write(n, 3)
            w.write(value - lo, n)
            return
    raise ValueError(value)


def ctx_probe_stream(p1: int, p2: int, mode: int) -> bytes:
    w = _AlignWriter()
    w.write(1, 1)
    w.write(22 - 17, 3)  # WBITS=22
    # meta-block 1: uncompressed, output = (p2, p1)
    w.write(0, 1)  # ISLAST=0
    w.write(0, 2)  # MNIBBLES=4
    for i in range(4):
        w.write(((2 - 1) >> (4 * i)) & 0xF, 4)
    w.write(1, 1)  # ISUNCOMPRESSED
    w.align()
    w.write_bytes(bytes([p2, p1]))
    # meta-block 2: compressed, MLEN=1, one literal under 64 trees
    w.write(1, 1)  # ISLAST
    w.write(0, 1)  # not ISLASTEMPTY
    w.write(0, 2)  # MNIBBLES=4
    for i in range(4):
        w.write(0, 4)  # MLEN-1 = 0
    w.write(0, 1)  # NBLTYPESL=1
    w.write(0, 1)  # NBLTYPESI=1
    w.write(0, 1)  # NBLTYPESD=1
    w.write(0, 2)  # NPOSTFIX=0
    w.write(0, 4)  # NDIRECT=0
    w.write(mode, 2)  # context mode for the single literal block type
    _varlen_u8_write(w, 64)  # NTREES_L=64
    # context map: no RLE, 64-symbol flat code, identity values, no IMTF
    w.write(0, 1)  # RLE off
    cmap_code = _write_prefix_code(w, {i: 6 for i in range(64)}, 64)
    for i in range(64):
        code, ln = cmap_code[i]
        _put_code(w, code, ln)
    w.write(0, 1)  # no inverse-MTF
    _varlen_u8_write(w, 1)  # NTREES_D=1 (no distance context map bits)
    for t in range(64):  # literal tree t = single symbol t
        _write_prefix_code(w, {t: 1}, 256)
    ic, ie = _insert_code(1)
    sym = _cmd_symbol(ic, 0, True)  # insert 1, dangling copy, implicit
    cmd_map = _write_prefix_code(w, {sym: 1}, 704)
    _write_prefix_code(w, {0: 1}, 64)  # distance code (never read)
    code, ln = cmd_map[sym]
    _put_code(w, code, ln)
    w.write(ie, _INSERT_BITS[ic])
    w.write(0, _COPY_BITS[0])
    # literal: single-symbol tree → zero bits; MLEN exhausts
    return w.done()


def sweep(mode: int) -> list[list[int]]:
    table = [[0] * 256 for _ in range(256)]
    for p1 in range(256):
        for p2 in range(256):
            out = CODEC.decompress(ctx_probe_stream(p1, p2, mode), 3, asbytes=True)
            assert out[:2] == bytes([p2, p1]), (p1, p2, out)
            table[p1][p2] = out[2]
    return table


def main() -> None:
    utf8 = sweep(_UTF8)
    print("utf8 sweep done", flush=True)
    signed = sweep(_SIGNED)
    print("signed sweep done", flush=True)

    # factorization checks over the FULL sweeps
    lut0 = [utf8[p1][0] for p1 in range(256)]
    lut1 = [utf8[0][p2] for p2 in range(256)]
    assert utf8[0][0] == 0
    for p1 in range(256):
        for p2 in range(256):
            assert utf8[p1][p2] == (lut0[p1] | lut1[p2]), (p1, p2)
    sig = [signed[p1][0] >> 3 for p1 in range(256)]
    assert signed[0][0] == 0
    for p1 in range(256):
        for p2 in range(256):
            assert signed[p1][p2] == ((sig[p1] << 3) | sig[p2]), (p1, p2)
    print("factorizations verified on all 65536 pairs per mode")

    out_path = (
        Path(__file__).resolve().parent.parent
        / "yark_spark"
        / "operators"
        / "brotli_dict.py"
    )
    src = out_path.read_text()
    marker = "# --- literal-context tables"
    if marker in src:
        src = src[: src.index(marker)].rstrip() + "\n"
    lines = [
        "",
        "# --- literal-context tables (GENERATED by",
        "# scripts/extract_brotli_context.py via identity-context-map probe",
        "# streams decoded by real C brotli; factorizations verified on all",
        "# 65536 (p1, p2) pairs per mode) ---",
        f"CTX_UTF8_LUT0 = bytes({lut0!r})",
        f"CTX_UTF8_LUT1 = bytes({lut1!r})",
        f"CTX_SIGNED_LUT = bytes({sig!r})",
    ]
    out_path.write_text(src + "\n".join(lines) + "\n")
    print("appended context tables to", out_path)


if __name__ == "__main__":
    main()
