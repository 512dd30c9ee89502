"""Subtitle codecs from scratch (round 12): SubRip (.srt) and WebVTT
(.vtt) — the two wire formats video platforms ship caption tracks in
(the reference's domain, YouTube, serves exactly these via its
timedtext endpoints; yt-dlp downloads them next to the media the
reference archives: /root/reference/cmds/archive.py fetch path). Both
directions, nothing imported.

Subtitles are the TEXT channel of video training data: every
speech/caption-aligned multimodal dataset (HowTo100M-style, YT-8M
descendants) starts from these files, and the first pipeline pass is
exactly what this operator does — parse cues, recover the transcript,
and compute timing statistics (speech rate, coverage) used as quality
filters. Joins Y4M/GIF/AVI (pixels), WAV/FLAC/AIFF (audio) and
HTML/WET (page text) as the caption modality.

Grammar notes (the interop traps, all handled + tested):
- SRT: 1-based cue index line, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
  (COMMA decimal separator), blank-line-terminated payload, CRLF or
  LF, optional UTF-8 BOM.
- WebVTT: ``WEBVTT`` magic line with optional trailing metadata,
  ``HH:MM:SS.mmm`` (PERIOD separator — the classic srt→vtt bug),
  optional cue identifiers, cue settings after the timestamp line
  (``align:start position:0%`` — ignored), NOTE comment blocks,
  optional hours field (``MM:SS.mmm`` is legal VTT).

Decode raises typed ``ValueError`` on malformed input (bad magic,
malformed timestamps, end ≤ start, unterminated blocks) so the
quarantine keeps corrupt rows as rows.

Oracle recipe: the fixture builds cues deterministically from the
document's words (one cue per 4 words, 1500 ms each, 200 ms gaps), so
cue count, total duration, speech span and the md5 of the recovered
transcript are all analytic SQL over the text column — and the SAME
cues shipped as SRT and as VTT must agree (the cross-format agreement
recipe on the caption modality). Grammar-trap vectors + fuzz live in
tests/test_subtitles.py.
"""

from __future__ import annotations

import re

__all__ = [
    "srt_build",
    "srt_parse",
    "vtt_build",
    "vtt_parse",
]

_SRT_TS = re.compile(r"^(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})$")
_VTT_TS = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, ms_part = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms_part:03d}"


def _parse_ts(token: str, pattern: re.Pattern, what: str) -> int:
    m = pattern.match(token)
    if not m:
        raise ValueError(f"{what}: malformed timestamp {token!r}")
    h = int(m.group(1)) if m.group(1) else 0
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(m.group(4))


def srt_build(cues: list[tuple[int, int, str]]) -> str:
    """Serialize (start_ms, end_ms, text) cues as SubRip."""
    blocks = []
    for i, (start, end, text) in enumerate(cues, 1):
        blocks.append(
            f"{i}\n{_fmt_ts(start, ',')} --> {_fmt_ts(end, ',')}\n{text}\n"
        )
    return "\n".join(blocks)


def srt_parse(payload: str, max_cues: int = 100_000) -> list[tuple[int, int, str]]:
    """Parse SubRip into (start_ms, end_ms, text) cues. Tolerates CRLF,
    a UTF-8 BOM, and multi-line cue text; cue indices are validated as
    integers but not required to be sequential (real files renumber)."""
    text = payload.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    cues: list[tuple[int, int, str]] = []
    blocks = [b for b in re.split(r"\n\n+", text.strip()) if b.strip()]
    for block in blocks:
        if len(cues) >= max_cues:
            raise ValueError("srt: cue count exceeds bomb guard")
        lines = block.split("\n")
        if len(lines) < 2:
            raise ValueError("srt: cue block too short")
        if not lines[0].strip().isdigit():
            raise ValueError(f"srt: cue index not an integer: {lines[0]!r}")
        arrow = lines[1].split(" --> ")
        if len(arrow) != 2:
            raise ValueError(f"srt: malformed timing line {lines[1]!r}")
        start = _parse_ts(arrow[0].strip(), _SRT_TS, "srt")
        end = _parse_ts(arrow[1].strip(), _SRT_TS, "srt")
        if end <= start:
            raise ValueError("srt: cue end not after start")
        cues.append((start, end, "\n".join(lines[2:])))
    return cues


def vtt_build(cues: list[tuple[int, int, str]], with_ids: bool = False) -> str:
    """Serialize cues as WebVTT (PERIOD millisecond separator)."""
    blocks = ["WEBVTT\n"]
    for i, (start, end, text) in enumerate(cues, 1):
        ident = f"cue-{i}\n" if with_ids else ""
        blocks.append(
            f"{ident}{_fmt_ts(start, '.')} --> {_fmt_ts(end, '.')}\n{text}\n"
        )
    return "\n".join(blocks)


def vtt_parse(payload: str, max_cues: int = 100_000) -> list[tuple[int, int, str]]:
    """Parse WebVTT: magic line (with optional metadata after it),
    NOTE/STYLE/REGION blocks skipped, optional cue identifiers, cue
    settings after the arrow ignored, optional hours field."""
    text = payload.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    if not text.startswith("WEBVTT"):
        raise ValueError("vtt: missing WEBVTT magic")
    after = text[6:7]
    if after not in ("", "\n", " ", "\t"):
        raise ValueError("vtt: malformed magic line")
    cues: list[tuple[int, int, str]] = []
    blocks = re.split(r"\n\n+", text.strip())
    for block in blocks[1:]:  # block 0 is the header
        lines = [ln for ln in block.split("\n")]
        if not lines or not lines[0].strip():
            continue
        if lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        # optional cue identifier: a first line with no arrow
        ts_line = 0
        if "-->" not in lines[0]:
            ts_line = 1
            if len(lines) < 2 or "-->" not in lines[1]:
                raise ValueError(f"vtt: cue without timing line: {lines[0]!r}")
        if len(cues) >= max_cues:
            raise ValueError("vtt: cue count exceeds bomb guard")
        timing = lines[ts_line]
        arrow = timing.split("-->")
        if len(arrow) != 2:
            raise ValueError(f"vtt: malformed timing line {timing!r}")
        start = _parse_ts(arrow[0].strip(), _VTT_TS, "vtt")
        # settings follow the end timestamp, whitespace-separated
        end_token = arrow[1].strip().split()[0] if arrow[1].strip() else ""
        end = _parse_ts(end_token, _VTT_TS, "vtt")
        if end <= start:
            raise ValueError("vtt: cue end not after start")
        cues.append((start, end, "\n".join(lines[ts_line + 1 :])))
    return cues
