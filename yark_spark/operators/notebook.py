"""Jupyter-notebook (.ipynb) ingest from scratch (round 12): the
nbformat-4 JSON document model — cells with ``cell_type`` markdown /
code / raw, ``source`` as EITHER one string or a list of
line-strings (both forms are on real disks; normalizing them is the
first interop bug), code-cell ``outputs`` (stream text,
execute_result/display_data mime bundles, error tracebacks) and
``execution_count`` — parsed with the standard-library JSON reader
(the format IS JSON; the from-scratch work is the document model,
normalization and the curation decision, not re-lexing JSON).

Notebooks are a first-class code-corpus shape: The Stack and
StarCoder's training data carve .ipynb files into text, and the
canonical curation decision this operator encodes is SOURCE ONLY —
outputs are stripped (they bloat tokens, embed base64 images, and
leak dataset rows users printed while exploring — an output cell is
PII surface exactly like EXIF GPS). ``nbformat < 4`` (the 2012-era
``worksheets`` nesting) is a typed boundary.

Parse raises typed ``ValueError`` on malformed input (non-JSON, no
cells list, unknown cell types, non-string sources, cell bomb) so the
quarantine keeps corrupt rows as rows.

Oracle recipe: the fixture packs each document's words into
alternating markdown/code cells (6 words per cell, list-of-lines
source form on even cells and single-string form on odd ones, noisy
stream outputs attached to every code cell); extraction strips
outputs and rejoins sources, so cell counts are analytic in the word
count and the recovered-text digest equals md5(text) — outputs
surviving, order bugs, or source-form mishandling all break the hash.
Form/boundary vectors live in tests/test_notebook.py.
"""

from __future__ import annotations

import json

__all__ = ["ipynb_build", "ipynb_cells"]


def ipynb_build(cells: list[tuple[str, str]], with_outputs: bool = True) -> str:
    """Build an nbformat-4 notebook from (cell_type, source_text)
    pairs. Even-indexed cells store source as a LIST of line strings
    (trailing-newline convention), odd-indexed as ONE string — both
    legal forms, so readers must normalize. Code cells get a noisy
    stream output + execution_count that extraction must strip."""
    out_cells = []
    for i, (cell_type, source) in enumerate(cells):
        lines = source.split("\n")
        src = (
            [ln + "\n" for ln in lines[:-1]] + [lines[-1]]
            if i % 2 == 0
            else source
        )
        cell: dict = {"cell_type": cell_type, "metadata": {}, "source": src}
        if cell_type == "code":
            cell["execution_count"] = i + 1
            cell["outputs"] = (
                [
                    {
                        "output_type": "stream",
                        "name": "stdout",
                        "text": ["LEAKED ROW 42\n", "secret@example.org\n"],
                    },
                    {
                        "output_type": "execute_result",
                        "execution_count": i + 1,
                        "data": {"text/plain": ["<DataFrame 1000x5>"]},
                        "metadata": {},
                    },
                ]
                if with_outputs
                else []
            )
        out_cells.append(cell)
    nb = {
        "nbformat": 4,
        "nbformat_minor": 5,
        "metadata": {
            "kernelspec": {"name": "python3", "display_name": "Python 3"},
            "language_info": {"name": "python"},
        },
        "cells": out_cells,
    }
    return json.dumps(nb, ensure_ascii=False)


def _normalize_source(src) -> str:
    if isinstance(src, str):
        return src
    if isinstance(src, list) and all(isinstance(s, str) for s in src):
        return "".join(src)
    raise ValueError("ipynb: cell source must be a string or list of strings")


def ipynb_cells(payload: str, max_cells: int = 100_000) -> list[tuple[str, str]]:
    """Parse a notebook into (cell_type, source_text) pairs — SOURCE
    ONLY, outputs stripped (the curation stance: outputs bloat tokens
    and leak printed data). Both source forms normalize; nbformat < 4
    is a typed boundary."""
    try:
        nb = json.loads(payload)
    except json.JSONDecodeError as e:
        raise ValueError(f"ipynb: not valid JSON ({e.msg})") from None
    if not isinstance(nb, dict):
        raise ValueError("ipynb: top level must be an object")
    version = nb.get("nbformat")
    if isinstance(version, int) and version < 4:
        raise NotImplementedError(
            "ipynb: nbformat < 4 uses worksheets nesting; convert with jupyter"
        )
    cells = nb.get("cells")
    if not isinstance(cells, list):
        raise ValueError("ipynb: missing cells list")
    if len(cells) > max_cells:
        raise ValueError("ipynb: cell count exceeds bomb guard")
    out = []
    for cell in cells:
        if not isinstance(cell, dict):
            raise ValueError("ipynb: cell must be an object")
        cell_type = cell.get("cell_type")
        if cell_type not in ("markdown", "code", "raw"):
            raise ValueError(f"ipynb: unknown cell type {cell_type!r}")
        out.append((cell_type, _normalize_source(cell.get("source", ""))))
    return out
