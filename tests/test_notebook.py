"""Jupyter-notebook ingest tests (round 12): both source forms,
output stripping (the PII/bloat stance), cell-type validation, the
nbformat<4 boundary, malformed-JSON typed errors, and roundtrip."""

import json

import pytest

from yark_spark.operators.notebook import ipynb_build, ipynb_cells

CELLS = [
    ("markdown", "intro words here"),
    ("code", "print('hello')\nx = 1"),
    ("markdown", "middle section"),
    ("code", "df.head()"),
]


def test_roundtrip_source_only():
    assert ipynb_cells(ipynb_build(CELLS)) == CELLS


def test_outputs_are_stripped():
    raw = ipynb_build(CELLS, with_outputs=True)
    assert "LEAKED ROW 42" in raw  # the noise IS on the wire
    joined = " ".join(src for _t, src in ipynb_cells(raw))
    assert "LEAKED" not in joined and "DataFrame" not in joined


def test_both_source_forms_on_wire():
    raw = json.loads(ipynb_build(CELLS))
    forms = {type(c["source"]).__name__ for c in raw["cells"]}
    assert forms == {"list", "str"}  # even cells list-of-lines, odd string


def test_multiline_list_form_preserves_newlines():
    cells = [("code", "a\nb\nc")]  # index 0 → list form
    raw = json.loads(ipynb_build(cells))
    assert raw["cells"][0]["source"] == ["a\n", "b\n", "c"]
    assert ipynb_cells(ipynb_build(cells)) == cells


def test_raw_cells_pass_through():
    nb = json.dumps(
        {"nbformat": 4, "cells": [{"cell_type": "raw", "source": "latex %% here"}]}
    )
    assert ipynb_cells(nb) == [("raw", "latex %% here")]


def test_missing_source_defaults_empty():
    nb = json.dumps({"nbformat": 4, "cells": [{"cell_type": "markdown"}]})
    assert ipynb_cells(nb) == [("markdown", "")]


def test_nbformat3_typed_boundary():
    nb = json.dumps({"nbformat": 3, "worksheets": [{"cells": []}]})
    with pytest.raises(NotImplementedError, match="worksheets"):
        ipynb_cells(nb)


def test_errors():
    with pytest.raises(ValueError, match="JSON"):
        ipynb_cells("{not json")
    with pytest.raises(ValueError, match="top level"):
        ipynb_cells("[1, 2]")
    with pytest.raises(ValueError, match="cells"):
        ipynb_cells(json.dumps({"nbformat": 4}))
    with pytest.raises(ValueError, match="cell type"):
        ipynb_cells(json.dumps({"nbformat": 4, "cells": [{"cell_type": "magic"}]}))
    with pytest.raises(ValueError, match="source"):
        ipynb_cells(
            json.dumps(
                {"nbformat": 4, "cells": [{"cell_type": "code", "source": [1, 2]}]}
            )
        )
    with pytest.raises(ValueError, match="bomb"):
        ipynb_cells(ipynb_build(CELLS), max_cells=2)
