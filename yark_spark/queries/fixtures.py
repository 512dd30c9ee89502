"""Deterministic on-disk fixtures for source-format queries (CSV/JSON).

The reference ingests Takeout playlist CSVs (`cmds/archive.py:229-247`) and
watch-history JSON arrays (`cmds/archive.py:317-327`). The driver fixtures
are Parquet-only, so the CSV/JSON *source* operators are exercised against
small files we materialize deterministically under the repo's fixtures/
directory; both the Spark query and the DuckDB oracle read the same file.
"""

from __future__ import annotations

import json
import os

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures")

_PLAYLIST_ROWS = [
    ("PLLOCAL_watchlater", f"vid{i:07d}XXXX", 1700000000 + 86400 * i) for i in range(20)
]

_HISTORY_ROWS = [
    {
        "titleUrl": f"https://www.youtube.com/watch?v=vid{i:07d}XXXX",
        "time": f"2024-01-{(i % 28) + 1:02d}T12:{i % 60:02d}:00Z",
        "unavailable": i % 7 == 0,
    }
    for i in range(30)
]


def fixture_path(name: str) -> str:
    ensure_fixtures()
    return os.path.join(FIXTURES_DIR, name)


def _ensure_at_import() -> None:
    """The driver may run oracle SQL (which read_csv/read_json these files)
    before any Spark query executes — so materialize on import, and the
    files are also committed to the repo."""
    try:
        ensure_fixtures()
    except OSError:
        pass  # read-only checkout: committed fixture files serve instead


def ensure_fixtures() -> None:
    os.makedirs(FIXTURES_DIR, exist_ok=True)
    csv_path = os.path.join(FIXTURES_DIR, "playlist.csv")
    if not os.path.exists(csv_path):
        with open(csv_path, "w") as f:
            f.write("playlist_id,video,added\n")
            for pl, vid, added in _PLAYLIST_ROWS:
                f.write(f"{pl},{vid},{added}\n")
    json_path = os.path.join(FIXTURES_DIR, "watch-history.json")
    if not os.path.exists(json_path):
        with open(json_path, "w") as f:
            json.dump(_HISTORY_ROWS, f, indent=1)
    # round 12: a small multi-row-group parquet file for the footer-
    # reader differential (q_parquet_footer) — BOTH sides read this
    # same committed file, so regeneration only happens when missing
    # (duckdb version drift would change bytes, not correctness)
    pq_path = os.path.join(FIXTURES_DIR, "footer.parquet")
    if not os.path.exists(pq_path):
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"""
            COPY (
                SELECT i AS id, CAST(i * 1.5 AS DOUBLE) AS score,
                       repeat('word ', 1 + i % 7) AS text,
                       CAST(i % 2 = 0 AS BOOLEAN) AS flag
                FROM range(6000) t(i)
            ) TO '{pq_path}'
            (FORMAT parquet, COMPRESSION zstd, ROW_GROUP_SIZE 1000)
            """
        )


_ensure_at_import()
