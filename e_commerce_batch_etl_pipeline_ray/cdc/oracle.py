"""Single-process replay oracle: the ground truth the distributed engine
must match row-for-row (SURVEY.md §5c).

Replays every event in strict LSN order through a plain Python dict —
upsert on I/U, tombstone on D (the tombstone keeps the delete's LSN so a
stale earlier event cannot resurrect the key; duplicate LSNs are idempotent
re-applies of identical payloads).
"""

from __future__ import annotations

import pyarrow as pa


def replay(events: pa.Table) -> dict[tuple[str, str], dict]:
    """events: unified table with lsn/op/repo/path/commit/content/
    content_sha256 (+ optional lang). Returns key -> final row dict
    (including tombstones with op='D')."""
    cols = events.column_names
    rows = events.to_pylist()
    rows.sort(key=lambda r: r["lsn"])
    state: dict[tuple[str, str], dict] = {}
    for r in rows:
        key = (r["repo"], r["path"])
        cur = state.get(key)
        if cur is not None and r["lsn"] < cur["lsn"]:
            continue  # stale (only possible with duplicate delivery)
        state[key] = {
            "lsn": r["lsn"],
            "op": r["op"],
            "commit": r["commit"],
            "lang": r.get("lang") if "lang" in cols or "lang" in r else None,
            "content": r["content"],
            "content_sha256": r["content_sha256"],
        }
    return state


def live_rows(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], dict]:
    """Drop tombstones -> the expected visible table."""
    return {k: v for k, v in state.items() if v["op"] != "D"}
