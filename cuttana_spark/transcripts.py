"""Deterministic transcripts fixture generator (FIXTURES.md §1).

Schema is BASELINE.json's ``input_hint``:
  (conv_id: string, turn_idx: int32, role: string, text: string,
   tool: string nullable, ts: timestamp)

RNG consumption order (verified to reproduce the measured baseline graph of
42,193 vertices / 52,726 undirected edges at N_CONV=2000, see BASELINE.md):
``rng = random.Random(42)``; per conversation: ``n = rng.randint(2, 40)``;
per turn: ``rng.random() < 0.3`` and, only when true, ``rng.randrange(50)``.
No other draws. The "10% system at turn 0" is derived without RNG
(``c % 10 == 0``) so it cannot perturb the graph-determining draws.

The ``text`` column is a pure function of (conv_id, turn_idx) — that is the
per-row invariant the north rule asserts: reading back ordered by
(conv_id, turn_idx) must reproduce text exactly.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
SEED = 42
N_TOOLS = 50
TOOL_PROB = 0.3
MIN_TURNS, MAX_TURNS = 2, 40

SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("tool", pa.string(), nullable=True),
        pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
    ]
)


def turn_text(conv_id: str, turn_idx: int) -> str:
    h = hashlib.sha256(f"{conv_id}|{turn_idx}".encode()).hexdigest()[:32]
    return f"turn {turn_idx} of {conv_id}: {h}"


def generate_rows(n_conv: int, seed: int = SEED):
    """Yield transcript rows as dicts, deterministic in ``seed``."""
    rng = random.Random(seed)
    epoch_us = int(EPOCH.timestamp() * 1_000_000)
    for c in range(n_conv):
        conv_id = f"conv_{c:06d}"
        n_turns = rng.randint(MIN_TURNS, MAX_TURNS)
        tools: list[str | None] = []
        for _ in range(n_turns):
            if rng.random() < TOOL_PROB:
                tools.append(f"tool_{rng.randrange(N_TOOLS)}")
            else:
                tools.append(None)
        for t in range(n_turns):
            if t == 0:
                role = "system" if c % 10 == 0 else "user"
            elif tools[t - 1] is not None:
                role = "tool"
            else:
                role = "user" if t % 2 == 0 else "assistant"
            yield {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": turn_text(conv_id, t),
                "tool": tools[t],
                "ts_us": epoch_us + (c * 3600 + t * 13) * 1_000_000,
            }


def generate_table(n_conv: int, seed: int = SEED) -> pa.Table:
    cols: dict[str, list] = {f: [] for f in ("conv_id", "turn_idx", "role", "text", "tool", "ts_us")}
    for row in generate_rows(n_conv, seed):
        for k, v in row.items():
            cols[k].append(v)
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts_us"], pa.timestamp("us", tz="UTC")),
        },
        schema=SCHEMA,
    )


def write_parquet(path: str, n_conv: int, seed: int = SEED) -> str:
    """Write the fixture as a single parquet file; returns the path."""
    pq.write_table(generate_table(n_conv, seed), path)
    return path


def expected_edges(n_conv: int, seed: int = SEED) -> set[tuple[str, str]]:
    """Pure-Python oracle for the derived undirected edge set (node keys).

    Node keys: ``turn|{conv_id}|{turn_idx:05d}`` and ``tool|{name}``.
    Edges: consecutive turns within a conversation + turn↔tool pairs,
    canonicalized (min, max).
    """
    edges: set[tuple[str, str]] = set()
    by_conv: dict[str, list[dict]] = {}
    for row in generate_rows(n_conv, seed):
        by_conv.setdefault(row["conv_id"], []).append(row)
    for conv_id, rows in by_conv.items():
        rows.sort(key=lambda r: r["turn_idx"])
        keys = [f"turn|{conv_id}|{r['turn_idx']:05d}" for r in rows]
        for a, b in zip(keys, keys[1:]):
            edges.add((min(a, b), max(a, b)))
        for r, k in zip(rows, keys):
            if r["tool"] is not None:
                tk = f"tool|{r['tool']}"
                edges.add((min(k, tk), max(k, tk)))
    return edges
