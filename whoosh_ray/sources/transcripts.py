"""Deterministic synthetic conversation-transcript generator (FIXTURES.md F1).

Input-table shape per the driver contract (BASELINE.json ``input_hint``)::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Generation is pure numpy from a fixed seed, so any scale regenerates
bit-identically (tests at ~200 turns, bench at >=500k turns) with no
external data.  The vocabulary deliberately exercises the analyzer edge
cases: reference stopwords, 1-char tokens (minsize=2), mixed case, and
``big-time`` / ``under_score`` / ``3.141``-style tokens pinning the default
token regex (reference: src/whoosh/analysis/tokenizers.py:33,
filters.py:41-45).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = np.array(["user", "assistant", "tool"], dtype=object)
TOOLS = np.array(["", "bash", "search", "browser"], dtype=object)

# ~200-word vocabulary, Zipf-ish when sampled by rank.
_BASE_WORDS = [
    # reference stopwords (stripped by StandardAnalyzer)
    "the", "a", "is", "to", "and", "of", "in", "it", "you", "that", "for",
    "on", "with", "as", "this", "be", "are", "or", "an", "if", "will",
    # 1-char tokens (stripped by minsize=2)
    "i", "x", "y", "k", "q",
    # mixed case + regex pinning tokens
    "Deploy", "RENDER", "CamelCase", "big-time", "under_score", "3.141",
    "v2.0.1", "a.b.c", "TBD", "e-mail",
    # agent-transcript flavored content words
    "deploy", "render", "cluster", "error", "retry", "timeout", "query",
    "index", "search", "token", "batch", "shuffle", "partition", "actor",
    "stream", "commit", "merge", "segment", "posting", "score", "rank",
    "model", "train", "eval", "loss", "gradient", "checkpoint", "resume",
    "parquet", "arrow", "python", "bash", "browser", "file", "path",
    "write", "read", "open", "close", "run", "test", "fail", "pass",
    "fix", "bug", "patch", "branch", "rebase", "push", "pull", "request",
    "review", "approve", "reject", "user", "assistant", "system", "prompt",
    "response", "context", "window", "memory", "cache", "disk", "network",
    "latency", "throughput", "scale", "node", "worker", "driver", "head",
    "object", "store", "spill", "block", "schema", "column", "row", "table",
    "filter", "groupby", "aggregate", "join", "sort", "limit", "union",
    "install", "package", "import", "module", "function", "class", "method",
    "variable", "constant", "string", "integer", "float", "boolean", "list",
    "dict", "tuple", "set", "loop", "condition", "return", "yield", "raise",
    "except", "finally", "assert", "lambda", "global", "local", "scope",
    "thread", "process", "queue", "lock", "mutex", "semaphore", "signal",
    "event", "timer", "clock", "date", "time", "zone", "format", "parse",
    "encode", "decode", "compress", "expand", "hash", "digest", "sign",
    "verify", "encrypt", "decrypt", "key", "value", "pair", "map", "reduce",
    "apples", "bananas", "cherries", "grapes", "lemons", "mangoes",
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]
VOCAB = np.array(_BASE_WORDS, dtype=object)

_BASE_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)


def generate_transcripts(n_convs: int = 40, seed: int = 42) -> pa.Table:
    """Generate the F1 transcripts table for ``n_convs`` conversations.

    turns per conversation are deterministic in 3..12; total rows ~= 7.5 *
    n_convs.  Rows are emitted already sorted by (conv_id, turn_idx).
    """
    rng = np.random.default_rng(seed)
    turns = rng.integers(3, 13, n_convs)
    total = int(turns.sum())
    conv_idx = np.repeat(np.arange(n_convs, dtype=np.int64), turns)
    starts = np.concatenate(([0], np.cumsum(turns)))[:-1]
    turn_idx = (np.arange(total, dtype=np.int64) - starts[conv_idx]).astype(np.int32)

    conv_ids = np.array([f"conv{c:06d}" for c in range(n_convs)], dtype=object)
    conv_col = conv_ids[conv_idx]
    role_col = ROLES[turn_idx % 3]
    tool_col = TOOLS[rng.integers(0, 4, total)]

    # Zipf-like rank sampling over the vocabulary.
    n_words_per_turn = rng.integers(5, 61, total)
    tot_words = int(n_words_per_turn.sum())
    ranks = rng.zipf(1.3, tot_words)
    ranks = np.minimum(ranks - 1, len(VOCAB) - 1)
    words = VOCAB[ranks]
    cuts = np.concatenate(([0], np.cumsum(n_words_per_turn)))
    texts = np.empty(total, dtype=object)
    join = " ".join
    for i in range(total):
        texts[i] = join(words[cuts[i]: cuts[i + 1]])

    ts = _BASE_EPOCH_US + conv_idx * 3_600_000_000 + turn_idx.astype(np.int64) * 30_000_000
    return pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role_col, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool_col, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def write_transcripts(path: str, n_convs: int, seed: int = 42,
                      rows_per_file: int = 250_000) -> str:
    """Write the table as (possibly several) parquet files under ``path``."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    t = generate_transcripts(n_convs, seed)
    n = t.num_rows
    nfiles = max(1, (n + rows_per_file - 1) // rows_per_file)
    for i in range(nfiles):
        # small row groups so parallel readers can split within files
        pq.write_table(t.slice(i * rows_per_file, rows_per_file),
                       os.path.join(path, f"transcripts-{i:04d}.parquet"),
                       row_group_size=16384)
    return path
