"""Measure the reference engine's single-node throughput on the SAME
transcript corpus (oracle import from /root/reference/src), for
BASELINE.md.  Usage: python scripts/baseline_whoosh.py [n_convs]
"""

from __future__ import annotations

import functools
import json
import sys
import tempfile
import time
import types

sys.path.insert(0, "/root/repo")

m = types.ModuleType("cached_property")
m.cached_property = functools.cached_property
sys.modules["cached_property"] = m
sys.path.insert(0, "/root/reference/src")


def main(n_convs: int):
    from whoosh import fields, index
    from whoosh.analysis import StandardAnalyzer
    from whoosh.query import And, Or, Phrase, Prefix, Term

    from whoosh_ray.sources.transcripts import generate_transcripts

    table = generate_transcripts(n_convs=n_convs)
    n = table.num_rows
    schema = fields.Schema(
        conv_id=fields.ID(stored=True),
        turn_idx=fields.NUMERIC(int, 32, stored=True),
        role=fields.ID(stored=True),
        tool=fields.ID(stored=True),
        text=fields.TEXT(analyzer=StandardAnalyzer(), phrase=True, stored=True),
    )
    tmp = tempfile.mkdtemp(prefix="whoosh_baseline_")
    ix = index.create_in(tmp, schema)
    cols = {c: table[c].to_pylist() for c in
            ("conv_id", "turn_idx", "role", "tool", "text")}
    t0 = time.time()
    w = ix.writer(limitmb=512)
    for i in range(n):
        w.add_document(conv_id=cols["conv_id"][i],
                       turn_idx=cols["turn_idx"][i],
                       role=cols["role"][i], tool=cols["tool"][i],
                       text=cols["text"][i])
    w.commit()
    t_build = time.time() - t0

    qset = [
        Term("text", "deploy"), Term("text", "november"),
        And([Term("text", "deploy"), Term("text", "render")]),
        Or([Term("text", "cluster"), Term("text", "error")]),
        Or([Term("text", "deploy"), Term("text", "the")]),
        Phrase("text", ["deploy", "render"]),
        Prefix("text", "rend"),
        And([Term("text", "deploy"), Term("role", "user")]),
    ]
    with ix.searcher() as s:
        t0 = time.time()
        for q in qset:
            s.search(q, limit=10)
        t_q = time.time() - t0
    print(json.dumps({
        "engine": "whoosh(reference)", "n_turns": n,
        "build_sec": round(t_build, 2),
        "turns_per_sec": round(n / t_build, 1),
        "queryset_sec": round(t_q, 3),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6700)
