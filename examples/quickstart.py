"""whoosh_ray quickstart — what a whoosh user writes here instead.

whoosh:                                  whoosh_ray:
  ix = index.create_in(dir, schema)        build_index(parquet, dir, schema)
  w = ix.writer(); w.add_document(...)     (rows come from the Parquet table)
  s = ix.searcher()                        s = Searcher(dir)
  s.search(parser.parse("..."))            s.search(QueryParser(...).parse(...))

Run:  python examples/quickstart.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

from whoosh_ray.pipelines.build import build_index  # noqa: E402
from whoosh_ray.pipelines.merge import merge_segments  # noqa: E402
from whoosh_ray.pipelines.mutate import delete_by_term  # noqa: E402
from whoosh_ray.search import (And, Count, FieldFacet, Or, Phrase,  # noqa: E402
                               Searcher, Term)
from whoosh_ray.search.qparser import QueryParser  # noqa: E402
from whoosh_ray.sources.transcripts import write_transcripts  # noqa: E402
from whoosh_ray.state.schema import transcripts_schema  # noqa: E402

WORK = "/tmp/wr_quickstart"
shutil.rmtree(WORK, ignore_errors=True)

# 1. a Parquet corpus (multi-turn transcripts) and a schema
src = write_transcripts(WORK + "/src", n_convs=2000)
schema = transcripts_schema()  # text TEXT + role/tool/conv_id ID + stored ts

# 2. distributed, resumable index build (one Ray Data pipeline)
manifest = build_index(src, WORK + "/ix", schema)
print(f"indexed {manifest.doc_count_all} turns "
      f"in {manifest.settings['build_secs']:.2f}s "
      f"({len(manifest.segments)} segments)")

# 3. BM25 search — query objects or the parser
s = Searcher(WORK + "/ix")
for q in [Term("text", "deploy"),
          And([Term("text", "deploy"), Term("role", "user")]),
          Or([Term("text", "cluster"), Term("text", "error")]),
          Phrase("text", ["deploy", "render"]),
          QueryParser("text", schema).parse('render "deploy render"~2'),
          QueryParser("text", schema).parse("rend* AND role:user")]:
    r = s.search_topk(q, limit=3)
    print(f"{str(type(q).__name__):16s} top3 docids={r.docids.tolist()} "
          f"scores={[round(x, 3) for x in r.scores.tolist()]}")

# 4. facets / grouping
r = s.search(Term("text", "deploy"), limit=None,
             groupedby=FieldFacet("role"), maptype=Count)
print("hits per role:", r.groups())

# 5. highlights
hit = s.search(Term("text", "deploy"), limit=1)
text = hit.to_arrow(columns=["text"])["text"][0].as_py()
from whoosh_ray.search.highlight import Highlighter, UppercaseFormatter  # noqa: E402

print("highlight:", Highlighter(formatter=UppercaseFormatter())
      .highlight(text, {"deploy"}, top=1)[:90], "...")

# 6. mutate + merge: tombstone deletes, then OPTIMIZE expunges them
n = delete_by_term(WORK + "/ix", "conv_id", "conv000007")
m = merge_segments(WORK + "/ix", policy="OPTIMIZE", target_segments=2,
                   concurrency=2)
print(f"deleted {n} docs; merged to {len(m.segments)} segments "
      f"(doc_count now {m.doc_count_all})")

ray.shutdown()
