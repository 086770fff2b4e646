"""whoosh_ray in the reference's own idiom — the drop-in workflow a
whoosh user already knows, line for line:

    ix = index.create_in(dirname, schema)
    w = ix.writer(); w.add_document(...); w.commit()
    with ix.searcher() as s:
        results = s.search(parser.parse("..."), limit=10)
        page = s.search_page(query, 2, pagelen=5)

Run:  python examples/whoosh_style.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

from whoosh_ray import index  # noqa: E402
from whoosh_ray.search.qparser import QueryParser  # noqa: E402
from whoosh_ray.state.schema import FieldSpec, IndexSchema  # noqa: E402

WORK = "/tmp/wr_whoosh_style"
shutil.rmtree(WORK, ignore_errors=True)
os.makedirs(WORK)

# 1. schema + empty index (searchable immediately)
schema = IndexSchema(fields=(
    FieldSpec.text("title", stored=True, positions=True),
    FieldSpec.text("body", stored=True, positions=True),
    FieldSpec.keyword("tags", lowercase=True, stored=True),
    FieldSpec.boolean("published", stored=True),
    FieldSpec.id("doc", stored=True, unique=True)))
ix = index.create_in(WORK, schema, conv_col="doc")

# 2. the familiar writer loop
w = ix.writer()
docs = [
    ("Ray Data joins", "distributed joins stream arrow blocks", "ray data", True),
    ("Index internals", "posting lists compress with varint delta blocks", "index internals", True),
    ("Draft: sharding", "hash sharding balances skewed keys", "index ray", False),
    ("Query planning", "the planner prunes blocks with skip info", "query", True),
]
for i, (title, body, tags, pub) in enumerate(docs):
    w.add_document(doc=f"d{i}", title=title, body=body, tags=tags,
                   published=pub, turn_idx=0)
w.commit()
ix.refresh()
print(f"indexed {ix.doc_count_all()} docs; fields: {ix.field_names()}")

# 3. parse + search inside a context manager
parser = QueryParser("body", schema, plugins=("fuzzy",))
with ix.searcher() as s:
    for qs in ["blocks", "blocks AND published:true", "tags:ray",
               'title:"query planning"', "shardng~"]:
        hits = s.search(parser.parse(qs), limit=10)
        print(f"{qs!r:38} -> {[h['doc'] for h in hits.hits()]}")

    # 4. paging
    page = s.search_page(parser.parse("blocks OR sharding OR planner"),
                         1, pagelen=2)
    print(f"page {page.pagenum}/{page.pagecount}, total {page.total}:",
          [h["title"] for h in page])

# 5. unique-key upsert + delete, whoosh style
w = ix.writer()
w.update_document(doc="d2", title="Sharding", body="hash sharding, now "
                  "with range splits", tags="index ray", published=True,
                  turn_idx=0)
w.commit()
ix.delete_by_term("tags", "query")
ix.refresh()
print(f"after upsert+delete: {ix.doc_count()} live / "
      f"{ix.doc_count_all()} total")

ix.optimize()
print(f"optimized to {len(ix._manifest.segments)} segment(s), "
      f"{ix.doc_count_all()} docs")

ray.shutdown()
