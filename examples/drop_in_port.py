"""A reference whoosh tutorial program, ported by changing ONLY the
package name in the imports (whoosh.X -> whoosh_ray.X).  Every line
below is the reference idiom: composed analyzers, Schema(**kwargs),
create_in/open_dir, writer/commit, QueryParser + add_plugin,
SimpleParser search boxes, highlights.

Run:  python examples/drop_in_port.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

# ---- the only change from the whoosh original: whoosh -> whoosh_ray
from whoosh_ray import index  # noqa: E402
from whoosh_ray.analysis import (LowercaseFilter, RegexTokenizer,  # noqa: E402
                                 StemFilter, StopFilter)
from whoosh_ray.fields import ID, KEYWORD, TEXT, Schema  # noqa: E402
from whoosh_ray.qparser import (FuzzyTermPlugin, QueryParser,  # noqa: E402
                                SimpleParser)

WORK = "/tmp/wr_drop_in_port"
shutil.rmtree(WORK, ignore_errors=True)
os.makedirs(WORK)

# 1. a composed analyzer, the reference way
my_analyzer = (RegexTokenizer() | LowercaseFilter() | StopFilter()
               | StemFilter())

schema = Schema(
    doc=ID(stored=True, unique=True),
    title=TEXT(stored=True),
    body=TEXT(analyzer=my_analyzer, stored=True),
    tags=KEYWORD(stored=True, lowercase=True, commas=True),
)

ix = index.create_in(WORK, schema, conv_col="doc")

# 2. write documents
writer = ix.writer()
writer.add_document(doc="a", title="Indexing with Ray",
                    body="Distributed indexing pipelines scale nicely",
                    tags="ray,indexing")
writer.add_document(doc="b", title="Query parsing",
                    body="The parser understands fuzzy queries and plugins",
                    tags="parser,queries")
writer.add_document(doc="c", title="Scaling searches",
                    body="Searches scale across many index segments",
                    tags="ray,scaling")
writer.commit()

# 3. query with the default parser + a plugin
ix = index.open_dir(WORK)
parser = QueryParser("body", ix.schema)
parser.add_plugin(FuzzyTermPlugin())
with ix.searcher() as searcher:
    results = searcher.search(parser.parse("scaleing~2"), limit=5)
    print("fuzzy:", [hit["doc"] for hit in results])
    assert [hit["doc"] for hit in results] == ["a", "c"]

    # 4. an end-user search box: SimpleParser (+/-/phrase grammar)
    simple = SimpleParser("body", ix.schema)
    results = searcher.search(simple.parse("+scale -parser"), limit=5)
    print("simple:", [hit["doc"] for hit in results])
    assert [hit["doc"] for hit in results] == ["a", "c"]

    # 5. highlights
    results = searcher.search(parser.parse("pipelines"), limit=5)
    for hit in results:
        print("highlight:", hit.highlights("body"))

print("drop-in port OK")
ray.shutdown()
