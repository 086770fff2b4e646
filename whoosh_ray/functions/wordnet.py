"""WordNet thesaurus — behavior parity with the reference
``whoosh/lang/wordnet.py``: parse the WordNet prolog synset file
(``wn_s.pl``) into synonym lookups, optionally persisted as a real
index whose stored ``syns`` column answers lookups (reference
``make_index``/``Thesaurus.to_storage``, wordnet.py:69-97/190-229).

No WordNet data ships here — tests synthesize a deterministic
``wn_s.pl``-format fixture.  Parse semantics match the reference
line-for-line: only ``s(...)`` lines count, the synset number is the
integer before the first comma, the word is the text between the first
pair of single quotes, non-``isalpha`` words are dropped, and lookups
are case-lowered.  (The reference's ``from_filename`` opens the file in
binary mode and then crashes on py3's bytes/str split — this one opens
text, with ``from_file`` accepting either.)

The storage layout is engine-idiomatic: one index dir per thesaurus
(``<storage_dir>/<indexname>``) built by the Ray pipeline with a
``word`` ID field (unique) and a stored ``syns`` list column, read back
through ``Searcher.document`` — the same shape as the reference's
``Schema(word=ID, syns=STORED)`` index.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections import defaultdict


def parse_file(f):
    """``wn_s.pl`` → (word2nums, num2words) dicts (reference
    wordnet.py:41-66)."""
    word2nums = defaultdict(list)
    num2words = defaultdict(list)
    for line in f:
        if isinstance(line, bytes):
            line = line.decode("utf-8", "replace")
        if not line.startswith("s("):
            continue
        line = line[2:]
        num = int(line[: line.find(",")])
        line = line[line.find("'") + 1:]
        word = line[: line.find("'")].lower()
        if not word.isalpha():
            continue
        word2nums[word].append(num)
        num2words[num].append(word)
    return word2nums, num2words


def synonyms(word2nums, num2words, word):
    """Union of the word's synsets minus the word itself, sorted
    (reference wordnet.py:85-97)."""
    syns = set()
    for key in word2nums[word]:
        syns.update(num2words[key])
    syns.discard(word)
    return sorted(syns)


def make_index(storage_dir: str, indexname: str, word2nums, num2words):
    """Build a synonym index: one doc per word, ``syns`` stored.
    Returns the index directory path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whoosh_ray.pipelines.build import build_index
    from whoosh_ray.state.schema import FieldSpec, IndexSchema

    words = sorted(word2nums)
    table = pa.table({
        "word": pa.array(words, pa.string()),
        "turn": pa.array([0] * len(words), pa.int32()),
        "syns": pa.array([synonyms(word2nums, num2words, w)
                          for w in words], pa.list_(pa.string())),
    })
    ix_dir = os.path.join(storage_dir, indexname)
    schema = IndexSchema(fields=(FieldSpec.id("word", unique=True),),
                         stored_columns=("syns",))
    tmp = tempfile.mkdtemp(prefix="wr_thes_")
    try:
        src = os.path.join(tmp, "thesaurus.parquet")
        pq.write_table(table, src)
        build_index(src, ix_dir, schema, conv_col="word", turn_col="turn")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return ix_dir


class Thesaurus:
    """Synonym lookups from a parsed ``wn_s.pl`` (in memory) or from a
    saved index (reference wordnet.py:100-243)."""

    def __init__(self):
        self.w2n = None
        self.n2w = None
        self.searcher = None

    @classmethod
    def from_file(cls, fileobj) -> "Thesaurus":
        thes = cls()
        thes.w2n, thes.n2w = parse_file(fileobj)
        return thes

    @classmethod
    def from_filename(cls, filename: str) -> "Thesaurus":
        with open(filename, "r", encoding="utf-8") as f:
            return cls.from_file(f)

    @classmethod
    def from_storage(cls, storage_dir: str,
                     indexname: str = "THES") -> "Thesaurus":
        from whoosh_ray.search.searcher import Searcher

        thes = cls()
        thes.searcher = Searcher(os.path.join(storage_dir, indexname))
        return thes

    def to_storage(self, storage_dir: str, indexname: str = "THES") -> str:
        if not self.w2n or not self.n2w:
            raise Exception("No synonyms loaded")
        return make_index(storage_dir, indexname, self.w2n, self.n2w)

    def synonyms(self, word: str) -> list[str]:
        word = word.lower()
        if self.searcher:
            return list(self.searcher.document(word=word)["syns"])
        return synonyms(self.w2n, self.n2w, word)
