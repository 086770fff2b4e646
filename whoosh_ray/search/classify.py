"""Key-term expansion (Bo1/Bo2/KL) + more-like-this.

Reference: /root/reference/src/whoosh/classify.py:42-205 (models +
Expander) and searching.py:495-585 (key_terms / key_terms_from_text /
more_like).  Formula parity is exact; ``more_like`` builds
``Or([Term(field, word, boost=score)])`` over the key terms and excludes
the source doc (searching.py:584-585 ``mask={docnum}``)."""

from __future__ import annotations

from collections import defaultdict
from math import log

import numpy as np

from whoosh_ray.functions.analysis import VectorAnalyzer
from whoosh_ray.search.query import Or, Term


class Bo1Model:
    """classify.py:59-68."""

    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length

    def normalizer(self, maxweight, top_total):
        if not maxweight:
            return maxweight
        f = maxweight / self.N
        return (maxweight * log((1.0 + f) / f) + log(1.0 + f)) / log(2.0)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_collection / self.N
        return weight_in_top * log((1.0 + f) / f, 2) + log(1.0 + f, 2)


class Bo2Model:
    """classify.py:71-80."""

    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length

    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        f = maxweight * self.N / self.collection_total
        return maxweight * log((1.0 + f) / f, 2) + log(1.0 + f, 2)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_top * top_total / self.collection_total
        return weight_in_top * log((1.0 + f) / f, 2) + log(1.0 + f, 2)


class KLModel:
    """classify.py:83-99."""

    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length

    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        return (maxweight * log(self.collection_total / top_total) / log(2.0)
                * top_total)

    def score(self, weight_in_top, weight_in_collection, top_total):
        wit_over_tt = weight_in_top / top_total
        wic_over_ct = weight_in_collection / self.collection_total
        if wit_over_tt < wic_over_ct:
            return 0
        return wit_over_tt * log(
            wit_over_tt / (weight_in_top / self.collection_total), 2)


class Expander:
    """classify.py:102-205, fed from stored text (the flagship schema
    stores text; the reference falls back to stored fields the same way,
    classify.py:152-158)."""

    def __init__(self, searcher, fieldname: str, model=Bo1Model):
        self.searcher = searcher
        self.fieldname = fieldname
        if isinstance(model, type):
            model = model(searcher.doc_count_all,
                          searcher.manifest.field_length(fieldname))
        self.model = model
        self.topN_weight: dict[str, float] = defaultdict(float)
        self.top_total = 0.0
        spec = searcher.schema.field(fieldname)
        self._analyzer = VectorAnalyzer(spec.analyzer)
        self._boost = spec.boost

    def add_text(self, text: str) -> None:
        agg = self._analyzer.aggregate([text])
        terms = agg["term_dict"][agg["term_codes"]]
        weights = agg["tfs"].astype(np.float64) * self._boost
        for w, wt in zip(terms, weights):
            self.topN_weight[w] += wt
        self.top_total += float(weights.sum())

    def add_document(self, docid: int) -> None:
        # prefer the stored term vector (no re-analysis; reference
        # Expander.add_document uses reader.vector when the field has
        # one, classify.py:123-130); fall back to re-tokenizing the
        # stored text — same weights (tf), different latency
        vec = (self.searcher.vector(docid, self.fieldname)
               if hasattr(self.searcher, "vector") else None)
        if vec is not None:
            terms, weights = vec
            for w, wt in zip(terms, weights):
                self.topN_weight[w] += wt
            self.top_total += float(sum(weights))
            return
        stored = self.searcher.stored(np.array([docid]),
                                      columns=[self.fieldname])
        if stored.num_rows:
            val = stored[self.fieldname][0].as_py()
            if val:
                self.add_text(val)

    def expanded_terms(self, number: int, normalize: bool = True):
        model = self.model
        tlist = []
        maxweight = 0.0
        if not self.topN_weight:
            return []
        for word, weight in self.topN_weight.items():
            cf = self.searcher.frequency(self.fieldname, word)
            if cf:
                score = model.score(weight, cf, self.top_total)
                maxweight = max(maxweight, score)
                tlist.append((score, word))
        norm = (model.normalizer(maxweight, self.top_total) if normalize
                else maxweight)
        tlist = [(weight / norm, t) for weight, t in tlist]
        tlist.sort(key=lambda x: (0 - x[0], x[1]))
        return [(t, weight) for weight, t in tlist[:number]]


def key_terms(searcher, docids, fieldname: str, numterms: int = 5,
              model=Bo1Model, normalize: bool = True):
    e = Expander(searcher, fieldname, model)
    for d in docids:
        e.add_document(int(d))
    return e.expanded_terms(numterms, normalize=normalize)


def key_terms_from_text(searcher, fieldname: str, text: str,
                        numterms: int = 5, model=Bo1Model,
                        normalize: bool = True):
    e = Expander(searcher, fieldname, model)
    e.add_text(text)
    return e.expanded_terms(numterms, normalize=normalize)


def more_like(searcher, docid: int, fieldname: str, text: str | None = None,
              top: int = 10, numterms: int = 5, model=Bo1Model,
              normalize: bool = False):
    if text:
        kts = key_terms_from_text(searcher, fieldname, text,
                                  numterms=numterms, model=model,
                                  normalize=normalize)
    else:
        kts = key_terms(searcher, [docid], fieldname, numterms=numterms,
                        model=model, normalize=normalize)
    if not kts:
        from whoosh_ray.search.searcher import Results

        return Results(searcher, np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.float64))
    q = Or([Term(fieldname, word, boost=weight) for word, weight in kts])
    r = searcher.search(q, limit=None)
    keep = r.docids != docid  # mask={docnum}, searching.py:585
    from whoosh_ray.search.searcher import Results

    return Results(searcher, r.docids[keep][:top], r.scores[keep][:top])
