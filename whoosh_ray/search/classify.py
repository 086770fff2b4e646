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


class ExpansionModel:
    """Expansion-model plug-point base (classify.py:42-56)."""

    def __init__(self, doc_count: int, field_length: int):
        self.N = doc_count
        self.collection_total = field_length
        self.mean_length = (self.collection_total / self.N if self.N
                            else 0)

    def normalizer(self, maxweight, top_total):
        raise NotImplementedError

    def score(self, weight_in_top, weight_in_collection, top_total):
        raise NotImplementedError


class Bo1Model(ExpansionModel):
    """classify.py:59-68."""

    def normalizer(self, maxweight, top_total):
        if not maxweight:
            return maxweight
        f = maxweight / self.N
        return (maxweight * log((1.0 + f) / f) + log(1.0 + f)) / log(2.0)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_collection / self.N
        return weight_in_top * log((1.0 + f) / f, 2) + log(1.0 + f, 2)


class Bo2Model(ExpansionModel):
    """classify.py:71-80."""

    def normalizer(self, maxweight, top_total):
        if not self.collection_total:
            return maxweight
        f = maxweight * self.N / self.collection_total
        return maxweight * log((1.0 + f) / f, 2) + log(1.0 + f, 2)

    def score(self, weight_in_top, weight_in_collection, top_total):
        f = weight_in_top * top_total / self.collection_total
        return weight_in_top * log((1.0 + f) / f, 2) + log(1.0 + f, 2)


class KLModel(ExpansionModel):
    """classify.py:83-99."""

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

    def add(self, vector) -> None:
        """Add one top document's (text, weight) forward vector
        (reference classify.py:131-148 — e.g. reader.vector_as("weight",
        docnum, fieldname))."""
        total = 0.0
        for word, weight in vector:
            total += weight
            self.topN_weight[word] += weight
        self.top_total += total

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


# ---- public analysis helpers the reference module exports ----
# (classify.py:208-395: shingling, simhash fingerprints, 1-D k-means,
# sliding-window clusters, variance utilities)


def shingles(input, size: int = 2):
    """(shingle, count) pairs over a sliding window (classify.py:208)."""
    d: dict = defaultdict(int)
    for i in range(len(input) - (size - 1)):
        d[input[i:i + size]] += 1
    return d.items()


def _varhash(s: str, hashbits: int) -> int:
    """Variable-width string hash (classify.py:238-252)."""
    if s == "":
        return 0
    x = ord(s[0]) << 7
    m = 1000003
    mask = 2 ** hashbits - 1
    for ch in s:
        x = ((x * m) ^ ord(ch)) & mask
    x ^= len(s)
    if x == -1:
        x = -2
    return x


def simhash(features, hashbits: int = 32) -> int:
    """Charikar fingerprint of weighted features (classify.py:216-235).
    NB at the default 32 bits the reference keys on Python's builtin
    ``hash`` (process-salted for strings) — mirrored; pass another
    width for the deterministic variable-width hash.  The distributed
    SimHash pipeline (pipelines/dedup.py) uses SipHash instead."""
    hashfn = hash if hashbits == 32 else (lambda s: _varhash(s, hashbits))
    vs = [0] * hashbits
    for feature, weight in features:
        h = hashfn(feature)
        for i in range(hashbits):
            if h & (1 << i):
                vs[i] += weight
            else:
                vs[i] -= weight
    out = 0
    for i, v in enumerate(vs):
        if v > 0:
            out |= 1 << i
    return out


def hamming_distance(first_hash: int, other_hash: int,
                     hashbits: int = 32) -> int:
    """Bit distance between fingerprints (classify.py:254-260)."""
    x = (first_hash ^ other_hash) & ((1 << hashbits) - 1)
    return int(bin(x).count("1"))


def kmeans(data, k: int, t: float = 0.0001, distfun=None, maxiter: int = 50,
           centers=None):
    """1-D k-means (classify.py:265-334): returns (labels, centroids).
    Vectorized lloyd steps; identical semantics — first-minimum label
    ties, empty clusters keep their summed value, stop when the summed
    squared error changes by < ``t`` or after ``maxiter`` passes.
    Initial centroids are ``random.sample(data, k)`` when not given
    (same seeding contract as the reference)."""
    import random

    arr = np.asarray(data, dtype=np.float64)
    n = len(arr)
    c = np.array(centers if centers else random.sample(list(data), k),
                 dtype=np.float64)
    error = 1.797693e308
    niter = 0
    labels = np.zeros(n, dtype=np.int64)
    while True:
        old_error = error
        dist = (arr[:, None] - c[None, :]) ** 2
        labels = np.argmin(dist, axis=1)  # first min wins, like strict <
        error = float(dist[np.arange(n), labels].sum())
        counts = np.bincount(labels, minlength=k)
        sums = np.bincount(labels, weights=arr, minlength=k)
        c = np.where(counts > 0, sums / np.maximum(counts, 1), sums)
        niter += 1
        if abs(error - old_error) < t or niter > maxiter:
            break
    return labels.tolist(), c.tolist()


def two_pass_variance(data) -> float:
    """Sample variance, two-pass (classify.py:337-352)."""
    seq = list(data)
    n = len(seq)
    mean = sum(seq) / n
    return sum((x - mean) ** 2 for x in seq) / (n - 1)


def weighted_incremental_variance(data_weight_pairs) -> float:
    """West's weighted incremental variance (classify.py:355-367)."""
    mean = 0.0
    s = 0.0
    sumweight = 0.0
    for x, weight in data_weight_pairs:
        temp = weight + sumweight
        q = x - mean
        r = q * weight / temp
        s += sumweight * q * r
        mean += r
        sumweight = temp
    return s / (sumweight - 1)


def swin(data, size):
    """Sliding-window clusters over sorted 1-D data (classify.py:370-
    383): (left, right, span, variance) tuples, widest-then-tightest
    first."""
    clusters = []
    for i, left in enumerate(data):
        j = i
        right = data[j]
        while j < len(data) - 1 and right - left < size:
            j += 1
            right = data[j]
        v = 99999
        if j - i > 1:
            v = two_pass_variance(data[i:j + 1])
        clusters.append((left, right, j - i, v))
    clusters.sort(key=lambda x: (0 - x[2], x[3]))
    return clusters
