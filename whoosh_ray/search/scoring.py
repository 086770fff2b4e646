"""Scoring models — rank- and score-identical to the reference.

Reference formulas (/root/reference/src/whoosh/scoring.py):

- idf: ``log(doc_count_all / (df + 1)) + 1``            (:53-60)
- BM25: ``idf * tf*(K1+1) / (tf + K1*((1-B) + B*fl/avgfl))``  (:266-279)
  with B=0.75, K1=1.2, per-field ``<field>_B`` overrides (:281-305);
- doc length ``fl`` is the *dequantized* stored byte
  (codec/whoosh3.py:420-433 + util/numeric.py:288-317);
- ``avgfl`` = exact total field length / doc_count_all (searching.py:259-262);
- non-scorable fields fall back to WeightScorer (score == weight)
  (:317-320, :92-124);
- TF_IDF: ``weight * idf`` (:449-474); Frequency: raw weight (:443-446).

All scorers are vectorized: one numpy expression over a decoded posting
array.  ``max_quality``/``block_quality`` mirror the reference's
block-max machinery (scoring.py:199-217) for WAND pruning.
"""

from __future__ import annotations

from math import log

import numpy as np

from whoosh_ray.functions.lengths import byte_to_length


def idf(doc_count_all: int, df: int) -> float:
    return log(doc_count_all / (df + 1)) + 1


class WeightingModel:
    """Factory for per-(field, term) vectorized scorers.

    ``use_final``/``final`` reproduce the reference's per-document
    post-processing hook (scoring.py:51-76): when ``use_final`` is
    True, ``final(searcher, docnum, score)`` adjusts every matched
    doc's aggregate score before ranking (applied in Searcher.search;
    pruned top-k paths fall back to exhaustive evaluation since score
    bounds no longer hold)."""

    def idf(self, searcher, fieldname: str, text: str) -> float:
        """Inverse document frequency of one term (reference
        scoring.py:53-60: log(N / (df + 1)) + 1 over the parent/global
        reader)."""
        import math

        parent = (searcher.get_parent() if hasattr(searcher, "get_parent")
                  else searcher)
        n = parent.doc_frequency(fieldname, text)
        dc = parent.doc_count_all
        if callable(dc):  # reference readers expose it as a method
            dc = dc()
        return math.log(dc / (n + 1)) + 1


    use_final = False

    def scorer(self, searcher, fieldname: str, text: str, qf: int = 1):
        raise NotImplementedError

    def final(self, searcher, docnum: int, score: float) -> float:
        return score


class Scorer:
    def score_array(self, tfs: np.ndarray, len_bytes: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def max_quality(self) -> float:
        raise NotImplementedError

    def block_quality(self, max_weight: float, min_len_byte: int) -> float:
        raise NotImplementedError


class BM25F(WeightingModel):
    def __init__(self, B: float = 0.75, K1: float = 1.2, **kwargs):
        self.B = B
        self.K1 = K1
        self._field_B = {k[:-2]: v for k, v in kwargs.items() if k.endswith("_B")}

    def scorer(self, searcher, fieldname: str, text: str, qf: int = 1):
        spec = searcher.schema.field(fieldname)
        if not spec.scorable:
            return WeightScorer(searcher, fieldname, text)
        B = self._field_B.get(fieldname, self.B)
        return BM25FScorer(searcher, fieldname, text, B, self.K1)


class BM25FScorer(Scorer):
    def __init__(self, searcher, fieldname, text, B, K1):
        self.idf = searcher.idf(fieldname, text)
        self.avgfl = searcher.avg_field_length(fieldname) or 1
        self.B = B
        self.K1 = K1
        self.boost = searcher.schema.field(fieldname).boost
        # stats for quality bounds
        ti = searcher.global_term_info(fieldname, text)
        self._maxw = ti["max_weight"] * self.boost if ti else 0.0
        self._minlen = ti["min_length"] if ti else 0

    def _bm25(self, weight, fl):
        B, K1 = self.B, self.K1
        return self.idf * ((weight * (K1 + 1)) / (weight + K1 * ((1 - B) + B * fl / self.avgfl)))

    def score_array(self, tfs, len_bytes):
        weight = tfs.astype(np.float64) * self.boost
        fl = byte_to_length(len_bytes).astype(np.float64)
        return self._bm25(weight, fl)

    def max_quality(self):
        return float(self._bm25(self._maxw, float(byte_to_length(np.array([self._minlen]))[0])))

    def block_quality(self, max_weight, min_len_byte):
        fl = float(byte_to_length(np.array([min_len_byte]))[0])
        return float(self._bm25(max_weight * self.boost, fl))


class WeightScorer(Scorer):
    """score == weight; for non-scorable (existence-format) fields the
    weight is the field boost, independent of tf (formats.py:129-159)."""

    def __init__(self, searcher, fieldname, text):
        spec = searcher.schema.field(fieldname)
        self.fmt = spec.fmt
        self.boost = spec.boost

    def score_array(self, tfs, len_bytes):
        if self.fmt == "existence":
            return np.full(len(tfs), self.boost, dtype=np.float64)
        return tfs.astype(np.float64) * self.boost

    def max_quality(self):
        return self.boost

    def block_quality(self, max_weight, min_len_byte):
        if self.fmt == "existence":
            return self.boost
        return max_weight * self.boost


class DFree(WeightingModel):
    """Terrier DFree model (scoring.py:337-381), vectorized."""

    def scorer(self, searcher, fieldname, text, qf=1):
        spec = searcher.schema.field(fieldname)
        if not spec.scorable:
            return WeightScorer(searcher, fieldname, text)
        return DFreeScorer(searcher, fieldname, text, qf)


class DFreeScorer(Scorer):
    def __init__(self, searcher, fieldname, text, qf=1):
        self.cf = searcher.frequency(fieldname, text)
        self.fl = searcher.manifest.field_length(fieldname)
        self.qf = qf
        self.boost = searcher.schema.field(fieldname).boost

    def score_array(self, tfs, len_bytes):
        tf = tfs.astype(np.float64) * self.boost
        dl = byte_to_length(len_bytes).astype(np.float64)
        prior = tf / dl
        post = (tf + 1.0) / (dl + 1.0)
        invpriorcol = self.fl / self.cf
        norm = tf * np.log(post / prior)
        return self.qf * norm * (tf * np.log(prior * invpriorcol)
                                 + (tf + 1.0) * np.log(post * invpriorcol)
                                 + 0.5 * np.log(post / prior))

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return float("inf")


class PL2(WeightingModel):
    """Terrier PL2 model (scoring.py:388-438), vectorized."""

    def __init__(self, c: float = 1.0):
        self.c = c

    def scorer(self, searcher, fieldname, text, qf=1):
        spec = searcher.schema.field(fieldname)
        if not spec.scorable:
            return WeightScorer(searcher, fieldname, text)
        return PL2Scorer(searcher, fieldname, text, self.c, qf)


class PL2Scorer(Scorer):
    _rec_log2_of_e = 1.0 / np.log(2)

    def __init__(self, searcher, fieldname, text, c, qf=1):
        self.cf = searcher.frequency(fieldname, text)
        self.dc = searcher.doc_count_all
        self.avgfl = searcher.avg_field_length(fieldname) or 1
        self.c = c
        self.qf = qf
        self.boost = searcher.schema.field(fieldname).boost

    def score_array(self, tfs, len_bytes):
        from math import pi

        tf = tfs.astype(np.float64) * self.boost
        fl = byte_to_length(len_bytes).astype(np.float64)
        TF = tf * np.log(1.0 + (self.c * self.avgfl) / fl)
        norm = 1.0 / (TF + 1.0)
        f = self.cf / self.dc
        return norm * self.qf * (TF * np.log(1.0 / f)
                                 + f * self._rec_log2_of_e
                                 + 0.5 * np.log(2 * pi * TF)
                                 + TF * (np.log(TF) - self._rec_log2_of_e))

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return float("inf")


class ReverseWeighting(WeightingModel):
    """Negates the wrapped model's scores (scoring.py:574-604) —
    lowest-scoring docs rank first."""

    def __init__(self, weighting: WeightingModel):
        self.weighting = weighting

    def scorer(self, searcher, fieldname, text, qf=1):
        return _ReverseScorer(self.weighting.scorer(searcher, fieldname,
                                                    text, qf=qf))


class _ReverseScorer(Scorer):
    def __init__(self, sub: Scorer):
        self.sub = sub

    def score_array(self, tfs, len_bytes):
        return 0 - self.sub.score_array(tfs, len_bytes)

    def max_quality(self):
        return 0 - self.sub.max_quality()

    def block_quality(self, max_weight, min_len_byte):
        return 0 - self.sub.block_quality(max_weight, min_len_byte)


class MultiWeighting(WeightingModel):
    """Per-field model dispatch (scoring.py:560-590)."""

    def __init__(self, default: WeightingModel, **weightings):
        self.default = default
        self.weightings = weightings

    def scorer(self, searcher, fieldname, text, qf=1):
        model = self.weightings.get(fieldname, self.default)
        return model.scorer(searcher, fieldname, text, qf)


class FunctionWeighting(WeightingModel):
    """UDF scoring (scoring.py:503-544), batch-vectorized: the function
    receives ``(searcher, fieldname, text, tfs, len_bytes)`` numpy arrays
    and returns a score array (the reference's per-matcher callback is a
    per-posting pull; same information, vectorized signature)."""

    def __init__(self, fn):
        self.fn = fn

    def scorer(self, searcher, fieldname, text, qf=1):
        return FunctionScorer(self.fn, searcher, fieldname, text)


class FunctionScorer(Scorer):
    def __init__(self, fn, searcher, fieldname, text):
        self.fn = fn
        self.searcher = searcher
        self.fieldname = fieldname
        self.text = text

    def score_array(self, tfs, len_bytes):
        return np.asarray(
            self.fn(self.searcher, self.fieldname, self.text, tfs, len_bytes),
            dtype=np.float64)

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return float("inf")


class TF_IDF(WeightingModel):
    def scorer(self, searcher, fieldname, text, qf=1):
        return TFIDFScorer(searcher, fieldname, text)


class TFIDFScorer(Scorer):
    def __init__(self, searcher, fieldname, text):
        self.idf = searcher.idf(fieldname, text)
        self.boost = searcher.schema.field(fieldname).boost

    def score_array(self, tfs, len_bytes):
        return tfs.astype(np.float64) * self.boost * self.idf

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return max_weight * self.boost * self.idf


class Frequency(WeightingModel):
    def scorer(self, searcher, fieldname, text, qf=1):
        return FrequencyScorer(searcher, fieldname, text)


class FrequencyScorer(Scorer):
    def __init__(self, searcher, fieldname, text):
        self.boost = searcher.schema.field(fieldname).boost

    def score_array(self, tfs, len_bytes):
        return tfs.astype(np.float64) * self.boost

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return max_weight * self.boost


# ---- public formula functions + legacy plug-points the reference
# module exports (scoring.py:88-260,266-273,337-407,479-500) ----

pi = np.pi
rec_log2_of_e = 1.0 / log(2)


def bm25(idf, tf, fl, avgfl, B, K1):
    """Raw BM25 formula (scoring.py:266-273); numpy-broadcastable."""
    return idf * ((tf * (K1 + 1)) / (tf + K1 * ((1 - B) + B * fl / avgfl)))


def dfree(tf, cf, qf, dl, fl):
    """Raw Terrier DFree formula (scoring.py:337-350)."""
    prior = tf / dl
    post = (tf + 1.0) / (dl + 1.0)
    invpriorcol = fl / cf
    norm = tf * np.log(post / prior)
    return qf * norm * (tf * (np.log(prior * invpriorcol))
                        + (tf + 1.0) * (np.log(post * invpriorcol))
                        + 0.5 * np.log(post / prior))


def pl2(tf, cf, qf, dc, fl, avgfl, c):
    """Raw Terrier PL2 formula (scoring.py:388-404)."""
    TF = tf * np.log(1.0 + (c * avgfl) / fl)
    norm = 1.0 / (TF + 1.0)
    f = cf / dc
    return norm * qf * (TF * np.log(1.0 / f)
                        + f * rec_log2_of_e
                        + 0.5 * np.log(2 * pi * TF)
                        + TF * (np.log(TF) - rec_log2_of_e))


# the reference's scorer base name (scoring.py:88); our vectorized
# Scorer plays that role
BaseScorer = Scorer


class WeightLengthScorer(Scorer):
    """Base for custom scorers whose score depends only on (weight,
    field length) — override ``_score(weight, length)`` with
    numpy-broadcastable ops (reference scoring.py:167-225, vectorized:
    one call per posting array instead of per posting)."""

    def score_array(self, tfs, len_bytes):
        return np.asarray(
            self._score(tfs.astype(np.float64),
                        byte_to_length(len_bytes).astype(np.float64)),
            dtype=np.float64)

    def _score(self, weight, length):
        raise NotImplementedError

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return float("inf")


def score_postings(scorer, docids, tfs, len_bytes):
    """Dispatch helper: scorers that need document ids (legacy
    ``Weighting`` compat, DebugScorer) get them; vectorized scorers
    keep the two-array fast path."""
    if getattr(scorer, "needs_docids", False):
        return scorer.score_array_docids(docids, tfs, len_bytes)
    return scorer.score_array(tfs, len_bytes)


class Weighting(WeightingModel):
    """Back-compat per-document scoring plug-point (reference
    scoring.py:479-500): subclass and override
    ``score(searcher, fieldname, text, docnum, weight)``.  Inherently
    per-document Python — queries run the exhaustive path (no pruning
    bounds), and each posting costs a callback; prefer
    :class:`FunctionWeighting` / :class:`WeightLengthScorer` for
    vectorized custom scoring."""

    needs_docids = True  # Searcher.search_topk falls back to search()

    def scorer(self, searcher, fieldname, text, qf=1):
        return CompatibilityScorer(searcher, fieldname, text, self.score)

    def score(self, searcher, fieldname, text, docnum, weight):
        raise NotImplementedError


class CompatibilityScorer(Scorer):
    needs_docids = True

    def __init__(self, searcher, fieldname, text, scoremethod):
        self.searcher = searcher
        self.fieldname = fieldname
        self.text = text
        self.scoremethod = scoremethod

    def score_array_docids(self, docids, tfs, len_bytes):
        sm, s, f, t = (self.scoremethod, self.searcher, self.fieldname,
                       self.text)
        return np.array([sm(s, f, t, int(d), float(w))
                         for d, w in zip(docids, tfs)], dtype=np.float64)

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return float("inf")


class DebugModel(WeightingModel):
    """Logs every scored posting as (fieldname, text, docnum, weight,
    length) and scores raw weight (reference scoring.py:228-260)."""

    needs_docids = True

    def __init__(self):
        self.log = []

    def scorer(self, searcher, fieldname, text, qf=1):
        return DebugScorer(searcher, fieldname, text, self.log)


class DebugScorer(Scorer):
    needs_docids = True

    def __init__(self, searcher, fieldname, text, log):
        self.fieldname = fieldname
        self.text = text
        self.log = log

    def score_array_docids(self, docids, tfs, len_bytes):
        w = tfs.astype(np.float64)
        lens = byte_to_length(len_bytes)
        self.log.extend(
            (self.fieldname, self.text, int(d), float(wt), int(ln))
            for d, wt, ln in zip(docids, w, lens))
        return w

    def max_quality(self):
        return float("inf")

    def block_quality(self, max_weight, min_len_byte):
        return float("inf")
