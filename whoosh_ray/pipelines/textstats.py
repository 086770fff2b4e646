"""Text analysis batch ops: token counts, quality scores, language ID,
document fingerprints — training-data-pipeline staples, each a single
vectorized ``map_batches`` stage plus (optionally) a small aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from whoosh_ray.functions.analysis import STOP_WORDS, STANDARD, VectorAnalyzer

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "de", "que"},
}


class TokenStats:
    """Adds n_tokens / n_stopwords / avg_token_len / quality columns.

    ``n_tokens_all`` counts every regex token; ``n_tokens`` counts the
    StandardAnalyzer's surviving tokens (stop/minsize filtered)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.analyzer = VectorAnalyzer(STANDARD)
        from whoosh_ray.functions.analysis import AnalyzerSpec

        self.raw = VectorAnalyzer(AnalyzerSpec(stopwords=None, minsize=0,
                                               lowercase=True))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        tb_raw = self.raw(texts)
        tb_std = self.analyzer(texts)
        n_all = tb_raw.row_lengths
        n_kept = tb_std.row_lengths
        # vectorized stopword count + char totals over the flat raw stream
        s = pd.Series(tb_raw.terms, dtype=object)
        is_stop = s.isin(STOP_WORDS).to_numpy() if len(s) else np.empty(0, bool)
        tok_lens = s.str.len().to_numpy() if len(s) else np.empty(0)
        n_stop = np.bincount(tb_raw.row_ids[is_stop],
                             minlength=len(texts)).astype(np.int64)
        char_tot = np.bincount(tb_raw.row_ids, weights=tok_lens,
                               minlength=len(texts))
        denom = np.maximum(n_all, 1)
        out = batch
        out = out.append_column("n_tokens_all", pa.array(n_all, type=pa.int64()))
        out = out.append_column("n_tokens", pa.array(n_kept, type=pa.int64()))
        out = out.append_column("n_stopwords", pa.array(n_stop, type=pa.int64()))
        out = out.append_column(
            "stopword_ratio", pa.array(n_stop / denom, type=pa.float64()))
        out = out.append_column(
            "avg_token_len", pa.array(char_tot / denom, type=pa.float64()))
        return out


def token_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(TokenStats(text_col), batch_format="pyarrow")


class LangId:
    """Stopword-profile language guesser (heuristic; ``lang_pred`` column)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.analyzer = VectorAnalyzer(
            STANDARD.__class__(stopwords=None, minsize=0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        tb = self.analyzer(texts)
        n = len(texts)
        names = list(_LANG_MARKERS)
        counts = np.zeros((len(names), n), dtype=np.int64)
        if len(tb.terms):
            # distinct (row, term) pairs, then per-language marker counts
            # — all hash/bincount kernels, no per-row Python sets
            codes, uniq = pd.factorize(
                pd.Series(tb.terms, dtype=object), sort=False)
            pair = np.unique(tb.row_ids.astype(np.int64) * len(uniq) + codes)
            urow = pair // len(uniq)
            ucode = pair % len(uniq)
            uniq_s = pd.Series(np.asarray(uniq, dtype=object))
            for li, markers in enumerate(_LANG_MARKERS.values()):
                hit = uniq_s.isin(markers).to_numpy()[ucode]
                counts[li] = np.bincount(urow[hit], minlength=n)
        best = np.argmax(counts, axis=0)  # first max wins, like strict >
        bestn = counts[best, np.arange(n)]
        langs = np.where(bestn > 0, np.asarray(names, dtype=object)[best],
                         "und")
        return batch.append_column("lang_pred",
                                   pa.array(langs, type=pa.string()))


class Fingerprint:
    """Order-insensitive document fingerprint: xor of token hashes
    (rolling-hash family; deterministic across processes)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.analyzer = VectorAnalyzer(STANDARD)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        tb = self.analyzer(texts)
        out = np.zeros(len(texts), dtype=np.uint64)
        if len(tb.terms):
            h = pd.util.hash_array(tb.terms)
            # xor-reduce per row
            df = pd.DataFrame({"r": tb.row_ids, "h": h})
            red = df.groupby("r")["h"].agg(lambda x: np.bitwise_xor.reduce(x.to_numpy()))
            out[red.index.to_numpy()] = red.to_numpy()
        return batch.append_column("fingerprint",
                                   pa.array(out.astype(np.int64), type=pa.int64()))
