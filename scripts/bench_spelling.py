"""Micro-bench: vectorized levenshtein_batch vs the per-word scalar DP
over a 1M-term lexicon (the VERDICT r3 #3 'fuzzy/suggest lexicon scan'
item).  Prints one JSON line.  Run: python scripts/bench_spelling.py"""

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from whoosh_ray.functions.spelling import levenshtein, levenshtein_batch


def main(n=1_000_000):
    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    vocab = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(3, 12)))
             for _ in range(n)]
    arr = np.array(vocab, dtype="S12")  # the fixed-width term matrix
    word, maxdist = "sugestion", 2

    # best-of-3, interleaved: this sandbox's clock swings 2x+ between
    # identical runs (CLAUDE.md), and the first call pays numpy warmup
    t_batch = t_scalar = float("inf")
    sample = vocab[::50]  # scalar on a 1/50 sample, extrapolated
    for _ in range(3):
        t0 = time.perf_counter()
        batch = levenshtein_batch(word, arr, maxdist)
        t_batch = min(t_batch, time.perf_counter() - t0)
        t0 = time.perf_counter()
        scal = [min(levenshtein(word, c, maxdist), maxdist + 1)
                for c in sample]
        t_scalar = min(t_scalar, (time.perf_counter() - t0) * 50)

    assert scal == batch[::50].tolist()
    print(json.dumps({
        "lexicon_terms": n,
        "batch_secs": round(t_batch, 3),
        "scalar_secs_extrapolated": round(t_scalar, 1),
        "speedup": round(t_scalar / t_batch, 1),
        "accepted": int((batch <= maxdist).sum()),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
