"""Levenshtein NFA (reference automata/lev.py:7-30; Schulz & Mihov
2002, "Fast string correction with Levenshtein automata").

State (i, e) = "consumed i characters of the term using e edits".
Arcs per state: the term's own character advances i for free; with an
edit budget left, ANY consumes an input char in place (deletion from
the term's view), EPSILON advances i without input (insertion), and
ANY advances both (substitution).  A ``prefix`` forces the first
characters to match exactly.

The engine's FuzzyTerm expands via the vectorized
``functions/spelling.levenshtein_batch`` banded DP, whose acceptance
set is fuzz-pinned identical to this automaton — this form exists for
``find_all_matches``-style user code.
"""

from whoosh_ray.automata.fsa import ANY, EPSILON, NFA


def levenshtein_automaton(term, k, prefix=0):
    nfa = NFA((0, 0))
    n = len(term)

    for i in range(prefix):
        nfa.add_transition((i, 0), term[i], (i + 1, 0))

    for e in range(k + 1):
        for i in range(prefix, n):
            here, diag, right = (i, e), (i + 1, e + 1), (i, e + 1)
            nfa.add_transition(here, term[i], (i + 1, e))
            if e < k:
                nfa.add_transition(here, ANY, right)      # deletion
                nfa.add_transition(here, EPSILON, diag)   # insertion
                nfa.add_transition(here, ANY, diag)       # substitution
        if e < k:
            nfa.add_transition((n, e), ANY, (n, e + 1))
        nfa.add_final_state((n, e))
    return nfa
