"""Levenshtein NFA (reference automata/lev.py:7-30; Schulz & Mihov
2002, "Fast string correction with Levenshtein automata").

States are (position-in-term, edits-used); transitions encode match /
substitution / insertion / deletion.  The engine's FuzzyTerm expands
via the vectorized ``functions/spelling.levenshtein_batch`` banded DP,
whose acceptance set is fuzz-pinned identical to this automaton — this
form exists for ``find_all_matches``-style user code."""

from whoosh_ray.automata.fsa import ANY, EPSILON, NFA


def levenshtein_automaton(term, k, prefix=0):
    nfa = NFA((0, 0))
    if prefix:
        for i in range(prefix):
            nfa.add_transition((i, 0), term[i], (i + 1, 0))

    for i in range(prefix, len(term)):
        c = term[i]
        for e in range(k + 1):
            nfa.add_transition((i, e), c, (i + 1, e))  # match
            if e < k:
                nfa.add_transition((i, e), ANY, (i, e + 1))       # delete
                nfa.add_transition((i, e), EPSILON, (i + 1, e + 1))  # insert
                nfa.add_transition((i, e), ANY, (i + 1, e + 1))   # subst
    for e in range(k + 1):
        if e < k:
            nfa.add_transition((len(term), e), ANY, (len(term), e + 1))
        nfa.add_final_state((len(term), e))
    return nfa
