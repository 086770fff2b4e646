"""Glob-pattern NFAs (reference automata/glob.py:33-90).

The engine's Wildcard query expands terms with a compiled-regex scan
over the sorted lexicon; this NFA form exists for user code driving
``find_all_matches`` directly.  Grammar quirks preserved (output-
matched vs the reference in tests/test_automata.py): consecutive ``*``
collapse to one, a ``?`` immediately AFTER a ``*`` is dropped, and
``[...]`` ranges never negate (the reference parser carries a negate
flag no syntax can set).
"""

from whoosh_ray.automata.fsa import ANY, EPSILON, NFA

# token kinds
_LIT = 0
_STAR = 1
_PLUS = 2
_QUEST = 3
_RANGE = 4


def parse_glob(pattern, _glob_multi="*", _glob_single="?",
               _glob_range1="[", _glob_range2="]"):
    """Tokenize a glob pattern into (kind, payload) pairs."""
    out = []
    chars = iter(enumerate(pattern))
    for pos, ch in chars:
        prev = out[-1][0] if out else None
        if ch == _glob_multi:
            if prev is not _STAR:
                out.append((_STAR, None))
        elif ch == _glob_single:
            if prev is not _STAR:  # "*?" behaves as "*"
                out.append((_QUEST, None))
        elif ch == _glob_range1:
            members = set()
            for _, rc in chars:
                if rc == _glob_range2:
                    break
                members.add(rc)
            if members:
                out.append((_RANGE, (members, False)))
        else:
            out.append((_LIT, ch))
    return iter(out)


def glob_automaton(pattern):
    """NFA over the token stream: one state per token, a star loops
    its state pair, literals/ranges/question advance."""
    nfa = NFA(0)
    state = -1
    for state, (kind, payload) in enumerate(parse_glob(pattern)):
        nxt = state + 1
        if kind is _STAR:
            nfa.add_transition(state, ANY, nxt)
            nfa.add_transition(state, EPSILON, nxt)
            nfa.add_transition(nxt, EPSILON, state)
        elif kind is _QUEST:
            nfa.add_transition(state, ANY, nxt)
        elif kind is _RANGE:
            for ch in payload[0]:
                nfa.add_transition(state, ch, nxt)
        else:
            nfa.add_transition(state, payload, nxt)
    nfa.add_final_state(state + 1)
    return nfa
