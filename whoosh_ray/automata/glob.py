"""Glob-pattern NFAs (reference automata/glob.py:33-90).

The engine's Wildcard query expands terms with a compiled-regex scan
over the sorted lexicon; this NFA form exists for user code driving
``find_all_matches`` directly.  Grammar quirks preserved: repeated
``*`` collapse, ``?`` AFTER a ``*`` is dropped (the reference treats
``*?`` as ``*``), and ``[...]`` ranges never negate (the parser reads
a ``negate`` flag but no syntax sets it)."""

from whoosh_ray.automata.fsa import ANY, EPSILON, NFA

_LIT = 0
_STAR = 1
_PLUS = 2
_QUEST = 3
_RANGE = 4


def parse_glob(pattern, _glob_multi="*", _glob_single="?",
               _glob_range1="[", _glob_range2="]"):
    pos = 0
    last = None
    while pos < len(pattern):
        char = pattern[pos]
        pos += 1
        if char == _glob_multi:
            if last is not _STAR:
                yield _STAR, None
                last = _STAR
        elif char == _glob_single:
            if last is not _STAR:
                yield _QUEST, None
                last = _QUEST
        elif char == _glob_range1:
            chars = set()
            negate = False
            while pos < len(pattern):
                char = pattern[pos]
                pos += 1
                if char == _glob_range2:
                    break
                chars.add(char)
            if chars:
                yield _RANGE, (chars, negate)
                last = _RANGE
        else:
            yield _LIT, char
            last = _LIT


def glob_automaton(pattern):
    nfa = NFA(0)
    i = -1
    for i, (op, arg) in enumerate(parse_glob(pattern)):
        if op is _LIT:
            nfa.add_transition(i, arg, i + 1)
        elif op is _STAR:
            nfa.add_transition(i, ANY, i + 1)
            nfa.add_transition(i, EPSILON, i + 1)
            nfa.add_transition(i + 1, EPSILON, i)
        elif op is _QUEST:
            nfa.add_transition(i, ANY, i + 1)
        elif op is _RANGE:
            for char in arg[0]:
                nfa.add_transition(i, char, i + 1)
    nfa.add_final_state(i + 1)
    return nfa
