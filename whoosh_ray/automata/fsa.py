"""Finite-state automata (reference automata/fsa.py:16-709).

The engine's fuzzy/wildcard expansions run on the vectorized
``levenshtein_batch`` / regex scans (acceptance-set-identical,
fuzz-pinned) — these classes are the reference's public automaton
toolkit, kept working for user code: NFA construction combinators,
subset-construction ``to_dfa``, DFA minimization, the wall-following
``next_valid_string`` search, sorted-lexicon intersection
(``find_all_matches``), and the Daciuk-Mihov minimal-DFA builder for
sorted string sets.

Quirks preserved on purpose (all verified crash-for-crash vs the
reference in tests/test_automata.py): ``FSA.accept`` treats any FALSY
state as a dead end (``if not state``) — a DFA renumbered from base 0
mis-walks through state 0; ``product``/``minimize`` index
``transitions[state]`` unguarded, so any reachable sink state (every
finite-language DFA) raises KeyError; ``product`` reassigns its
cursor pair inside the label loop, under-exploring multi-label
states; ``u_to_utf8`` mutates the dict it iterates when a label
encodes to more than one byte — RuntimeError for any non-ASCII label.
"""

import itertools
import operator
from bisect import bisect_left

unull = chr(0)


class Marker:
    """Sentinel transition label."""

    def __init__(self, name):
        self.name = name

    def __repr__(self):
        return "<%s>" % self.name


EPSILON = Marker("EPSILON")
ANY = Marker("ANY")


class FSA:
    def __init__(self, initial):
        self.initial = initial
        self.transitions = {}
        self.final_states = set()

    def __len__(self):
        return len(self.all_states())

    def __eq__(self, other):
        return (self.initial == other.initial
                and self.final_states == other.final_states
                and self.transitions == other.transitions)

    def all_states(self):
        states = set(self.transitions)
        for trans in self.transitions.values():
            states.update(trans.values())
        return states

    def all_labels(self):
        labels = set()
        for trans in self.transitions.values():
            labels.update(trans)
        return labels

    def get_labels(self, src):
        return iter(self.transitions.get(src, []))

    def generate_all(self, state=None, sofar=""):
        """Every accepted string, in label-sorted DFS order (finite
        languages only)."""
        state = self.start() if state is None else state
        if self.is_final(state):
            yield sofar
        for label in sorted(self.get_labels(state)):
            yield from self.generate_all(self.next_state(state, label),
                                         sofar + label)

    def start(self):
        return self.initial

    def next_state(self, state, label):
        raise NotImplementedError

    def is_final(self, state):
        raise NotImplementedError

    def add_transition(self, src, label, dest):
        raise NotImplementedError

    def add_final_state(self, state):
        raise NotImplementedError

    def to_dfa(self):
        raise NotImplementedError

    def accept(self, string, debug=False):
        state = self.start()
        for label in string:
            state = self.next_state(state, label)
            if not state:  # falsy-state quirk kept (see module doc)
                break
        return self.is_final(state)

    def append(self, fsa):
        self.transitions.update(fsa.transitions)
        for state in self.final_states:
            self.add_transition(state, EPSILON, fsa.initial)
        self.final_states = fsa.final_states


class NFA(FSA):
    """Nondeterministic automaton; states in the public API are
    epsilon-closed frozensets."""

    def __init__(self, initial):
        self.initial = initial
        self.transitions = {}
        self.final_states = set()

    def start(self):
        return frozenset(self._expand({self.initial}))

    def add_transition(self, src, label, dest):
        self.transitions.setdefault(src, {}).setdefault(label,
                                                        set()).add(dest)

    def add_final_state(self, state):
        self.final_states.add(state)

    def triples(self):
        for src, trans in self.transitions.items():
            for label, dests in trans.items():
                for dest in dests:
                    yield src, label, dest

    def is_final(self, states):
        return bool(self.final_states.intersection(states))

    def _expand(self, states):
        """Epsilon-closure, in place."""
        transitions = self.transitions
        frontier = set(states)
        while frontier:
            state = frontier.pop()
            eps = transitions.get(state, {}).get(EPSILON)
            if eps:
                new = eps.difference(states)
                frontier.update(new)
                states.update(new)
        return states

    def next_state(self, states, label):
        dest_states = set()
        for state in states:
            trans = self.transitions.get(state)
            if trans:
                if label in trans:
                    dest_states.update(trans[label])
                if ANY in trans:
                    dest_states.update(trans[ANY])
        return frozenset(self._expand(dest_states))

    def get_labels(self, states):
        labels = set()
        for state in states:
            labels.update(self.transitions.get(state, ()))
        return labels

    def embed(self, other):
        """Merge the other NFA's transition graph into this one."""
        for s, othertrans in other.transitions.items():
            trans = self.transitions.setdefault(s, {})
            for label, otherdests in othertrans.items():
                trans.setdefault(label, set()).update(otherdests)

    def insert(self, src, other, dest):
        """Splice ``other`` between two of our states via epsilons."""
        self.embed(other)
        self.add_transition(src, EPSILON, other.initial)
        for final in other.final_states:
            self.add_transition(final, EPSILON, dest)

    def to_dfa(self):
        """Subset construction; ANY-transitions become the DFA's
        default transitions."""
        dfa = DFA(self.start())
        frontier = [self.start()]
        seen = set()
        while frontier:
            current = frontier.pop()
            if self.is_final(current):
                dfa.add_final_state(current)
            for label in self.get_labels(current):
                if label is EPSILON:
                    continue
                new_state = self.next_state(current, label)
                if new_state not in seen:
                    frontier.append(new_state)
                    seen.add(new_state)
                    if self.is_final(new_state):
                        dfa.add_final_state(new_state)
                if label is ANY:
                    dfa.set_default_transition(current, new_state)
                else:
                    dfa.add_transition(current, label, new_state)
        return dfa


class DFA(FSA):
    def __init__(self, initial):
        self.initial = initial
        self.transitions = {}
        self.defaults = {}
        self.final_states = set()
        self.outlabels = {}

    def start(self):
        return self.initial

    def add_transition(self, src, label, dest):
        self.transitions.setdefault(src, {})[label] = dest

    def set_default_transition(self, src, dest):
        self.defaults[src] = dest

    def add_final_state(self, state):
        self.final_states.add(state)

    def is_final(self, state):
        return state in self.final_states

    def next_state(self, src, label):
        trans = self.transitions.get(src, {})
        return trans.get(label, self.defaults.get(src, None))

    def next_valid_string(self, string, asbytes=False):
        """The lexicographically smallest accepted string >= ``string``
        (wall-following search), or None."""
        state = self.start()
        stack = []
        i = 0
        for i, label in enumerate(string):
            stack.append((string[:i], state, label))
            state = self.next_state(state, label)
            if not state:
                break
        else:
            stack.append((string[:i + 1], state, None))

        if self.is_final(state):
            return string

        while stack:
            path, state, label = stack.pop()
            label = self.find_next_edge(state, label, asbytes=asbytes)
            if label is not None:
                path += label
                state = self.next_state(state, label)
                if self.is_final(state):
                    return path
                stack.append((path, state, None))
        return None

    def find_next_edge(self, s, label, asbytes):
        """Smallest outgoing label of ``s`` strictly greater than
        ``label`` (None = smallest overall)."""
        if label is None:
            label = b"\x00" if asbytes else "\0"
        else:
            label = (label + 1) if asbytes else chr(ord(label) + 1)
        trans = self.transitions.get(s, {})
        if label in trans or s in self.defaults:
            return label
        try:
            labels = self.outlabels[s]
        except KeyError:
            self.outlabels[s] = labels = sorted(trans)
        pos = bisect_left(labels, label)
        if pos < len(labels):
            return labels[pos]
        return None

    def reachable_from(self, src, inclusive=True):
        reached = {src} if inclusive else set()
        stack = [src]
        seen = set()
        while stack:
            src = stack.pop()
            seen.add(src)
            for dest in self.transitions[src].values():
                reached.add(dest)
                if dest not in seen:
                    stack.append(dest)
        return reached

    def minimize(self):
        """Partition-refinement minimization + dead-state pruning,
        in place."""
        transitions = self.transitions
        initial = self.initial

        reachable = self.reachable_from(initial)
        for src in list(transitions):
            if src not in reachable:
                del transitions[src]
        final_states = self.final_states.intersection(reachable)
        labels = self.all_labels()

        # refine {final, nonfinal} until stable
        parts = [final_states, reachable - final_states]
        changed = True
        while changed:
            changed = False
            for i in range(len(parts)):
                part = parts[i]
                split = None
                for label in labels:
                    next_part = None
                    moved = set()
                    for state in part:
                        dest = transitions[state].get(label)
                        if dest is not None:
                            if next_part is None:
                                for p in parts:
                                    if dest in p:
                                        next_part = p
                            elif dest not in next_part:
                                moved.add(state)
                    if moved:
                        split = (part - moved, moved)
                        break
                if split:
                    parts.pop(i)
                    parts.extend(split)
                    changed = True
                    break

        # map every state to one representative per equivalence class
        mapping = {}
        new_trans = {}
        new_initial = None
        for part in parts:
            part = set(part)
            representative = part.pop()
            if representative is initial or initial in part:
                new_initial = representative
            mapping[representative] = representative
            new_trans[representative] = {}
            for state in part:
                mapping[state] = representative
        assert new_initial is not None

        new_finals = {mapping[s] for s in final_states}
        for state, d in new_trans.items():
            for label, dest in transitions[state].items():
                d[label] = mapping[dest]

        # prune non-final states with no outgoing arcs but self-loops
        removing = set()
        for src in [s for s in new_trans if s not in new_finals]:
            dests = set(new_trans[src].values())
            dests.discard(src)
            if not dests:
                removing.add(src)
                del new_trans[src]
        for t in new_trans.values():
            for label in list(t):
                if t[label] in removing:
                    del t[label]

        self.transitions = new_trans
        self.initial = new_initial
        self.final_states = new_finals

    def to_dfa(self):
        return self


# ---- transformations -------------------------------------------------


def renumber_dfa(dfa, base=0):
    counter = itertools.count(base)
    mapping = {}

    def remap(state):
        if state not in mapping:
            mapping[state] = next(counter)
        return mapping[state]

    out = DFA(remap(dfa.initial))
    for src, trans in dfa.transitions.items():
        for label, dest in trans.items():
            out.add_transition(remap(src), label, remap(dest))
    for final in dfa.final_states:
        out.add_final_state(remap(final))
    for src, dest in dfa.defaults.items():
        out.set_default_transition(remap(src), remap(dest))
    return out


def u_to_utf8(dfa, base=0):
    """Rewrite unicode-labeled transitions into utf-8 byte chains,
    in place (labels become ints; multi-byte chars add chain states)."""
    counter = itertools.count(base)
    for src, trans in dfa.transitions.items():
        for label, dest in list(trans.items()):
            if label is EPSILON:
                continue
            if label is ANY:
                raise Exception("ANY transitions cannot be byte-encoded")
            assert isinstance(label, str)
            encoded = label.encode("utf8")
            node = src
            for i, byte in enumerate(encoded):
                if i < len(encoded) - 1:
                    st = next(counter)
                    dfa.add_transition(node, byte, st)
                    node = st
                else:
                    dfa.add_transition(node, byte, dest)
            del trans[label]


def find_all_matches(dfa, lookup_func, first=unull):
    """Intersect the DFA's language with a sorted lexicon:
    ``lookup_func(key)`` must return the first lexicon word >= key (or
    None).  Yields every lexicon word the DFA accepts, skipping whole
    rejected ranges per probe."""
    match = dfa.next_valid_string(first)
    while match:
        key = lookup_func(match)
        if key is None:
            return
        if match == key:
            yield match
            key += unull
        match = dfa.next_valid_string(key)


# ---- NFA constructors -------------------------------------------------


def reverse_nfa(n):
    """NFA accepting the reverse of ``n``'s language: flip every arc,
    epsilon-connect a fresh start to the old finals, accept at the old
    initial."""
    s = object()
    nfa = NFA(s)
    for src, trans in n.transitions.items():
        for label, dests in trans.items():
            for dest in dests:
                nfa.add_transition(dest, label, src)
    for final in n.final_states:
        nfa.add_transition(s, EPSILON, final)
    nfa.add_final_state(n.initial)
    return nfa


def product(dfa1, op, dfa2):
    """Product construction.  TWO reference quirks preserved
    (fsa.py:502-522): transitions[state] is indexed unguarded, so a
    reachable sink state (no outgoing arcs) raises KeyError; and the
    cursor variables are REASSIGNED inside the label loop, so later
    labels of the same product state step from the already-advanced
    pair — the construction under-explores on multi-label states."""
    dfa1 = dfa1.to_dfa()
    dfa2 = dfa2.to_dfa()
    start = (dfa1.start(), dfa2.start())
    dfa = DFA(start)
    stack = [start]
    while stack:
        src = stack.pop()
        state1, state2 = src
        labels1 = set(dfa1.transitions[state1])
        labels2 = set(dfa2.transitions[state2])
        for label in labels1.intersection(labels2):
            state1 = dfa1.next_state(state1, label)
            state2 = dfa2.next_state(state2, label)
            if op(state1 is not None, state2 is not None):
                dest = (state1, state2)
                dfa.add_transition(src, label, dest)
                stack.append(dest)
                if op(dfa1.is_final(state1), dfa2.is_final(state2)):
                    dfa.add_final_state(dest)
    return dfa


def intersection(dfa1, dfa2):
    return product(dfa1, operator.and_, dfa2)


def union(dfa1, dfa2):
    return product(dfa1, operator.or_, dfa2)


def epsilon_nfa():
    return basic_nfa(EPSILON)


def dot_nfa():
    return basic_nfa(ANY)


def basic_nfa(label):
    s, e = object(), object()
    nfa = NFA(s)
    nfa.add_transition(s, label, e)
    nfa.add_final_state(e)
    return nfa


def charset_nfa(labels):
    s, e = object(), object()
    nfa = NFA(s)
    for label in labels:
        nfa.add_transition(s, label, e)
    nfa.add_final_state(e)
    return nfa


def string_nfa(string):
    s = object()
    nfa = NFA(s)
    e = s
    for label in string:
        e = object()
        nfa.add_transition(s, label, e)
        s = e
    nfa.add_final_state(e)
    return nfa


def choice_nfa(n1, n2):
    s, e = object(), object()
    nfa = NFA(s)
    nfa.insert(s, n1, e)
    nfa.insert(s, n2, e)
    nfa.add_final_state(e)
    return nfa


def concat_nfa(n1, n2):
    s, m, e = object(), object(), object()
    nfa = NFA(s)
    nfa.insert(s, n1, m)
    nfa.insert(m, n2, e)
    nfa.add_final_state(e)
    return nfa


def star_nfa(n):
    s, e = object(), object()
    nfa = NFA(s)
    nfa.insert(s, n, e)
    nfa.add_transition(s, EPSILON, e)
    for final in n.final_states:
        nfa.add_transition(final, EPSILON, s)
    nfa.add_final_state(e)
    return nfa


def plus_nfa(n):
    return concat_nfa(n, star_nfa(n))


def optional_nfa(n):
    return choice_nfa(n, epsilon_nfa())


# ---- Daciuk-Mihov incremental minimal DFA -----------------------------


class DMNode:
    def __init__(self, n):
        self.n = n
        self.arcs = {}
        self.final = False

    def __repr__(self):
        return "<%s, %r>" % (self.n, self.tuple())

    def __hash__(self):
        return hash(self.tuple())

    def tuple(self):
        return tuple(sorted(self.arcs.items())), self.final


def strings_dfa(strings):
    """Minimal DFA of a SORTED iterable of non-empty strings (Daciuk,
    Mihov, Watson & Watson 2000: incremental construction of minimal
    acyclic FSAs)."""
    dfa = DFA(0)
    counter = itertools.count(1)
    last = ""
    seen = {}
    nodes = [DMNode(0)]

    for string in strings:
        if string <= last:
            raise Exception("Strings must be in order")
        if not string:
            raise Exception("Can't add empty string")

        # longest common prefix with the previous word stays unfrozen
        i = 0
        while i < len(last) and i < len(string) and last[i] == string[i]:
            i += 1
        prefixlen = i

        add_suffix(dfa, nodes, last, prefixlen + 1, seen)

        for label in string[prefixlen:]:
            node = DMNode(next(counter))
            nodes[-1].arcs[label] = node.n
            nodes.append(node)
        nodes[-1].final = True
        last = string

    if len(nodes) > 1:
        add_suffix(dfa, nodes, last, 0, seen)
    return dfa


def add_suffix(dfa, nodes, last, downto, seen):
    """Freeze the tail of the node stack, replacing any node whose
    (arcs, final) signature was already registered."""
    while len(nodes) > downto:
        node = nodes.pop()
        tup = node.tuple()
        try:
            this = seen[tup]
        except KeyError:
            this = node.n
            if node.final:
                dfa.add_final_state(this)
            seen[tup] = this
        else:
            parent = nodes[-1]
            inlabel = last[len(nodes) - 1]
            parent.arcs[inlabel] = this
        for label, dest in node.arcs.items():
            dfa.add_transition(this, label, dest)
