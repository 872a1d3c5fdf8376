"""NFA/DFA machinery for the non-heuristic (DFA) query-search path.

Re-expression of the reference's schema-search design
(/root/reference/components/core/src/clp/SchemaSearcher.{hpp,cpp},
GrepCore.hpp:150-153, and the design doc
docs/src/dev-docs/design-parsing-wildcard-queries.md): deciding, for a
wildcard query token, EXACTLY which schema variable rules could match
it — language-intersection questions answered on automata instead of
the heuristic character checks the default path uses.

Pieces:
  - a small regex-subset parser → Thompson NFA (literals, escapes,
    char classes, '.', groups, alternation, *, +, ?, {m,n}) — enough
    for grok/schema variable patterns;
  - wildcard patterns ('*', '?') → NFA;
  - product-construction emptiness tests (NFA ∩ NFA);
  - subset-construction determinization + complement over label-atom
    alphabets, for "could this token be static text / could it match
    rule k given rule priority" — the questions that need ¬(r1 ∪ …).

Alphabet: bytes 0..255 (labels are frozensets of single-char strings).
Patterns are tiny (schema rules), so set-valued labels and subset
construction stay trivially small.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_ALL = frozenset(chr(c) for c in range(256))
_DIGIT = frozenset("0123456789")
_WORD = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)
_SPACE = frozenset(" \t\n\r\f\v")
_ESC_CLASSES = {
    "d": _DIGIT,
    "D": _ALL - _DIGIT,
    "w": _WORD,
    "W": _ALL - _WORD,
    "s": _SPACE,
    "S": _ALL - _SPACE,
}


@dataclass
class Nfa:
    """Thompson NFA: states 0..n-1, edges (src, label, dst); label is a
    frozenset of chars, or None for epsilon. One start, one accept."""

    n: int = 0
    edges: list = field(default_factory=list)
    start: int = 0
    accept: int = 0

    def new_state(self) -> int:
        self.n += 1
        return self.n - 1

    def add(self, src: int, label, dst: int) -> None:
        self.edges.append((src, label, dst))

    # -- derived, built lazily for simulation --
    def eps_map(self) -> list:
        m: list = [[] for _ in range(self.n)]
        for s, lab, d in self.edges:
            if lab is None:
                m[s].append(d)
        return m

    def sym_map(self) -> list:
        m: list = [[] for _ in range(self.n)]
        for s, lab, d in self.edges:
            if lab is not None:
                m[s].append((lab, d))
        return m

    def accepts(self, text: str) -> bool:
        """Direct NFA simulation (tests + small driver-side checks)."""
        eps = self.eps_map()
        sym = self.sym_map()
        cur = _eps_closure({self.start}, eps)
        for c in text:
            nxt = {d for st in cur for lab, d in sym[st] if c in lab}
            if not nxt:
                return False
            cur = _eps_closure(nxt, eps)
        return self.accept in cur


def _eps_closure(states: set, eps: list) -> frozenset:
    out = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for d in eps[s]:
            if d not in out:
                out.add(d)
                stack.append(d)
    return frozenset(out)


class RegexParseError(ValueError):
    pass


class _RegexParser:
    """Recursive-descent parser for the schema-rule regex subset,
    building fragments directly into one Nfa."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.nfa = Nfa()

    def parse(self) -> Nfa:
        s, a = self._alt()
        if self.i != len(self.p):
            raise RegexParseError(f"trailing input at {self.i}: {self.p!r}")
        self.nfa.start, self.nfa.accept = s, a
        return self.nfa

    # alt := concat ('|' concat)*
    def _alt(self):
        frags = [self._concat()]
        while self.i < len(self.p) and self.p[self.i] == "|":
            self.i += 1
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        s, a = self.nfa.new_state(), self.nfa.new_state()
        for fs, fa in frags:
            self.nfa.add(s, None, fs)
            self.nfa.add(fa, None, a)
        return s, a

    # concat := quantified*
    def _concat(self):
        frags = []
        while self.i < len(self.p) and self.p[self.i] not in "|)":
            frags.append(self._quantified())
        if not frags:
            s = self.nfa.new_state()
            return s, s
        cur = frags[0]
        for nxt in frags[1:]:
            self.nfa.add(cur[1], None, nxt[0])
            cur = (cur[0], nxt[1])
        return cur

    def _quantified(self):
        s, a = self._atom()
        while self.i < len(self.p) and self.p[self.i] in "*+?{":
            c = self.p[self.i]
            if c == "{":
                m, n = self._brace()
                s, a = self._repeat(s, a, m, n)
                continue
            self.i += 1
            if c == "*":
                ns, na = self.nfa.new_state(), self.nfa.new_state()
                self.nfa.add(ns, None, s)
                self.nfa.add(ns, None, na)
                self.nfa.add(a, None, s)
                self.nfa.add(a, None, na)
                s, a = ns, na
            elif c == "+":
                na = self.nfa.new_state()
                self.nfa.add(a, None, s)
                self.nfa.add(a, None, na)
                a = na
            else:  # ?
                ns, na = self.nfa.new_state(), self.nfa.new_state()
                self.nfa.add(ns, None, s)
                self.nfa.add(ns, None, na)
                self.nfa.add(a, None, na)
                s, a = ns, na
        return s, a

    def _brace(self):
        j = self.p.index("}", self.i)
        body = self.p[self.i + 1 : j]
        self.i = j + 1
        if "," in body:
            lo, hi = body.split(",", 1)
            m = int(lo) if lo else 0
            n = int(hi) if hi else None
        else:
            m = n = int(body)
        return m, n

    def _clone(self, s: int, a: int, old_lo: int, old_hi: int):
        """Clone the fragment's state range [old_lo, old_hi) (fragments
        are built from contiguous fresh states)."""
        off = self.nfa.n - old_lo
        for _ in range(old_hi - old_lo):
            self.nfa.new_state()
        for src, lab, dst in list(self.nfa.edges):
            if old_lo <= src < old_hi and old_lo <= dst < old_hi:
                self.nfa.add(src + off, lab, dst + off)
        return s + off, a + off

    def _repeat(self, s, a, m, n):
        # fragment states are contiguous: remember the range to clone
        lo = min(
            [s, a]
            + [x for e in self.nfa.edges for x in (e[0], e[2]) if self._in_frag(e, s, a)]
        )
        # conservative: clone the whole current nfa range that the
        # fragment occupies — fragments are always the tail of the
        # state array at atom-build time, so [frag_lo, n) is safe
        frag_lo, frag_hi = self._frag_range(s, a)
        if n is None:
            # {m,}: m copies then a star over the last clone
            cur = None
            last = (s, a)
            for k in range(max(m, 1)):
                piece = last if k == 0 else self._clone(s, a, frag_lo, frag_hi)
                cur = piece if cur is None else self._join(cur, piece)
                last_piece = piece
            star_s, star_a = self.nfa.new_state(), self.nfa.new_state()
            self.nfa.add(star_s, None, star_a)
            loop = self._clone(s, a, frag_lo, frag_hi)
            self.nfa.add(star_s, None, loop[0])
            self.nfa.add(loop[1], None, loop[0])
            self.nfa.add(loop[1], None, star_a)
            if m == 0:
                return star_s, star_a
            return self._join(cur, (star_s, star_a))
        # {m,n}: m required copies + (n-m) optional copies
        cur = None
        for k in range(m):
            piece = (s, a) if k == 0 else self._clone(s, a, frag_lo, frag_hi)
            cur = piece if cur is None else self._join(cur, piece)
        for k in range(n - m):
            piece = (
                (s, a) if (cur is None and k == 0) else self._clone(s, a, frag_lo, frag_hi)
            )
            ns, na = self.nfa.new_state(), self.nfa.new_state()
            self.nfa.add(ns, None, piece[0])
            self.nfa.add(ns, None, na)
            self.nfa.add(piece[1], None, na)
            piece = (ns, na)
            cur = piece if cur is None else self._join(cur, piece)
        if cur is None:  # {0,0}
            z = self.nfa.new_state()
            cur = (z, z)
        return cur

    def _frag_range(self, s, a):
        states = {s, a}
        changed = True
        while changed:
            changed = False
            for src, _lab, dst in self.nfa.edges:
                if src in states and dst not in states:
                    states.add(dst)
                    changed = True
                if dst in states and src not in states:
                    states.add(src)
                    changed = True
        return min(states), max(states) + 1

    def _in_frag(self, e, s, a):
        return False

    def _join(self, f1, f2):
        self.nfa.add(f1[1], None, f2[0])
        return (f1[0], f2[1])

    def _atom(self):
        c = self.p[self.i]
        if c == "(":
            self.i += 1
            # swallow (?: and (?P<name> group prefixes
            if self.p.startswith("?:", self.i):
                self.i += 2
            elif self.p.startswith("?P<", self.i):
                self.i = self.p.index(">", self.i) + 1
            s, a = self._alt()
            if self.i >= len(self.p) or self.p[self.i] != ")":
                raise RegexParseError(f"unclosed group in {self.p!r}")
            self.i += 1
            return s, a
        if c == "[":
            return self._charclass()
        if c == ".":
            self.i += 1
            return self._sym(_ALL)
        if c == "\\":
            self.i += 2
            e = self.p[self.i - 1]
            if e in _ESC_CLASSES:
                return self._sym(_ESC_CLASSES[e])
            return self._sym(frozenset(self._esc_char(e)))
        if c in "*+?{":
            raise RegexParseError(f"dangling quantifier in {self.p!r}")
        self.i += 1
        return self._sym(frozenset(c))

    @staticmethod
    def _esc_char(e: str) -> str:
        return {"n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v", "0": "\0"}.get(
            e, e
        )

    def _sym(self, label: frozenset):
        s, a = self.nfa.new_state(), self.nfa.new_state()
        self.nfa.add(s, label, a)
        return s, a

    def _charclass(self):
        assert self.p[self.i] == "["
        self.i += 1
        neg = self.p[self.i] == "^"
        if neg:
            self.i += 1
        chars: set = set()
        first = True
        while self.i < len(self.p) and (self.p[self.i] != "]" or first):
            first = False
            c = self.p[self.i]
            if c == "\\":
                e = self.p[self.i + 1]
                self.i += 2
                if e in _ESC_CLASSES:
                    chars |= _ESC_CLASSES[e]
                    continue
                c = self._esc_char(e)
            else:
                self.i += 1
            if (
                self.i + 1 < len(self.p)
                and self.p[self.i] == "-"
                and self.p[self.i + 1] != "]"
            ):
                hi = self.p[self.i + 1]
                if hi == "\\":
                    hi = self._esc_char(self.p[self.i + 2])
                    self.i += 3
                else:
                    self.i += 2
                chars |= {chr(x) for x in range(ord(c), ord(hi) + 1)}
            else:
                chars.add(c)
        if self.i >= len(self.p):
            raise RegexParseError(f"unclosed class in {self.p!r}")
        self.i += 1  # ]
        return self._sym(frozenset(_ALL - chars if neg else chars))


def regex_nfa(pattern: str) -> Nfa:
    """Compile a schema-rule regex (fullmatch semantics) to an NFA."""
    return _RegexParser(pattern).parse()


def wildcard_nfa(pattern: str, any_set: frozenset = _ALL) -> Nfa:
    """CLP wildcard pattern → NFA: '*' = any run, '?' = any one char;
    '\\*' '\\?' '\\\\' are literals (wildcard.py escaping rules).
    `any_set` restricts what the wildcards range over — pass the
    non-delimiter set to get the language of a single TOKEN the pattern
    could match (schema search needs exactly that)."""
    nfa = Nfa()
    s = nfa.new_state()
    cur = s
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            i += 2
            lab = frozenset(pattern[i - 1])
        elif c == "*":
            i += 1
            nxt = nfa.new_state()
            nfa.add(cur, None, nxt)
            nfa.add(nxt, any_set, nxt)
            cur = nxt
            continue
        elif c == "?":
            i += 1
            lab = any_set
        else:
            i += 1
            lab = frozenset(c)
        nxt = nfa.new_state()
        nfa.add(cur, lab, nxt)
        cur = nxt
    nfa.start, nfa.accept = s, cur
    return nfa


def product_nfa(a: Nfa, b: Nfa) -> Nfa:
    """NFA accepting L(a) ∩ L(b) (label-set product construction,
    epsilon edges advance one side at a time)."""
    out = Nfa()
    index: dict = {}

    def state(p, q):
        if (p, q) not in index:
            index[(p, q)] = out.new_state()
        return index[(p, q)]

    sa, sb = a.sym_map(), b.sym_map()
    ea, eb = a.eps_map(), b.eps_map()
    start = state(a.start, b.start)
    stack = [(a.start, b.start)]
    seen = {(a.start, b.start)}

    def push(p, q):
        if (p, q) not in seen:
            seen.add((p, q))
            stack.append((p, q))

    while stack:
        p, q = stack.pop()
        src = state(p, q)
        for d in ea[p]:
            out.add(src, None, state(d, q))
            push(d, q)
        for d in eb[q]:
            out.add(src, None, state(p, d))
            push(p, d)
        for lab_a, da in sa[p]:
            for lab_b, db in sb[q]:
                both = lab_a & lab_b
                if both:
                    out.add(src, both, state(da, db))
                    push(da, db)
    out.start = start
    out.accept = state(a.accept, b.accept)
    return out


def intersect_nonempty(a: Nfa, b: Nfa) -> bool:
    """True iff L(a) ∩ L(b) ≠ ∅ (BFS over the product construction)."""
    ea, eb = a.eps_map(), b.eps_map()
    sa, sb = a.sym_map(), b.sym_map()
    start = (
        _eps_closure({a.start}, ea),
        _eps_closure({b.start}, eb),
    )
    seen = {start}
    stack = [start]
    while stack:
        pa, pb = stack.pop()
        if a.accept in pa and b.accept in pb:
            return True
        # collect outgoing labels from each side's closure
        outs_a: list = []
        for st in pa:
            outs_a.extend(sa[st])
        outs_b: list = []
        for st in pb:
            outs_b.extend(sb[st])
        for lab_a, da in outs_a:
            for lab_b, db in outs_b:
                if lab_a & lab_b:
                    nxt = (
                        _eps_closure({da}, ea),
                        _eps_closure({db}, eb),
                    )
                    if nxt not in seen:
                        seen.add(nxt)
                        stack.append(nxt)
    return False


@dataclass
class Dfa:
    """Complete DFA over label atoms. trans[state][atom_ix] -> state;
    atoms is a list of frozensets partitioning the 256-char alphabet."""

    atoms: list
    trans: list
    accept: set
    start: int = 0

    def complement(self) -> "Dfa":
        n = len(self.trans)
        return Dfa(
            self.atoms,
            self.trans,
            {q for q in range(n) if q not in self.accept},
            self.start,
        )


def _label_atoms(labels: list) -> list:
    """Partition the 256-char alphabet into equivalence classes by
    membership across the given labels."""
    sig: dict = {}
    for x in range(256):
        c = chr(x)
        key = tuple(c in lab for lab in labels)
        sig.setdefault(key, set()).add(c)
    return [frozenset(v) for v in sig.values()]


def determinize(nfa: Nfa) -> Dfa:
    """Subset construction over label atoms; result is COMPLETE (dead
    state included), so complement() is just flipping accepts."""
    labels = sorted(
        {lab for _s, lab, _d in nfa.edges if lab is not None},
        key=lambda f: (len(f), min(f) if f else ""),
    )
    atoms = _label_atoms(labels)
    eps = nfa.eps_map()
    sym = nfa.sym_map()
    start = _eps_closure({nfa.start}, eps)
    index = {start: 0}
    order = [start]
    trans: list = []
    i = 0
    while i < len(order):
        cur = order[i]
        i += 1
        row = []
        outs: list = []
        for st in cur:
            outs.extend(sym[st])
        for atom in atoms:
            probe = next(iter(atom))
            dest = {d for lab, d in outs if probe in lab}
            dest = _eps_closure(dest, eps) if dest else frozenset()
            if dest not in index:
                index[dest] = len(order)
                order.append(dest)
            row.append(index[dest])
        trans.append(row)
    accept = {ix for sub, ix in index.items() if nfa.accept in sub}
    return Dfa(atoms, trans, accept)


def dfa_intersect_nfa_nonempty(dfa: Dfa, nfa: Nfa) -> bool:
    """True iff L(dfa) ∩ L(nfa) ≠ ∅. The DFA's atoms partition the
    alphabet, so an NFA edge label intersects atom a iff their char
    sets overlap."""
    eps = nfa.eps_map()
    sym = nfa.sym_map()
    start = (dfa.start, _eps_closure({nfa.start}, eps))
    seen = {start}
    stack = [start]
    while stack:
        q, ps = stack.pop()
        if q in dfa.accept and nfa.accept in ps:
            return True
        outs: list = []
        for st in ps:
            outs.extend(sym[st])
        for ai, atom in enumerate(dfa.atoms):
            qn = dfa.trans[q][ai]
            dest = {d for lab, d in outs if lab & atom}
            if not dest:
                continue
            nxt = (qn, _eps_closure(dest, eps))
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    return False


def union_nfa(nfas: list) -> Nfa:
    """One NFA accepting the union of the given languages."""
    out = Nfa()
    s, a = out.new_state(), out.new_state()
    for nfa in nfas:
        off = out.n
        for _ in range(nfa.n):
            out.new_state()
        for src, lab, dst in nfa.edges:
            out.add(src + off, lab, dst + off)
        out.add(s, None, nfa.start + off)
        out.add(nfa.accept + off, None, a)
    out.start, out.accept = s, a
    return out
