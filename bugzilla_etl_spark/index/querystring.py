"""ES ``query_string`` / ``simple_query_string`` parser -> ``Bool``.

The reference's consumers speak Lucene query-string syntax to the ES
index it maintains (the `bugs` alias the dashboards query — the
not_analyzed term/range filters of
``configuration/es/bug_version.json:57-65,221-224`` reached through
Kibana-style search boxes). This module is that front door for the
engine: one string parses into the composable :class:`~.boolquery.Bool`
object and executes through the existing grouped executor — the parser
adds NO execution machinery of its own.

Supported syntax (the ``simple_query_string`` operator set plus the
common ``query_string`` extras)::

    term            optional term (``default_operator="or"``) or
                    required (``default_operator="and"``)
    +term  -term    explicitly required / excluded
    a | b | c       OR group — ONE bool clause, >=1 member must match
    ( a | b )       parenthesized OR group (one nesting level: groups
                    of terms only — arbitrary boolean trees are not
                    expressible in one flat Bool; compose Bool objects)
    "a b"~N^B       match_phrase, slop N, clause boost B
    term*  te?m     wildcard -> dictionary expansion (top-df terms,
                    capped at ``max_expansions`` — Lucene's top-terms
                    multi-term rewrite, exactly ``wildcard_search``)
    term~N          fuzzy (edit distance N<=2; bare ``~`` = 1)
    term^B          clause boost
    attr:value      docs-dimension term filter (ES filter context —
                    candidates restricted, statistics untouched)
    attr:>v >=v <v <=v    range filter
    attr:[a TO b]   closed range filter
    attr:*          exists filter;  -attr:... negates any filter
    field:term      analyzed-field-scoped match (single-field
                    ``multi_match`` clause; one scoped field per query)
    AND OR NOT      uppercase keyword forms of ``+`` / ``|`` / ``-``

Documented deviations / limitations (each raises ``ValueError`` with
the reason rather than silently mis-parsing):

- phrases always GATE (ES with ``default_operator=or`` would treat an
  unmarked phrase as a should clause; ``Bool`` has no phrase-as-should);
- phrases cannot be negated or OR-grouped (``must_not`` holds terms);
- ``attr:...`` filters are always conjunctive filter-context clauses
  regardless of +/default operator (ES filter semantics);
- field-scoped matches are always required and one scoped analyzed
  field per query (a single-field ``multi_match`` clause gates);
- OR groups and multi-term expansions on a ``*_shingle`` analyzer
  chain raise: joining atoms into one clause text would manufacture
  shingles across atom boundaries that neither atom contains.

Wildcard / fuzzy atoms expand against the index dictionary AT PARSE
TIME (driver-side range scans — plan-time data, no Spark job), so the
returned ``Bool`` is plain data that executes anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from ..tokenize import py_analyze
from .manifest import IndexManifest
from .predicate import BASE_COL_TYPES
from .query import _expand_fuzzy, _expand_wildcard, _lookup_terms

__all__ = ["parse_query_string", "query_string_search"]

_WORD_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")
_WORD_FUZZY_RE = re.compile(r"~(\d*)$")
_FIELD_RE = re.compile(r"^([A-Za-z][A-Za-z0-9_.]*):(.+)$", re.S)
_RANGE_RE = re.compile(r"^\[(.+?)\s+TO\s+(.+?)\]$", re.S)

#: negation map for -attr:... filters (every op has an exact complement)
_NEG_OP = {"==": "!=", "!=": "==", "<": ">=", "<=": ">", ">": "<=",
           ">=": "<", "in": "not_in", "not_in": "in"}


@dataclass
class _Atom:
    kind: str                      # term | phrase | filter | scoped
    text: str = ""
    boost: float = 1.0
    slop: int | None = None        # phrase ~N
    fuzzy: int | None = None       # term ~N
    wildcard: bool = False         # term contains * / ?
    field: str = ""                # scoped match field
    clause: tuple = ()             # filter (col, op, value)


@dataclass
class _Unit:
    neg: bool = False
    plus: bool = False
    atoms: list = dc_field(default_factory=list)


# ------------------------------------------------------------------ lexer
def _lex(qs: str) -> list:
    """-> flat tokens: '(' ')' '|' '+' '-' or ('P', text, suffix) for a
    quoted phrase or ('W', word). ``+``/``-`` are unit prefixes only at
    a unit boundary (start / after whitespace / '(' / '|'); embedded
    they stay part of the word (and the analyzer strips them)."""
    out = []
    i, n = 0, len(qs)
    boundary = True
    while i < n:
        c = qs[i]
        if c.isspace():
            boundary = True
            i += 1
            continue
        if c in "()|":
            out.append(c)
            boundary = True
            i += 1
            continue
        if c in "+-" and boundary and i + 1 < n and not qs[i + 1].isspace():
            out.append(c)
            boundary = False
            i += 1
            continue
        if c == '"':
            j = qs.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated phrase quote: {qs[i:]!r}")
            text = qs[i + 1 : j]
            k = j + 1
            while k < n and not qs[k].isspace() and qs[k] not in "()|":
                k += 1
            out.append(("P", text, qs[j + 1 : k]))
            boundary = False
            i = k
            continue
        # word — may carry an attr:[a TO b] range (spaces inside [ ])
        j = i
        depth = 0
        while j < n:
            ch = qs[j]
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth = max(0, depth - 1)
            elif depth == 0 and (ch.isspace() or ch in '()|"'):
                break
            j += 1
        out.append(("W", qs[i:j]))
        boundary = False
        i = j
    return out


# ----------------------------------------------------------- atom parsing
def _typed_value(col: str, raw: str, col_type: str) -> object:
    """Coerce a filter literal to the column's manifest type."""
    t = col_type.lower()
    v = raw.strip("'\"")
    try:
        if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
            return int(v)
        if t in ("float", "double") or t.startswith("decimal"):
            return float(v)
        if t == "boolean":
            if v.lower() in ("true", "false"):
                return v.lower() == "true"
            raise ValueError(v)
    except ValueError:
        raise ValueError(
            f"filter value {raw!r} does not parse as the {t} column {col!r}"
        ) from None
    return v


def _filter_atom(col: str, rest: str, col_type: str) -> _Atom:
    rest = rest.strip()
    if rest == "*":
        return _Atom(kind="filter", clause=(col, "exists", True))
    rm = _RANGE_RE.match(rest)
    if rm:
        lo = _typed_value(col, rm.group(1), col_type)
        hi = _typed_value(col, rm.group(2), col_type)
        # one atom, two conjunctive clauses — marker op handled in lower
        return _Atom(kind="filter", clause=("__range__", col, lo, hi))
    for op_s, op in ((">=", ">="), ("<=", "<="), (">", ">"), ("<", "<")):
        if rest.startswith(op_s):
            return _Atom(
                kind="filter",
                clause=(col, op, _typed_value(col, rest[len(op_s):], col_type)),
            )
    if rest.endswith("*") and not any(c in rest[:-1] for c in "*?"):
        # trailing-star keyword wildcard -> the pushable prefix op
        # (half-open string range on parquet statistics); string
        # columns only — a numeric prefix has no order semantics
        if col_type.lower() not in ("string", "varchar"):
            raise ValueError(
                f"prefix filters need a string column: {col!r} is "
                f"{col_type}"
            )
        return _Atom(kind="filter", clause=(col, "prefix", rest[:-1]))
    return _Atom(kind="filter", clause=(col, "==", _typed_value(col, rest, col_type)))


def _word_atom(
    word: str, m: IndexManifest | None, default_field: str
) -> _Atom:
    boost = 1.0
    bm = _WORD_BOOST_RE.search(word)
    if bm:
        boost = float(bm.group(1))
        if not boost > 0:
            raise ValueError(f"boost must be > 0: {word!r}")
        word = word[: bm.start()]
    fuzzy = None
    fm = _WORD_FUZZY_RE.search(word)
    if fm and word[: fm.start()]:
        fuzzy = int(fm.group(1)) if fm.group(1) else 1
        if fuzzy > 2:
            raise ValueError(
                f"fuzziness is capped at 2 edits (Lucene): {word!r}"
            )
        word = word[: fm.start()]
    fs = _FIELD_RE.match(word)
    if fs:
        head, rest = fs.group(1), fs.group(2)
        if m is None:
            raise ValueError(
                f"{head}:... needs the index manifest (pass m/index_dir)"
            )
        attr_types = dict(BASE_COL_TYPES)
        attr_types.update(m.doc_attr_types)
        for a in m.doc_attrs:
            attr_types.setdefault(a, "string")
        if head in attr_types:
            if fuzzy is not None:
                raise ValueError(f"~ does not apply to filters: {word!r}")
            a = _filter_atom(head, rest, attr_types[head])
            a.boost = boost
            return a
        if head == "content" or head in m.fields:
            if head == default_field:
                word = rest  # scoped to the default field = plain term
            else:
                if fuzzy is not None or "*" in rest or "?" in rest:
                    raise ValueError(
                        "scoped-field matches take plain text only "
                        f"(no ~/*/?): {word!r}"
                    )
                return _Atom(kind="scoped", text=rest, field=head, boost=boost)
        else:
            raise ValueError(
                f"unknown field {head!r}: not a docs-dimension column "
                f"({sorted(attr_types)}) or analyzed field "
                f"({sorted(m.fields)})"
            )
    if fuzzy is None and ("*" in word or "?" in word):
        if word.strip("*?") == "":
            raise ValueError(f"wildcard pattern needs a literal: {word!r}")
        return _Atom(kind="term", text=word.lower(), boost=boost, wildcard=True)
    if not word or not re.search(r"[A-Za-z0-9_]", word):
        raise ValueError(f"empty term: {word!r}")
    return _Atom(kind="term", text=word, boost=boost, fuzzy=fuzzy)


def _phrase_atom(text: str, suffix: str) -> _Atom:
    slop = None
    boost = 1.0
    s = suffix
    bm = _WORD_BOOST_RE.search(s)
    if bm:
        boost = float(bm.group(1))
        if not boost > 0:
            raise ValueError(f"boost must be > 0: ^{bm.group(1)}")
        s = s[: bm.start()]
    fm = _WORD_FUZZY_RE.search(s)
    if fm:
        slop = int(fm.group(1)) if fm.group(1) else 0
        s = s[: fm.start()]
    if s:
        raise ValueError(f"unexpected phrase suffix: {suffix!r}")
    return _Atom(kind="phrase", text=text, boost=boost, slop=slop)


# ----------------------------------------------------------------- parser
def _parse_units(
    tokens: list, m: IndexManifest | None, default_field: str
) -> list[_Unit]:
    units: list[_Unit] = []
    neg = plus = False
    i, n = 0, len(tokens)

    def atom_of(tok) -> _Atom:
        if isinstance(tok, tuple) and tok[0] == "P":
            return _phrase_atom(tok[1], tok[2])
        if isinstance(tok, tuple) and tok[0] == "W":
            return _word_atom(tok[1], m, default_field)
        raise ValueError(f"expected a term or phrase, got {tok!r}")

    while i < n:
        t = tokens[i]
        if t == "+":
            plus = True
            i += 1
            continue
        if t == "-":
            neg = True
            i += 1
            continue
        if isinstance(t, tuple) and t[0] == "W" and t[1] in ("AND", "OR", "NOT"):
            if t[1] == "NOT":
                neg = True
            elif t[1] == "AND":
                if not units or i + 1 >= n:
                    raise ValueError("AND needs a clause on both sides")
                units[-1].plus = True
                plus = True
            else:  # OR
                if not units or i + 1 >= n:
                    raise ValueError("OR needs a clause on both sides")
                nxt = tokens[i + 1]
                units[-1].atoms.append(atom_of(nxt))
                i += 2
                continue
            i += 1
            continue
        if t == "|":
            if not units or i + 1 >= n:
                raise ValueError("| needs a clause on both sides")
            if neg or plus:
                raise ValueError("put +/- before the whole group, not inside")
            nxt = tokens[i + 1]
            units[-1].atoms.append(atom_of(nxt))
            i += 2
            continue
        if t == "(":
            group: list[_Atom] = []
            i += 1
            expect_atom = True
            while i < n and tokens[i] != ")":
                tk = tokens[i]
                if tk == "|":
                    if expect_atom:
                        raise ValueError("'|' without a left operand in group")
                    expect_atom = True
                    i += 1
                    continue
                if tk == "(":
                    raise ValueError(
                        "nested groups are not expressible in one flat "
                        "Bool query; compose Bool objects directly"
                    )
                if not expect_atom:
                    raise ValueError(
                        "groups hold '|'-separated alternatives only "
                        "(nested boolean trees need composed Bool objects)"
                    )
                group.append(atom_of(tk))
                expect_atom = False
                i += 1
            if i >= n:
                raise ValueError("unterminated '('")
            if not group:
                raise ValueError("empty group")
            units.append(_Unit(neg=neg, plus=plus, atoms=group))
            neg = plus = False
            i += 1
            continue
        if t == ")":
            raise ValueError("unbalanced ')'")
        units.append(_Unit(neg=neg, plus=plus, atoms=[atom_of(t)]))
        neg = plus = False
        i += 1
    if neg or plus:
        raise ValueError("dangling +/-/NOT at end of query")
    return units


# --------------------------------------------------------------- lowering
def _expand_term_atom(
    a: _Atom,
    m: IndexManifest | None,
    index_dir: str | None,
    chain: str,
    fld: str,
    fuzzy_prefix_length: int,
    max_expansions: int,
) -> list[str]:
    """-> the atom's clause-text fragments (analyzed-dictionary terms
    for expansions, raw text otherwise — Bool re-analyzes raw text)."""
    if a.wildcard or a.fuzzy is not None:
        if m is None or index_dir is None:
            raise ValueError(
                "wildcard/fuzzy terms need the index for dictionary "
                "expansion (pass m and index_dir)"
            )
        if a.wildcard:
            terms = _expand_wildcard(m, index_dir, a.text, fld, max_expansions)
        else:
            toks = py_analyze(a.text, chain)
            if len(toks) != 1:
                raise ValueError(
                    f"~ fuzziness applies to a single term: {a.text!r} "
                    f"analyzes to {toks}"
                )
            terms = _expand_fuzzy(
                m, index_dir, toks[0], fld, a.fuzzy,
                fuzzy_prefix_length, max_expansions,
            )
        if terms:
            return terms
        # expansion of nothing: the clause must stay present but
        # unmatchable (ES: a wildcard matching no term matches no doc).
        # A digest sentinel survives every analyzer chain as one token
        # and cannot collide with a real dictionary term.
        import hashlib

        return [
            "z0" + hashlib.blake2b(a.text.encode(), digest_size=8).hexdigest()
        ]
    return [a.text]


def parse_query_string(
    qs: str,
    m: IndexManifest | None = None,
    index_dir: str | None = None,
    default_field: str = "content",
    default_operator: str = "or",
    min_should_match: int | None = None,
    fuzzy_prefix_length: int = 1,
    max_expansions: int = 50,
):
    """Parse one query string into a :class:`~.boolquery.Bool`.

    ``m``/``index_dir`` are required only when the string uses
    ``attr:`` filters, scoped fields, or wildcard/fuzzy expansion.
    ``default_operator``: "or" — unmarked terms are optional (should)
    when any gating clause exists, the matching clause otherwise;
    "and" — every unmarked term is required.
    """
    from .boolquery import Bool

    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be or|and: {default_operator!r}"
        )
    units = _parse_units(_lex(qs), m, default_field)
    if not units:
        raise ValueError("empty query string")
    chain = m.field_chain(default_field) if m is not None else "code_v1"
    shingle = chain.endswith("_shingle")

    must: list[str] = []
    must_bs: list[float] = []
    phrases: list[str] = []
    phrase_bs: list[float] = []
    should: list[str] = []
    should_bs: list[float] = []
    must_not: list[str] = []
    filters: list[tuple] = []
    scoped_texts: list[str] = []
    scoped_bs: list[float] = []
    scoped_field: str | None = None
    slop: int | None = None

    def _clause_text(atoms: list[_Atom]) -> tuple[str, float]:
        frags: list[str] = []
        for a in atoms:
            frags.extend(
                _expand_term_atom(
                    a, m, index_dir, chain, default_field,
                    fuzzy_prefix_length, max_expansions,
                )
            )
        if shingle and (len(atoms) > 1 or len(frags) > 1):
            raise ValueError(
                f"OR groups / multi-term expansions on the {chain!r} "
                "chain would manufacture shingles across atom "
                "boundaries; query each alternative separately"
            )
        boosts = {a.boost for a in atoms}
        if len(boosts) > 1:
            raise ValueError(
                "one boost per clause: group members carry "
                f"{sorted(boosts)} (Bool boosts are per clause)"
            )
        return " ".join(frags), boosts.pop()

    for u in units:
        kinds = {a.kind for a in u.atoms}
        if "filter" in kinds or "scoped" in kinds or "phrase" in kinds:
            if len(u.atoms) > 1:
                raise ValueError(
                    "filters / scoped matches / phrases cannot be "
                    "OR-grouped (groups hold plain terms)"
                )
        a = u.atoms[0]
        if a.kind == "filter":
            clauses = (
                [(a.clause[1], ">=", a.clause[2]),
                 (a.clause[1], "<=", a.clause[3])]
                if a.clause[0] == "__range__"
                else [a.clause]
            )
            if u.neg:
                if a.clause[0] == "__range__":
                    raise ValueError(
                        "negated range filters are not conjunctive "
                        "(NOT(a<=x<=b) is a disjunction); split the query"
                    )
                col, op, v = a.clause
                if op == "exists":
                    clauses = [(col, "exists", not v)]
                elif op == "prefix":
                    raise ValueError(
                        "negated prefix filters are not conjunctive "
                        f"(-{col}:{v}*); split the query"
                    )
                else:
                    clauses = [(col, _NEG_OP[op], v)]
            filters.extend(clauses)
            continue
        if a.kind == "scoped":
            if u.neg:
                raise ValueError(
                    "scoped-field matches cannot be negated (must_not "
                    "holds primary-field terms)"
                )
            if scoped_field is not None and scoped_field != a.field:
                raise ValueError(
                    "one scoped analyzed field per query "
                    f"({scoped_field!r} vs {a.field!r}); use multi_match"
                )
            scoped_field = a.field
            scoped_texts.append(a.text)
            scoped_bs.append(a.boost)
            continue
        if a.kind == "phrase":
            if u.neg:
                raise ValueError(
                    "phrases cannot be negated (must_not holds terms)"
                )
            if a.slop is not None:
                if slop is not None and slop != a.slop:
                    raise ValueError(
                        f"Bool carries one slop for all phrases: "
                        f"{slop} vs {a.slop}"
                    )
                slop = a.slop
            phrases.append(a.text)
            phrase_bs.append(a.boost)
            continue
        # term unit (possibly an OR group / expansion)
        if u.neg:
            for at in u.atoms:
                for frag in _expand_term_atom(
                    at, m, index_dir, chain, default_field,
                    fuzzy_prefix_length, max_expansions,
                ):
                    must_not.append(frag)
            continue
        text, boost = _clause_text(u.atoms)
        if u.plus or default_operator == "and":
            must.append(text)
            must_bs.append(boost)
        else:
            should.append(text)
            should_bs.append(boost)

    sb = 1.0
    if should_bs and len(set(should_bs)) > 1:
        raise ValueError(
            "Bool carries ONE should_boost for every optional term: "
            f"got {sorted(set(should_bs))}; mark boosted terms required (+)"
        )
    if should_bs:
        sb = should_bs[0]

    return Bool(
        must=tuple(must),
        phrase=tuple(phrases),
        should=tuple(should),
        must_not=tuple(must_not),
        filter=tuple(tuple(c) for c in filters),
        min_should_match=min_should_match,
        field=default_field,
        slop=int(slop or 0),
        multi_match=tuple(scoped_texts),
        mm_fields=(scoped_field,) if scoped_field else (),
        must_boosts=tuple(must_bs) if any(b != 1.0 for b in must_bs) else (),
        phrase_boosts=(
            tuple(phrase_bs) if any(b != 1.0 for b in phrase_bs) else ()
        ),
        mm_boosts=tuple(scoped_bs) if any(b != 1.0 for b in scoped_bs) else (),
        should_boost=sb,
    )


def query_string_search(
    spark,
    index_dir: str,
    qs: str,
    k: int = 10,
    default_field: str = "content",
    default_operator: str = "or",
    min_should_match: int | None = None,
    sort_by: tuple | None = None,
    search_after: tuple | None = None,
    collapse: str | None = None,
    execution: str = "auto",
) -> list[tuple]:
    """Parse ``qs`` against ``index_dir``'s manifest and execute it
    through :func:`~.boolquery.bool_search` (top-k, or attr-sorted /
    collapsed / paged — every Bool execution option composes)."""
    import os

    from .boolquery import bool_search

    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    q = parse_query_string(
        qs, m=m, index_dir=index_dir, default_field=default_field,
        default_operator=default_operator,
        min_should_match=min_should_match,
    )
    return bool_search(
        spark, index_dir, q, k=k, sort_by=sort_by,
        search_after=search_after, collapse=collapse, execution=execution,
    )


# re-exported for parser unit tests that probe expansion fallback
_lookup = _lookup_terms
