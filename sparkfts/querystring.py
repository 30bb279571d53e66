"""ES ``query_string`` syntax -> bool-tree IR -> single-pass execution.

The reference builds its query DSL programmatically (reference
ElasticsearchToNeo4jSync.py:92-102); the next thing a real user of an ES
index types is the Lucene query-string syntax (Kibana search bar,
``q=`` URL param). This module pins a deterministic SUBSET of that
grammar and compiles it onto the existing typed IR
(:class:`~sparkfts.querybuilder.Bool` / ``Clause``), executed by the
single-pass bool-tree kernel (:mod:`sparkfts.booltree`) — no new
scoring semantics, only new surface syntax.

Pinned grammar (EBNF; everything outside it FAILS LOUD with a
``QueryStringError`` naming the offending token — matching ES
``query_string``'s parse-error behavior, not ``simple_query_string``'s
silent best-effort)::

    query    := or_expr
    or_expr  := and_expr ( OR and_expr )*
    and_expr := not_expr ( AND not_expr )*
             |  group                       -- modifier group, see below
    not_expr := NOT not_expr | primary
    group    := modified+                   -- implicit combination
    modified := [ '+' | '-' ] primary
    primary  := '(' query ')' | term
    term     := [ field ':' ] word [ '~' ]

- ``AND`` / ``OR`` / ``NOT`` are uppercase keywords (Lucene); ``&&`` /
  ``||`` / ``!`` are accepted aliases.
- A sequence WITHOUT explicit AND/OR uses Lucene occur-modifier
  semantics: ``+x`` -> must, ``-x`` -> must_not, bare -> should when
  ``default_operator='or'`` (must when ``'and'``). Mixing ``+``/``-``
  modifiers with explicit AND/OR inside one group is ambiguous in
  Lucene and REJECTED here.
- ``NOT x`` attaches ``x`` to the enclosing bool's must_not. A query or
  group with no positive member (e.g. ``NOT x``, ``-x``) is rejected,
  and so is bare ``*`` — match-all(-minus) goes through the typed API
  (``match_all_topk`` / ``SearchRequest``), keeping this grammar purely
  scoring-positive.
- ``word~`` -> ``fuzziness=AUTO`` on that word's clause (ES AUTO edit
  distances); otherwise exact.
- ``field:word`` targets one field; only valid when executing against a
  multi-field index (single-field execution rejects non-default
  fields). ``field:(a b)`` distributes the field over the group.
- Each ``word`` is run through the pinned analyzer; a word that
  analyzes to several terms (``spark-job``) stays ONE conjunctive
  clause, like ES's per-field match of the analyzed token stream.
- ``term^N`` / ``(group)^N`` / ``field:(...)^N`` apply a Lucene boost
  (round 5): one multiply after the node's own fold, N a non-negative
  number; stacked boosts multiply (``(a^2)^3`` = 6).
- Quoted phrases, ranges, regex and wildcards-in-words are
  NOT in the subset -> ``QueryStringError`` (wildcard/prefix queries
  have their own typed API, :mod:`sparkfts.prefix`).

Scoring is entirely the bool-tree kernel's pinned semantics: must/
should sums in member order, union-OR, exclusion must_not, fuzzy
best-expansion-wins ``idf`` weights.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from sparkfts.querybuilder import Bool, Clause, DEFAULT_FIELDS


class QueryStringError(ValueError):
    """Parse/validation failure; message carries token + position."""


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<quote>")
  | (?P<word>[^\s()+\-!"~:^|&]+(?:-[^\s()+\-!"~:^|&]+)*)
  | (?P<colon>:)
  | (?P<fuzz>~)
  | (?P<caret>\^)
    """,
    re.VERBOSE,
)

_REJECT = {
    "quote": 'quoted phrases ("...") are outside the pinned subset — '
    "use sparkfts.phrase.match_phrase_batch",
}


def _lex(q: str) -> list[tuple[str, str, int]]:
    toks: list[tuple[str, str, int]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if m is None:  # pragma: no cover - the word class is a catch-all
            raise QueryStringError(f"unexpected character at {pos}: {q[pos]!r}")
        kind = m.lastgroup
        if kind in _REJECT:
            raise QueryStringError(f"at {pos}: {_REJECT[kind]}")
        if kind != "ws":
            toks.append((kind, m.group(), pos))
        pos = m.end()
    return toks


class _Parser:
    def __init__(self, toks, default_operator: str, fields: tuple[str, ...]):
        self.toks = toks
        self.i = 0
        if default_operator not in ("and", "or"):
            raise QueryStringError(
                f"default_operator must be 'and' or 'or', got {default_operator!r}"
            )
        self.default_op = default_operator
        self.fields = fields

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        if t is None:
            raise QueryStringError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, kind: str):
        t = self.take()
        if t[0] != kind:
            raise QueryStringError(f"at {t[2]}: expected {kind}, got {t[1]!r}")
        return t

    # -- grammar ----------------------------------------------------------
    def parse(self):
        node = self.or_expr()
        t = self.peek()
        if t is not None:
            raise QueryStringError(f"at {t[2]}: unexpected {t[1]!r}")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() and self.peek()[0] == "or":
            self.take()
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        should = []
        for p in parts:
            if p[0] != "pos":
                raise QueryStringError(
                    "NOT / occur modifiers directly under OR are ambiguous "
                    "— parenthesize (e.g. 'a OR (b AND NOT c)')"
                )
            should.append(p[1])
        return ("pos", Bool(should=tuple(should)))

    def and_expr(self):
        first = self._modified_or_not()
        parts = [first]
        explicit = False
        while True:
            t = self.peek()
            if t is None or t[0] in ("or", "rparen"):
                break
            if t[0] == "and":
                self.take()
                explicit = True
                parts.append(self._modified_or_not())
            elif t[0] in ("lparen", "word", "not", "plus", "minus"):
                parts.append(self._modified_or_not())
            else:
                raise QueryStringError(f"at {t[2]}: unexpected {t[1]!r}")
        if len(parts) == 1:
            return parts[0]
        kinds = {p[0] for p in parts}
        if explicit and kinds & {"must", "mustnot"}:
            raise QueryStringError(
                "mixing +/- occur modifiers with explicit AND/OR in one "
                "group is ambiguous in Lucene — parenthesize instead"
            )
        must, should, must_not = [], [], []
        for p in parts:
            if p[0] == "not" or p[0] == "mustnot":
                must_not.append(p[1])
            elif p[0] == "must":
                must.append(p[1])
            elif explicit or self.default_op == "and":
                must.append(p[1])
            else:
                should.append(p[1])
        if not must and not should:
            raise QueryStringError(
                "query group has no positive clause (pure-negative "
                "queries match nothing; add '*' for match-all-minus)"
            )
        return ("pos", Bool(must=tuple(must), should=tuple(should),
                            must_not=tuple(must_not)))

    def _modified_or_not(self):
        t = self.peek()
        if t and t[0] == "not":
            self.take()
            inner = self._modified_or_not()
            if inner[0] != "pos":
                raise QueryStringError(f"at {t[2]}: NOT of a modified/negated term")
            return ("not", inner[1])
        if t and t[0] == "plus":
            self.take()
            return ("must", self._primary())
        if t and t[0] == "minus":
            self.take()
            return ("mustnot", self._primary())
        return ("pos", self._primary())

    def _boost(self, node):
        """Optional trailing ``^number`` (Lucene boost) -> wrapped node.
        The kernel applies it as one multiply after the node's own fold
        (querybuilder Clause.boost / Bool.boost -> booltree ("boost",…))."""
        if not (self.peek() and self.peek()[0] == "caret"):
            return node
        t = self.take()
        num = self.take()
        if num[0] != "word":
            raise QueryStringError(f"at {t[2]}: ^ needs a number")
        try:
            b = float(num[1])
        except ValueError:
            raise QueryStringError(
                f"at {num[2]}: invalid boost {num[1]!r}"
            ) from None
        if b < 0:
            raise QueryStringError(f"at {num[2]}: negative boost")
        import dataclasses

        return dataclasses.replace(node, boost=b * node.boost)

    def _primary(self):
        t = self.take()
        if t[0] == "lparen":
            node = self.or_expr()
            self.expect("rparen")
            if node[0] == "not":
                raise QueryStringError("parenthesized pure-NOT group")
            return self._boost(node[1])
        if t[0] != "word":
            raise QueryStringError(f"at {t[2]}: expected a term, got {t[1]!r}")
        word = t[1]
        fields = self.fields
        # field:word  or  field:(group)
        if self.peek() and self.peek()[0] == "colon":
            self.take()
            fields = (word,)
            nxt = self.peek()
            if nxt and nxt[0] == "lparen":
                saved = self.fields
                self.fields = fields
                try:
                    self.take()
                    node = self.or_expr()
                    self.expect("rparen")
                finally:
                    self.fields = saved
                if node[0] == "not":
                    raise QueryStringError("field:(...) of a pure-NOT group")
                return self._boost(node[1])
            word = self.expect("word")[1]
        fuzziness = "0"
        if self.peek() and self.peek()[0] == "fuzz":
            self.take()
            fuzziness = "AUTO"
        if word == "*":
            raise QueryStringError(
                "bare '*' match-all is only valid as the single positive "
                "clause of a match-all-minus query; use match_all_topk / "
                "SearchRequest for match-all"
            )
        return self._boost(
            Clause(query=word, fields=fields, operator="and",
                   fuzziness=fuzziness)
        )


def parse_query_string(
    q: str,
    default_operator: str = "or",
    fields: tuple[str, ...] = DEFAULT_FIELDS,
):
    """Parse ``q`` -> a :class:`Bool`/:class:`Clause` IR node (pinned
    grammar in the module docstring). Raises :class:`QueryStringError`
    on anything outside the subset."""
    toks = _lex(q)
    if not toks:
        raise QueryStringError("empty query string")
    node = _Parser(toks, default_operator, tuple(fields)).parse()
    if node[0] in ("not", "mustnot"):
        raise QueryStringError(
            "pure-negative query matches nothing (no positive clause)"
        )
    return node[1]


def _used_fields(node) -> set:
    out: set = set()
    if isinstance(node, Clause):
        out.update(f.split("^", 1)[0] for f in node.fields)
    elif isinstance(node, Bool):
        for part in (node.must, node.should, node.must_not):
            for c in part:
                out |= _used_fields(c)
    else:  # DisMax — not produced by this parser, but walk anyway
        for c in node.queries:
            out |= _used_fields(c)
    return out


def query_string_topk_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    default_operator: str = "or",
    fields: tuple[str, ...] = DEFAULT_FIELDS,
    multifield: bool = False,
    max_expansions: int | None = None,
) -> DataFrame:
    """Parse + execute a batch of query strings on the index in ONE
    single-pass bool-tree plan -> DataFrame(query_id, rank, doc_id,
    score). ``fields`` is the default field set for unqualified terms;
    ``field:term`` syntax requires ``multifield=True``."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import SearchRequest

    reqs = []
    id_map = {}
    for pos, (qid, q, k) in enumerate(queries):
        node = parse_query_string(q, default_operator, fields)
        if not multifield:
            bad = _used_fields(node) - set(
                f.split("^", 1)[0] for f in fields
            )
            if bad:
                raise QueryStringError(
                    f"field-qualified terms {sorted(bad)} need a "
                    "multi-field index (multifield=True)"
                )
        reqs.append(SearchRequest(clauses=(node,), k=int(k)))
        id_map[pos] = qid
    res = bool_topk_batch(
        spark, index_dir, reqs, max_expansions=max_expansions,
        multifield=multifield,
    )
    from sparkfts.index import lit_map
    from pyspark.sql import functions as F

    qid_map = lit_map(id_map.items())
    return res.select(
        F.element_at(qid_map, F.col("request_id")).alias("query_id"),
        "rank", "doc_id", "score",
    )
