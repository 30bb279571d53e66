"""ES ``simple_query_string``: lenient syntax -> exact composed execution.

The sibling of :mod:`sparkfts.querystring` (``query_string``): same
compile-to-typed-IR design, OPPOSITE error contract. ``query_string``
FAILS LOUD on anything outside its grammar (ES parity); this module
**never raises on query text** — ES's ``simple_query_string`` "discards
any invalid parts" (the user-facing search-box query), and that
leniency is the feature. Reference pin: the reference exposes exactly
one analyzed-search entry point (``client.search`` with the dict built
at reference ElasticsearchToNeo4jSync.py:92-102); simple_query_string is the
ES-surface sibling a search box in front of that index would use.

Pinned syntax (each feature gated by its ES flag; a disabled feature's
character is LITERAL text and the analyzer deals with it):

- ``+`` AND, ``|`` OR (flags ``AND`` / ``OR``). Whitespace between
  clauses combines with ``default_operator``. Pinned precedence:
  ``-`` > ``+`` > ``|``, left-associative; whitespace binds at its
  default operator's level.
- ``-term`` negation (flag ``NOT``) — only at clause start; a mid-word
  ``-`` (``spark-job``) is term text and the analyzer splits it into
  ONE conjunctive clause (the same pin as :mod:`sparkfts.querystring`).
- ``"quoted phrase"`` (flag ``PHRASE``) -> match_phrase on the
  positional index; ``"..."~N`` (flag ``NEAR``, alias ``SLOP``) sets
  phrase slop.
- ``term*`` trailing-star prefix (flag ``PREFIX``) -> a
  :class:`~sparkfts.querybuilder.Prefix` bool-tree leaf (term-level:
  lowercased, never analyzed; best-expansion-wins scoring, the
  :mod:`sparkfts.prefix` pin). A ``*`` elsewhere in a word is literal.
- ``term~`` / ``term~N`` fuzziness (flag ``FUZZY``): ``~0`` exact,
  ``~1`` / ``~2`` a FIXED max edit distance (the kernel's
  ``_FUZZY1``/``_FUZZY2`` expansion classes), ``~N>2`` caps at 2
  (Lucene's bound); bare ``~`` -> ES ``AUTO`` (length-laddered 0/1/2
  edits — Lucene's SimpleQueryParser defaults bare ``~`` to fixed 2;
  AUTO is this engine's pinned default everywhere, documented here
  once).
- ``( ... )`` grouping (flag ``PRECEDENCE``).
- ``\\x`` escapes the special character ``x`` (flag ``ESCAPE``).

Leniency pins (the "discard invalid parts" matrix, each one tested):
dangling operators are dropped; a stray ``)`` is skipped; an unclosed
``(`` parses to end-of-input; an unclosed quote runs to end-of-input;
``-`` with nothing after it is dropped; a bare ``*`` is dropped; a word
the analyzer empties vanishes (and empty groups collapse); a query with
no surviving positive clause matches NOTHING (Lucene's pure-MUST_NOT
BooleanQuery semantics — same pin as the kernel's empty-must tree).

Execution:

- **Phrase-free tree** (the common case): lowered to the typed
  Bool/Clause/Prefix IR and executed by the single-pass bool-tree
  kernel (:func:`sparkfts.booltree.bool_topk_batch`) — one pruned
  postings scan, per-shard evaluation, bounded global window. Prefix
  leaves ride the kernel's expansion-group machinery
  (:func:`sparkfts.booltree._field_expansions` ``_PREFIX`` tag), so
  their scores are bit-identical to the standalone prefix query.
- **Phrase-bearing tree**: exact composition over COMPLETE leaf match
  sets: ONE kernel pass evaluates every term/prefix leaf
  (:func:`sparkfts.booltree.bool_matches_batch`), one positions pass
  per distinct slop evaluates every phrase leaf
  (:func:`sparkfts.phrase.match_phrase_batch` ``all_matches=True``),
  then a single ``groupBy(query_id, doc_id)`` folds the per-leaf score
  map through the tree as pure Catalyst expressions (matched-predicate
  + member-order float64 sum — the kernel's exact fold, codegen'd).
  Cost: 2-3 scans total regardless of leaf count; the fold shuffle is
  bounded by the union of leaf match sets (what ES's doc-at-a-time
  scorer also touches). The final page reuses the repo's standard
  per-query rank window.

Scoring is everywhere the engine's pinned BM25 family: term leaf =
``idf * tf_norm * (k1+1)``; fuzzy leaf = best-expansion-wins
(:mod:`oracle.fuzzy`); prefix leaf = best-expansion-wins over the
dictionary range; phrase leaf = phrase-idf-sum * tf_norm(phrase-freq)
(:mod:`oracle.phrase`); AND sums members, OR sums MATCHING members, in
member order.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkfts.querybuilder import Bool, Clause, DEFAULT_FIELDS, Prefix

ALL_FLAGS = frozenset(
    {"AND", "OR", "NOT", "PREFIX", "PHRASE", "PRECEDENCE", "ESCAPE",
     "FUZZY", "NEAR"}
)
_FLAG_ALIASES = {"SLOP": "NEAR"}


def _resolve_flags(flags) -> frozenset:
    """``"ALL"`` / ``"NONE"`` / iterable of flag names -> frozenset.
    Unknown flag names raise (config, not query text — fail loud)."""
    if flags is None or flags == "ALL":
        return ALL_FLAGS
    if flags == "NONE":
        return frozenset()
    out = set()
    for f in flags:
        f = _FLAG_ALIASES.get(f.upper(), f.upper())
        if f == "ALL":
            return ALL_FLAGS
        if f == "NONE":
            continue
        if f not in ALL_FLAGS:
            raise ValueError(f"unknown simple_query_string flag {f!r}")
        out.add(f)
    return frozenset(out)


@dataclass(frozen=True)
class PhraseLeaf:
    """A quoted-phrase leaf in a simple_query_string tree. Executed by
    the positions kernel (:mod:`sparkfts.phrase`), never by the
    bool-tree kernel — :func:`simple_query_string_topk_batch` splits
    phrase-bearing trees into the composed plan."""

    text: str
    slop: int = 0


# ---------------------------------------------------------------------------
# lexer


def _lex(q: str, flags: frozenset) -> list[tuple]:
    """Lenient char-walk lexer -> tokens:
    ("lp",) ("rp",) ("and",) ("or",) ("not",)
    ("word", text, fuzziness_or_None, is_prefix)
    ("phrase", text, slop)."""
    esc = "ESCAPE" in flags
    toks: list[tuple] = []
    i, n = 0, len(q)

    def _digits(j: int) -> tuple[int | None, int]:
        k = j
        while k < n and q[k].isdigit():
            k += 1
        return (int(q[j:k]) if k > j else None), k

    def _at_clause_start(j: int) -> bool:
        # '-' is the NOT operator only at a clause boundary: start of
        # input, after whitespace, after an active '(' or after another
        # operator token — a mid-word '-' never reaches here (the word
        # loop keeps it as term text, the querystring.py hyphen pin)
        if not toks or toks[-1][0] in ("lp", "and", "or", "not"):
            return True
        prev = q[j - 1] if j > 0 else " "
        return prev.isspace() or (prev == "(" and "PRECEDENCE" in flags)

    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(" and "PRECEDENCE" in flags:
            toks.append(("lp",))
            i += 1
            continue
        if c == ")" and "PRECEDENCE" in flags:
            toks.append(("rp",))
            i += 1
            continue
        if c == "+" and "AND" in flags:
            toks.append(("and",))
            i += 1
            continue
        if c == "|" and "OR" in flags:
            toks.append(("or",))
            i += 1
            continue
        if c == "-" and "NOT" in flags and _at_clause_start(i):
            toks.append(("not",))
            i += 1
            continue
        if c == '"' and "PHRASE" in flags:
            j = i + 1
            buf = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and esc and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                else:
                    buf.append(q[j])
                    j += 1
            j = j + 1 if j < n else j  # consume closing quote if present
            slop = 0
            if j < n and q[j] == "~" and "NEAR" in flags:
                val, j2 = _digits(j + 1)
                if val is not None:
                    slop, j = val, j2
                else:
                    j = j + 1  # bare ~ after phrase: dropped
            text = "".join(buf)
            if text.strip():
                toks.append(("phrase", text, slop))
            i = j
            continue
        if c == "~":
            # a ~ not attached to a word/phrase: drop it (+ digits)
            _, i = _digits(i + 1)
            continue
        # word: collect chars up to whitespace / an ACTIVE special
        buf = []
        j = i
        while j < n:
            c = q[j]
            if c == "\\" and esc and j + 1 < n:
                buf.append(q[j + 1])
                j += 2
                continue
            if c.isspace():
                break
            if c == "(" and "PRECEDENCE" in flags:
                break
            if c == ")" and "PRECEDENCE" in flags:
                break
            if c == "+" and "AND" in flags:
                break
            if c == "|" and "OR" in flags:
                break
            if c == '"' and "PHRASE" in flags:
                break
            if c == "~" and "FUZZY" in flags:
                break
            buf.append(c)
            j += 1
        text = "".join(buf)
        fuzz = None
        if j < n and q[j] == "~" and "FUZZY" in flags:
            val, j2 = _digits(j + 1)
            j = j2
            # pinned mapping (module docstring): bare ~ -> AUTO,
            # ~0 -> exact, ~1/~2 -> FIXED edit distance, ~N>2 caps at 2
            if val is None:
                fuzz = "AUTO"
            else:
                fuzz = str(min(val, 2))
        is_prefix = False
        if "PREFIX" in flags and text.endswith("*"):
            text = text.rstrip("*")
            is_prefix = True
            fuzz = None  # "x*~" lexes prefix-then-~; ~ already consumed above
        if text:
            toks.append(("word", text, fuzz, is_prefix))
        i = max(j, i + 1)
    return toks


# ---------------------------------------------------------------------------
# parser (lenient recursive descent over the token list)


class _P:
    def __init__(self, toks: list[tuple], default_operator: str,
                 fields: tuple):
        self.toks = toks
        self.i = 0
        self.default_and = default_operator == "and"
        self.fields = fields

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def or_expr(self):
        """-> (pos_members, neg_members) at OR level."""
        pos: list = []
        neg: list = []

        def absorb(part):
            p, m = part
            if len(p) == 1 and not m:
                pos.append(p[0])
            elif p:
                pos.append(Bool(must=tuple(p), must_not=tuple(m)))
            else:
                neg.extend(m)  # pure-negative OR member hoists (Lucene)

        absorb(self.and_expr())
        while True:
            t = self.peek()
            if t is None or t[0] == "rp":
                break
            if t[0] == "or":
                self.i += 1
                absorb(self.and_expr())
            elif not self.default_and and t[0] in (
                "word", "phrase", "lp", "not"
            ):
                absorb(self.and_expr())  # whitespace = OR
            elif t[0] == "and":
                # dangling + at OR level (e.g. "a | + b"): treat as
                # starting a new AND part
                self.i += 1
                absorb(self.and_expr())
            else:
                self.i += 1  # stray token: discard (leniency)
        return pos, neg

    def and_expr(self):
        """-> (must_list, must_not_list): one +/whitespace-joined run."""
        must: list = []
        must_not: list = []

        def absorb_one():
            negd, node = self.unary()
            if node is None:
                return
            (must_not if negd else must).append(node)

        absorb_one()
        while True:
            t = self.peek()
            if t is None or t[0] in ("rp", "or"):
                break
            if t[0] == "and":
                self.i += 1
                absorb_one()
            elif self.default_and and t[0] in ("word", "phrase", "lp", "not"):
                absorb_one()  # whitespace = AND
            elif not self.default_and and t[0] in (
                "word", "phrase", "lp", "not"
            ):
                break  # whitespace = OR: hand back to or_expr
            else:
                self.i += 1  # discard
        return must, must_not

    def unary(self):
        """-> (negated, node_or_None)."""
        negd = False
        while self.peek() and self.peek()[0] == "not":
            self.i += 1
            negd = not negd
        node = self.primary()
        return negd, node

    def primary(self):
        t = self.peek()
        if t is None:
            return None
        if t[0] == "lp":
            self.i += 1
            pos, neg = self.or_expr()
            if self.peek() and self.peek()[0] == "rp":
                self.i += 1  # unclosed ( : parsed to end (leniency)
            if not pos and not neg:
                return None
            if not pos:
                # a group with only negatives: hoist impossible here
                # without a positive context -> pinned: the group is a
                # pure-negative node (matches nothing on its own; its
                # enclosing NOT/level decides)
                return Bool(must_not=tuple(neg))
            if len(pos) == 1 and not neg:
                return pos[0]
            return Bool(should=tuple(pos), must_not=tuple(neg))
        if t[0] == "word":
            self.i += 1
            _, text, fuzz, is_prefix = t
            if is_prefix:
                return Prefix(prefix=text.lower(), fields=self.fields)
            return Clause(
                query=text, fields=self.fields, operator="and",
                fuzziness=fuzz if fuzz is not None else "0",
            )
        if t[0] == "phrase":
            self.i += 1
            return PhraseLeaf(text=t[1], slop=t[2])
        # and/or/rp with no operand context: discard
        self.i += 1
        return None


def parse_simple_query_string(
    q: str,
    default_operator: str = "or",
    flags="ALL",
    fields: tuple = DEFAULT_FIELDS,
):
    """Parse ``q`` -> IR node (Clause / Prefix / PhraseLeaf / Bool), or
    ``None`` when no positive clause survives (matches nothing — the
    pinned Lucene pure-MUST_NOT semantics). NEVER raises on query text;
    raises only on invalid config (bad flag name / default_operator)."""
    if default_operator not in ("and", "or"):
        raise ValueError(
            f"default_operator must be 'and' or 'or', got"
            f" {default_operator!r}"
        )
    fl = _resolve_flags(flags)
    toks = _lex(q, fl)
    if not toks:
        return None
    p = _P(toks, default_operator, tuple(fields))
    pos, neg = p.or_expr()
    # trailing garbage (stray rp at top level): or_expr stops at rp —
    # restart after it and merge (leniency: ') b' keeps b)
    while p.peek() is not None:
        if p.peek()[0] == "rp":
            p.i += 1
            continue
        pos2, neg2 = p.or_expr()
        pos.extend(pos2)
        neg.extend(neg2)
    if not pos:
        return None
    if len(pos) == 1 and not neg:
        return pos[0]
    return Bool(should=tuple(pos), must_not=tuple(neg))


# ---------------------------------------------------------------------------
# tree utilities


def _prune(node, sw, stem):
    """Drop leaves the analyzer empties; collapse empty groups.
    Returns the pruned node or None."""
    from sparkfts.analysis import tokenize_query

    if isinstance(node, Clause):
        return node if tokenize_query(node.query, sw, stem) else None
    if isinstance(node, (Prefix, PhraseLeaf)):
        if isinstance(node, PhraseLeaf):
            return node if tokenize_query(node.text, sw, stem) else None
        return node if node.prefix else None
    if isinstance(node, Bool):
        must = tuple(
            x for x in (_prune(c, sw, stem) for c in node.must)
            if x is not None
        )
        should = tuple(
            x for x in (_prune(c, sw, stem) for c in node.should)
            if x is not None
        )
        must_not = tuple(
            x for x in (_prune(c, sw, stem) for c in node.must_not)
            if x is not None
        )
        # ES drops vanished clauses: a Bool whose positives all vanish
        # vanishes itself (its must_not has nothing to attach to)
        if not must and not should:
            return None
        if len(must) + len(should) == 1 and not must_not:
            return (must or should)[0]
        return Bool(must=must, should=should, must_not=must_not)
    raise TypeError(f"unexpected node {type(node)!r}")


def _has_phrase(node) -> bool:
    if isinstance(node, PhraseLeaf):
        return True
    if isinstance(node, Bool):
        return any(
            _has_phrase(c)
            for part in (node.must, node.should, node.must_not)
            for c in part
        )
    return False


def _leaves(node, out: list) -> None:
    if isinstance(node, (Clause, Prefix, PhraseLeaf)):
        out.append(node)
    elif isinstance(node, Bool):
        for part in (node.must, node.should, node.must_not):
            for c in part:
                _leaves(c, out)


# ---------------------------------------------------------------------------
# execution


def simple_query_string_topk_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    default_operator: str = "or",
    flags="ALL",
    fields: tuple = DEFAULT_FIELDS,
    multifield: bool = False,
    max_expansions: int | None = None,
    _force_composed: bool = False,
) -> DataFrame:
    """Execute a batch of simple_query_string queries -> DataFrame
    (query_id, rank, doc_id, score).

    Routing (module docstring): phrase-free trees -> ONE single-pass
    bool-tree plan; phrase-bearing trees -> the composed plan (one
    kernel pass for all term/prefix leaves + one positions pass per
    distinct slop + one fold shuffle). ``multifield=True`` executes
    against a multi-field index (phrase leaves are single-field —
    a phrase-bearing query under multifield raises ValueError; that is
    a CONFIG error, not query text). ``_force_composed`` routes
    phrase-free trees through the composed plan too (test seam — the
    two paths are asserted bit-identical)."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.index import lit_map, read_meta
    from sparkfts.querybuilder import SearchRequest

    schema = "query_id int, rank int, doc_id long, score double"
    parsed = [
        (qid, parse_simple_query_string(q, default_operator, flags, fields),
         int(k))
        for qid, q, k in queries
    ]
    if multifield and any(
        t is not None and _has_phrase(t) for _, t, _ in parsed
    ):
        raise ValueError(
            "phrase leaves require the single-field positional "
            "index (multifield=False)"
        )
    if multifield:
        from sparkfts.multifield import field_dir, read_mf_meta

        mf = read_mf_meta(index_dir)
        meta0 = read_meta(field_dir(index_dir, mf["fields"][0]))
    else:
        meta0 = read_meta(index_dir)
    from sparkfts.analysis import analysis_opts

    sw, stem = analysis_opts(meta0)

    fast: list[tuple[int, object, int]] = []      # (qid, tree, k)
    composed: list[tuple[int, object, int]] = []
    for qid, tree, k in parsed:
        if tree is None:
            continue
        tree = _prune(tree, sw, stem)
        if tree is None:
            continue
        if _has_phrase(tree):
            composed.append((qid, tree, int(k)))
        elif _force_composed:
            composed.append((qid, tree, int(k)))
        else:
            fast.append((qid, tree, int(k)))

    results: list[DataFrame] = []
    if fast:
        reqs = [
            SearchRequest(clauses=(tree,), k=k) for _, tree, k in fast
        ]
        res = bool_topk_batch(
            spark, index_dir, reqs, max_expansions=max_expansions,
            multifield=multifield,
        )
        qmap = lit_map((pos, qid) for pos, (qid, _t, _k) in enumerate(fast))
        results.append(
            res.select(
                F.element_at(qmap, F.col("request_id")).alias("query_id"),
                "rank", "doc_id", "score",
            )
        )
    if composed:
        results.append(
            _composed_topk(
                spark, index_dir, composed, max_expansions
            )
        )
    if not results:
        return spark.createDataFrame([], schema)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy("query_id", "rank")


def _composed_topk(
    spark: SparkSession,
    index_dir: str,
    composed: list[tuple[int, object, int]],
    max_expansions: int | None,
) -> DataFrame:
    """Composed plan for phrase-bearing trees (module docstring)."""
    from sparkfts.booltree import bool_matches_batch
    from sparkfts.index import lit_map
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.querybuilder import SearchRequest

    schema = "query_id int, rank int, doc_id long, score double"

    # leaf numbering (globally unique across the batch)
    leaf_ids: dict[int, int] = {}   # id(leaf-object-instance) unused; map below
    term_reqs: list = []            # SearchRequest per term/prefix leaf
    term_lids: list[int] = []
    phrase_by_slop: dict[int, list[tuple[int, str]]] = {}
    lid_qid: list[tuple[int, int]] = []   # (lid, qid)
    trees: list[tuple[int, object, int, dict]] = []
    next_lid = 0
    for qid, tree, k in composed:
        leaves: list = []
        _leaves(tree, leaves)
        lid_of: dict[int, int] = {}   # index into leaves -> lid
        for pos, leaf in enumerate(leaves):
            lid = next_lid
            next_lid += 1
            lid_of[pos] = lid
            lid_qid.append((lid, qid))
            if isinstance(leaf, PhraseLeaf):
                phrase_by_slop.setdefault(leaf.slop, []).append(
                    (lid, leaf.text)
                )
            else:
                term_reqs.append(SearchRequest(clauses=(leaf,), k=1))
                term_lids.append(lid)
        trees.append((qid, tree, k, lid_of))

    frames: list[DataFrame] = []
    if term_reqs:
        tf = bool_matches_batch(
            spark, index_dir, term_reqs, max_expansions=max_expansions
        )
        tmap = lit_map(enumerate(term_lids))
        frames.append(
            tf.select(
                F.element_at(tmap, F.col("request_id")).alias("lid"),
                "doc_id", "score",
            )
        )
    for slop, items in sorted(phrase_by_slop.items()):
        pf = match_phrase_batch(
            spark, index_dir, [(lid, text, 1) for lid, text in items],
            slop=slop, all_matches=True,
        )
        frames.append(
            pf.select(F.col("query_id").alias("lid"), "doc_id", "score")
        )
    if not frames:
        return spark.createDataFrame([], schema)
    union = frames[0]
    for fr in frames[1:]:
        union = union.unionByName(fr)

    qid_map = lit_map(lid_qid)
    grouped = (
        union.select(
            F.element_at(qid_map, F.col("lid")).alias("query_id"),
            "lid", "doc_id", "score",
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("lid", "score"))
            ).alias("m")
        )
    )

    m = F.col("m")

    def leaf_expr(lid: int):
        return F.element_at(m, F.lit(lid))

    def matched_expr(node, lid_by_pos, counter):
        """counter walks leaves in the same _leaves order."""
        if isinstance(node, (Clause, Prefix, PhraseLeaf)):
            lid = lid_by_pos[counter[0]]
            counter[0] += 1
            return leaf_expr(lid).isNotNull(), F.coalesce(
                leaf_expr(lid), F.lit(0.0)
            )
        # Bool: kernel semantics (booltree eval_node) mirrored exactly
        musts = [
            matched_expr(c, lid_by_pos, counter) for c in node.must
        ]
        shoulds = [
            matched_expr(c, lid_by_pos, counter) for c in node.should
        ]
        mnots = [
            matched_expr(c, lid_by_pos, counter)[0] for c in node.must_not
        ]
        if musts:
            base = reduce(lambda a, b: a & b, (mc for mc, _ in musts))
            score = reduce(
                lambda a, b: a + b, (ms for _, ms in musts)
            )
            if shoulds:
                bonus = reduce(
                    lambda a, b: a + b,
                    (
                        F.when(mc, ms).otherwise(F.lit(0.0))
                        for mc, ms in shoulds
                    ),
                )
                score = score + bonus
        elif shoulds:
            base = reduce(lambda a, b: a | b, (mc for mc, _ in shoulds))
            score = reduce(
                lambda a, b: a + b,
                (F.when(mc, ms).otherwise(F.lit(0.0)) for mc, ms in shoulds),
            )
        else:
            base, score = F.lit(False), F.lit(0.0)
        for nc in mnots:
            base = base & ~F.coalesce(nc, F.lit(False))
        return base, score

    matched_col = F.lit(False)
    score_col = F.lit(0.0)
    for qid, tree, _k, lid_of in trees:
        mc, sc = matched_expr(tree, lid_of, [0])
        cond = F.col("query_id") == qid
        matched_col = F.when(cond, mc).otherwise(matched_col)
        score_col = F.when(cond, sc).otherwise(score_col)

    k_map = lit_map((qid, k) for qid, _t, k, _l in trees)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        grouped.where(matched_col)
        .select("query_id", "doc_id", score_col.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.element_at(k_map, F.col("query_id")))
        .select("query_id", F.col("rank").cast("int"), "doc_id", "score")
    )
