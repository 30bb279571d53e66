"""Pinned arithmetic script DSL for ES ``script_score``.

ES scores with Painless scripts (``"script": {"source": "_score * ..."}``)
— another `_search` body on the backend surface the reference delegates
wholesale (reference ElasticsearchHandler.py:69).  Painless itself is a
JVM language; the engine pins the arithmetic subset every scoring
script in the ES docs actually uses:

    expr  := term  (('+'|'-') term)*
    term  := unary (('*'|'/') unary)*
    unary := '-' unary | atom
    atom  := NUMBER | VAR | FUNC '(' expr {',' expr} ')' | '(' expr ')'

Variables: ``_score`` (the BM25 relevance score) and ``value`` (the
doc-value field the query names).  Functions (numpy-backed, float64):
``log`` (natural), ``log1p``, ``sqrt``, ``abs``, ``exp``, ``min``,
``max``, ``pow``.  Unknown names, malformed syntax, and empty scripts
fail loudly at parse time — on the driver, before any Spark job runs.

Scripts compile to closures over numpy arrays (vectorized, float64
IEEE arithmetic in source order), NOT to Python ``eval`` — there is no
dynamic code execution, so a script can never reach beyond its two
variables.  The same association order is what the DuckDB oracle
reproduces (driver-contract float convention).
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[()+\-*/,]))"
)

_FUNCS = {
    "log": np.log,
    "log1p": np.log1p,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}
_FUNC_ARITY = {"min": 2, "max": 2, "pow": 2}
VARIABLES = ("_score", "value")


def _tokenize(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise ValueError(
                    f"script syntax error at {src[pos:pos + 10]!r}"
                )
            break
        out.append(m.group(m.lastgroup))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[str], variables=VARIABLES):
        self.toks = tokens
        self.i = 0
        self.variables = tuple(variables)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, expect: str | None = None):
        t = self.peek()
        if t is None or (expect is not None and t != expect):
            raise ValueError(
                f"script syntax error: expected {expect or 'token'}, "
                f"got {t!r}"
            )
        self.i += 1
        return t

    def expr(self):
        node = self.term()
        while self.peek() in ("+", "-"):
            op = self.take()
            rhs = self.term()
            node = ("+", node, rhs) if op == "+" else ("-", node, rhs)
        return node

    def term(self):
        node = self.unary()
        while self.peek() in ("*", "/"):
            op = self.take()
            rhs = self.unary()
            node = (op, node, rhs)
        return node

    def unary(self):
        if self.peek() == "-":
            self.take()
            return ("neg", self.unary())
        return self.atom()

    def atom(self):
        t = self.take()
        if t == "(":
            node = self.expr()
            self.take(")")
            return node
        if re.fullmatch(r"\d+\.?\d*(?:[eE][+-]?\d+)?", t):
            return ("num", float(t))
        if t in _FUNCS:
            self.take("(")
            args = [self.expr()]
            while self.peek() == ",":
                self.take(",")
                args.append(self.expr())
            self.take(")")
            want = _FUNC_ARITY.get(t, 1)
            if len(args) != want:
                raise ValueError(f"{t}() takes {want} argument(s)")
            return ("call", t, args)
        if t in self.variables:
            return ("var", t)
        raise ValueError(
            f"unknown script name {t!r}; variables are "
            f"{sorted(self.variables)}, functions are {sorted(_FUNCS)}"
        )


def parse_script(src: str, variables=VARIABLES):
    """-> AST; fail-loud on syntax errors / unknown names / trailing
    tokens. ``variables`` is the allowed bare-name set (default: the
    script_score pair ``_score`` / ``value``)."""
    if not src or not src.strip():
        raise ValueError("script must be non-empty")
    p = _Parser(_tokenize(src), variables)
    node = p.expr()
    if p.peek() is not None:
        raise ValueError(
            f"script syntax error: unexpected {p.peek()!r}"
        )
    return node


def compile_script(src: str):
    """-> vectorized ``fn(env: dict[str, np.ndarray]) -> np.ndarray``
    evaluating the script in float64 source-order association."""
    ast = parse_script(src)

    def ev(node, env):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "var":
            return env[node[1]]
        if kind == "neg":
            return -ev(node[1], env)
        if kind == "call":
            fn = _FUNCS[node[1]]
            return fn(*[ev(a, env) for a in node[2]])
        a, b = ev(node[1], env), ev(node[2], env)
        if kind == "+":
            return a + b
        if kind == "-":
            return a - b
        if kind == "*":
            return a * b
        return np.divide(a, b)

    def fn(env):
        return np.asarray(ev(ast, env), dtype=np.float64)

    return fn


def compile_script_column(src: str, cols: dict):
    """Compile the script to a Catalyst ``Column`` over named columns —
    the ES *runtime field* backend (``runtime_mappings``: script-derived
    fields usable in filters, sorts and aggs without reindexing).

    ``cols`` maps each allowed bare name to a ``pyspark.sql.Column``.
    The expression stays entirely JVM-side (whole-stage codegen, no
    Python in the row path); float64 source-order association matches
    ``compile_script``'s numpy backend. Arithmetic, ``sqrt``, ``abs``,
    ``min``/``max`` are bit-identical across backends (correctly
    rounded IEEE ops); ``log``/``log1p``/``exp``/``pow`` are libm
    transcendentals and may differ in the last ulp between the JVM and
    numpy/DuckDB — quantize outputs accordingly (driver-contract float
    convention).
    """
    from pyspark.sql import functions as F

    ast = parse_script(src, variables=tuple(cols))
    fmap = {
        "log": F.log,
        "log1p": F.log1p,
        "sqrt": F.sqrt,
        "abs": F.abs,
        "exp": F.exp,
        "min": F.least,
        "max": F.greatest,
        "pow": F.pow,
    }

    def ev(node):
        kind = node[0]
        if kind == "num":
            return F.lit(node[1])
        if kind == "var":
            return cols[node[1]].cast("double")
        if kind == "neg":
            return -ev(node[1])
        if kind == "call":
            return fmap[node[1]](*[ev(a) for a in node[2]])
        a, b = ev(node[1]), ev(node[2])
        return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[kind]

    return ev(ast)


def runtime_field(df, name: str, script: str, fields=None):
    """Attach an ES runtime field: ``df`` plus column ``name`` computed
    by ``script`` over ``fields`` (default: every existing column whose
    name is a legal script identifier). Filters/sorts/aggs on the new
    column plan exactly like a stored field — Catalyst folds the
    expression into the scan stage."""
    allowed = fields if fields is not None else [
        c for c in df.columns
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c)
    ]
    from pyspark.sql import functions as F

    cols = {c: F.col(c) for c in allowed}
    return df.withColumn(name, compile_script_column(script, cols))
