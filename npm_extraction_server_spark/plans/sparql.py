"""SPARQL text front-end over the BGP algebra (plans/bgp.py).

The algebra layer speaks Python (``bgp_join(patterns=...)``); this
module speaks SPARQL — a tokenizer + recursive-descent parser for the
subset that maps 1:1 onto the algebra the engine already evaluates,
so every accepted query plans as the SAME Catalyst plan the
corresponding ``bgp_*`` call would produce (pushed constant scans,
shared-variable hash joins, TakeOrderedAndProject for ORDER+LIMIT):

- SELECT [DISTINCT] (?vars | * | aggregate projections) / ASK /
  CONSTRUCT (incl. quad templates via GRAPH) / DESCRIBE <iri>
- PREFIX declarations, ``a`` for rdf:type
- basic graph patterns with ``;`` / ``,`` abbreviations,
  GRAPH <g>/?g groups (quad patterns over an ``as_quads`` dataset)
- OPTIONAL / UNION / MINUS / FILTER EXISTS / FILTER NOT EXISTS
  (each group parsed to the matching algebra call)
- FILTER with comparisons, && || !, REGEX / STRSTARTS / CONTAINS /
  BOUND / STR; BIND(expr AS ?v); VALUES (inline bindings)
- GROUP BY + COUNT/SUM/MIN/MAX (+DISTINCT) aggregates, HAVING
- ORDER BY (ASC/DESC) / LIMIT / OFFSET

Deliberate contract choices, documented rather than hidden:

- Solution SET semantics always (the algebra's uniform contract):
  DISTINCT/REDUCED are accepted and redundant; bag semantics is
  unsupported, not approximated.
- Literals must be written exactly as the store encodes them
  (kernel/serialize: quotes kept in ``obj``, ``"x"^^<t>`` stored as
  ``"x"^^t``, ``"x"@en`` as written) — the parser normalizes the
  ``^^<iri>`` form, nothing else.
- One algebra form per query: a query mixing OPTIONAL with MINUS (or
  aggregates with OPTIONAL, etc.) raises SparqlUnsupported — the
  algebra composes those through subqueries/prepared frames, which
  have no text syntax here.
- Property paths in predicate position: sequence ``p1/p2``,
  alternative ``p1|p2``, inverse ``^p`` and negated sets ``!(p1|p2)``
  parse onto ``path_edges`` and join into the other patterns (the
  bgp_join subquery mechanism). Transitive closure (``p+``/``p*``) is
  SEEDED in this engine (per-pair closure over an unbounded relation
  is a different algorithm) — the text layer raises and points at
  ``plans.bgp.bgp_path``.

Everything rejected raises ``SparqlUnsupported`` with the offending
token — the honest-subset pattern kernel/parse.py uses for RDF docs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .bgp import (
    _finish,
    bgp_agg,
    bgp_ask,
    bgp_construct,
    bgp_describe,
    bgp_exists,
    bgp_join,
    bgp_minus,
    bgp_optional,
    bgp_union,
)

__all__ = ["sparql", "SparqlUnsupported"]

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlUnsupported(ValueError):
    """Query uses SPARQL outside the supported subset."""


_TOKEN = re.compile(r"""
    <[^<>\s]*>
  | "(?:[^"\\]|\\.)*"(?:\^\^<[^<>\s]*>|@[A-Za-z][A-Za-z0-9-]*)?
  | \?\w+
  | [A-Za-z_][\w-]*:[\w.%~-]*
  | [A-Za-z_][\w-]*
  | -?\d+(?:\.\d+)?
  | !=|<=|>=|&&|\|\|
  | [{}().;,*=<>!/^|+]
""", re.X)


def _tokenize(q: str) -> list[str]:
    toks, pos = [], 0
    for m in _TOKEN.finditer(q):
        if q[pos:m.start()].strip():
            raise SparqlUnsupported(
                f"cannot tokenize: {q[pos:m.start()].strip()!r}")
        toks.append(m.group(0))
        pos = m.end()
    if q[pos:].strip():
        raise SparqlUnsupported(f"cannot tokenize: {q[pos:].strip()!r}")
    return toks


class _P:
    def __init__(self, toks: list[str], prefixes: dict[str, str]):
        self.t, self.i, self.prefixes = toks, 0, prefixes

    def peek(self) -> str | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def kw(self, *words: str) -> bool:
        """Consume the next token if it equals one of ``words``
        case-insensitively."""
        p = self.peek()
        if p is not None and p.upper() in words:
            self.i += 1
            return True
        return False

    def expect(self, tok: str) -> None:
        p = self.peek()
        if p != tok:
            raise SparqlUnsupported(f"expected {tok!r}, got {p!r}")
        self.i += 1

    def next(self) -> str:
        p = self.peek()
        if p is None:
            raise SparqlUnsupported("unexpected end of query")
        self.i += 1
        return p

    # --- terms ---
    def term(self) -> str:
        tok = self.next()
        if tok == "a":
            return RDF_TYPE
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok.startswith("?") or tok.startswith('"'):
            if '^^<' in tok:  # normalize "x"^^<t> to the stored form
                lit, dt = tok.rsplit("^^<", 1)
                return lit + "^^" + dt[:-1]
            return tok
        m = re.fullmatch(r"([A-Za-z_][\w-]*):([\w.%~-]*)", tok)
        if m:
            pre, local = m.groups()
            if pre not in self.prefixes:
                raise SparqlUnsupported(f"undeclared prefix {pre}:")
            return self.prefixes[pre] + local
        raise SparqlUnsupported(f"cannot parse term {tok!r}")


def _group(p: _P) -> dict:
    """Parse one { ... } group into its algebra components."""
    p.expect("{")
    g = {"patterns": [], "paths": [], "optionals": [], "unions": [],
         "minuses": [], "exists": [], "not_exists": [], "filters": [],
         "binds": {}, "values": None}
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlUnsupported("unterminated group")
        if tok == "}":
            p.i += 1
            return g
        up = tok.upper()
        if up == "OPTIONAL":
            p.i += 1
            inner = _group(p)
            g["optionals"].append(_patterns_only(inner, "OPTIONAL"))
        elif up == "MINUS":
            p.i += 1
            inner = _group(p)
            g["minuses"].append(_patterns_only(inner, "MINUS"))
        elif up == "FILTER":
            p.i += 1
            nxt = p.peek()
            if nxt is not None and nxt.upper() == "EXISTS":
                p.i += 1
                g["exists"].append(_patterns_only(_group(p), "EXISTS"))
            elif nxt is not None and nxt.upper() == "NOT":
                p.i += 1
                if not p.kw("EXISTS"):
                    raise SparqlUnsupported("FILTER NOT without EXISTS")
                g["not_exists"].append(
                    _patterns_only(_group(p), "NOT EXISTS"))
            else:
                g["filters"].append(_expr(p))
        elif up == "BIND":
            p.i += 1
            p.expect("(")
            expr = _expr(p, stop_kw="AS")
            if not p.kw("AS"):
                raise SparqlUnsupported("BIND without AS")
            var = p.next()
            if not var.startswith("?"):
                raise SparqlUnsupported(f"BIND target {var!r} not a var")
            p.expect(")")
            g["binds"][var[1:]] = expr
        elif up == "VALUES":
            p.i += 1
            g["values"] = _values(p)
        elif up == "GRAPH":
            p.i += 1
            gterm = p.term()
            inner = _group(p)
            quads = _patterns_only(inner, "GRAPH")
            g["patterns"].extend(
                (s, pr, o, gterm) for (s, pr, o) in quads)
        elif tok == "{":
            branches = [_patterns_only(_group(p), "UNION")]
            while p.kw("UNION"):
                branches.append(_patterns_only(_group(p), "UNION"))
            if len(branches) < 2:
                raise SparqlUnsupported("bare nested group (not UNION)")
            g["unions"].append(branches)
        else:
            _triples_block(p, g)
    return g


def _patterns_only(g: dict, ctx: str) -> list[tuple]:
    extras = [k for k in ("paths", "optionals", "unions", "minuses",
                          "exists", "not_exists", "filters", "binds")
              if g[k]] + (["values"] if g["values"] else [])
    if extras:
        raise SparqlUnsupported(
            f"{ctx} group supports only triple patterns here "
            f"(found {extras})")
    return g["patterns"]


def _triples_block(p: _P, g: dict) -> None:
    subj = p.term()
    while True:
        pred = _path_alt(p)
        while True:
            obj = p.term()
            (g["patterns"] if isinstance(pred, str)
             else g["paths"]).append((subj, pred, obj))
            if p.peek() == ",":
                p.i += 1
                continue
            break
        if p.peek() == ";":
            p.i += 1
            if p.peek() in ("}", ".", None):  # dangling ';'
                break
            continue
        break
    if p.peek() == ".":
        p.i += 1


# --- property-path expressions (predicate position) ---

def _closure_check(p: _P, e):
    if p.peek() in ("+", "*"):
        raise SparqlUnsupported(
            "transitive closure (p+/p*) is seeded in this engine — "
            "use plans.bgp.bgp_path over path_edges")
    return e


def _path_primary(p: _P):
    tok = p.peek()
    if tok == "(":
        p.i += 1
        e = _path_alt(p)
        p.expect(")")
        return e
    if tok == "^":
        p.i += 1
        return ("inv", _path_primary(p))
    if tok == "!":
        p.i += 1
        p.expect("(")
        iris = [p.term()]
        while p.peek() == "|":
            p.i += 1
            iris.append(p.term())
        p.expect(")")
        bad = [i for i in iris if i.startswith("?") or i.startswith('"')]
        if bad:
            raise SparqlUnsupported(f"negated set needs IRIs, got {bad}")
        return ("neg", *iris)
    t = p.term()
    if t.startswith("?") or t.startswith('"'):
        raise SparqlUnsupported(
            f"predicate position needs an IRI or path, got {t!r}")
    return t


def _path_seq(p: _P):
    parts = [_closure_check(p, _path_primary(p))]
    while p.peek() == "/":
        p.i += 1
        parts.append(_closure_check(p, _path_primary(p)))
    return parts[0] if len(parts) == 1 else ("seq", *parts)


def _path_alt(p: _P):
    parts = [_path_seq(p)]
    while p.peek() == "|":
        p.i += 1
        parts.append(_path_seq(p))
    return parts[0] if len(parts) == 1 else ("alt", *parts)


def _path_frame(triples: DataFrame, s: str, expr, o: str) -> DataFrame:
    """Evaluate one path pattern (s, pathexpr, o) to a solution frame
    over its variable terms (the bgp_join subquery shape)."""
    from pyspark.sql import functions as F

    from .bgp import path_edges

    e = path_edges(triples, expr)
    s_var, o_var = s.startswith("?"), o.startswith("?")
    if not s_var and not o_var:
        raise SparqlUnsupported(
            "path pattern with two constants — use ASK semantics via "
            "a variable + FILTER")
    if not s_var:
        e = e.filter(F.col("src") == s)
    if not o_var:
        e = e.filter(F.col("dst") == o)
    if s_var and o_var and s == o:
        return e.filter(F.col("src") == F.col("dst"))             .select(F.col("src").alias(s[1:])).distinct()
    cols = []
    if s_var:
        cols.append(F.col("src").alias(s[1:]))
    if o_var:
        cols.append(F.col("dst").alias(o[1:]))
    return e.select(*cols).distinct()


def _values(p: _P) -> tuple[list[str], list[tuple]]:
    multi = p.peek() == "("
    if multi:
        p.i += 1
        vars_ = []
        while p.peek() != ")":
            v = p.next()
            if not v.startswith("?"):
                raise SparqlUnsupported(f"VALUES var expected, got {v!r}")
            vars_.append(v[1:])
        p.i += 1
    else:
        v = p.next()
        if not v.startswith("?"):
            raise SparqlUnsupported(f"VALUES var expected, got {v!r}")
        vars_ = [v[1:]]
    p.expect("{")
    rows = []
    while p.peek() != "}":
        if multi:
            p.expect("(")
            row = []
            while p.peek() != ")":
                row.append(p.term())
            p.i += 1
            rows.append(tuple(row))
        else:
            rows.append((p.term(),))
    p.i += 1
    return vars_, rows


# --- FILTER / BIND / HAVING expression translation to Spark SQL ---

_CMP = {"=": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}
_FNS = {"REGEX": 2, "STRSTARTS": 2, "CONTAINS": 2, "BOUND": 1,
        "STR": 1, "CONCAT": -1}


def _lit_content(sql: str) -> str:
    """'"x"' (a stored-form literal SQL constant) -> 'x'."""
    m = re.fullmatch(r"'\"(.*)\"'", sql, re.S)
    return "'" + m.group(1) + "'" if m else sql


def _sql_atom(p: _P) -> str:
    tok = p.peek()
    if tok is None:
        raise SparqlUnsupported("unexpected end of expression")
    if tok == "(":
        p.i += 1
        inner = _expr(p)
        p.expect(")")
        return f"({inner})"
    if tok == "!":
        p.i += 1
        return f"(NOT {_sql_atom(p)})"
    if tok.upper() in _FNS:
        fn = tok.upper()
        p.i += 1
        p.expect("(")
        args = [_expr(p)]
        while p.peek() == ",":
            p.i += 1
            args.append(_expr(p))
        p.expect(")")
        n = _FNS[fn]
        if n != -1 and len(args) != n:
            raise SparqlUnsupported(f"{fn} takes {n} args")
        if fn in ("REGEX", "STRSTARTS", "CONTAINS"):
            # the pattern/needle literal denotes its CONTENT (its
            # quotes are syntax); every other literal position keeps
            # the stored-form token (module contract)
            args[1] = _lit_content(args[1])
        elif fn == "CONCAT":
            args = [_lit_content(a) for a in args]
        if fn == "REGEX":
            return f"({args[0]} RLIKE {args[1]})"
        if fn == "STRSTARTS":
            return f"startswith({args[0]}, {args[1]})"
        if fn == "CONTAINS":
            return f"contains({args[0]}, {args[1]})"
        if fn == "BOUND":
            return f"({args[0]} IS NOT NULL)"
        if fn == "STR":
            return args[0]
        return f"concat({', '.join(args)})"
    if tok.startswith("?"):
        p.i += 1
        return f"`{tok[1:]}`"
    if tok.startswith('"') or tok.startswith("<"):
        term = p.term()
        return "'" + term.replace("'", "''") + "'"
    if re.fullmatch(r"-?\d+(\.\d+)?", tok):
        p.i += 1
        return tok
    raise SparqlUnsupported(f"cannot parse expression at {tok!r}")


def _expr(p: _P, stop_kw: str | None = None) -> str:
    """or-expr := and-expr (|| and-expr)*; and := cmp (&& cmp)*;
    cmp := atom (op atom)?"""
    def cmp_expr() -> str:
        left = _sql_atom(p)
        if p.peek() in _CMP:
            op = _CMP[p.next()]
            return f"({left} {op} {_sql_atom(p)})"
        return left

    def and_expr() -> str:
        out = cmp_expr()
        while p.peek() == "&&":
            p.i += 1
            out = f"({out} AND {cmp_expr()})"
        return out

    out = and_expr()
    while p.peek() == "||":
        if stop_kw and p.peek().upper() == stop_kw:
            break
        p.i += 1
        out = f"({out} OR {and_expr()})"
    return out


# --- query forms ---

_AGG_KW = {"COUNT": "count", "SUM": "sum", "MIN": "min", "MAX": "max"}


def _projection(p: _P) -> tuple[list[str] | None, list[tuple]]:
    """Parse the SELECT clause: returns (select_vars, aggs)."""
    sel: list[str] = []
    aggs: list[tuple] = []
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlUnsupported("SELECT without WHERE")
        if tok == "*":
            p.i += 1
            return None, aggs
        if tok.upper() in ("WHERE", "{"):
            break
        if tok.startswith("?"):
            p.i += 1
            sel.append(tok[1:])
        elif tok == "(":
            p.i += 1
            fn_tok = p.next().upper()
            if fn_tok not in _AGG_KW:
                raise SparqlUnsupported(f"unsupported aggregate {fn_tok}")
            fn = _AGG_KW[fn_tok]
            p.expect("(")
            if p.kw("DISTINCT"):
                if fn != "count":
                    raise SparqlUnsupported(
                        f"DISTINCT only with COUNT (got {fn_tok})")
                fn = "count_distinct"
            v = p.next()
            if not v.startswith("?"):
                raise SparqlUnsupported(
                    f"aggregate over {v!r} (only variables)")
            p.expect(")")
            if not p.kw("AS"):
                raise SparqlUnsupported("aggregate without AS ?alias")
            alias = p.next()
            if not alias.startswith("?"):
                raise SparqlUnsupported(f"alias {alias!r} not a var")
            p.expect(")")
            aggs.append((v[1:], fn, alias[1:]))
        else:
            raise SparqlUnsupported(f"cannot parse projection at {tok!r}")
    return (sel or None), aggs


def _solution_modifiers(p: _P) -> dict:
    mods = {"group_by": None, "having": [], "order_by": None,
            "limit": None, "offset": 0}
    while p.peek() is not None:
        if p.kw("GROUP"):
            if not p.kw("BY"):
                raise SparqlUnsupported("GROUP without BY")
            gb = []
            while p.peek() is not None and p.peek().startswith("?"):
                gb.append(p.next()[1:])
            mods["group_by"] = gb
        elif p.kw("HAVING"):
            p.expect("(")
            mods["having"].append(_expr(p))
            p.expect(")")
        elif p.kw("ORDER"):
            if not p.kw("BY"):
                raise SparqlUnsupported("ORDER without BY")
            ob = []
            while True:
                tok = p.peek()
                if tok is None:
                    break
                if tok.upper() in ("ASC", "DESC"):
                    desc = tok.upper() == "DESC"
                    p.i += 1
                    p.expect("(")
                    v = p.next()
                    if not v.startswith("?"):
                        raise SparqlUnsupported(
                            f"ORDER BY over {v!r} (only variables)")
                    p.expect(")")
                    ob.append(("-" if desc else "") + v[1:])
                elif tok.startswith("?"):
                    p.i += 1
                    ob.append(tok[1:])
                else:
                    break
            mods["order_by"] = ob or None
        elif p.kw("LIMIT"):
            mods["limit"] = int(p.next())
        elif p.kw("OFFSET"):
            mods["offset"] = int(p.next())
        else:
            raise SparqlUnsupported(f"trailing tokens at {p.peek()!r}")
    return mods


def sparql(triples: DataFrame, query: str) -> DataFrame:
    """Parse ``query`` and evaluate it over ``triples`` via the BGP
    algebra. Returns the solution DataFrame (SELECT), the (subj, pred,
    obj[, graph]) graph (CONSTRUCT/DESCRIBE), or the one-row boolean
    frame (ASK)."""
    p = _P(_tokenize(query), {})
    while p.kw("PREFIX"):
        decl = p.next()
        m = re.fullmatch(r"([A-Za-z_][\w-]*):", decl)
        if not m:
            raise SparqlUnsupported(f"bad PREFIX declaration {decl!r}")
        iri = p.next()
        if not (iri.startswith("<") and iri.endswith(">")):
            raise SparqlUnsupported(f"PREFIX needs an <iri>, got {iri!r}")
        p.prefixes[m.group(1)] = iri[1:-1]

    if p.kw("SELECT"):
        p.kw("DISTINCT", "REDUCED")  # set semantics either way
        select, aggs = _projection(p)
        p.kw("WHERE")
        g = _group(p)
        mods = _solution_modifiers(p)
        return _route_select(triples, select, aggs, g, mods)
    if p.kw("ASK"):
        p.kw("WHERE")
        g = _group(p)
        if p.peek() is not None:
            raise SparqlUnsupported(f"trailing tokens at {p.peek()!r}")
        return bgp_ask(triples, _filters_patterns_only(g, "ASK"),
                       filters=g["filters"] or None)
    if p.kw("CONSTRUCT"):
        tmpl_g = _group(p)
        template = _patterns_only(tmpl_g, "CONSTRUCT template")
        if not p.kw("WHERE"):
            raise SparqlUnsupported("CONSTRUCT without WHERE")
        g = _group(p)
        if p.peek() is not None:
            raise SparqlUnsupported(f"trailing tokens at {p.peek()!r}")
        return bgp_construct(triples,
                             _filters_patterns_only(g, "CONSTRUCT"),
                             template, filters=g["filters"] or None)
    if p.kw("DESCRIBE"):
        iri = p.term()
        if iri.startswith("?") or iri.startswith('"'):
            raise SparqlUnsupported("DESCRIBE supports one constant IRI")
        if p.peek() is not None:
            raise SparqlUnsupported(f"trailing tokens at {p.peek()!r}")
        return bgp_describe(triples, iri,
                            with_graph="graph" in triples.columns)
    raise SparqlUnsupported(f"unsupported query form at {p.peek()!r}")


def _filters_patterns_only(g: dict, ctx: str) -> list[tuple]:
    extras = [k for k in ("paths", "optionals", "unions", "minuses",
                          "exists", "not_exists", "binds") if g[k]]
    if extras or g["values"]:
        raise SparqlUnsupported(f"{ctx} supports patterns+FILTER only")
    return g["patterns"]


def _route_select(triples, select, aggs, g, mods) -> DataFrame:
    common = dict(order_by=mods["order_by"], limit=mods["limit"],
                  offset=mods["offset"])
    if g["paths"]:
        other = [k for k in ("optionals", "unions", "minuses", "exists",
                             "not_exists") if g[k]]
        if other or aggs or mods["group_by"]:
            raise SparqlUnsupported(
                f"property paths combine only with plain patterns and "
                f"FILTER (found {other or 'aggregates'})")
        frames = [_path_frame(triples, s, e, o) for s, e, o in g["paths"]]
        if g["patterns"]:
            return bgp_join(triples, g["patterns"],
                            select=select, filters=g["filters"] or None,
                            values=g["values"], bind=g["binds"] or None,
                            subqueries=frames, **common)
        if g["values"] or g["binds"]:
            raise SparqlUnsupported(
                "VALUES/BIND with a path-only group (unsupported)")
        out = frames[0]
        for f in frames[1:]:
            shared = [c for c in f.columns if c in out.columns]
            if not shared:
                raise SparqlUnsupported(
                    "path patterns share no variable (cartesian)")
            out = out.join(f, shared)
        return _finish(out, select, g["filters"] or None, **common)
    if aggs or mods["group_by"]:
        pats = _filters_patterns_only(g, "aggregate query")
        if not aggs:
            raise SparqlUnsupported("GROUP BY without aggregates")
        return bgp_agg(triples, pats, mods["group_by"] or [], aggs,
                       filters=g["filters"] or None,
                       having=mods["having"] or None, **common)
    if mods["having"]:
        raise SparqlUnsupported("HAVING without aggregates")
    forms = [k for k in ("optionals", "unions", "minuses", "exists",
                         "not_exists") if g[k]]
    if len(forms) > 1:
        raise SparqlUnsupported(
            f"one algebra form per query (found {forms}); compose via "
            "the Python API's prepared frames/subqueries")
    flt = g["filters"] or None
    if g["unions"]:
        if g["patterns"] or len(g["unions"]) != 1:
            raise SparqlUnsupported(
                "UNION mixes with other patterns (unsupported)")
        return bgp_union(triples, g["unions"][0], select=select,
                         filters=flt, **common)
    if g["optionals"]:
        return bgp_optional(triples, g["patterns"], g["optionals"],
                            select=select, filters=flt, **common)
    if g["minuses"]:
        return bgp_minus(triples, g["patterns"], g["minuses"],
                         select=select, filters=flt, **common)
    if g["exists"] or g["not_exists"]:
        if g["exists"] and g["not_exists"]:
            raise SparqlUnsupported("EXISTS mixed with NOT EXISTS")
        if g["exists"]:
            return bgp_exists(triples, g["patterns"], g["exists"],
                              select=select, filters=flt, **common)
        return bgp_minus(triples, g["patterns"], g["not_exists"],
                         select=select, filters=flt, **common)
    return bgp_join(triples, g["patterns"], select=select, filters=flt,
                    values=g["values"], bind=g["binds"] or None,
                    **common)
