"""RDF parsers: N-Triples, N-Quads, Turtle, TriG — the READ direction
of kernel/serialize.py, closing the round trip the reference's N3.js
covers in both directions (lib/util/JsonLdParser.js consumes what
bin/exportTriples.js emits).

Contract: ``parse(serialize(triples, fmt), fmt) == triples`` as a
multiset for every serializer in this engine (pinned by tests and the
kg_trig_roundtrip hard oracle), plus standards-subset parsing of
external documents: IRIs, prefixed names, language-tagged and typed
literals, ``a`` for rdf:type, ``;``/``,`` predicate/object lists,
``@prefix``/``PREFIX`` declarations, named-graph blocks, comments,
and blank-node labels (kept verbatim as ``_:label`` — this engine
skolemizes before serializing, so labels appear only in foreign
input). Not covered (raises): collections ``( .. )``, anonymous nodes
``[ .. ]``, multiline ``\"\"\"`` literals, ``@base``/relative IRIs —
the constructs neither our writers nor the reference's npm output
produce.

Literals come back in the kernel's internal N3-encoded object form
(``"value"``, ``"value"@lang``, ``"value"^^<dt-IRI-without-brackets>``)
with escape sequences decoded — exactly what jsonld_rdf emits, so a
parsed Triple is indistinguishable from a pipeline-born one.

Scale shape: parsing is pure per-document Python (the same profile as
the JSON-LD converter) — the engine runs it inside mapInPandas over a
(doc_id, rdf_text) column, one document per row, embarrassingly
parallel; there is no cross-document state.
"""

from __future__ import annotations

import re

from .jsonld_rdf import Triple

__all__ = ["parse_nquads", "parse_ntriples", "parse_trig",
           "parse_turtle", "parse_rdf", "PARSERS"]

_UNESCAPES = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t",
              "b": "\b", "f": "\f", "'": "'"}


def _unescape(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError(f"dangling escape at end of literal: {s!r}")
        nxt = s[i + 1]
        if nxt in _UNESCAPES:
            out.append(_UNESCAPES[nxt])
            i += 2
        elif nxt == "u":
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        elif nxt == "U":
            out.append(chr(int(s[i + 2:i + 10], 16)))
            i += 10
        else:
            raise ValueError(f"unknown escape \\{nxt} in literal: {s!r}")
    return "".join(out)


# one token per match; order matters (longest/most specific first)
_TOKEN = re.compile(r"""
      (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtsep>\^\^)
    | (?P<bnode>_:[^\s;,.{}]+)
    | (?P<punct>[;,.{}])
    | (?P<pname>[A-Za-z_][\w.-]*?:[^\s;,]*?(?=[;,\s]|\.\s|\.$|$))
    | (?P<kw>@prefix|PREFIX(?=\s)|a(?![\w:]))
    | (?P<ws>\s+|\#[^\n]*)
""", re.VERBOSE)


def _tokenize(text: str):
    pos, n = 0, len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"RDF parse error at offset {pos}: "
                             f"{text[pos:pos + 40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        # '@prefix' also matches the lang-tag pattern; reclassify
        if kind == "lang" and val == "@prefix":
            kind = "kw"
        elif kind == "kw" and val == "PREFIX":
            val = "@prefix"
        yield kind, val


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class _Parser:
    def __init__(self, text: str, quads: bool):
        self.toks = list(_tokenize(text))
        self.i = 0
        self.quads = quads
        self.prefixes: dict[str, str] = {}
        self.out: list[Triple] = []

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise ValueError("unexpected end of RDF document")
        self.i += 1
        return t

    def resolve(self, kind: str, val: str) -> tuple[str, bool, str]:
        """-> (internal term, is_literal, category)."""
        if kind == "iri":
            return val[1:-1], False, "iri"
        if kind == "bnode":
            return val, False, "bnode"
        if kind == "kw" and val == "a":
            return _RDF_TYPE, False, "iri"
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"undeclared prefix '{pfx}:' in {val!r}")
            return self.prefixes[pfx] + local, False, "iri"
        if kind == "literal":
            value = _unescape(val[1:-1])
            k2, v2 = self.peek()
            if k2 == "lang":
                self.i += 1
                return f'"{value}"{v2}', True, "literal"
            if k2 == "dtsep":
                self.i += 1
                k3, v3 = self.next()
                dt, _, cat = self.resolve(k3, v3)
                if cat != "iri":
                    raise ValueError(f"datatype must be an IRI, got {v3!r}")
                return f'"{value}"^^{dt}', True, "literal"
            return f'"{value}"', True, "literal"
        raise ValueError(f"unexpected token {val!r}")

    def parse_prefix(self):
        k, v = self.next()
        if not (k == "pname" and v.endswith(":")):
            raise ValueError(f"@prefix expects 'name:', got {v!r}")
        name = v[:-1]
        k2, v2 = self.next()
        if k2 != "iri":
            raise ValueError(f"@prefix expects an IRI, got {v2!r}")
        self.prefixes[name] = v2[1:-1]
        if self.peek() == ("punct", "."):  # SPARQL-style PREFIX has no dot
            self.i += 1

    def parse_po_list(self, subj: str, graph: str | None):
        while True:
            k, v = self.next()
            pred, is_lit, _ = self.resolve(k, v)
            if is_lit:
                raise ValueError(f"literal in predicate position: {v!r}")
            while True:
                k2, v2 = self.next()
                obj, obj_lit, _ = self.resolve(k2, v2)
                self.out.append(Triple(subj, pred, obj, obj_lit, graph))
                if self.peek() == ("punct", ","):
                    self.i += 1
                    continue
                break
            nk, nv = self.peek()
            if (nk, nv) == ("punct", ";"):
                self.i += 1
                # trailing ';' before '.' or '}' is legal Turtle
                if self.peek()[1] in (".", "}"):
                    break
                continue
            break

    def parse_statement(self, graph: str | None, in_block: bool):
        k, v = self.peek()
        if (k, v) == ("kw", "@prefix"):
            self.i += 1
            self.parse_prefix()
            return
        k, v = self.next()
        subj, is_lit, _ = self.resolve(k, v)
        if is_lit:
            raise ValueError(f"literal in subject position: {v!r}")
        if not in_block and self.peek() == ("punct", "{"):
            if not self.quads:
                raise ValueError("named-graph block in a triples-only "
                                 "format (use trig/nq)")
            self.i += 1
            while self.peek() != ("punct", "}"):
                self.parse_statement(subj, in_block=True)
            self.i += 1  # consume '}'
            return
        self.parse_po_list(subj, graph)
        # line/statement terminator
        nk, nv = self.peek()
        if (nk, nv) == ("punct", "."):
            self.i += 1
        elif self.quads and nk == "iri" and graph is None:
            # N-Quads 4th term: <s> <p> <o> <g> .
            self.i += 1
            g = nv[1:-1]
            if (self.out and self.out[-1].graph is None
                    and self.peek() == ("punct", ".")):
                self.i += 1
                self.out[-1] = self.out[-1]._replace(graph=g)
            else:
                raise ValueError("malformed N-Quads graph term")
        elif (nk, nv) == ("punct", "}") and in_block:
            pass  # block close terminates the last statement
        else:
            raise ValueError(f"expected '.', got {nv!r}")

    def run(self) -> list[Triple]:
        while self.peek()[0] is not None:
            self.parse_statement(None, in_block=False)
        return self.out


def parse_ntriples(text: str) -> list[Triple]:
    return _Parser(text, quads=False).run()


def parse_nquads(text: str) -> list[Triple]:
    return _Parser(text, quads=True).run()


def parse_turtle(text: str) -> list[Triple]:
    return _Parser(text, quads=False).run()


def parse_trig(text: str) -> list[Triple]:
    return _Parser(text, quads=True).run()


PARSERS = {
    "nt": parse_ntriples,
    "nq": parse_nquads,
    "ttl": parse_turtle,
    "n3": parse_turtle,
    "trig": parse_trig,
}


def parse_rdf(text: str, fmt: str = "nt") -> list[Triple]:
    if fmt not in PARSERS:
        raise ValueError(f"Invalid format {fmt}")
    return PARSERS[fmt](text)
