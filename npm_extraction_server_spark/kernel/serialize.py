"""RDF serializers: N-Triples, N-Quads, Turtle, TriG (SN3 formats).

The reference serves nt/nq/n3/ttl/trig via N3.js
(/root/reference/bin/index.js:31-37, bin/exportTriples.js:14-21,
lib/util/JsonLdParser.js:43). These writers cover the same formats
(n3 == ttl for our triple shapes, as in N3.js default mode):
deterministic output, prefix-compressed Turtle, graph-grouped TriG.
"""

from __future__ import annotations

from .jsonld_rdf import Triple, _nt_term
from .vocab import PREFIXES

# stable prefix order for Turtle headers
_PREFIX_ORDER = ["rdf", "rdfs", "xsd", "owl", "doap", "dcterms", "foaf",
                 "spdx", "npm", "lsd"]


def to_ntriples(triples: list[Triple]) -> str:
    lines = [
        f"<{t.subj}> <{t.pred}> {_nt_term(t.obj, t.obj_is_literal)} ."
        for t in triples
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def to_nquads(triples: list[Triple]) -> str:
    lines = []
    for t in triples:
        obj = _nt_term(t.obj, t.obj_is_literal)
        if t.graph:
            lines.append(f"<{t.subj}> <{t.pred}> {obj} <{t.graph}> .")
        else:
            lines.append(f"<{t.subj}> <{t.pred}> {obj} .")
    return "\n".join(lines) + ("\n" if lines else "")


def _compact(iri: str, used: set[str]) -> str:
    for prefix in _PREFIX_ORDER:
        ns = PREFIXES[prefix]
        if iri.startswith(ns):
            local = iri[len(ns):]
            # PN_LOCAL subset: keep it conservative
            if local and all(c.isalnum() or c in "_-." for c in local) \
                    and not local.startswith(("-", ".")) and not local.endswith("."):
                used.add(prefix)
                return f"{prefix}:{local}"
    return f"<{iri}>"


def _ttl_object(t: Triple, used: set[str]) -> str:
    if not t.obj_is_literal:
        return _compact(t.obj, used)
    term = _nt_term(t.obj, t.obj_is_literal)
    # compact datatype IRIs too: "v"^^<...#int> -> "v"^^xsd:int
    if "^^<" in term:
        lit, dt = term.rsplit("^^<", 1)
        return lit + "^^" + _compact(dt[:-1], used)
    return term


def _turtle_body(triples: list[Triple], used: set[str]) -> str:
    """Subject-grouped, predicate-grouped Turtle body (no header);
    prefixes consumed while compacting are recorded in ``used``."""
    by_subj: dict[str, dict[str, list[str]]] = {}
    subj_order: list[str] = []
    for t in triples:
        if t.subj not in by_subj:
            by_subj[t.subj] = {}
            subj_order.append(t.subj)
        preds = by_subj[t.subj]
        key = _compact(t.pred, used)
        preds.setdefault(key, []).append(_ttl_object(t, used))

    blocks = []
    for subj in subj_order:
        s = _compact(subj, used)
        pred_strs = []
        for pred, objs in by_subj[subj].items():
            pred_strs.append(f"{pred} " + ", ".join(objs))
        blocks.append(f"{s} " + ";\n    ".join(pred_strs) + " .")
    return "\n".join(blocks)


def _prefix_header(used: set[str]) -> str:
    return "".join(
        f"@prefix {p}: <{PREFIXES[p]}> .\n" for p in _PREFIX_ORDER if p in used
    )


def to_turtle(triples: list[Triple]) -> str:
    """Subject-grouped, predicate-grouped Turtle with prefix header."""
    used: set[str] = set()
    body = _turtle_body(triples, used)
    header = _prefix_header(used)
    return (header + "\n" if header else "") + body + ("\n" if body else "")


def to_trig(triples: list[Triple]) -> str:
    """Graph-grouped TriG: default graph bare, named graphs in blocks.

    A SINGLE document-level @prefix header is hoisted over every graph
    (TriG prefixes are document-scoped), so prefixed names inside named
    blocks are always declared — per-block headers would be invalid."""
    default = [t for t in triples if not t.graph]
    named: dict[str, list[Triple]] = {}
    for t in triples:
        if t.graph:
            named.setdefault(t.graph, []).append(t)
    used: set[str] = set()
    parts = []
    if default:
        parts.append(_turtle_body(default, used))
    for graph, ts in named.items():
        body = _turtle_body(ts, used)
        parts.append("<%s> {\n%s\n}" % (graph, body))
    header = _prefix_header(used)
    out = "\n".join(parts)
    return (header + "\n" if header else "") + out + ("\n" if out else "")


SERIALIZERS = {
    "nt": to_ntriples,
    "nq": to_nquads,
    "ttl": to_turtle,
    "n3": to_turtle,  # reference's formatMap treats n3 ~ turtle family
    "trig": to_trig,
}


def serialize(triples: list[Triple], fmt: str = "nt") -> str:
    if fmt not in SERIALIZERS:
        raise ValueError(f"Invalid format {fmt}")
    return SERIALIZERS[fmt](triples)
