"""S13: unmapped-key reification — total (lossless) extraction.

Port of ``NpmContext.isMapped`` / ``updateUnusedValues`` /
``recursiveUpdateUnusedValues``
(/root/reference/lib/npm/NpmContext.js:29-98). Keys absent from the
merged context (and not @keywords / prefixed / absolute IRIs) are
reified into ``npm:key`` trees of ``{@id, rdfs:label, npm:value}``;
arrays become ``@list``; single-element lists are unwrapped.

The early-``return`` at NpmContext.js:64-65 (instead of ``continue``)
means that if any @graph entry yields zero unmapped keys, all LATER
entries are skipped — replicated for parity (SURVEY.md R6).
"""

from __future__ import annotations

from .jsonld_rdf import merge_contexts


def is_mapped(tag: str, context: dict) -> bool:
    if tag.startswith("@"):
        return True
    if context.get(tag):
        return True
    idx = tag.find("://")
    if idx > 0:
        return True
    idx = tag.find(":")
    if idx < 0:
        return False
    return bool(context.get(tag[:idx]))


def _recursive(key, value, node_id):
    result = {"@id": node_id}
    if key:
        result["rdfs:label"] = key
    if isinstance(value, list):
        items = [_recursive(None, v, f"{node_id}/{i}") for i, v in enumerate(value)]
        result["npm:value"] = {"@list": items}
    elif isinstance(value, dict):
        sub_keys = [_recursive(k, v, f"{node_id}/{k}") for k, v in value.items()]
        if len(sub_keys) == 1:
            sub_keys = sub_keys[0]
        result["npm:value"] = sub_keys
    elif key:
        result["npm:value"] = value
    else:
        result = value
    return result


def update_unused_values(jsonld: dict) -> None:
    """Mutates the doc in place, exactly like the reference."""
    context = merge_contexts(jsonld.get("@context", []))
    entries = jsonld
    if jsonld.get("@graph"):
        entries = jsonld["@graph"]
    if not isinstance(entries, list):
        entries = [entries]

    for entry in entries:
        keys = []
        for key in list(entry.keys()):
            if not is_mapped(key, context):
                keys.append(_recursive(key, entry[key], str(entry.get("@id")) + "/" + key))
        if len(keys) == 0:
            return  # reference bug: return, not continue (NpmContext.js:64-65)
        if len(keys) == 1:
            keys = keys[0]
        entry["npm:key"] = keys
