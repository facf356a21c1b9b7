"""SC9/SC10: tarball extraction + path resolution + the lsd component
BFS — pure-Python kernel functions (the Spark operators in
sources/tarballs.py wrap these in Arrow-batched stages).

Reference semantics:
- extract: /root/reference/lib/util/Tarball.js:8-55 — gunzip + tar
  walk into a nested dict keyed by path steps; directory entries
  (trailing '/') are skipped; file bodies are byte buffers.
- resolve: Tarball.js:60-68 — lookup starts at data['package'] (npm
  tarballs root everything under a 'package' folder), then follows
  '/'-separated steps; a missing step raises KeyError (the reference's
  TypeError, caught by callers as a fallback).
- component closure: /root/reference/lib/npm/NpmModule.js:216-243 —
  BFS over JSON-LD 'import' edges (relative to the importing file's
  directory), collecting 'components' entries with the importing
  document's @context attached; a 'handled' set breaks import cycles.
"""

from __future__ import annotations

import gzip
import io
import json
import tarfile


def extract_tar(blob: bytes) -> dict:
    """Gunzip (if gzipped) + tar walk -> nested dict path tree with
    bytes at the leaves. Mirrors Tarball.fromUrl's entry handling:
    directories skipped, files buffered whole."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    result: dict = {}
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        for member in tf:
            if not member.isfile():
                continue
            steps = member.name.split("/")
            obj = result
            for i, step in enumerate(steps):
                if i == len(steps) - 1:
                    fh = tf.extractfile(member)
                    obj[step] = fh.read() if fh is not None else b""
                else:
                    obj = obj.setdefault(step, {})
    return result


def try_extract_tar(blob: bytes) -> dict | None:
    """``extract_tar`` that answers None for corrupt blobs (bad gzip,
    truncated tar, non-archive bytes) instead of raising — the form the
    Spark UDF stages use so one broken tarball can't fail its task
    (the reference's stream .on('error') path, Tarball.js:24-26)."""
    try:
        return extract_tar(blob)
    except Exception:
        return None


def resolve_path(path: str, data: dict) -> bytes:
    """Tarball.resolvePath: root folder is always 'package'; raises
    KeyError when any step is missing (callers fall back, matching the
    reference's .catch on the promise)."""
    result = data["package"]
    for step in path.split("/"):
        result = result[step]
    if not isinstance(result, bytes):
        raise KeyError(path)  # resolved to a directory, not a file
    return result


def component_closure(entry_path: str, data: dict) -> list[dict]:
    """handleComponent (NpmModule.js:216-243): BFS over 'import' edges;
    each imported path is relative to the importing file's directory
    (path.replace(/[^/]*$/, '') + imprt); components inherit the
    importing document's @context; cycles broken by the handled set."""
    handled: set[str] = set()
    paths = [entry_path]
    components: list[dict] = []
    while paths:
        path = paths.pop(0)
        if path in handled:
            continue
        result = resolve_path(path, data)
        handled.add(path)
        jsonld = json.loads(result)
        if jsonld.get("import"):
            prefix = path[: path.rfind("/") + 1]
            for imprt in jsonld["import"]:
                paths.append(prefix + imprt)
        for component in jsonld.get("components") or []:
            component = dict(component)
            component["@context"] = jsonld.get("@context")
            components.append(component)
    return components


def resolve_contexts(contexts: dict, data: dict) -> dict:
    """handleContexts (NpmModule.js:245-250): parse each context file."""
    return {uri: json.loads(resolve_path(p, data))
            for uri, p in contexts.items()}
