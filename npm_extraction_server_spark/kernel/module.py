"""NpmModule.getJsonLd (export mode) — S9-S12, S16, S21, P2.

Port of /root/reference/lib/npm/NpmModule.js:56-212 with
``output === true`` (the batch/export path: readme/scripts carry labels,
tarballs are never downloaded, NpmModule.js:163-165,189-191).
"""

from __future__ import annotations

from ..functions.jsuri import encode_uri_component as enc
from ..functions.jstypes import js_truthy
from ..functions.semver import valid_range
from .context import add_context, handle_repository
from .unmapped import update_unused_values
from .uris import (
    bundle_uri,
    engine_module_uri,
    module_base_uri,
    module_uri,
    script_object_uri,
    script_predicate,
)

DEP_KEYS = ("dependencies", "devDependencies", "peerDependencies", "optionalDependencies")


def module_json(package_doc: dict, version: str) -> dict:
    """NpmCouchDb.getVersion (/root/reference/lib/npm/NpmCouchDb.js:53-65):
    the manifest enriched with ``created`` from the time map."""
    result = package_doc["versions"][version]
    time = package_doc.get("time")
    if time and time.get(version):
        result = dict(result)
        result["created"] = time[version]
    return result


def module_jsonld(package_doc: dict, name: str, version: str, root: str,
                  user_map: dict, output: bool = True) -> dict:
    uri = module_uri(root, name, version)
    json = add_context(module_json(package_doc, version), uri, user_map, root, output)
    json["@type"] = "doap:Version"

    for key in DEP_KEYS:
        deps = json.get(key)
        if js_truthy(deps):
            for pkg in list(deps.keys()):
                rng = deps[pkg]
                if valid_range(rng):
                    if output:
                        deps[pkg] = {
                            "@id": module_uri(root, pkg, rng),
                            "bundle": bundle_uri(root, pkg),
                            "version": rng,
                        }
                    else:
                        deps[pkg] = module_uri(root, pkg, rng)
                elif isinstance(rng, str) and (
                    rng.startswith("http://") or rng.startswith("https://")
                ):
                    # blank node, only thing we know is this tarball
                    deps[pkg] = {"name": pkg, "dist": {"tarball": rng}}
                else:
                    repo = handle_repository(rng)
                    deps[pkg] = {
                        "name": pkg,
                        "repository": {"@id": repo["url"], "@type": "doap:GitRepository"},
                    }

    for bkey in ("bundledDependencies", "bundleDependencies"):
        if js_truthy(json.get(bkey)):
            if not isinstance(json[bkey], list):
                raise TypeError(f"{bkey}.map is not a function")
            json[bkey] = [bundle_uri(root, d) for d in json[bkey]]

    if js_truthy(json.get("engines")):
        engines = json["engines"]
        if isinstance(engines, list):  # deprecated representation
            engines = {e.get("name"): e.get("version") for e in engines}
            json["engines"] = engines
        for engine in list(engines.keys()):
            ver = engines[engine]
            if engine not in ("node", "iojs"):
                engines[engine] = module_uri(root, engine, ver)
            else:
                engines[engine] = engine_module_uri(root, engine, ver)

    if js_truthy(json.get("_nodeVersion")):
        json["_nodeVersion"] = engine_module_uri(root, "node", json["_nodeVersion"])
    if js_truthy(json.get("_npmVersion")):
        json["_npmVersion"] = module_uri(root, "npm", json["_npmVersion"])

    if js_truthy(json.get("scripts")):
        for script, cmd in json["scripts"].items():
            pred = script_predicate(root, script)
            json[pred] = {"@id": script_object_uri(uri, script)}
            if output:
                json[pred]["rdfs:label"] = cmd
        del json["scripts"]

    if js_truthy(json.get("pre-commit")) or js_truthy(json.get("precommit")):
        key = "pre-commit" if js_truthy(json.get("pre-commit")) else "precommit"
        scripts = json[key]
        if isinstance(scripts, dict) and scripts.get("run"):
            scripts = scripts["run"]
        if isinstance(scripts, str):
            scripts = scripts.split(",")
        if not isinstance(scripts, list):
            raise TypeError("scripts.map is not a function")
        json[key] = [uri + "/scripts/" + enc(s.strip()) for s in scripts]

    if js_truthy(json.get("dist")) and isinstance(json["dist"], dict) and js_truthy(json["dist"].get("shasum")):
        json["dist"]["shasum"] = {
            "@id": uri + "/shasum",
            "spdx:checksumValue": json["dist"]["shasum"],
            "spdx:algorithm": {"@id": "spdx:checksumAlgorithm_sha1"},
        }

    if js_truthy(json.get("lsd:components")):
        val = json["lsd:components"]
        if val is True:
            val = "components.jsonld"
        if not (isinstance(val, str) and (val.startswith("http://") or val.startswith("https://"))):
            # export mode: never download tarballs (NpmModule.js:163-165)
            json["lsd:components"] = {"rdfs:label": val}

    if js_truthy(json.get("lsd:contexts")):
        # export-mode fallback (NpmModule.js:179-191)
        json["lsd:contexts"] = {
            ctx_uri: {"rdfs:label": path} for ctx_uri, path in json["lsd:contexts"].items()
        }

    # link back to parent, remove last slash (NpmModule.js:202)
    json["bundle"] = module_base_uri(root, name)[:-1]

    for drop in ("_from", "_npmOperationalInternal", "engineStrict", "_shasum"):
        json.pop(drop, None)

    update_unused_values(json)
    return json
