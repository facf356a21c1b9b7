"""NpmBundle.getJsonLd — P1/P4/S2/S18 + the dist-tags graph wrap.

Port of /root/reference/lib/npm/NpmBundle.js:119-161.
"""

from __future__ import annotations

from .context import add_context
from .unmapped import update_unused_values
from .uris import bundle_uri, module_uri, npmjs_same_as


def bundle_jsonld(package_doc: dict, name: str, root: str, user_map: dict,
                  output: bool = True) -> dict:
    uri = bundle_uri(root, name)
    json = add_context(package_doc, uri, user_map, root, output)

    if json.get("name"):
        json["owl:sameAs"] = npmjs_same_as(json["name"])

    if not isinstance(json["@context"], list):
        json["@context"] = [json["@context"]]
    json["@type"] = "doap:Project"

    versions = json.get("versions") or {}
    for version in list(versions.keys()):
        versions[version] = module_uri(root, name, version)
    tags = {
        tag: module_uri(root, name, version)
        for tag, version in (json.get("dist-tags") or {}).items()
    }
    json["dist-tags"] = tags

    time = json.get("time")
    if time:
        if time.get("created"):
            json["created"] = time["created"]
        if time.get("modified"):
            json["modified"] = time["modified"]

    for drop in ("time", "readmeFilename", "_rev", "users"):
        json.pop(drop, None)

    # do dist-tags last since that introduces a graph object (NpmBundle.js:149-156)
    context = json.pop("@context")
    tags = json.pop("dist-tags")
    json = {"@context": context, "@graph": [json]}
    for tag, tag_uri in tags.items():
        json["@graph"].append({"@id": tag_uri, "npm:dist-tag": tag})

    update_unused_values(json)
    return json
