"""addContext: the shared bundle/module JSON-LD enrichment (S3-S8, S17).

Port of ``NpmContext.addContext`` + ``handleRepository``
(/root/reference/lib/npm/NpmContext.js:100-286). Mutation semantics are
preserved: persons found in the user map are aliased (not copied), so
the first transformation mutates the shared identity entry exactly like
the reference — subsequent references within the same bundle see the
already-transformed object (NpmContext.js:239-240).

Raises on the same inputs the reference would throw on (e.g. a license
object with neither ``type`` nor ``url`` hits ``toUpperCase`` on a
non-string, NpmContext.js:163) — the per-bundle atomicity wrapper (T2)
turns that into a failed bundle.
"""

from __future__ import annotations


from ..functions.authors import parse_author
from ..functions.jstypes import js_truthy
from ..functions.jsuri import encode_uri_component as enc
from ..functions.jsuri import valid_url_is_uri
from ..functions.spdx import SpdxError, correct, parse_spdx
from .uris import spdx_license_uri, user_uri
from .vocab import CONTEXT_IRI


def handle_repository(url: str) -> dict:
    """S5 (/root/reference/lib/npm/NpmContext.js:100-124). Replicates the
    gitlab.org (sic) host and the always-'git' returned type."""
    if "://" in url:
        return {"type": "git", "url": url}
    rtype = "git"
    if url.startswith("gist:"):
        rtype = "gist"
    elif url.startswith("bitbucket:"):
        rtype = "bitbucket"
    elif url.startswith("gitlab:"):
        rtype = "gitlab"

    if rtype == "git":
        url = "https://github.com/" + enc(url)
    elif rtype == "gist":
        url = "https://gist.github.com/" + enc(url[len("gist:"):])
    elif rtype == "bitbucket":
        url = "https://bitbucket.org/" + enc(url[len("bitbucket:"):])
    elif rtype == "gitlab":
        url = "https://gitlab.org/" + enc(url[len("gitlab:"):])
    return {"type": "git", "url": url}


def _parse_spdx_tree(node: dict) -> dict:
    """Inner parseSpdx (/root/reference/lib/npm/NpmContext.js:176-192)."""
    result: dict = {}
    if node.get("license"):
        result["@id"] = spdx_license_uri(node["license"])
    if node.get("exception"):
        result["spdx:licenseException"] = spdx_license_uri(node["exception"])
    if node.get("conjunction") or node.get("disjunction"):
        left = _parse_spdx_tree(node["left"])
        right = _parse_spdx_tree(node["right"])
        # reference bug kept: disjunction ALSO maps to ConjunctiveLicenseSet
        result["@type"] = "spdx:ConjunctiveLicenseSet"
        result["member"] = [left, right]
    return result


def _handle_license(json: dict, uri: str) -> None:
    license_val = json.get("license")
    if not js_truthy(license_val):
        return
    if isinstance(license_val, list):
        license_val = license_val[0] if license_val else None
        json["license"] = license_val
        if not js_truthy(license_val):
            # JS: Cannot read property 'type' of undefined -> bundle fails
            raise TypeError("Cannot read property 'type' of undefined")
    if isinstance(license_val, dict) and license_val.get("type") and not license_val.get("url"):
        license_val = license_val["type"]
        json["license"] = license_val
    if isinstance(license_val, dict) and license_val.get("url"):
        json["license"] = license_val["url"]
        return
    if not isinstance(license_val, str):
        # JS: json.license.toUpperCase is not a function -> bundle fails
        raise TypeError("license.toUpperCase is not a function")
    if license_val.upper() == "UNLICENSED":
        del json["license"]
        return
    if license_val.upper().startswith("SEE LICENSE IN "):
        lic_id = uri + "/license"
        file = license_val[len("SEE LICENSE IN "):]
        json["spdx:licenseInfoFromFiles"] = {"@id": lic_id, "spdx:name": file}
        json["dcterms:license"] = {"@id": lic_id, "rdfs:label": license_val}
        del json["license"]
        return

    original = license_val
    try:
        json["license"] = _parse_spdx_tree(parse_spdx(original))
    except SpdxError:
        try:
            json["license"] = _parse_spdx_tree(parse_spdx(correct(original)))
        except SpdxError:
            json["license"] = {}
    json["license"]["spdx:name"] = original
    if "@id" not in json["license"]:
        json["license"]["@id"] = uri + "/license"
    json["dcterms:license"] = {"@id": json["license"]["@id"], "rdfs:label": original}


def _handle_repo_field(json: dict) -> None:
    if isinstance(json.get("repository"), str):
        json["repository"] = handle_repository(json["repository"])
    repo = json.get("repository")
    if isinstance(repo, dict) and repo.get("url"):
        url = repo["url"]
        if "://" not in url and not valid_url_is_uri(url) and valid_url_is_uri("ssh://" + url):
            url = "ssh://" + url
        repository = {"@id": url}
        if repo.get("type") == "git":
            repository["@type"] = "doap:GitRepository"
        elif repo.get("type") == "svn":
            repository["@type"] = "doap:SVNRepository"
        elif repo.get("type") == "cvs":
            repository["@type"] = "doap:CVSRepository"
        json["repository"] = repository


def handle_person(person, name_is_id: bool, user_map: dict, root: str):
    """S8 (/root/reference/lib/npm/NpmContext.js:231-267). Aliases (does
    not copy) user-map entries so shared mutation is preserved."""
    if not js_truthy(person):
        return None
    if isinstance(person, str):
        person = parse_author(person)
    if not isinstance(person, dict):
        return person
    if person.get("email") and user_map.get(person["email"]):
        person = user_map[person["email"]]
    elif name_is_id:
        if "name" in person:
            person["id"] = person.get("name")
            del person["name"]

    if person.get("id"):
        person["@id"] = user_uri(root, person["id"])
        del person["id"]
    elif person.get("email") and not person.get("@id"):
        person["@id"] = person["email"]
    if person.get("name"):
        person["foaf:name"] = person["name"]
        del person["name"]
    if person.get("url"):
        person["foaf:homepage"] = person["url"]
        del person["url"]
    return person


def _json_deepcopy(value):
    """Deep copy for plain-JSON values (dict/list/scalars): ~3x faster
    than copy.deepcopy (no memo or type dispatch) — inputs here always
    come from json.loads."""
    if isinstance(value, dict):
        return {k: _json_deepcopy(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_json_deepcopy(v) for v in value]
    return value


def add_context(json: dict, uri: str, user_map: dict, root: str, output: bool) -> dict:
    """The common enrichment for bundle and module docs
    (/root/reference/lib/npm/NpmContext.js:127-286). ``json`` is deep-
    copied (the reference's cloneDeep); ``user_map`` is NOT."""
    json = _json_deepcopy(json)
    json["@id"] = uri

    if js_truthy(json.get("readme")):
        if output:
            json["readme"] = {"@id": uri + "/README", "rdfs:label": json["readme"]}
        else:
            json["readme"] = uri + "/README"

    # safety measures to prevent duplicate @id values (NpmContext.js:143-145)
    json.pop("url", None)
    json.pop("tarball", None)

    json["@context"] = [CONTEXT_IRI]

    _handle_license(json, uri)
    _handle_repo_field(json)

    if js_truthy(json.get("author")):
        json["author"] = handle_person(json["author"], False, user_map, root)
    if js_truthy(json.get("contributors")):
        contributors = json["contributors"]
        if not isinstance(contributors, list):
            contributors = [contributors]
        json["contributors"] = [handle_person(c, False, user_map, root) for c in contributors]
    if js_truthy(json.get("_npmUser")):
        json["_npmUser"] = handle_person(json["_npmUser"], True, user_map, root)
    if json.get("maintainers") and isinstance(json["maintainers"], list):
        json["maintainers"] = [handle_person(m, True, user_map, root) for m in json["maintainers"]]

    return json
