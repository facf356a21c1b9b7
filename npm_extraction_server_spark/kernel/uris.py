"""S1/S2: entity URI construction (SURVEY.md Appendix B).

Ports the getUri/getBaseUri chain:
- bundle:  /root/reference/lib/Bundle.js:9-12 + NpmBundle.js:19-39
  (scoped ``@org/name`` keeps literal ``@`` and ``/``)
- module:  /root/reference/lib/Module.js + NpmModule.js:22-35
  (the FULL name is encoded — scoped names become ``%40org%2Fname``;
  asymmetry with bundle URIs replicated deliberately)
- user:    /root/reference/lib/User.js + NpmUser.js:14-17,31-34
- engines: /root/reference/lib/EngineBundle.js + NodeEngineBundle.js:17-20,
  NodeEngineModule.js:16-24
- npmjs sameAs: NpmBundle.js:125-126
"""

from __future__ import annotations

from ..functions.jsuri import encode_uri_component as enc


def bundle_uri(root: str, name: str) -> str:
    base = root + "bundles/npm/"
    if name.startswith("@"):
        slash = name.find("/")
        if slash >= 0:
            return base + "@" + enc(name[1:slash]) + "/" + enc(name[slash + 1:])
    return base + enc(name)


def module_base_uri(root: str, name: str) -> str:
    return root + "bundles/npm/" + enc(name) + "/"


def module_uri(root: str, name: str, version: str) -> str:
    return module_base_uri(root, name) + enc(version)


def user_uri(root: str, name: str) -> str:
    return root + "users/npm/" + enc(name)


def engine_bundle_uri(root: str, name: str) -> str:
    return root + "engines/" + enc(name) + "/"


def engine_module_base_uri(root: str, name: str) -> str:
    return root + "engines/" + enc(name) + "/"


def engine_module_uri(root: str, name: str, version: str) -> str:
    return engine_module_base_uri(root, name) + enc(version)


def npmjs_same_as(name: str) -> str:
    return "https://www.npmjs.com/package/" + enc(name)


def script_predicate(root: str, script_name: str) -> str:
    """NpmModule.js:131-134: predicate = {root}scripts/npm/{enc(name)}."""
    return root + "scripts/npm/" + enc(script_name)


def script_object_uri(module_uri_: str, script_name: str) -> str:
    return module_uri_ + "/scripts/" + enc(script_name)


def spdx_license_uri(license_id: str) -> str:
    """NpmContext.js:180-182."""
    return "https://spdx.org/licenses/" + enc(license_id) + ".html"


# Engine dist roots (NodeEngines.urls, /root/reference/lib/npm/NodeEngines.js:5-8)
ENGINE_ROOTS = {
    "node": "https://nodejs.org/download/release/",
    "iojs": "https://iojs.org/download/release/",
}
