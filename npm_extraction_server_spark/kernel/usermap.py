"""A2: the order-sensitive user-identity fold.

Port of ``NpmBundle.getUserMap`` (/root/reference/lib/npm/NpmBundle.js:61-117):
iterate every version manifest in key order, then the bundle doc itself;
per email, last non-null write wins for email/url/name/id. ``_npmUser``
and ``maintainers`` names are npm usernames (id); ``author`` and
``contributors`` names are display names.
"""

from __future__ import annotations

from ..functions.authors import parse_author
from ..functions.jsuri import encode_uri


def _handle_user(user, user_map: dict, is_npm_name: bool) -> None:
    if not user:
        return
    if isinstance(user, str):
        user = parse_author(user)
    if not isinstance(user, dict):
        return
    mail = user.get("email")
    if not mail or not isinstance(mail, str):
        return
    entry = user_map.setdefault(mail, {})
    entry["email"] = f"mailto:{encode_uri(mail)}"
    if user.get("url"):
        entry["url"] = user["url"]
    if user.get("web"):  # maintainers use web instead of url (NpmBundle.js:81-82)
        entry["url"] = user["web"]
    if user.get("name"):
        if is_npm_name:
            entry["id"] = user["name"]
        else:
            entry["name"] = user["name"]


def _handle_version(version: dict, user_map: dict) -> None:
    if not isinstance(version, dict):
        return
    if version.get("author"):
        _handle_user(version["author"], user_map, False)
    if version.get("_npmUser"):
        _handle_user(version["_npmUser"], user_map, True)
    contributors = version.get("contributors")
    if contributors and not isinstance(contributors, list):
        contributors = [contributors]
    for val in contributors or []:
        _handle_user(val, user_map, False)
    maintainers = version.get("maintainers")
    if maintainers and isinstance(maintainers, list):
        for val in maintainers:
            _handle_user(val, user_map, True)


def build_user_map(package_doc: dict) -> dict:
    """Fold all versions (in key order), then the bundle-level doc."""
    user_map: dict = {}
    for version in (package_doc.get("versions") or {}).values():
        _handle_version(version, user_map)
    _handle_version(package_doc, user_map)
    return user_map
