"""Shared fixture corpus: CouchDB-style package docs exercising every
operator branch (FIXTURES.md §3 variants), plus a deterministic engine
release index (FIXTURES.md §5). Used by kernel golden tests AND by the
synthetic pages generator (sources/pages.py) so the Spark pipeline and
the pure-Python oracle consume identical inputs."""

from __future__ import annotations

from npm_extraction_server_spark.sources.engine_index import ENGINE_INDEX  # noqa: F401

ROOT = "http://example.org/"


def pkg_simple() -> dict:
    """Plain package: MIT license, github-shorthand repo, string author,
    deps with ranges + URL + git shorthand, scripts, shasum, engines."""
    return {
        "_id": "alpha",
        "_rev": "3-abc",
        "name": "alpha",
        "description": "A simple test package",
        "dist-tags": {"latest": "1.1.0", "beta": "2.0.0-beta.1"},
        "versions": {
            "1.0.0": {
                "name": "alpha",
                "version": "1.0.0",
                "description": "A simple test package",
                "license": "MIT",
                "repository": "user/alpha",
                "author": "Ann Author <ann@example.org> (http://ann.example.org)",
                "dependencies": {"hotpkg": "^1.0.0", "beta-pkg": "~2.1"},
                "main": "index.js",
                "scripts": {"test": "mocha test/", "build:prod": "webpack -p"},
                "dist": {
                    "tarball": "http://registry.example.org/alpha/-/alpha-1.0.0.tgz",
                    "shasum": "deadbeefdeadbeefdeadbeefdeadbeefdeadbeef",
                },
                "engines": {"node": ">=4"},
                "_npmUser": {"name": "annuser", "email": "ann@example.org"},
                "maintainers": [{"name": "annuser", "email": "ann@example.org"}],
                "_npmVersion": "3.10.3",
                "_nodeVersion": "6.9.1",
                "_from": "alpha@1.0.0",
                "_shasum": "deadbeefdeadbeefdeadbeefdeadbeefdeadbeef",
            },
            "1.1.0": {
                "name": "alpha",
                "version": "1.1.0",
                "license": "MIT",
                "author": {"name": "Ann Author", "email": "ann@example.org"},
                "dependencies": {
                    "hotpkg": "^1.0.0",
                    "urldep": "https://example.org/tarballs/urldep-1.0.0.tgz",
                    "gitdep": "someuser/gitdep",
                },
                "keywords": ["test", "fixture"],
                "homepage": "http://alpha.example.org",
                "dist": {"tarball": "http://registry.example.org/alpha/-/alpha-1.1.0.tgz"},
            },
            "2.0.0-beta.1": {
                "name": "alpha",
                "version": "2.0.0-beta.1",
                "license": "(MIT OR Apache-2.0)",
                "customField": {"nested": {"deep": [1, 2, "three"]}},
            },
        },
        "time": {
            "created": "2016-01-01T10:00:00.000Z",
            "modified": "2017-03-01T11:00:00.000Z",
            "1.0.0": "2016-01-01T10:00:00.000Z",
            "1.1.0": "2016-06-15T09:30:00.000Z",
            "2.0.0-beta.1": "2017-03-01T11:00:00.000Z",
        },
        "readme": "# alpha\n\nA test package.",
        "readmeFilename": "README.md",
        "maintainers": [{"name": "annuser", "email": "ann@example.org"}],
        "users": {"bob": True},
    }


def pkg_scoped() -> dict:
    """Scoped @org/name package: URI-encoding branches, license variants,
    pre-commit comma list, engines array form, bundledDependencies."""
    return {
        "_id": "@org/scoped-pkg",
        "_rev": "1-def",
        "name": "@org/scoped-pkg",
        "dist-tags": {"latest": "0.1.0"},
        "versions": {
            "0.1.0": {
                "name": "@org/scoped-pkg",
                "version": "0.1.0",
                "license": "SEE LICENSE IN LICENSE.txt",
                "repository": {"type": "svn", "url": "svn.example.org/repo"},
                "contributors": [
                    "Bob Builder <bob@example.org>",
                    {"name": "Carol", "email": "carol@example.org",
                     "url": "http://carol.example.org"},
                ],
                "bundledDependencies": ["alpha", "hotpkg"],
                "engines": [{"name": "node", "version": "0.10.x"},
                            {"name": "custom-engine", "version": "1.x"}],
                "pre-commit": "lint, test ,build",
                "scripts": {"lint": "eslint .", "test": "tap"},
            },
            "0.2.0": {
                "name": "@org/scoped-pkg",
                "version": "0.2.0",
                "license": "BSD",
                "repository": "gitlab:org/scoped",
                "precommit": {"run": "check,verify"},
                "devDependencies": {"hotpkg": "1.x"},
            },
        },
        "time": {
            "created": "2017-01-05T00:00:00.000Z",
            "modified": "2017-02-05T00:00:00.000Z",
            "0.1.0": "2017-01-05T00:00:00.000Z",
            "0.2.0": "2017-02-05T00:00:00.000Z",
        },
        "maintainers": [{"name": "orguser", "email": "org@example.org"}],
    }


def pkg_weird() -> dict:
    """Edge cases: UNLICENSED, deprecated license object, gist/bitbucket
    repos, person without email, web-instead-of-url, unmapped keys with
    @list + single-element unwrap, invalid-IRI values, dist-tag range."""
    return {
        "_id": "weird-pkg",
        "name": "weird-pkg",
        "dist-tags": {"latest": "1.0.0", "next": "1.0.0"},
        "versions": {
            "0.0.1": {
                "name": "weird-pkg",
                "version": "0.0.1",
                "license": {"type": "MIT", "url": "http://opensource.org/licenses/MIT"},
                "repository": "gist:abc123def",
                "author": {"name": "No Email Person"},
                "maintainers": [
                    {"name": "weird", "email": "weird@example.org",
                     "web": "http://weird.example.org"}
                ],
                "strangeList": ["a", "b"],
                "singleton": ["only"],
            },
            "1.0.0": {
                "name": "weird-pkg",
                "version": "1.0.0",
                "license": "whatever custom license",
                "repository": "bitbucket:team/repo",
                "dependencies": {"tagged": "latest"},
                "peerDependencies": {"alpha": ">=1.0.0 <2"},
                "optionalDependencies": {"opt": "1.2.x"},
                "engines": {"iojs": "^3.0.0"},
                "pre-commit": ["a b", "c"],
            },
        },
        "time": {
            "created": "2015-07-01T00:00:00.000Z",
            "modified": "2016-07-01T00:00:00.000Z",
            "0.0.1": "2015-07-01T00:00:00.000Z",
            "1.0.0": "2016-07-01T00:00:00.000Z",
        },
        "author": "Weird Author <weird@example.org>",
    }


def pkg_hot() -> dict:
    """The head-entity package most fixtures depend on (skew test)."""
    return {
        "_id": "hotpkg",
        "name": "hotpkg",
        "dist-tags": {"latest": "1.4.0"},
        "versions": {
            v: {
                "name": "hotpkg",
                "version": v,
                "license": "ISC",
                "author": {"name": "Hot Dev", "email": "hot@example.org"},
            }
            for v in ["1.0.0", "1.1.0", "1.2.0", "1.3.0", "1.4.0", "2.1.0"]
        },
        "time": {
            "created": "2014-01-01T00:00:00.000Z",
            "modified": "2016-01-01T00:00:00.000Z",
            **{v: f"2014-0{i + 1}-01T00:00:00.000Z"
               for i, v in enumerate(["1.0.0", "1.1.0", "1.2.0", "1.3.0", "1.4.0", "2.1.0"])},
        },
    }


def all_packages() -> list[dict]:
    return [pkg_simple(), pkg_scoped(), pkg_weird(), pkg_hot()]
