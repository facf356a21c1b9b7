"""Static engine release index (SC8 broadcast dimension).

Stands in for the reference's one-time fetch of
https://nodejs.org/dist/index.json / iojs.org
(/root/reference/lib/npm/NodeEngines.js:5-33): a deterministic fixture
shaped exactly like the public index (``[{version: "vX.Y.Z", date}]``).
"""

ENGINE_INDEX: dict[str, list[dict]] = {
    "node": [
        {"version": "v0.10.0", "date": "2013-03-11"},
        {"version": "v0.12.0", "date": "2015-02-06"},
        {"version": "v4.0.0", "date": "2015-09-08"},
        {"version": "v4.2.1", "date": "2015-10-13"},
        {"version": "v5.0.0", "date": "2015-10-29"},
        {"version": "v5.12.0", "date": "2016-06-23"},
        {"version": "v6.0.0", "date": "2016-04-26"},
        {"version": "v6.9.1", "date": "2016-10-19"},
        {"version": "v7.0.0", "date": "2016-10-25"},
        {"version": "v8.0.0", "date": "2017-05-30"},
    ],
    "iojs": [
        {"version": "v1.0.0", "date": "2015-01-14"},
        {"version": "v2.0.0", "date": "2015-05-04"},
        {"version": "v3.0.0", "date": "2015-08-04"},
        {"version": "v3.3.1", "date": "2015-09-15"},
    ],
}
