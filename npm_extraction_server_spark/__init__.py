"""PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the query/data-processing capabilities of
LinkedSoftwareDependencies/npm-extraction-server (reference at
/root/reference), generalized to a batch triple-extraction pipeline
over Common-Crawl-style web-page tables, per BASELINE.json.

Layout:
  functions/  -- JS-compatible scalar kernels (uri, semver, spdx, authors)
  kernel/     -- pure-Python doc->triples semantics (oracle + UDF body)
  extract/    -- html -> embedded structured-metadata blobs
  sources/    -- synthetic pages generator, table readers
  operators/  -- Spark DataFrame operators (joins, aggs, dedup, ANN, text)
  plans/      -- end-to-end pipelines (extract -> triples -> link -> write)
  streaming/  -- incremental/changed-since processing
"""

__version__ = "0.1.0"
