"""End-to-end corpus curation: the composition a pretraining data
pipeline actually runs — language filter -> quality floor -> exact
dedup (survivor = min doc_id per text digest) -> deterministic split
assignment. Every stage is a built-in-expression operator defined
elsewhere in this package; this module just wires them, so the whole
curated corpus is one Catalyst plan (filters push down into the scan,
the only shuffle is the dedup groupBy on the 64-char digest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import stratified_split
from .text import quality_scores


def curate_corpus(documents: DataFrame,
                  langs: tuple[str, ...] = ("en", "es"),
                  min_quality: float = 0.5,
                  split_weights: dict[str, int] | None = None,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, lang, quality_score, split) for the curated corpus.

    Dedup keeps the LOWEST doc_id per exact text digest (stable
    survivor choice — re-runs pick the same representative). Quality
    filtering uses the ROUNDED score so the cut is reproducible across
    engines/precisions."""
    weights = split_weights or {"train": 80, "val": 10, "test": 10}
    sha = documents.select(
        "doc_id", "lang", F.sha2(F.col(text_col), 256).alias("text_sha"))
    survivors = sha.groupBy("text_sha").agg(F.min("doc_id").alias("survivor_id"))
    kept = (
        sha.join(survivors, "text_sha")
        .filter(F.col("doc_id") == F.col("survivor_id"))
        .select("doc_id", "lang")
    )
    q = quality_scores(documents, text_col).select("doc_id", "quality_score")
    filtered = (
        kept.join(q, "doc_id")
        .filter(F.col("lang").isin(*langs)
                & (F.col("quality_score") >= min_quality))
    )
    return stratified_split(filtered, weights).select(
        "doc_id", "lang", "quality_score", "split")
