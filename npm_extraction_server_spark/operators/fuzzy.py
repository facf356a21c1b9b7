"""Blocked fuzzy string matching — the precision half of entity
resolution.

``plans/linking.py`` blocks candidate entity pairs with MinHash-LSH
(high recall, cheap); this module scores blocked pairs with EDIT
DISTANCE (high precision) using Spark's built-in ``levenshtein``
(JVM codegen, no UDF) — the classic two-stage ER design: block for
recall, verify for precision. The reference's analog is its
user-identity matching by exact name/email keys
(/root/reference/lib/npm/NpmUsers.js); fuzzy scoring generalizes it
to the dirty-strings reality of a web-scale KG.

Shape at scale: the self-join is an equi-join on the BLOCK key, so
the cross product exists only within blocks — total work is
Σ n_b², not N². That makes block design the whole game: a skewed
block (one giant key) degenerates to a quadratic hot partition, so
callers either sub-block (composite keys, e.g. (nation, name-prefix))
or cap block size upstream, exactly like the LSH bucket cap in
``plans/linking.py``. The ``a < b`` predicate halves the pair space
and canonicalizes output; the distance filter runs inside the same
codegen stage as the join, so rejected pairs never materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_block_join"]


def fuzzy_block_join(df: DataFrame, id_col: str, block_col: str,
                     name_col: str, max_dist: int = 2) -> DataFrame:
    """Self-join ``df`` within ``block_col`` blocks and keep pairs
    whose ``name_col`` values are within ``max_dist`` edits.

    Returns (id_a, id_b, blk, dist) with id_a < id_b (each pair once,
    deterministic orientation). ``dist`` is plain Levenshtein edit
    distance — computed by the JVM built-in, bit-portable to any
    engine with the standard DP definition (the DuckDB oracle uses
    its own ``levenshtein``).

    NULL semantics (deliberate — dirty ER inputs are full of them):
    rows with a NULL block key never join (SQL equi-join), and pairs
    touching a NULL name score NULL dist and fail the threshold —
    both are EXCLUDED from the output. Callers who need to resolve
    null-blocked entities assign a fallback block (e.g. a name
    prefix) upstream; an operator cannot guess one."""
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(block_col).alias("blk"),
                  F.col(name_col).alias("name_a"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(block_col).alias("blk"),
                  F.col(name_col).alias("name_b"))
    return (a.join(b, "blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "blk", "dist"))
