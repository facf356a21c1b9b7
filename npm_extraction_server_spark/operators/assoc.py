"""Pairwise association-rule mining (A-priori) over item baskets.

The classic market-basket analysis (Agrawal & Srikant, VLDB'94),
specialized to pairs: for items X, Y with basket supports s(X), s(Y),
pair support s(X,Y) and n baskets total,

    confidence(X -> Y) = s(X,Y) / s(X)
    lift(X -> Y)       = n * s(X,Y) / (s(X) * s(Y))

Applied to the dependency KG it answers "packages that depend on X
also depend on Y" — the co-adoption signal a registry recommender or
an ecosystem-drift monitor runs on (reference scope: the dependency
edges this engine extracts per NpmModule.js:56-212; the rule mining
itself is an added training-data-pipeline analytic, not a reference
behavior).

Exactness: supports are integers; confidence and lift are short
rationals reported on the 1e-8 grid via exact HALF_UP integer
division in decimal(38,0) — no doubles anywhere before the final
exact /1e8 conversion, so results are bit-identical cross-engine.
Overflow bound: 2e8 * n * s(X,Y) must fit decimal(38,0) — n*s < 5e29.
lift_e8 <= 1e8 * n / min_supp fits int64 to ~1.8e11 baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assoc_rules(baskets: DataFrame, min_supp: int = 2) -> DataFrame:
    """Mine pairwise rules from a (basket_id, item) DataFrame (first
    two columns, any names). Both rule directions are emitted.

    Scale shape: the A-priori downward-closure prune drops items with
    support < min_supp BEFORE pair generation (broadcast semi join),
    so pair work is sum_b C(k_b, 2) with k_b = FREQUENT items per
    basket — bounded by basket width, never |items|^2. One
    combine-enabled groupBy for item supports, a self-equi-join on
    basket id + one groupBy for pair supports; rule stats join back
    via broadcasts (the support table is |frequent items| rows) and
    the basket count is a 1-row broadcast cross join — no driver
    collect, no global sort.
    """
    b = (baskets.select(F.col(baskets.columns[0]).alias("b"),
                        F.col(baskets.columns[1]).alias("item"))
         .distinct())
    nb = b.agg(F.countDistinct("b").alias("n"))
    supp = b.groupBy("item").agg(F.count("*").alias("s"))
    freq = supp.filter(F.col("s") >= min_supp)
    fb = b.join(F.broadcast(freq.select("item")), "item")
    fx = fb.select("b", F.col("item").alias("xi"))
    fy = fb.select("b", F.col("item").alias("yi"))
    pairs = (fx.join(fy, "b")
             .filter(F.col("xi") < F.col("yi"))
             .groupBy("xi", "yi").agg(F.count("*").alias("sxy"))
             .filter(F.col("sxy") >= min_supp))
    rules = (pairs.select(F.col("xi").alias("antecedent"),
                          F.col("yi").alias("consequent"), "sxy")
             .unionByName(pairs.select(F.col("yi").alias("antecedent"),
                                       F.col("xi").alias("consequent"),
                                       "sxy")))
    sa = freq.select(F.col("item").alias("antecedent"),
                     F.col("s").alias("supp_a"))
    sc = freq.select(F.col("item").alias("consequent"),
                     F.col("s").alias("supp_c"))
    r = (rules.join(F.broadcast(sa), "antecedent")
         .join(F.broadcast(sc), "consequent")
         .crossJoin(F.broadcast(nb)))
    conf_e8 = F.expr(
        "(2 * CAST(sxy AS DECIMAL(38,0)) * 100000000 + supp_a)"
        " div (2 * CAST(supp_a AS DECIMAL(38,0)))")
    lift_e8 = F.expr(
        "(2 * CAST(n AS DECIMAL(38,0)) * sxy * 100000000"
        " + CAST(supp_a AS DECIMAL(38,0)) * supp_c)"
        " div (2 * CAST(supp_a AS DECIMAL(38,0)) * supp_c)")
    return r.select(
        "antecedent", "consequent", F.col("n").alias("n_baskets"),
        "supp_a", "supp_c", F.col("sxy").alias("supp_both"),
        conf_e8.alias("conf_e8"),
        (conf_e8.cast("double") / F.lit(1e8)).alias("confidence"),
        lift_e8.alias("lift_e8"),
        (lift_e8.cast("double") / F.lit(1e8)).alias("lift"))
