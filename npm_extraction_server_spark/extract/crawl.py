"""Crawl-frontier operators: robots.txt rules + politeness scheduling.

The step between the link graph and the next crawl: the outlink
frontier is filtered by each host's robots.txt rules and scheduled
into per-host fetch rounds that respect the host's crawl-delay — the
classic politeness constraint (never more than ``per_round`` URLs per
host per round, rounds spaced by the host's declared delay).

Everything is whole-stage codegen: robots parsing is regexp over the
fetched bytes, the filter is a broadcast anti-join on (host, prefix
match), and the schedule is one window over the host partition — the
same shuffle key the frontier is naturally grouped by. At 10^12 URLs
the frontier partitioning by host is exactly what a fetcher fleet
needs anyway (a host's queue lives on one partition), so the schedule
costs one shuffle that the fetch layout wants regardless; hub hosts
(huge queues) stay a single partition each, which is correct — the
crawl of one host is inherently serial under politeness, and the
window never materializes more than a partition stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sha_mod(salt: str, col, n: int):
    """Deterministic digit from sha256("<salt><value>") — 60-bit hex
    prefix mod n, reproducible bit-for-bit in DuckDB for the oracles
    (same recipe as the synthetic-corpus derivations)."""
    return F.pmod(
        F.conv(F.substring(F.sha2(F.concat(F.lit(salt), col), 256), 1, 15),
               16, 10).cast("long"), F.lit(n))


def synth_robots(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """Deterministic robots.txt BYTES per host (the fetched-file model:
    real crawls store the raw response). Each host disallows one
    path-prefix family ``/p/<digit>`` and declares a crawl-delay of
    1-3 s — both pure sha256 functions of the host name, so DuckDB
    re-derives the exact rule set."""
    h = F.col(host_col)
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /p/"),
        _sha_mod("rb:", h, 10).cast("string"),
        F.lit("\nCrawl-delay: "),
        (F.lit(1) + _sha_mod("cd:", h, 3)).cast("string"),
        F.lit("\n"))
    return hosts.select(h.alias("host"), F.encode(body, "UTF-8").alias("robots"))


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, robots bytes) -> one row per Disallow rule:
    (host, disallow_prefix, crawl_delay_s). Hosts whose file has no
    Disallow line (or an empty one — 'Disallow:' means allow-all in
    the robots.txt spec) emit no rule rows; crawl-delay defaults to 1
    when absent. Pure JVM regex — the bytes never reach Python."""
    txt = F.decode(F.col("robots"), "UTF-8")
    delay = F.regexp_extract(txt, r"(?m)^Crawl-delay:\s*(\d+)", 1)
    base = robots.select(
        "host",
        F.explode(F.regexp_extract_all(txt, F.lit(r"(?m)^Disallow:\s*(\S+)"),
                                       F.lit(1))).alias("disallow_prefix"),
        F.when(delay == "", F.lit(1))
         .otherwise(delay.cast("int")).alias("crawl_delay_s"))
    return base.filter(F.col("disallow_prefix") != "")


def _url_path(col):
    return F.regexp_extract(col, r"(?i)^https?://[^/#?]+([^#?]*)", 1)


def robots_filter(frontier: DataFrame, rules: DataFrame,
                  url_col: str = "canon_url",
                  host_col: str = "dst_host") -> DataFrame:
    """Drop frontier URLs whose path starts with a Disallow prefix of
    their host. The rule table is tiny relative to the frontier (one
    small file per HOST, not per page) — broadcast left-anti join on
    host + prefix match, one pass over the frontier."""
    r = rules.select(F.col("host").alias(host_col), "disallow_prefix")
    path = _url_path(F.col(url_col))
    return frontier.join(
        F.broadcast(r),
        on=[frontier[host_col] == r[host_col],
            path.startswith(r["disallow_prefix"])],
        how="left_anti")


def fetch_rounds(frontier: DataFrame, rules: DataFrame,
                 per_round: int = 2,
                 url_col: str = "canon_url",
                 host_col: str = "dst_host") -> DataFrame:
    """Politeness schedule: each host's (distinct, allowed) URLs are
    ordered deterministically and cut into rounds of ``per_round``;
    the earliest fetch offset is round * the host's crawl-delay. At
    most ``per_round`` URLs of a host share a round — the invariant a
    polite fetcher fleet enforces. One window over the host partition;
    hosts without a crawl-delay rule default to 1 s."""
    delays = (rules.groupBy("host")
              .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
              .withColumnRenamed("host", host_col))
    w = Window.partitionBy(host_col).orderBy(url_col)
    sched = (frontier.select(url_col, host_col).distinct()
             .withColumn("rn", F.row_number().over(w))
             .withColumn("round",
                         ((F.col("rn") - 1) / per_round).cast("int"))
             .drop("rn"))
    return (sched.join(F.broadcast(delays), host_col, "left")
            .withColumn("crawl_delay_s",
                        F.coalesce("crawl_delay_s", F.lit(1)))
            .withColumn("fetch_offset_s",
                        F.col("round") * F.col("crawl_delay_s")))
