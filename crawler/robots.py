"""robots.txt fetch + cache (north_rule: "per-host politeness delays and
robots.txt caching").

The reference has no robots support; this is the standard crawler
semantics layered onto the same fetch-sim machinery: at the start of a
wave, every host that has pending frontier rows but no robots_cache row
gets its `http://host/robots.txt` fetched (out-of-band — robots fetches
don't consume the politeness budget, the convention real crawlers use)
and parsed into disallow prefixes.  Hosts without a robots page cache
an empty prefix list (negative caching — never re-fetched).

Parsing is pure JVM: split lines → keep `Disallow:` lines → strip the
directive → drop empties.  (User-agent groups are intentionally not
modeled; the fixture speaks plain Disallow lines.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_disallow_expr(text_col) -> F.Column:
    """robots.txt body → array of disallow path prefixes."""
    lines = F.split(text_col, "\n")
    dis = F.filter(
        F.transform(lines, lambda ln: F.trim(ln)),
        lambda ln: ln.startswith("Disallow:"),
    )
    prefixes = F.transform(
        dis, lambda ln: F.trim(F.regexp_replace(ln, "^Disallow:", ""))
    )
    return F.filter(prefixes, lambda p: p != "")


def robots_text_expr(spans_col) -> F.Column:
    """Concatenated text spans of the robots document."""
    return F.concat_ws(
        "\n",
        F.transform(
            F.filter(spans_col, lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )


def refresh_robots(
    pending: DataFrame,
    robots_cache: DataFrame,
    pages: DataFrame,
    documents: DataFrame,
    wave: int,
) -> DataFrame:
    """New ROBOTS_CACHE rows for hosts with pending rows but no cache
    entry.  One anti-join on host (distinct hosts, tiny) + one fetch-sim
    join against the web."""
    new_hosts = (
        pending.select("host")
        .distinct()
        .join(robots_cache.select("host"), on="host", how="left_anti")
    )
    robots_url = F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt"))
    req = new_hosts.select("host", robots_url.alias("_rurl"))

    web = pages.join(documents, on="doc_id", how="left").select(
        F.col("url").alias("_rurl"),
        F.col("status").alias("_status"),
        F.col("spans").alias("_spans"),
    )
    j = req.join(web, on="_rurl", how="left")
    ok = F.col("_status").isNotNull() & F.col("_status").between(200, 299)
    prefixes = F.when(ok, parse_disallow_expr(robots_text_expr(F.col("_spans"))))
    return j.select(
        F.col("host"),
        F.coalesce(prefixes, F.array().cast("array<string>")).alias(
            "disallow_prefixes"
        ),
        F.lit(wave).cast("int").alias("fetched_wave"),
    )


# scalar twin for the oracle ---------------------------------------------


def py_parse_disallow(text: str) -> list[str]:
    out = []
    for ln in (text or "").split("\n"):
        ln = ln.strip()
        if ln.startswith("Disallow:"):
            p = ln[len("Disallow:"):].strip()
            if p:
                out.append(p)
    return out
