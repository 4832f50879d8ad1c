"""robots.txt fetch + cache (north_rule: "per-host politeness delays and
robots.txt caching").

The reference has no robots support; this layers the standard Robots
Exclusion Protocol (RFC 9309) onto the same fetch-sim machinery: at the
start of a wave, every host that has pending frontier rows but no
robots_cache row gets its ``http://host/robots.txt`` fetched
(out-of-band — robots fetches don't consume the politeness budget, the
convention real crawlers use) and parsed into the RULE LIST of the
group that applies to our user agent.  Hosts without a robots page
cache an empty rule list (negative caching — never re-fetched).

Semantics implemented (RFC 9309 / the behavior of Google's open-source
parser), all evaluated JVM-side:

* **User-agent groups** — consecutive ``User-agent:`` lines name a
  group; the group whose UA token most specifically matches ours wins
  (longest matching token; ``*`` matches everything at the lowest
  specificity).  All groups at the winning specificity merge.  A
  matching group with no rules means allow-all (a less-specific group
  is NOT consulted).  Lenient extension: rules before any
  ``User-agent`` line belong to an implicit ``*`` group.
* **Allow + Disallow, longest-match precedence** — the rule whose
  pattern is longest wins among all matching rules; on a length tie,
  ``Allow`` wins.  An empty ``Disallow:`` / ``Allow:`` value is a
  no-op line, not a rule.
* **Wildcards** — ``*`` matches any character sequence; a trailing
  ``$`` anchors the match at the end.  Patterns are compiled to Java
  regexes at PARSE time (once per host); plain-prefix rules (the vast
  majority) carry ``wild=false`` and match via ``startsWith`` so the
  scheduling hot path stays regex-free for them.
* **Match target** — the URL's path plus ``?query`` when present
  (RFC 9309 §2.2.2); fragments never match.

Parsing is one pass of ``F.aggregate`` over the line array (a JVM
fold — no Python stage): the fold tracks (current group's best UA
specificity, whether we're inside a UA run) and appends compiled rules
whose group specificity equals the text's best specificity.  The best
specificity itself is the same fold run for its scalar result; robots
bodies are tiny (KBs), so the duplicated fold is irrelevant.
"""

from __future__ import annotations

import re as _re
from urllib.parse import urlsplit

from pyspark.sql import Column, DataFrame, functions as F

#: rules column type (ROBOTS_CACHE.rules): compiled at parse time
RULES_TYPE = "array<struct<allow:boolean,pattern:string,wild:boolean,re:string>>"

#: regex metacharacters to escape when compiling a robots pattern —
#: everything except '*' (translated to '.*') and the trailing '$'
#: (stripped first, re-added as a real anchor)
_META_CLASS = r"([.^$+?(){}\[\]|\\])"


def _kv_expr(text_col: Column) -> Column:
    """text → array<struct<k,v>>: trimmed, comment-stripped lines split
    at the first ':' (k lowercased; colon-less lines get k='' = noise)."""
    lines = F.transform(
        F.split(text_col, "\r?\n"),
        lambda ln: F.trim(F.regexp_replace(ln, "#.*$", "")),
    )
    return F.transform(
        lines,
        lambda ln: F.struct(
            F.when(
                F.instr(ln, ":") > 0,
                F.lower(F.trim(F.substring_index(ln, ":", 1))),
            )
            .otherwise(F.lit(""))
            .alias("k"),
            F.when(
                F.instr(ln, ":") > 0,
                F.trim(F.regexp_replace(ln, "^[^:]*:", "")),
            )
            .otherwise(F.lit(""))
            .alias("v"),
        ),
    )


def _spec_expr(v: Column, user_agent: str) -> Column:
    """UA-token match specificity: 0 = no match, 1 = '*', 10+len for a
    token that occurs in our UA (longer token = more specific)."""
    return (
        F.when(v == "", F.lit(0))
        .when(v == "*", F.lit(1))
        .when(F.lit(user_agent.lower()).contains(F.lower(v)), F.length(v) + 10)
        .otherwise(F.lit(0))
    )


def _group_step(acc_cur: Column, acc_inua: Column, k: Column, s: Column):
    """Shared group-tracking transition: (new_cur, new_inua).

    A User-agent line either extends the current UA run (taking the max
    specificity) or starts a new group; any other directive ends the UA
    run; noise lines change nothing."""
    is_ua = k == F.lit("user-agent")
    new_cur = F.when(
        is_ua,
        F.when(acc_inua == 1, F.greatest(acc_cur, s)).otherwise(s),
    ).otherwise(acc_cur)
    new_inua = (
        F.when(is_ua, F.lit(1)).when(k == "", acc_inua).otherwise(F.lit(0))
    )
    return new_cur, new_inua


def best_spec_expr(text_col: Column, user_agent: str) -> Column:
    """Highest UA-group specificity present in the text (≥1: the
    implicit leading '*' group always exists)."""
    kv = _kv_expr(text_col)
    init = F.struct(
        F.lit(1).alias("cur"), F.lit(0).alias("inua"), F.lit(1).alias("best")
    )

    def step(acc, x):
        s = _spec_expr(x["v"], user_agent)
        new_cur, new_inua = _group_step(acc["cur"], acc["inua"], x["k"], s)
        return F.struct(
            new_cur.alias("cur"),
            new_inua.alias("inua"),
            F.greatest(acc["best"], new_cur).alias("best"),
        )

    return F.aggregate(kv, init, step)["best"]


def _rule_struct(k: Column, v: Column) -> Column:
    """Compile one Allow/Disallow value into the stored rule struct."""
    anchored = v.endswith("$")
    core = F.when(anchored, F.substring(v, F.lit(1), F.length(v) - 1)).otherwise(v)
    esc = F.regexp_replace(core, _META_CLASS, "\\\\$1")
    rex = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.struct(
        (k == F.lit("allow")).alias("allow"),
        v.alias("pattern"),
        (v.contains("*") | anchored).alias("wild"),
        rex.alias("re"),
    )


def parse_rules_expr(text_col: Column, user_agent: str) -> Column:
    """robots.txt body → compiled rule array (RULES_TYPE) of the group
    that applies to `user_agent`.  Pure JVM fold; empty array = no
    restrictions (also the negative-cache value for 4xx/missing)."""
    kv = _kv_expr(text_col)
    best = best_spec_expr(text_col, user_agent)
    init = F.struct(
        F.lit(1).alias("cur"),
        F.lit(0).alias("inua"),
        F.array().cast(RULES_TYPE).alias("rules"),
    )

    def step(acc, x):
        s = _spec_expr(x["v"], user_agent)
        new_cur, new_inua = _group_step(acc["cur"], acc["inua"], x["k"], s)
        take = (
            x["k"].isin("allow", "disallow") & (x["v"] != "") & (acc["cur"] == best)
        )
        return F.struct(
            new_cur.alias("cur"),
            new_inua.alias("inua"),
            F.when(take, F.array_append(acc["rules"], _rule_struct(x["k"], x["v"])))
            .otherwise(acc["rules"])
            .alias("rules"),
        )

    return F.aggregate(kv, init, step)["rules"]


def match_target_expr(url_col: str | Column) -> Column:
    """The string robots rules match against: path (empty → '/') plus
    '?query' when the URL has one; fragments never participate."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    path = F.coalesce(
        F.nullif(F.parse_url(c, F.lit("PATH")), F.lit("")), F.lit("/")
    )
    query = F.parse_url(c, F.lit("QUERY"))
    return F.when(
        query.isNotNull(), F.concat(path, F.lit("?"), query)
    ).otherwise(path)


def blocked_expr(rules_col: Column, target: Column) -> Column:
    """Longest-match verdict over the compiled rules (NULL rules → not
    blocked).  Plain-prefix rules match via startsWith (no regex on the
    hot path); wildcard rules via regexp_like on the compiled pattern.
    array_max over (pattern_length, allow) structs implements
    longest-wins with allow beating disallow on ties."""
    matched = F.filter(
        rules_col,
        lambda r: F.when(r["wild"], F.regexp_like(target, r["re"])).otherwise(
            target.startswith(r["pattern"])
        ),
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["pattern"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return (
        rules_col.isNotNull() & (F.size(matched) > 0) & (best["a"] == F.lit(0))
    )


def robots_text_expr(spans_col) -> Column:
    """Concatenated text spans of the robots document."""
    return F.concat_ws(
        "\n",
        F.transform(
            F.filter(spans_col, lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )


def _robots_requests(pending: DataFrame, robots_cache: DataFrame) -> DataFrame:
    """One row per not-yet-cached host: (host, tpd, _rurl).  The robots
    URL is derived from a representative pending URL's AUTHORITY
    (scheme://host[:port]) rather than the politeness host column —
    the host column strips ports, so a port-bearing crawl surface
    (e.g. a :9090 test server, an :8080 intranet) would otherwise ask
    the wrong origin for robots.txt.  min(url) keeps it deterministic."""
    return (
        pending.groupBy("host")
        .agg(F.min("url").alias("_any_url"), F.min("tpd").alias("tpd"))
        .join(robots_cache.select("host"), on="host", how="left_anti")
        .select(
            "host",
            "tpd",
            F.concat(
                F.regexp_extract("_any_url", r"^(https?://[^/]+)", 1),
                F.lit("/robots.txt"),
            ).alias("_rurl"),
        )
    )


def refresh_robots(
    pending: DataFrame,
    robots_cache: DataFrame,
    pages: DataFrame,
    documents: DataFrame,
    wave: int,
    user_agent: str = "*",
) -> DataFrame:
    """New ROBOTS_CACHE rows for hosts with pending rows but no cache
    entry.  One anti-join on host (distinct hosts, tiny) + one fetch-sim
    join against the web."""
    req = _robots_requests(pending, robots_cache).select(
        "host", F.col("_rurl")
    )

    web = pages.join(documents, on="doc_id", how="left").select(
        F.col("url").alias("_rurl"),
        F.col("status").alias("_status"),
        F.col("spans").alias("_spans"),
    )
    j = req.join(web, on="_rurl", how="left")
    ok = F.col("_status").isNotNull() & F.col("_status").between(200, 299)
    rules = F.when(
        ok, parse_rules_expr(robots_text_expr(F.col("_spans")), user_agent)
    )
    return j.select(
        F.col("host"),
        F.coalesce(rules, F.array().cast(RULES_TYPE)).alias("rules"),
        F.lit(wave).cast("int").alias("fetched_wave"),
    )


def refresh_robots_via(
    pending: DataFrame,
    robots_cache: DataFrame,
    wave: int,
    user_agent: str,
    fetch_fn,
) -> DataFrame:
    """refresh_robots through the pluggable O5 fetcher: when a real
    fetcher is installed (loop.Crawl(fetcher=...)), robots.txt is
    fetched over the actual network instead of the fixture join — same
    anti-join discovery, same parse, same output rows.  Non-2xx (404,
    connection failure) caches an empty rule set, like the sim path."""
    sched = _robots_requests(pending, robots_cache).select(
        F.col("_rurl").alias("url"),
        F.col("_rurl").alias("url_canon"),
        "host",
        "tpd",
        F.lit(0).cast("long").alias("fetch_ms"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("GET").alias("method"),
        F.array(F.col("_rurl")).alias("provenance"),
        F.lit(None)
        .cast("array<struct<name:string,value:string>>")
        .alias("req_headers"),
        F.lit(None).cast("binary").alias("req_entity"),
    )
    fetched = fetch_fn(sched, None, None)
    ok = F.col("status").between(200, 299)
    rules = F.when(
        ok, parse_rules_expr(robots_text_expr(F.col("spans")), user_agent)
    )
    return fetched.select(
        F.col("host"),
        F.coalesce(rules, F.array().cast(RULES_TYPE)).alias("rules"),
        F.lit(wave).cast("int").alias("fetched_wave"),
    )


# scalar twin for the oracle ---------------------------------------------


def py_parse_rules(
    text: str, user_agent: str = "*"
) -> list[tuple[bool, str, bool, str]]:
    """Single-doc twin of parse_rules_expr: [(allow, pattern, wild, re)]."""
    ua = user_agent.lower()

    def spec(v: str) -> int:
        if not v:
            return 0
        if v == "*":
            return 1
        return len(v) + 10 if v.lower() in ua else 0

    kv: list[tuple[str, str]] = []
    for ln in _re.split(r"\r?\n", text or ""):
        ln = _re.sub(r"#.*$", "", ln).strip()
        if ":" in ln:
            k, _, v = ln.partition(":")
            kv.append((k.strip().lower(), v.strip()))
        else:
            kv.append(("", ""))

    cur, inua, best = 1, 0, 1
    for k, v in kv:
        if k == "user-agent":
            cur = max(cur, spec(v)) if inua else spec(v)
            inua, best = 1, max(best, cur)
        elif k != "":
            inua = 0

    out: list[tuple[bool, str, bool, str]] = []
    cur, inua = 1, 0
    for k, v in kv:
        if k in ("allow", "disallow") and v and cur == best:
            anchored = v.endswith("$")
            core = v[:-1] if anchored else v
            esc = _re.sub(r"([.^$+?(){}\[\]|\\])", r"\\\1", core)
            rex = "^" + esc.replace("*", ".*") + ("$" if anchored else "")
            out.append((k == "allow", v, ("*" in v) or anchored, rex))
        if k == "user-agent":
            cur = max(cur, spec(v)) if inua else spec(v)
            inua = 1
        elif k != "":
            inua = 0
    return out


def py_match_target(url: str) -> str:
    """Twin of match_target_expr."""
    parts = urlsplit(url)
    path = parts.path or "/"
    return path + ("?" + parts.query if parts.query else "")


def py_blocked(rules, target: str) -> bool:
    """Twin of blocked_expr.  Accepts (allow, pattern, wild, re) tuples
    or Row-like objects with those fields."""
    best: tuple[int, int] | None = None
    for r in rules or []:
        allow, pattern, wild, rex = (
            (r[0], r[1], r[2], r[3])
            if isinstance(r, (tuple, list))
            else (r["allow"], r["pattern"], r["wild"], r["re"])
        )
        hit = _re.search(rex, target) if wild else target.startswith(pattern)
        if hit:
            key = (len(pattern), 1 if allow else 0)
            if best is None or key > best:
                best = key
    return best is not None and best[1] == 0
