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
  group; a line matches when its token is a case-insensitive PREFIX of
  our PRODUCT TOKEN (the leading letters/hyphens/underscores of the
  configured UA string — RFC 9309 §2.2.1), so ``googlebot`` applies to
  a ``googlebot-news`` crawler but ``crawler`` does NOT capture
  ``sparkcrawler``; ``*`` matches everything at the lowest specificity.
  The most specific (longest) matching token wins; all groups at the
  winning specificity merge.  A matching group with no rules means
  allow-all (a less-specific group is NOT consulted).  Lenient
  extension: rules before any ``User-agent`` line belong to an
  implicit ``*`` group.
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


def _product_token(user_agent: str) -> str:
    """Our crawler's PRODUCT TOKEN (RFC 9309 §2.2.1): the leading run of
    letters/hyphens/underscores of the configured UA string, lowercased
    ('sparkcrawler/1.0 (+info)' → 'sparkcrawler')."""
    m = _re.match(r"[A-Za-z_-]+", user_agent or "")
    return (m.group(0) if m else (user_agent or "")).lower()


def _spec_expr(v: Column, user_agent: str) -> Column:
    """UA-line match specificity: 0 = no match, 1 = '*', 10+len when the
    line's token is a case-insensitive PREFIX of our product token
    (longer = more specific).  Prefix-of-token, not substring-of-UA:
    'User-agent: crawler' written for a bot named Crawler must NOT
    capture a crawler whose token is 'sparkcrawler', while the layered
    matching real crawlers document ('googlebot' applies to
    'googlebot-news') still works."""
    token = _product_token(user_agent)
    return (
        F.when(v == "", F.lit(0))
        .when(v == "*", F.lit(1))
        .when(F.lit(token).startswith(F.lower(v)), F.length(v) + 10)
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


#: clamp parsed Crawl-delay to int32 range (a pathological
#: 'Crawl-delay: 99999999999' must not overflow the cache column)
_CD_INT_MAX = 2**31 - 1


def parse_crawl_delay_expr(text_col: Column, user_agent: str) -> Column:
    """robots.txt body → Crawl-delay of the group applying to
    `user_agent`, in ms (int, null when not declared).  Non-standard
    but widely honored; seconds value may be fractional.  Groups at the
    winning specificity merge like rules do — the MAX (strictest)
    declared delay wins; unparseable values are no-op lines.  Same pure
    JVM fold as parse_rules_expr."""
    kv = _kv_expr(text_col)
    best = best_spec_expr(text_col, user_agent)
    init = F.struct(
        F.lit(1).alias("cur"),
        F.lit(0).alias("inua"),
        F.lit(-1).cast("long").alias("cd"),
    )

    def step(acc, x):
        s = _spec_expr(x["v"], user_agent)
        new_cur, new_inua = _group_step(acc["cur"], acc["inua"], x["k"], s)
        val = F.when(
            x["v"].rlike(r"^[0-9]+(\.[0-9]+)?$"),
            F.ceil(x["v"].cast("double") * 1000).cast("long"),
        )
        take = (
            (x["k"] == F.lit("crawl-delay")) & (acc["cur"] == best) & val.isNotNull()
        )
        return F.struct(
            new_cur.alias("cur"),
            new_inua.alias("inua"),
            F.when(take, F.greatest(acc["cd"], val)).otherwise(acc["cd"]).alias("cd"),
        )

    cd = F.aggregate(kv, init, step)["cd"]
    return (
        F.when(cd >= 0, F.least(cd, F.lit(_CD_INT_MAX).cast("long")))
        .cast("int")
    )


def parse_sitemaps_expr(text_col: Column) -> Column:
    """robots.txt body → array of declared Sitemap URLs, in file order.

    Per sitemaps.org, Sitemap lines are GLOBAL — independent of any
    User-agent group — so this is one filter+transform over the kv
    lines, no group fold.  Values must look absolute (scheme://…);
    anything else is a no-op line (the protocol requires full URLs).
    Pure JVM, fused wherever the caller projects it."""
    kv = _kv_expr(text_col)
    return F.transform(
        F.filter(
            kv,
            lambda x: (x["k"] == F.lit("sitemap"))
            & x["v"].rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
        ),
        lambda x: x["v"],
    )


def py_parse_sitemaps(text: str) -> list[str]:
    """Scalar twin of parse_sitemaps_expr."""
    out = []
    for ln in _re.split(r"\r?\n", text or ""):
        ln = _re.sub(r"#.*$", "", ln).strip()
        if ":" not in ln:
            continue
        k, _, v = ln.partition(":")
        if k.strip().lower() == "sitemap" and _re.match(
            r"[A-Za-z][A-Za-z0-9+.-]*://", v.strip()
        ):
            out.append(v.strip())
    return out


def py_parse_crawl_delay(text: str, user_agent: str = "*") -> int | None:
    """Single-doc twin of parse_crawl_delay_expr (ms or None)."""
    import math

    token = _product_token(user_agent)

    def spec(v: str) -> int:
        if not v:
            return 0
        if v == "*":
            return 1
        return len(v) + 10 if token.startswith(v.lower()) else 0

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

    cd = -1
    cur, inua = 1, 0
    for k, v in kv:
        if k == "crawl-delay" and cur == best and _re.fullmatch(r"[0-9]+(\.[0-9]+)?", v):
            cd = max(cd, math.ceil(float(v) * 1000))
        if k == "user-agent":
            cur = max(cur, spec(v)) if inua else spec(v)
            inua = 1
        elif k != "":
            inua = 0
    return None if cd < 0 else min(cd, _CD_INT_MAX)


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


def latest(robots_cache: DataFrame) -> DataFrame:
    """Latest-wins view of the cache: one row per host, max fetched_wave.

    Only needed under config.robots_ttl_waves — the append-only cache
    then holds one row per host per refetch, and every reader (rule
    split, crawl-delay agg) must see exactly the freshest.  One window
    shuffle over the cache (bounded: hosts × refetches); without a TTL
    the single-row-per-host invariant holds and callers skip this."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy(F.col("fetched_wave").desc())
    return (
        robots_cache.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _robots_requests(
    pending: DataFrame, robots_cache: DataFrame, fresh_after: int | None = None
) -> DataFrame:
    """One row per host with no (fresh) cache entry: (host, tpd, _rurl).
    The robots URL is derived from a representative pending URL's
    AUTHORITY (scheme://host[:port]) rather than the politeness host
    column — the host column strips ports, so a port-bearing crawl
    surface (e.g. a :9090 test server, an :8080 intranet) would
    otherwise ask the wrong origin for robots.txt.  min(url) keeps it
    deterministic.

    fresh_after (config.robots_ttl_waves): a cache row with
    fetched_wave ≤ fresh_after no longer counts as cached — the host is
    re-fetched and the new row supersedes via `latest`."""
    cached = robots_cache
    if fresh_after is not None:
        cached = cached.where(F.col("fetched_wave") > F.lit(fresh_after))
    return (
        pending.groupBy("host")
        .agg(F.min("url").alias("_any_url"), F.min("tpd").alias("tpd"))
        .join(cached.select("host"), on="host", how="left_anti")
        .select(
            "host",
            "tpd",
            F.concat(
                F.regexp_extract("_any_url", r"^(https?://[^/]+)", 1),
                F.lit("/robots.txt"),
            ).alias("_rurl"),
        )
    )


def _resolve_redirect_expr(url: Column, loc: Column) -> Column:
    """Resolve a Location header against the redirecting robots URL:
    absolute passes through, root-relative joins the origin, other
    relatives resolve against '/' (robots.txt always sits at the
    root, so its base directory IS the origin)."""
    origin = F.regexp_extract(url, r"^(https?://[^/]+)", 1)
    t = F.trim(loc)
    return (
        F.when(t.rlike("(?i)^https?://"), t)
        .when(t.startswith("/"), F.concat(origin, t))
        .otherwise(F.concat(origin, F.lit("/"), t))
    )


def _follow_redirects(cur: DataFrame, refetch, max_redirects: int = 5) -> DataFrame:
    """Bounded robots.txt redirect chase (RFC 9309 §2.3.1.2: follow at
    least five consecutive redirects).  `cur` holds one fetched row per
    host with columns (host, tpd, url, status, spans, location); rows
    with 3xx + Location are re-fetched at the resolved target via
    `refetch(host, tpd, url)`; a chain still redirecting after the
    budget stays 3xx (the classifier maps residual 3xx to 'unavailable'
    = allow-all, §2.3.1.3).  Each hop materializes the redirect subset,
    so the common no-redirect case costs one count over ~0 rows; the
    final union is localCheckpoint'ed so robots are fetched exactly
    once and the intermediates can be unpersisted."""
    redir = F.col("status").between(300, 399) & F.col("location").isNotNull()
    persisted: list[DataFrame] = []
    terminal: list[DataFrame] = []
    for _ in range(max_redirects):
        cur = cur.persist()
        persisted.append(cur)
        n = cur.where(redir).count()
        terminal.append(cur.where(~redir))
        if n == 0:
            cur = None
            break
        cur = refetch(
            cur.where(redir).select(
                "host",
                "tpd",
                _resolve_redirect_expr(F.col("url"), F.col("location")).alias(
                    "url"
                ),
            )
        )
    out = terminal[0]
    for t in terminal[1:]:
        out = out.unionByName(t)
    if cur is not None:  # budget exhausted: residual rows, whatever state
        out = out.unionByName(cur)
    out = out.localCheckpoint(eager=True)
    for p in persisted:
        p.unpersist()
    return out


def _rules_from_fetched(fetched: DataFrame, user_agent: str, wave: int) -> DataFrame:
    """Terminal robots responses → ROBOTS_CACHE rows (RFC 9309 §2.3.1):
    2xx parses the matching group's rules; UNREACHABLE (connection
    failure / 5xx) caches complete-disallow — a transiently-down host
    must not be crawled unchecked; everything else (4xx 'unavailable',
    a redirect chain that never terminated, a missing sim page) caches
    allow-all."""
    ok = F.col("status").between(200, 299)
    unreachable = (F.col("status") <= 0) | (F.col("status") >= 500)
    disallow_all = F.array(
        F.struct(
            F.lit(False).alias("allow"),
            F.lit("/").alias("pattern"),
            F.lit(False).alias("wild"),
            F.lit("^/").alias("re"),
        )
    ).cast(RULES_TYPE)
    rules = F.when(
        ok, parse_rules_expr(robots_text_expr(F.col("spans")), user_agent)
    ).when(unreachable, disallow_all)
    crawl_delay = F.when(
        ok, parse_crawl_delay_expr(robots_text_expr(F.col("spans")), user_agent)
    )
    sitemaps = F.when(ok, parse_sitemaps_expr(robots_text_expr(F.col("spans"))))
    return fetched.select(
        F.col("host"),
        F.coalesce(rules, F.array().cast(RULES_TYPE)).alias("rules"),
        crawl_delay.cast("int").alias("crawl_delay_ms"),
        F.coalesce(sitemaps, F.array().cast("array<string>")).alias("sitemaps"),
        F.lit(wave).cast("int").alias("fetched_wave"),
    )


def refresh_robots(
    pending: DataFrame,
    robots_cache: DataFrame,
    pages: DataFrame,
    documents: DataFrame,
    wave: int,
    user_agent: str = "*",
    max_redirects: int = 5,
    fresh_after: int | None = None,
) -> DataFrame:
    """New ROBOTS_CACHE rows for hosts with pending rows but no cache
    entry (or a stale one, under config.robots_ttl_waves — see
    _robots_requests).  One anti-join on host (distinct hosts, tiny) +
    fetch-sim joins against the web (redirect hops re-join the same web
    view)."""
    web = pages.join(documents, on="doc_id", how="left").select(
        F.col("url").alias("_w_url"),
        F.col("status").alias("_w_status"),
        F.col("location").alias("_w_location"),
        F.col("spans").alias("_w_spans"),
    )

    def refetch(req: DataFrame) -> DataFrame:
        return req.join(web, req["url"] == web["_w_url"], "left").select(
            "host",
            "tpd",
            "url",
            F.col("_w_status").alias("status"),
            F.col("_w_spans").alias("spans"),
            F.col("_w_location").alias("location"),
        )

    first = refetch(
        _robots_requests(pending, robots_cache, fresh_after).select(
            "host", "tpd", F.col("_rurl").alias("url")
        )
    )
    return _rules_from_fetched(
        _follow_redirects(first, refetch, max_redirects), user_agent, wave
    )


def refresh_robots_via(
    pending: DataFrame,
    robots_cache: DataFrame,
    wave: int,
    user_agent: str,
    fetch_fn,
    max_redirects: int = 5,
    fresh_after: int | None = None,
) -> DataFrame:
    """refresh_robots through the pluggable O5 fetcher: when a real
    fetcher is installed (loop.Crawl(fetcher=...)), robots.txt is
    fetched over the actual network instead of the fixture join — same
    anti-join discovery, same redirect chase, same RFC classification
    (2xx parse / unreachable disallow-all / unavailable allow-all)."""

    def refetch(req: DataFrame) -> DataFrame:
        sched = req.select(
            "url",
            F.col("url").alias("url_canon"),
            "host",
            "tpd",
            F.lit(0).cast("long").alias("fetch_ms"),
            F.lit(0).cast("long").alias("seq"),
            F.lit("GET").alias("method"),
            F.array(F.col("url")).alias("provenance"),
            F.lit(None)
            .cast("array<struct<name:string,value:string>>")
            .alias("req_headers"),
            F.lit(None).cast("binary").alias("req_entity"),
        )
        return fetch_fn(sched, None, None).select(
            "host", "tpd", "url", "status", "spans", "location"
        )

    first = refetch(
        _robots_requests(pending, robots_cache, fresh_after).select(
            "host", "tpd", F.col("_rurl").alias("url")
        )
    )
    return _rules_from_fetched(
        _follow_redirects(first, refetch, max_redirects), user_agent, wave
    )


# scalar twin for the oracle ---------------------------------------------


#: scalar twin of the classifier's complete-disallow rule set
DISALLOW_ALL_PY = [(False, "/", False, "^/")]


def py_resolve_redirect(url: str, loc: str) -> str:
    """Twin of _resolve_redirect_expr."""
    m = _re.match(r"^(https?://[^/]+)", url)
    origin = m.group(1) if m else ""
    t = (loc or "").strip()
    if _re.match(r"(?i)^https?://", t):
        return t
    if t.startswith("/"):
        return origin + t
    return origin + "/" + t


def py_parse_rules(
    text: str, user_agent: str = "*"
) -> list[tuple[bool, str, bool, str]]:
    """Single-doc twin of parse_rules_expr: [(allow, pattern, wild, re)]."""
    token = _product_token(user_agent)

    def spec(v: str) -> int:
        if not v:
            return 0
        if v == "*":
            return 1
        return len(v) + 10 if token.startswith(v.lower()) else 0

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
    if parts.query:
        return path + "?" + parts.query
    # bare trailing '?' (present but empty query): java parse_url
    # returns '' — not NULL — so the engine target keeps the '?';
    # urlsplit collapses both cases to query='' and must re-check
    return path + "?" if "?" in url.split("#", 1)[0] else path


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
