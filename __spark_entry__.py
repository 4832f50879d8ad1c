"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship: the full crawl wave-loop (frontier →
politeness → fetch-sim → extract → dedup → merge) on the ported
TestHttpServer ring fixture and returns the fetched-documents DataFrame.

``queries()`` / ``oracle_sql()`` carry the operators from SURVEY.md §2
plus the training-data pipeline operators (dedup family / ANN / text
analysis / multimodal plumbing) over the driver's testdata tables;
EVERY query has a value-identical DuckDB oracle (md5-based hashing and
seed-pinned hyperplane literals keep cross-engine determinism; floats
are rounded).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EN_SW = (
    "the a an and or of to in is are was were be been it this that with for on"
).split()
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in EN_SW) + "]"


def _read(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read a bench table; ``spread=True`` adds an ADAPTIVE post-scan
    repartition (guide §2.5 "input skew: one huge unsplittable file ...
    repartition immediately after the read"): a single-file table scans
    as ONE partition (a single parquet row group ignores
    maxPartitionBytes/minPartitionNum splitting), so every expression
    FUSED onto the scan — md5 shingling, minhash signatures, shingle
    tokenizers — runs on one core while the other 31 idle; measured
    2.6 s → 1.3 s for substring_dedup and 4.0 s → 2.1 s for
    ngram_jaccard_dups at sf0.1.  The repartition is decided from the
    scan's ACTUAL partition count, so a production table with >= cores
    splits is untouched and no exchange appears at scale; column
    pruning and predicate pushdown pass through a Repartition node, so
    the exchange carries only the pruned columns.

    It is OPT-IN per query because it is a measured LOSS for everything
    that is not scan-compute-bound: a full A/B over the 56-query
    battery showed light queries pay +0.2-0.9 s each for the extra
    exchange and 32-task scheduling (e.g. shipping_priority 0.63 →
    1.48 s, sessionize 0.50 → 1.04 s) while only the md5/shingle-heavy
    doc-scan queries win."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


# ------------------------------------------------------------------ entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the TestHttpServer ring end-to-end (SURVEY §3.1);
    returns the delivered CrawlItems (fetched docs with span arrays)."""
    from crawler import synth
    from crawler.config import test_config
    from crawler.loop import Crawl

    pages_pd, docs_pd = synth.test_server_fixture()
    root = tempfile.mkdtemp(prefix="crawl_wh_")
    cfg = test_config(seed_url_seen=True, max_waves=14)
    c = Crawl(spark, root, cfg)
    c.init(
        ["http://localhost:9090/crawl/1"],
        synth.pages_df(spark, pages_pd),
        synth.documents_df(spark, docs_pd),
    )
    c.run()
    return (
        c._read("fetched")
        .where(F.col("status").between(200, 399))
        .select("wave", "url", "host", "tpd", "status", "spans", "n_bytes")
        .orderBy("wave", "fetch_ms")
    )


# ---------------------------------------------------------------- queries


def _q_status_filter(spark, sf):
    """F1 StatusCodeFilter semantics: keep the 2xx/3xx band of an int
    column (StatusCodeFilter.scala:10-13)."""
    ev = _read(spark, sf, "events")
    return ev.where(F.col("value").between(200, 399)).select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )


def _q_word_count_top25(spark, sf):
    """P10+A1: the example-app word count with final top-25
    (example-app/Main.scala:40-52,74-78)."""
    docs = _read(spark, sf, "documents", spread=True)
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(25)
    )


def _q_crawl_stats(spark, sf):
    """A2/S9 CrawlStats fold: count + byte sum (CrawlStats.scala:9-14)."""
    docs = _read(spark, sf, "documents")
    return docs.agg(
        F.count("*").alias("num_fetched"),
        F.sum("n_chars").cast("long").alias("num_bytes_fetched"),
    )


def _q_url_kernel(spark, sf):
    """P4 canonicalize + P6 host/tpd over synthesized URLs."""
    from crawler import urlnorm

    docs = _read(spark, sf, "documents")
    url = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example.com/d/"),
        F.col("doc_id").cast("string"), F.lit("/#frag"),
    )
    d = docs.select("doc_id", url.alias("url"))
    host = urlnorm.host_expr("url")
    return d.select(
        "doc_id",
        urlnorm.canonicalize_expr("url").alias("url_canon"),
        host.alias("host"),
        urlnorm.tpd_expr(host).alias("tpd"),
    )


def _q_tpd_extract(spark, sf):
    """P6 full PSL rule engine (crawler/psl.py, urlnorm.tpd_expr):
    hosts synthesized per doc to cover every rule class — exact TLD,
    two-label suffix, deep 4-label suffix (pvt.k12.ma.us), wildcard
    (*.ck), exception (!www.ck), private suffixes (s3.amazonaws.com,
    github.io), and a host that IS a public suffix ('notpd').  The
    oracle states the EXPECTED registrable domain per template, so the
    engine's longest-match/wildcard/exception logic is what's checked
    (reference parity: Guava InternetDomainName.topPrivateDomain,
    Requests.scala:50-53)."""
    from crawler import urlnorm

    docs = _read(spark, sf, "documents")
    k = F.col("doc_id").cast("string")
    m = F.pmod(F.col("doc_id"), F.lit(8))
    host = (
        F.when(m == 0, F.concat(F.lit("www.site"), k, F.lit(".com")))
        .when(m == 1, F.concat(F.lit("a.b.site"), k, F.lit(".co.uk")))
        .when(m == 2, F.concat(F.lit("h"), k, F.lit(".pvt.k12.ma.us")))
        .when(m == 3, F.concat(F.lit("foo"), k, F.lit(".bar"), k, F.lit(".ck")))
        .when(m == 4, F.lit("www.ck"))
        .when(m == 5, F.concat(F.lit("b"), k, F.lit(".s3.amazonaws.com")))
        .when(m == 6, F.concat(F.lit("sub.site"), k, F.lit(".github.io")))
        .otherwise(F.concat(F.lit("bar"), k, F.lit(".ck")))
    )
    d = docs.select("doc_id", host.alias("host"))
    return d.select("doc_id", "host", urlnorm.tpd_expr(F.col("host")).alias("tpd"))


def _q_robots_eval(spark, sf):
    """RFC-9309 robots engine (crawler/robots.py) driver-checked: eight
    robots.txt templates synthesized per doc exercise UA-group selection
    by specificity (specific beats '*', matching group with only
    non-path directives = allow-all), Allow/Disallow longest-match with
    allow winning length ties, '*' wildcards, '$' anchors, the implicit
    leading-'*' group, and case/comment lenience.  The body is PARSED by
    the real JVM fold (parse_rules_expr) and matched by the real verdict
    expression (blocked_expr over match_target_expr); the oracle states
    the closed-form EXPECTED verdict per template, so a hash match
    proves the engine reproduces RFC-9309 semantics on the grid."""
    from crawler import robots

    docs = _read(spark, sf, "documents")
    k = F.col("doc_id").cast("string")
    p = F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
    m = F.pmod(F.col("doc_id"), F.lit(8))
    url = F.concat(
        F.lit("http://h"), k, F.lit(".example.com/sec"), p, F.lit("/page"), k,
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.concat(F.lit("?q="), p))
        .otherwise(F.lit("")),
    )
    body = (
        # m=0: plain prefix rules in a '*' group
        F.when(m == 0, F.lit("User-agent: *\nDisallow: /sec0\nDisallow: /sec1"))
        # m=1: specific group beats '*' (the '*' Disallow:/ must NOT apply)
        .when(m == 1, F.lit(
            "User-agent: *\nDisallow: /\nUser-agent: crawlerbot\nDisallow: /sec3"
        ))
        # m=2: longest-match precedence (Allow len 10 beats Disallow len 4)
        .when(m == 2, F.lit("User-agent: *\nDisallow: /sec\nAllow: /sec2/page"))
        # m=3: '*' wildcard (blocks any target with a query string)
        .when(m == 3, F.lit("User-agent: crawlerbot\nDisallow: /*?"))
        # m=4: '$' anchor — exact-path block only
        .when(m == 4, F.concat(
            F.lit("User-agent: *\nDisallow: /sec2/page"), k, F.lit("$")
        ))
        # m=5: matching group with only a non-path directive = allow-all;
        # the less-specific '*' group (Disallow:/) is NOT consulted
        .when(m == 5, F.lit(
            "User-agent: crawlerbot\nCrawl-delay: 5\n\nUser-agent: *\nDisallow: /"
        ))
        # m=6: implicit leading-'*' group + equal-length tie → Allow wins
        .when(m == 6, F.lit("Disallow: /sec4\nAllow: /sec4\nDisallow: /sec0"))
        # m=7: case-insensitive directives/UA token + trailing comments
        .otherwise(F.concat(
            F.lit("# robots\nUsEr-AgEnT: CrAwLeRbOt\nDiSaLlOw: /sec"),
            F.pmod(F.col("doc_id"), F.lit(2)).cast("string"),
            F.lit("  # trailing"),
        ))
    )
    d = docs.select(
        "doc_id",
        m.cast("int").alias("tmpl"),
        robots.match_target_expr(url).alias("target"),
        body.alias("_body"),
    )
    rules = robots.parse_rules_expr(F.col("_body"), "crawlerbot")
    return d.select(
        "doc_id",
        "tmpl",
        "target",
        robots.blocked_expr(rules, F.col("target")).alias("blocked"),
    )


def _q_provenance_cap(spark, sf):
    """withProvenance: append + keep last 10 (Requests.scala:62-65)."""
    from crawler import urlnorm

    docs = _read(spark, sf, "documents")
    prov = F.split("text", " ")
    capped = urlnorm.provenance_expr(prov, F.col("source"), 10)
    return docs.select(
        "doc_id",
        F.size(capped).alias("prov_len"),
        F.md5(F.concat_ws("|", capped)).alias("prov_md5"),
    )


def _q_dedup_exact(spark, sf):
    from crawler.textops import exact_dedup

    return exact_dedup(_read(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long"))
    ).select("text_md5", "doc_id", "n_copies")


def _q_dedup_first_wins(spark, sf):
    """F2's first-wins as a windowed batch op: earliest event per user."""
    from pyspark.sql.window import Window

    ev = _read(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_id", "event_type")
    )


def _q_minhash_words(spark, sf):
    """Word-level MinHash signature (4 hashes) — md5 keeps both engines
    value-identical; lexicographic min over hex digests."""
    docs = _read(spark, sf, "documents")
    toks = F.array_distinct(F.split(F.lower("text"), " "))

    def mh(i: int):
        # NB: a two-arg lambda would make F.transform pass the array
        # INDEX as the second arg — bind the seed via closure instead
        prefix = f"{i}|"
        return F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(prefix), t)))
        ).alias(f"mh{i}")

    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), *[mh(i) for i in range(4)]
    )


def _q_simhash(spark, sf):
    """SimHash fingerprints: JVM md5 token hashing + vectorized numpy
    bit-vote, reported as two unsigned 32-bit halves so the DuckDB
    oracle (pure SQL bit-vote over the same md5 halves) can reproduce
    the values without signed-64 overflow games."""
    from crawler.textops import simhash64_expr

    docs = _read(spark, sf, "documents")
    sim = simhash64_expr("text")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.shiftrightunsigned(sim, 32).alias("sim_hi"),
        sim.bitwiseAND(F.lit(0xFFFFFFFF)).alias("sim_lo"),
    )


def _q_simhash_dups(spark, sf):
    """SimHash near-dup PAIRS — the scale path driver-checked end to
    end: pigeonhole 16-bit-chunk blocking (any pair with hamming ≤ 3 on
    a 64-bit hash shares an exact chunk) → bit_count(xor) verify on the
    colliding pairs only.  Never all-pairs; mirrors
    crawler.textops.simhash_dedup over the hi/lo halves the SQL oracle
    can reproduce exactly."""
    from crawler.textops import simhash64_expr

    docs = _read(spark, sf, "documents", spread=True)
    # ONE sim column per doc (a single ArrowEvalPython evaluation);
    # chunks and hamming derive from it JVM-side — splitting into hi/lo
    # first would evaluate the bit-vote UDF twice per side
    # simhash64_expr is provably non-null (coalesce inside), so the
    # join's isnotnull(chunk) pushdown folds away instead of re-deriving
    # the UDF in a Filter — one bit-vote evaluation per side
    # persist(): the self-join references this subtree from BOTH sides
    # (spread probe + broadcast build), and Catalyst does not dedupe
    # shared subplans — without the cache the md5 token hashing and the
    # Python bit-vote hop run twice over the corpus (guide §4: the
    # JVM↔Python boundary is the expensive part of this query; the
    # cached table is 2 longs/doc)
    h = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        simhash64_expr("text").alias("sim"),
    ).persist()
    # explode plain chunk ids FIRST (the Generate node is a projection-
    # collapse barrier), then derive the chunk value from the already-
    # computed sim column — otherwise collapse inlines sim's UDF into
    # each of the 4 chunk expressions and it evaluates multiple times
    chunks = h.select(
        "doc_id",
        "sim",
        F.explode(F.array(*[F.lit(c) for c in range(4)])).alias("chunk_id"),
    ).withColumn(
        "chunk",
        F.expr("shiftrightunsigned(sim, chunk_id * 16)")
        .bitwiseAND(F.lit(0xFFFF))
        .cast("long"),
    )
    from crawler.textops import spread

    a, b = spread(chunks, "doc_id").alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).cast("int")

    # first-colliding-chunk-wins: a pair sharing several chunks (near-
    # identical docs share all 4) is kept ONLY at its lowest shared
    # chunk_id — duplicates are rejected inside the join instead of by a
    # distinct() exchange over the 4×-inflated pair stream
    def _chunk_at(side: str, c: int):
        return F.shiftrightunsigned(F.col(f"{side}.sim"), c * 16).bitwiseAND(
            F.lit(0xFFFF)
        )

    first_chunk = F.lit(True)
    for c in range(3):
        first_chunk = first_chunk & (
            (F.col("chunk_id") <= F.lit(c)) | (_chunk_at("a", c) != _chunk_at("b", c))
        )
    return (
        a.join(b, on=["chunk_id", "chunk"])
        .where((F.col("a.doc_id") < F.col("b.doc_id")) & first_chunk)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )


#: MinHash/LSH banding parameters shared by the Spark query and the
#: DuckDB oracle (word-level signatures; md5 hex-string min keeps both
#: engines value-identical — fixed-width lowercase hex orders like the
#: numeric value).  4 rows/band keeps bucket collision selective enough
#: that near-dup clusters don't explode the candidate join.
_LSH_HASHES = 16
_LSH_BANDS = 4


def _lsh_candidate_pairs(spark, sf):
    """Banded-LSH candidate pairs: equal md5-signature band slice →
    same bucket → pair.  The self-join is keyed on (band, bucket) —
    never an all-pairs cross join; this IS the scale path."""
    rows = _LSH_HASHES // _LSH_BANDS
    docs = _read(spark, sf, "documents", spread=True)
    toks = F.array_distinct(F.split(F.lower("text"), " "))

    def mh(i: int):
        prefix = f"{i}|"  # closure-bound (two-arg lambda would rebind)
        return F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(prefix), t)))
        ).alias(f"mh{i}")

    sigs = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[mh(i) for i in range(_LSH_HASHES)],
    )
    # each bucket row carries the doc's FULL band-key array: a pair
    # colliding in several bands is then rejected inline at every band
    # but its lowest (same first-colliding-chunk-wins trick as
    # simhash_dups), so the join emits each candidate pair EXACTLY ONCE
    # and the 11M-row pre-distinct stream + its exchange disappear
    # (guide §2.4 "remove shuffles outright"); downstream consumers
    # also inherit pairs that are distinct BY CONSTRUCTION (a < b, one
    # row per pair), which lets dedup_clusters skip its canonicalize
    # exchange.  Band keys are folded to fixed-width xxhash64 longs
    # (guide §2.3 narrower types): the hot self-join's build rows and
    # its ~11M emitted rows carry 4×8 B instead of 4×131 B of md5
    # strings — an order of magnitude less transient allocation on the
    # quadratic emit path.  A band-hash collision merely admits a
    # spurious candidate into the exact-Jaccard verify (or dedups a
    # pair against a non-identical band) at p ≈ 2^-64 per comparison —
    # the same negligible-collision budget the 60-bit shingle hashes
    # already document.
    band_keys = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
                )
            )
            for b in range(_LSH_BANDS)
        ]
    )
    buckets = sigs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(b) for b in range(_LSH_BANDS)])).alias("band"),
        band_keys.alias("bands"),
    ).withColumn("bucket", F.col("bands")[F.col("band")])
    from crawler.textops import spread

    # probe side spread across tasks: the build side broadcasts, so
    # without this the hot buckets' quadratic emit runs in ~one task
    a, b = spread(buckets, "doc_id").alias("a"), buckets.alias("b")
    first_band = F.lit(True)
    for c in range(_LSH_BANDS - 1):
        first_band = first_band & (
            (F.col("band") <= F.lit(c))
            | (F.col("a.bands")[c] != F.col("b.bands")[c])
        )
    return (
        a.join(b, on=["band", "bucket"])
        .where((F.col("a.doc_id") < F.col("b.doc_id")) & first_band)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


def _q_ngram_jaccard_dups(spark, sf):
    """Near-dup verification over LSH candidates (the scale path:
    minhash-band blocking → exact Jaccard only on colliding pairs —
    the full corpus is never n²-joined)."""
    pairs = _lsh_candidate_pairs(spark, sf)
    docs = _read(spark, sf, "documents", spread=True)
    # set SIZE projected once per doc; per pair only ONE set traversal
    # (intersect) remains — |a ∪ b| = |a| + |b| - |a ∩ b|, exactly the
    # formula the DuckDB oracle uses (array ops are interpreted, so a
    # second union traversal per pair is pure waste).  Shingles are
    # hashed to 60-bit longs ONCE per doc (JVM md5) so the per-pair
    # intersect compares/hashes fixed-width longs, not strings — the
    # oracle hashes identically, so collision behavior (negligible at
    # 2^60) is bit-identical on both sides.
    sh = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_distinct(
            F.transform(
                F.split(F.lower("text"), " "),
                lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"),
            )
        ).alias("sh"),
    ).withColumn("n", F.size("sh"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                      F.col("n").alias("n_a")), "doc_a"
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                      F.col("n").alias("n_b")), "doc_b"
        )
        .select(
            "doc_a", "doc_b",
            F.round(
                inter / (F.col("n_a") + F.col("n_b") - inter).cast("double"), 4
            ).alias("jaccard"),
        )
        .where("jaccard >= 0.5")
    )


def _q_knn_cosine(spark, sf):
    """Brute-force cosine top-10 vs the vec_id=0 embedding (double math,
    rounded for cross-engine stability)."""
    emb = _read(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    from crawler.textops import cosine_expr, dlit_array

    qc = dlit_array(q)
    return (
        emb.where("vec_id != 0")
        .select(
            "vec_id", F.round(cosine_expr(F.col("embedding"), qc), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _q_knn_lsh(spark, sf):
    """Multi-probe LSH-bucketed ANN (scale path): deterministic
    hyperplanes (seed 42) shared with the DuckDB oracle; probes the
    query bucket plus the 2 lowest-|margin| Hamming-1 buckets (Lv et
    al. 2007), cosine rounded for cross-engine stability."""
    from crawler.textops import knn_lsh_bucketed

    emb = _read(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    out = knn_lsh_bucketed(emb.where("vec_id != 0"), q, k=10, n_planes=6, n_probes=3)
    return out.select("vec_id", F.round("cos_sim", 6).alias("cos_sim"))


def _q_dedup_embedding(spark, sf):
    """Embedding-cosine near-dup pairs via banded hyperplane LSH (12
    planes, 3 bands of 4 bits) + exact cosine verify at ≥ 0.42 — the
    embedding member of the dedup family; candidates are band-bucket
    collisions, never all-pairs."""
    from crawler.textops import embedding_neardup_pairs

    emb = _read(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    return embedding_neardup_pairs(emb, threshold=0.42, n_planes=12, n_bands=3)


def _q_knn_ivf(spark, sf):
    """IVF-flat ANN: deterministic sampled centroids (vec_id 1..8),
    nprobe=2 nearest cells scanned, exact cosine within — the
    inverted-file scale path next to the LSH one."""
    from crawler.textops import knn_ivf

    emb = _read(spark, sf, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
    return knn_ivf(emb.where("vec_id != 0"), q, k=10, n_cells=8, n_probe=2)


def _q_langid(spark, sf):
    docs = _read(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    sw = F.array(*[F.lit(w) for w in EN_SW])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.greatest(
        F.size(toks), F.lit(1)
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def _q_quality(spark, sf):
    docs = _read(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    n = F.greatest(F.size(toks), F.lit(1))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z ]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.round(F.least(n / F.lit(100.0), F.lit(1.0)) * 0.5 + alpha * 0.5, 6).alias(
            "quality"
        ),
    )


def _q_token_counts(spark, sf):
    docs = _read(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.lower("text"), " ")).alias("ws_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("subword_est"),
    )


def _q_fingerprint(spark, sf):
    docs = _read(spark, sf, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.substring(norm, 1, 64)).alias("fp_prefix"),
        F.floor(F.length("text") / 256).cast("long").alias("len_bucket"),
    )


def _q_curate_corpus(spark, sf):
    """The end-to-end training-data curation pipeline as ONE declarative
    plan: language gate (stopword-ratio en) → quality gate (≥ 0.6) →
    exact-dedup first-wins (min doc_id per md5(text)).  Composition of
    the individually-verified langid/quality/dedup stages; Catalyst
    fuses the gates into the scan and the dedup is one shuffle on the
    16-byte fingerprint — the shape a 100 TB curation job wants."""
    docs = _read(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")
    sw = F.array(*[F.lit(w) for w in EN_SW])
    swr = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.greatest(
        F.size(toks), F.lit(1)
    )
    n = F.greatest(F.size(toks), F.lit(1))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z ]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    quality = F.round(F.least(n / F.lit(100.0), F.lit(1.0)) * 0.5 + alpha * 0.5, 6)
    kept = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("fp"),
        F.size(toks).alias("n_tokens"),
        quality.alias("quality"),
        swr.alias("swr"),
    ).where((F.col("swr") >= 0.08) & (F.col("quality") >= 0.6))
    first = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return kept.join(first, ["fp", "doc_id"]).select("doc_id", "n_tokens", "quality")


def _q_pricing_summary(spark, sf):
    """Catalyst agg coverage (partial+final, multiple measures)."""
    li = _read(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _q_top_revenue_nations(spark, sf):
    """Broadcast-join coverage: orders ⋈ customer ⋈ nation, top by rev."""
    o = _read(spark, sf, "orders")
    c = _read(spark, sf, "customer")
    n = _read(spark, sf, "nation")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
        .limit(10)
    )


def _q_events_window(spark, sf):
    """Window-function coverage: latest event per user with running count."""
    from pyspark.sql.window import Window

    ev = _read(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_id", "event_type")
    )


def _q_media_features(spark, sf):
    """Multimodal plumbing (mapInPandas over opaque refs, deterministic
    fake decode — md5-derived features); the DuckDB oracle reproduces
    the same bytes from md5 hex, so the whole pipeline is value-checked."""
    from crawler.textops import media_features

    docs = _read(spark, sf, "documents").where("doc_id < 500")
    refs = docs.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref")
    )
    out = media_features(refs)
    return out.select(
        "media_ref", "kind", "n_bytes",
        *[F.round(F.col("feature")[i], 6).alias(f"f{i}") for i in range(4)],
    )


def _q_media_decode(spark, sf):
    """REAL binary decode: md5-stream SIMG payloads → numpy
    frombuffer/reshape decode (textops.media_decode_features) → pixel
    statistics.  The DuckDB oracle recomputes the same statistics from
    the md5 hex stream, value-checking the decode end-to-end."""
    from crawler.synth import md5_image_blobs
    from crawler.textops import media_decode_features

    docs = _read(spark, sf, "documents").where("doc_id < 100")
    refs = docs.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref")
    )
    out = media_decode_features(md5_image_blobs(refs))
    return out.select(
        "media_ref", "width", "height", "channels", "n_pixel_bytes",
        F.round("mean", 6).alias("mean"),
        F.round("std", 6).alias("std"),
    )


_MEDIA_DECODE_ORACLE = """
    WITH refs AS (
      SELECT 'img://' || CAST(doc_id AS VARCHAR) AS media_ref
      FROM documents WHERE doc_id < 100
    ),
    dims AS (
      SELECT media_ref,
             8 + (('0x' || substr(md5(media_ref), 1, 2))::INT % 25) AS w,
             8 + (('0x' || substr(md5(media_ref), 3, 2))::INT % 25) AS h
      FROM refs
    ),
    px AS (
      SELECT media_ref, w, h,
             ('0x' || substr(md5(media_ref || ':' || CAST((i.i // 16) AS VARCHAR)),
                             ((i.i % 16) * 2) + 1, 2))::INT AS b
      FROM dims, LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS i) i
    )
    SELECT media_ref, w AS width, h AS height, 3 AS channels,
           CAST(w * h * 3 AS BIGINT) AS n_pixel_bytes,
           round(avg(b), 6) AS mean,
           round(stddev_pop(b), 6) AS std
    FROM px GROUP BY media_ref, w, h
"""


def _q_gopher_repetition(spark, sf):
    """Gopher-style repetition gates (Rae et al. 2021 App. A, token
    variant): repeated-bigram fraction + top-bigram share per doc, with
    the keep/drop verdict.  Distinct-fraction is pure JVM array math in
    the scan's project; the exact top-share mode is one well-keyed
    explode+count shuffle (see crawler/textops.py repetition_stats)."""
    from crawler.textops import repetition_stats

    return repetition_stats(_read(spark, sf, "documents"))


# ------------- link-graph analytics (crawler/graph.py) -------------


def _graph_edges(spark, sf, with_nodes: bool = False):
    from crawler import graph

    docs = _read(spark, sf, "documents")
    n = docs.count()
    edges = graph.synth_edges(docs, n)
    if with_nodes:
        # every doc_id IS a src in the synthesized graph (each doc
        # emits >= 2 out-edges), so the node set == the doc_id column —
        # callers can skip re-deriving it from the edge list
        nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
        return edges, nodes, n
    return edges


def _q_link_stats(spark, sf):
    """Per-document link statistics over the deterministic synthesized
    link graph (crawler/graph.py synth_edges — the oracle states the
    same closed-form dst formula): out-degree / in-degree per doc.
    Two map-side-combined aggregates + one full-outer join on the node
    id.  No reference analog (the reference has no graph analytics);
    training-pipeline extension."""
    from crawler import graph

    return graph.link_stats(_graph_edges(spark, sf)).select(
        F.col("node").alias("doc_id"), "outdeg", "indeg"
    )


def _q_pagerank(spark, sf):
    """Fixed-iteration PageRank (5 rounds, d=0.85, rank rounded to 9dp
    after EVERY round so cross-engine float drift cannot compound) over
    the synthesized link graph; top-50 by rounded rank, doc_id
    tie-break.  The DuckDB oracle unrolls the same five iterations term
    for term (Brin & Page 1998; no-dangling-mass variant — the
    synthesized graph gives every node out-links)."""
    from crawler import graph

    edges, nodes, n = _graph_edges(spark, sf, with_nodes=True)
    pr = graph.pagerank(edges, n_iter=5, damping=0.85, iter_dp=9,
                        n_nodes=n, nodes=nodes)
    return (
        pr.select(
            F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(50)
    )


def _q_dedup_clusters(spark, sf):
    """The last step of the dedup story: resolve the VERIFIED near-dup
    pairs (ngram_jaccard_dups: banded-LSH candidates -> exact Jaccard
    >= 0.5) into clusters via alternating large-star/small-star
    connected components (Kiveris et al. 2014), pick the canonical
    representative = min doc_id, attach the cluster size.  The >= 0.5
    pair relation is NOT transitive (A~B and B~C can hold with A~C
    below threshold), so this is genuine component resolution, not a
    groupBy — the DuckDB oracle computes the same components by
    recursive transitive closure."""
    from crawler import graph

    pairs = _q_ngram_jaccard_dups(spark, sf).select("doc_a", "doc_b")
    # the LSH pair stream is (doc_a < doc_b), one row per pair BY
    # CONSTRUCTION (first-band-wins join) — skip the canonicalize
    # distinct, which at sf0.1 re-exchanged all 5.9M pairs
    comp = graph.connected_components(
        pairs, a="doc_a", b="doc_b", assume_canonical=True
    )
    sizes = comp.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "rep").select(
        F.col("node").alias("doc_id"), "rep", "cluster_size"
    )


# ------------- corpus curation part 2 + event analytics (round 3b)


def _q_paragraph_dedup(spark, sf):
    """CCNet-style corpus-level paragraph dedup (Wenzek et al. 2019):
    first occurrence of each paragraph wins corpus-wide, documents
    reassembled from survivors.  Two shuffles — first-wins window on
    md5(para), groupBy(doc_id) reassembly with within-doc array_sort
    (no global sort).  See crawler/textops.paragraph_dedup."""
    from crawler.textops import paragraph_dedup

    return paragraph_dedup(_read(spark, sf, "documents"), width=10)


def _q_decontaminate(spark, sf):
    """Benchmark decontamination: training docs sharing any word-3-gram
    with the held-out eval slice (doc_id % 97 == 0), with the distinct
    overlapping-shingle count.  The eval side reduces to distinct
    shingles (small by construction → AQE broadcasts it); the train
    side streams map-side.  See crawler/textops.contamination."""
    from crawler.textops import contamination

    docs = _read(spark, sf, "documents", spread=True)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    return contamination(train, bench, shingle_n=3)


def _q_stratified_sample(spark, sf):
    """Deterministic stratified sample (20 docs per language) ranked by
    seeded md5 — no rand(), reproducible cross-engine.  Runs the salted
    two-phase top-k (textops.topk_per_group): the plain row_number()
    oracle twin proves the salted prune lossless."""
    from crawler.textops import stratified_sample

    return stratified_sample(_read(spark, sf, "documents"), "lang", k=20)


def _q_tfidf_top(spark, sf):
    """Top-5 characteristic terms per source by tf/df (log-free idf:
    one IEEE division ranks identically in every engine; ln() is a
    last-ulp landmine near rank boundaries).  tf agg → df agg → join →
    salted two-phase top-k.  See crawler/textops.tfidf_top_terms."""
    from crawler.textops import tfidf_top_terms

    return tfidf_top_terms(_read(spark, sf, "documents"), k=5)


#: 6h inactivity gap (microseconds) — sized to the synthetic events
#: stream's per-user median gap (~7h) so sessions genuinely merge+split.
_SESSION_GAP_US = 6 * 3600 * 1_000_000


def sessionize(events: DataFrame, gap_us: int = _SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inactivity exceeds `gap_us` (the classic lag → new-session flag →
    running sum).  One window shuffle on user_id; totals sum in
    decimal(18,4) because double summation order is engine- and
    partition-dependent.  The events table stores TIMESTAMP_NTZ; the
    session TZ is pinned UTC (session.py), so casting to TIMESTAMP
    keeps the wall clock and unix_micros == DuckDB's epoch_us."""
    from pyspark.sql.window import Window

    events = events.withColumn("_us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("_us") - F.lag("_us").over(w)
    new_s = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    run = events.withColumn(
        "session_seq",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return run.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
        ).alias("total_value"),
    )


def _q_sessionize(spark, sf):
    return sessionize(_read(spark, sf, "events"))


def _q_kmeans(spark, sf):
    """Fixed-iteration spherical k-means over the embeddings table
    (textops.kmeans_spherical): 3 Lloyd rounds from deterministic seed
    centroids, exact fixed-point centroid means, 6dp-rounded cosine
    assignment.  The DuckDB oracle unrolls all three rounds term for
    term (the pagerank playbook) — assignment, centroid recompute and
    the empty-cluster keep-old rule included."""
    from crawler.textops import kmeans_spherical

    return kmeans_spherical(_read(spark, sf, "embeddings"), k=8, n_iter=3)


def _kmeans_oracle_sql(
    k: int = 8, n_iter: int = 3, dim: int = 64, final_select: str | None = None
) -> str:
    """Unrolled SQL twin of kmeans_spherical: per round an assignment
    CTE (row_number over rounded cosine, ties to the lowest cluster)
    and a centroid CTE (exact BIGINT fixed-point sums → one double
    division; empty clusters coalesce to the previous round's
    centroid), then a final assignment."""
    def cos(v, c):
        return (
            f"round(list_dot_product({v}, {c}) / "
            f"(sqrt(list_dot_product({v}, {v})) * "
            f"sqrt(list_dot_product({c}, {c}))), 6)"
        )

    def assign(r, prev):
        return f"""
        a{r} AS (
          SELECT vec_id, v, cluster, cos FROM (
            SELECT vec_id, v, cluster, cos,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, cluster ASC) AS rn
            FROM (SELECT e.vec_id, e.v, c.cluster,
                         {cos('e.v', 'c.cent')} AS cos
                  FROM e, {prev} c) _x{r}) _y{r}
          WHERE rn = 1
        )"""

    def cents(r):
        terms = ", ".join(
            f"sum(CAST(round(v[{i + 1}] * 1000000) AS BIGINT))"
            f" / (count(*) * 1000000.0)"
            for i in range(dim)
        )
        return f"""
        n{r} AS (SELECT cluster, [{terms}] AS cent FROM a{r} GROUP BY cluster),
        c{r} AS (SELECT p.cluster, coalesce(n.cent, p.cent) AS cent
                 FROM c{r - 1} p LEFT JOIN n{r} n USING (cluster))"""

    parts = [
        f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        c0 AS (SELECT vec_id AS cluster, v AS cent FROM e
               WHERE vec_id BETWEEN 1 AND {k})"""
    ]
    for r in range(1, n_iter + 1):
        parts.append("," + assign(r, f"c{r - 1}"))
        parts.append("," + cents(r))
    parts.append("," + assign(n_iter + 1, f"c{n_iter}"))
    if final_select is None:
        final_select = f"\nSELECT vec_id, cluster, cos FROM a{n_iter + 1}"
    parts.append(final_select)
    return "".join(parts)


def _semdedup_oracle_sql(
    k: int = 8, n_iter: int = 3, dim: int = 64, tau: float = 0.35
) -> str:
    """SemDeDup twin: the unrolled k-means CTE chain (shared with the
    ``kmeans`` oracle term for term), then within-cluster pairs at
    6dp-rounded cosine ≥ tau, loser = higher centroid-cos (tie: higher
    vec_id), keep = never a loser."""
    n = n_iter + 1
    final = f"""
        , km AS (SELECT vec_id, v, cluster, cos FROM a{n}),
        p AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 a.cos AS a_cos, b.cos AS b_cos
          FROM km a JOIN km b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.v, b.v) /
                      (sqrt(list_dot_product(a.v, a.v)) *
                       sqrt(list_dot_product(b.v, b.v))), 6) >= {tau}
        ),
        d AS (
          SELECT DISTINCT CASE WHEN a_cos > b_cos
                                 OR (a_cos = b_cos AND a_id > b_id)
                               THEN a_id ELSE b_id END AS vec_id
          FROM p
        )
        SELECT km.vec_id, km.cluster, km.cos,
               (d.vec_id IS NULL) AS keep
        FROM km LEFT JOIN d ON km.vec_id = d.vec_id"""
    return _kmeans_oracle_sql(k=k, n_iter=n_iter, dim=dim, final_select=final)


def _q_semdedup(spark, sf):
    """Semantic dedup over embeddings (SemDeDup, Abbas et al. 2023):
    k-means bounds the pair search to within-cluster blocks, cosine ≥
    tau flags a dup pair, the member closer to its centroid loses
    (keep the outlier).  See crawler/textops.semdedup (plan notes).
    The oracle reuses the kmeans unrolled CTE chain term for term."""
    from crawler.textops import semdedup

    return semdedup(_read(spark, sf, "embeddings"), k=8, n_iter=3, tau=0.35)


def _q_substring_dedup(spark, sf):
    """Exact-substring dedup (Lee et al. 2021 ExactSubstr semantics at
    word-5-gram window granularity): docs sharing any exact window with
    an earlier doc, via a hashed-window inverted index — the
    distributed stand-in for the paper's single-machine suffix array.
    See crawler/textops.exact_substring_dedup (plan notes there)."""
    from crawler.textops import exact_substring_dedup

    return exact_substring_dedup(_read(spark, sf, "documents", spread=True), n=5)


def _q_anchor_stats(spark, sf):
    """Anchor-text aggregation per link target (the web-graph signal
    anchor-text corpora collect; companion to RequestExtractor.scala's
    href extraction — here the ANCHOR TEXT rides along).  Documents are
    rendered to well-formed HTML covering all three href quoting forms,
    a nested tag + an entity in the anchor text, and comment/script
    decoys that a DOM parse must NOT extract; the REAL tokenizer UDF
    (crawler/extract.find_links_udf) does the extraction and the oracle
    states the expected links closed-form — so strip + tag-scan +
    attribute-walk + Element.text() semantics are all value-checked.
    Scale: extraction is one Arrow pass fused into the scan; then one
    (href, anchor) count agg, a salt-free top-1 window over the per-href
    anchor counts (group = distinct anchors of one target, bounded), and
    one href agg — the n² pair structure of a web graph never appears."""
    from crawler.extract import find_links_udf

    docs = _read(spark, sf, "documents")
    k = F.col("doc_id")
    w = F.split(F.lower("text"), " ")

    def tgt(i):
        return F.concat(
            F.lit("http://site"), ((k * 7 + i) % 40).cast("string"),
            F.lit(".example.com/p/"), ((k + i) % 100).cast("string"),
        )

    # null-safe word pick (F.get, not element_at: ANSI mode throws on an
    # out-of-range index; a <3-word doc must degrade, not crash) — the
    # SQL twin coalesces identically
    def word(i):
        return F.coalesce(F.get(w, i), F.lit("w"))

    seg0 = F.concat(
        F.lit('<a href="'), tgt(0), F.lit('"><b>'), word(0),
        F.lit("</b> page "), (k % 100).cast("string"), F.lit("</a>"),
    )
    seg1 = F.when(
        k % 3 >= 1,
        F.concat(
            F.lit("<a href='"), tgt(1), F.lit("'>"), word(1),
            F.lit(" page "), ((k + 1) % 100).cast("string"), F.lit("</a>"),
        ),
    ).otherwise(F.lit(""))
    seg2 = F.when(
        k % 3 >= 2,
        F.concat(
            F.lit("<a href="), tgt(2), F.lit(">"), word(2),
            F.lit(" &amp; "), ((k + 2) % 100).cast("string"), F.lit("</a>"),
        ),
    ).otherwise(F.lit(""))
    decoys = F.lit(
        '<!--<a href="http://dead.example.com/x">dead</a>-->'
        '<script>var a = "<a href=\\"http://js.example.com/y\\">js</a>";'
        "</script>"
    )
    html_col = F.concat(
        F.lit("<html><body>"), decoys, seg0, seg1, seg2, F.lit("</body></html>")
    )
    # links feeds BOTH the per-href agg and the per-(href, anchor)
    # count; without the persist the extraction UDF plans (and the
    # corpus scans) twice — same lesson as tfidf_top_terms
    links = (
        docs.select("doc_id", F.explode(find_links_udf(html_col)).alias("l"))
        .select("doc_id", F.col("l.href").alias("href"), F.col("l.anchor").alias("anchor"))
        .persist()
    )
    agg = links.groupBy("href").agg(
        F.count("*").alias("n_refs"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    pa = links.groupBy("href", "anchor").agg(F.count("*").alias("cnt"))
    win = Window.partitionBy("href").orderBy(F.desc("cnt"), F.asc("anchor"))
    top = (
        pa.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select("href", F.col("anchor").alias("top_anchor"))
    )
    return agg.join(top, "href")


def _q_gopher_quality(spark, sf):
    """Gopher doc-quality gates (Rae et al. 2021 App. A1.1): word-count
    bounds, mean word length, symbol-to-word ratio, alpha-word
    fraction, distinct-stopword floor — all JVM exprs fused into the
    scan (zero shuffles).  See crawler/textops.gopher_quality."""
    from crawler.textops import gopher_quality

    return gopher_quality(_read(spark, sf, "documents"))


def _q_domain_stats(spark, sf):
    """Domain-level curation rollup (RefinedWeb/C4-style host gate):
    per registrable domain — via the full-PSL engine, so curation and
    politeness group identically — doc count, EXACT fixed-point mean
    quality, English fraction, keep/drop verdict.  One groupBy(tpd)
    with map-side combine; see crawler/textops.domain_stats."""
    from crawler.textops import domain_stats

    docs = _read(spark, sf, "documents")
    k = F.col("doc_id")
    host = F.concat(
        F.when(k % 3 == 0, F.lit("www."))
        .when(k % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit("a.b.")),
        F.lit("site"), (k % 40).cast("string"),
        F.when(k % 2 == 0, F.lit(".com")).otherwise(F.lit(".co.uk")),
    )
    return domain_stats(docs.select("doc_id", host.alias("host"), "text"))


def _q_asof_join(spark, sf):
    """As-of join (pandas merge_asof / kdb aj semantics): every click
    event picks, per user, the latest view event at-or-before it.
    Implemented as union + window last(ignorenulls) — ONE exchange on
    user_id, zero joins (crawler/timeseries.asof_join); the DuckDB
    oracle is the engine's own independent ASOF LEFT JOIN.  Nulls
    (click before any view / user with no views) coalesce to -1
    sentinels so the value-hash never depends on null stringification."""
    from crawler.timeseries import asof_join

    ev = _read(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    j = asof_join(clicks, views, ["user_id"], "ts", ["view_id", "view_value"])
    click_us = F.unix_micros(F.col("ts").cast("timestamp"))
    view_us = F.unix_micros(F.col("ts_asof").cast("timestamp"))
    return j.select(
        "click_id",
        "user_id",
        click_us.alias("click_us"),
        "click_value",
        F.coalesce(F.col("view_id_asof"), F.lit(-1)).alias("view_id"),
        F.coalesce(view_us, F.lit(-1)).alias("view_us"),
        F.coalesce(F.col("view_value_asof"), F.lit(-1.0)).alias("view_value"),
        F.coalesce(click_us - view_us, F.lit(-1)).alias("stale_us"),
    )


def _q_range_join(spark, sf):
    """Interval join without a nested-loop: heavy lineitems (quantity ≥
    48) matched to every URGENT order whose [orderdate, +7d) window
    covers the shipdate — no key equality, pure range predicate.
    crawler/timeseries.range_join bucketizes time so the pair search is
    an equi-join on bucket (points own ONE bucket → no dedup); the
    DuckDB oracle runs the bare inequality join (its IEJoin path — an
    independent algorithm)."""
    from crawler.timeseries import range_join

    li = (
        _read(spark, sf, "lineitem")
        .where(F.col("l_quantity") >= 48)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    )
    od = (
        _read(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("o_enddate"),
        )
    )
    j = range_join(li, od, "l_shipdate", "o_orderdate", "o_enddate",
                   bucket_s=7 * 86400)
    return j.groupBy("o_orderkey").agg(
        F.count("*").alias("n_shipped"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_qty"),
    )


def _q_shipping_priority(spark, sf):
    """TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    orders ⋈ lineitem, per-order discounted revenue, top 10.  Join
    strategy: Catalyst/AQE by size, NO hints — the filtered orders side
    is fact-sized at 100 TB, so a forced broadcast would be the round-1
    robots mistake.  Revenue sums in DECIMAL (price 2dp ×
    discount-complement 2dp = exact 4dp — double summation order is
    engine-dependent, decimal is not); top-k via TakeOrderedAndProject
    (no global sort)."""
    c = (
        _read(spark, sf, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _read(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _read(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(rev.cast("double"), 4).alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_length_quantiles(spark, sf):
    """Exact grouped quantiles (p50/p90/p99 whitespace-token length per
    predicted language) — textops.length_quantiles.  Spark's exact
    percentile aggregate is a value→count histogram with map-side
    merge (state = distinct lengths, not rows); the oracle is DuckDB's
    independent quantile_cont (bit-identical linear interpolation,
    probed exact before wiring)."""
    from crawler.textops import length_quantiles

    return length_quantiles(_read(spark, sf, "documents"))


def _q_media_resize(spark, sf):
    """Multimodal RESIZE: numpy SIMG decode → nearest-neighbor 4×4
    downsample (integer index math) → resized pixel block + channel
    means (textops.media_resize_features).  The DuckDB oracle
    recomputes every picked pixel from the md5 hex stream — the resize
    itself is value-checked end-to-end, pixel for pixel."""
    from crawler.synth import md5_image_blobs
    from crawler.textops import media_resize_features

    docs = _read(spark, sf, "documents").where("doc_id < 100")
    refs = docs.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref")
    )
    out = media_resize_features(md5_image_blobs(refs))
    return out.select(
        "media_ref", "width", "height", "out_w", "out_h", "pixels_csv",
        F.round("r_mean", 6).alias("r_mean"),
        F.round("g_mean", 6).alias("g_mean"),
        F.round("b_mean", 6).alias("b_mean"),
    )


def _q_frame_sample(spark, sf):
    """Multimodal FRAME SAMPLING: numpy SVID decode → every-3rd-frame
    sample → one row per sampled frame with per-frame stats
    (textops.frame_sample_features — the 1→N fan-out of a video
    pipeline).  The DuckDB oracle regenerates each sampled frame's
    pixels from the md5 stream and recomputes the stats."""
    from crawler.synth import md5_video_blobs
    from crawler.textops import frame_sample_features

    docs = _read(spark, sf, "documents").where("doc_id < 100")
    refs = docs.select(
        F.concat(F.lit("vid://"), F.col("doc_id").cast("string")).alias("media_ref")
    )
    out = frame_sample_features(md5_video_blobs(refs), stride=3)
    return out.select(
        "media_ref", "frame_idx", "n_frames", "width", "height",
        F.round("mean", 6).alias("mean"), "first_byte",
    )


def _q_hypertable_rollup(spark, sf):
    """Hypertable-style multi-granularity rollup (TimescaleDB
    continuous-aggregate shape): hour/day/week × event_type counts and
    exact decimal value totals in ONE pass — a single GROUPING SETS
    Expand + one partially-aggregated exchange instead of three scans
    (crawler/timeseries.rollup_time_buckets).  The oracle is the
    independent formulation: three UNION ALL'd GROUP BYs."""
    from crawler.timeseries import rollup_time_buckets

    return rollup_time_buckets(
        _read(spark, sf, "events"), "ts", ["event_type"], "value"
    )


def _q_hll_distinct(spark, sf):
    """Mergeable HyperLogLog distinct-user sketch per event_type
    (Flajolet et al. 2007): the register table is the sketch state —
    per-day sketches merge with max() instead of re-shuffling raw keys
    (the distributed analog of StatsCollector.scala's exact counters).
    Exact count(distinct) carried alongside so the sketch error is
    visible in the result; the oracle reproduces the estimate
    bit-for-bit via the same md5 hash + integer register sum."""
    from crawler.sketches import hll_distinct

    ev = _read(spark, sf, "events")
    est = hll_distinct(ev, ["event_type"], "user_id", p=9)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "hll_distinct", "exact_distinct"
    )


def _q_heavy_hitters(spark, sf):
    """Count-min heavy hitters (Cormode & Muthukrishnan 2005): top-25
    tokens by CMS point-query estimate over the documents corpus.  The
    sketch is d×w = 1024 cells REGARDLESS of corpus size (broadcast
    join), built in one partial-aggregating pass; estimates are an
    overestimate, never under — exact counts alongside show the error."""
    from crawler.sketches import countmin_topk

    toks = (
        _read(spark, sf, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    out = countmin_topk(toks, "tok", d=4, w=256, k=25)
    return out.select(
        F.col("item").alias("tok"), "cms_est", "exact_cnt"
    )


#: PII injection mirrored verbatim in the oracle — the synthetic corpus
#: carries no real PII, so every doc_id % 3 == 0 row gets a
#: deterministic contact line appended; the scrub is then value-checked
#: non-vacuously (counts AND the scrubbed text's md5 must both match).
def _pii_injected(docs: DataFrame) -> DataFrame:
    pii_line = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.org or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.7"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), pii_line))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _q_pii_redact(spark, sf):
    """PII scrubbing pass (emails / phones / IPv4 → typed placeholders)
    with per-kind redaction counts — pure JVM regexp_count +
    regexp_replace fused into the scan (crawler/textops.pii_redact);
    patterns restricted to the Java-regex ∩ RE2 common subset so the
    DuckDB oracle is a true twin."""
    from crawler import textops

    out = textops.pii_redact(_pii_injected(_read(spark, sf, "documents")))
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        "n_emails",
        "n_phones",
        "n_ips",
    )


def _q_unigram_lm(spark, sf):
    """Unigram-LM document quality scoring (CCNet-style, corpus as LM):
    mean corpus probability of a doc's tokens, computed with an exact
    BIGINT sum and ONE terminal division so Spark and DuckDB agree
    bit-for-bit (crawler/textops.unigram_lm_score)."""
    from crawler import textops

    out = textops.unigram_lm_score(_read(spark, sf, "documents"))
    return out.select(
        "doc_id", "n_tokens", F.round("mean_unigram_p", 9).alias("mean_unigram_p")
    )


#: mixture weights for the mix_sources query — mirrored in the oracle
_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}


def _q_mix_sources(spark, sf):
    """Deterministic weighted source mixing (crawler/textops.mix_sources):
    per-doc md5 coin vs floor(weight·2^32) — a pure integer compare, so
    the DuckDB twin agrees doc-for-doc, not just in expectation."""
    from crawler import textops

    out = textops.mix_sources(
        _read(spark, sf, "documents"), _MIX_WEIGHTS, default_weight=0.75
    )
    return out.where(F.col("keep")).select("doc_id", "source")


def _q_bigram_lm(spark, sf):
    """Corpus bigram LM: top-100 adjacent word pairs with conditional
    probability p(w2|w1) = c(w1,w2)/c(w1·) — both counts exact BIGINTs
    from one aggregate, p one division (crawler/textops.bigram_lm)."""
    from crawler import textops

    out = textops.bigram_lm(_read(spark, sf, "documents"), k=100)
    return out.select("w1", "w2", "cnt", F.round("p_cond", 9).alias("p_cond"))


def _q_frontier_schedule(spark, sf):
    """The wave hot path itself, driver-checked: the REAL politeness
    scheduler (crawler/politeness.schedule_wave — salted lossless top-k
    prune, exact per-TPD queue rank, closed-form JVM tick arithmetic;
    RabbitThrottler.scala:59-66 / FrontierThrottler.scala:22-48
    semantics) over a frontier synthesized from the events table by
    pure column arithmetic.  Exercises score-ordered dequeue (priority
    DESC, seq ASC — the north rule's score-ordered queues) and a custom
    per-domain delay; the DuckDB twin recomputes the schedule from the
    same closed form (fetch_ms = start + (rank-1)·delay, emitted while
    < wave end)."""
    from crawler import politeness, schemas
    from crawler.config import CrawlConfig
    from crawler.frontier import request_body_cols

    ev = _read(spark, sf, "events")
    host = F.concat(
        F.lit("h"), (F.col("user_id") % 97).cast("string"), F.lit(".example.com")
    )
    url = F.concat(
        F.lit("http://"), host, F.lit("/e/"), F.col("event_id").cast("string")
    )
    pending = ev.select(
        url.alias("url"),
        url.alias("url_canon"),
        F.xxhash64(url).alias("url_hash"),
        host.alias("host"),
        host.alias("tpd"),
        F.lit("GET").alias("method"),
        *request_body_cols(),
        F.array().cast("array<string>").alias("provenance"),
        (F.col("event_id") % 5).cast("double").alias("priority"),
        F.col("event_id").alias("seq"),
        F.lit(0).cast("int").alias("not_before_wave"),
        F.lit(0).cast("int").alias("wave_added"),
    )
    cfg = CrawlConfig(
        per_domain_delay_ms=500,
        wave_ms=10_000,
        domain_delays={"h7.example.com": 2000},
    )
    host_state = spark.createDataFrame([], schemas.HOST_STATE)
    scheduled, _ = politeness.schedule_wave(pending, host_state, None, cfg, wave=0)
    return scheduled.select("url", "tpd", "priority", "seq", "delay_ms", "fetch_ms")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's CORRECTNESS check covers the FIRST 50
    # entries in dict order (round-3 evidence: CORRECTNESS_r03 keys ==
    # registry[0:50]).  Crawl-native queries lead — frontier_schedule
    # (the RabbitThrottler.scala:59-66 wave hot path) above all.  With
    # 56 queries and a 50-row driver cap, 6 redundant variants sit past
    # slot 50 each round and ROTATE back in the next round (VERDICT r4
    # item 4), so every query has a driver row no older than one round:
    #   r4 window-out (driver-green r3, rotated IN for r5): knn_lsh,
    #     events_window, shipping_priority, length_quantiles,
    #     media_resize, frame_sample
    #   r5 window-out (driver-green r4, each a redundant variant of a
    #     still-checked twin): knn_cosine ~ knn_lsh/knn_ivf,
    #     sessionize ~ events_window/rollup, top_revenue_nations ~
    #     shipping_priority/pricing_summary, domain_stats ~
    #     length_quantiles/stratified_sample, media_decode/
    #     media_features ~ media_resize/frame_sample
    #   r6 window-out (driver-green r5, rotated per the same scheme —
    #     the r5 outs swap back IN): knn_lsh ~ knn_cosine/knn_ivf,
    #     events_window ~ sessionize/rollup, shipping_priority ~
    #     top_revenue_nations/pricing_summary, length_quantiles ~
    #     domain_stats/stratified_sample, media_resize/frame_sample ~
    #     media_features/media_decode
    # tests/test_registry_guard.py pins the window invariants, and
    # tests/test_oracle_sweep_gate.py runs EVERY oracle (incl. the
    # demoted 6) as a local gate each suite run.
    return {
        "status_filter": _q_status_filter,
        "word_count_top25": _q_word_count_top25,
        "crawl_stats": _q_crawl_stats,
        "frontier_schedule": _q_frontier_schedule,
        "url_kernel": _q_url_kernel,
        "tpd_extract": _q_tpd_extract,
        "robots_eval": _q_robots_eval,
        "provenance_cap": _q_provenance_cap,
        "dedup_exact": _q_dedup_exact,
        "dedup_first_wins": _q_dedup_first_wins,
        "minhash_words": _q_minhash_words,
        "simhash": _q_simhash,
        "simhash_dups": _q_simhash_dups,
        "ngram_jaccard_dups": _q_ngram_jaccard_dups,
        "knn_cosine": _q_knn_cosine,
        "langid": _q_langid,
        "quality": _q_quality,
        "token_counts": _q_token_counts,
        "fingerprint": _q_fingerprint,
        "pii_redact": _q_pii_redact,
        "unigram_lm": _q_unigram_lm,
        "bigram_lm": _q_bigram_lm,
        "heavy_hitters": _q_heavy_hitters,
        "mix_sources": _q_mix_sources,
        "pricing_summary": _q_pricing_summary,
        "top_revenue_nations": _q_top_revenue_nations,
        "media_features": _q_media_features,
        "media_decode": _q_media_decode,
        "dedup_embedding": _q_dedup_embedding,
        "knn_ivf": _q_knn_ivf,
        "curate_corpus": _q_curate_corpus,
        "link_stats": _q_link_stats,
        "pagerank": _q_pagerank,
        "dedup_clusters": _q_dedup_clusters,
        "gopher_repetition": _q_gopher_repetition,
        "paragraph_dedup": _q_paragraph_dedup,
        "decontaminate": _q_decontaminate,
        "stratified_sample": _q_stratified_sample,
        "tfidf_top": _q_tfidf_top,
        "sessionize": _q_sessionize,
        "kmeans": _q_kmeans,
        "semdedup": _q_semdedup,
        "substring_dedup": _q_substring_dedup,
        "anchor_stats": _q_anchor_stats,
        "domain_stats": _q_domain_stats,
        "gopher_quality": _q_gopher_quality,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "hypertable_rollup": _q_hypertable_rollup,
        "hll_distinct": _q_hll_distinct,
        # ---- slot 51+ (redundant variants; rotate back in next round;
        # builder-verified this round via the oracle-sweep gate) ----
        "knn_lsh": _q_knn_lsh,
        "events_window": _q_events_window,
        "shipping_priority": _q_shipping_priority,
        "length_quantiles": _q_length_quantiles,
        "media_resize": _q_media_resize,
        "frame_sample": _q_frame_sample,
    }


def _knn_lsh_oracle_sql(n_planes: int = 6, dim: int = 64, n_probes: int = 3) -> str:
    """Mirror of knn_lsh_bucketed (multi-probe): same seed-42 float64
    hyperplane literals, same sign-bit bucket, same lowest-|margin|
    Hamming-1 probe expansion, same cosine — pure DuckDB SQL."""
    from crawler.textops import lsh_planes

    planes = lsh_planes(n_planes, dim)
    lits = ["[" + ", ".join(repr(float(w)) for w in p) + "]" for p in planes]
    bucket = lambda v: " + ".join(  # noqa: E731
        f"(CASE WHEN list_dot_product({v}, {lits[i]}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    margin_rows = "\n              UNION ALL ".join(
        f"SELECT {i} AS i, list_dot_product(qv, {lits[i]}) AS m FROM q"
        for i in range(n_planes)
    )
    return f"""
        WITH q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        ),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        qb AS (SELECT ({bucket('qv')}) AS qbucket FROM q),
        margins AS ({margin_rows}),
        flips AS (SELECT i FROM margins ORDER BY abs(m) ASC, i ASC LIMIT {n_probes - 1}),
        probes AS (SELECT qbucket AS p FROM qb
                   UNION ALL SELECT xor(qbucket, 1 << i) FROM qb, flips)
        SELECT vec_id,
               round(list_dot_product(v, qv)
                     / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM e, q
        WHERE vec_id != 0 AND ({bucket('v')}) IN (SELECT p FROM probes)
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """


def _dedup_embedding_oracle_sql(
    n_planes: int = 12, n_bands: int = 3, dim: int = 64, threshold: float = 0.42
) -> str:
    """Mirror of embedding_neardup_pairs: same banded sign-bit buckets
    over the same seed-42 planes, same rounded-cosine verify."""
    from crawler.textops import lsh_planes

    bits_per = n_planes // n_bands
    planes = lsh_planes(n_planes, dim)
    lits = ["[" + ", ".join(repr(float(w)) for w in p) + "]" for p in planes]

    def band_bucket(b: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {lits[b * bits_per + i]}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(bits_per)
        )

    band_selects = "\n              UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, ({band_bucket(b)}) AS bucket FROM e"
        for b in range(n_bands)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        buckets AS ({band_selects}),
        pairs AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM buckets a
          JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id < b.vec_id
        ),
        cos AS (
          SELECT vec_a, vec_b,
                 round(list_dot_product(ea.v, eb.v)
                       / (sqrt(list_dot_product(ea.v, ea.v))
                          * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos_sim
          FROM pairs
          JOIN e ea ON ea.vec_id = vec_a
          JOIN e eb ON eb.vec_id = vec_b
        )
        SELECT * FROM cos WHERE cos_sim >= {threshold} ORDER BY vec_a, vec_b
    """


_KNN_IVF_ORACLE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id BETWEEN 1 AND 8),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    assign AS (
      SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY
        round(list_dot_product(v, cv)
              / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        cell ASC) AS rn
      FROM e CROSS JOIN c WHERE vec_id != 0
    ),
    qcells AS (
      SELECT cell FROM c CROSS JOIN q
      ORDER BY round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
               cell ASC LIMIT 2
    )
    SELECT e.vec_id,
           round(list_dot_product(v, qv)
                 / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM e
    JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1 AND a.cell IN (SELECT cell FROM qcells)
    CROSS JOIN q
    WHERE e.vec_id != 0
    ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10
"""


def _ngram_lsh_oracle_sql() -> str:
    rows = _LSH_HASHES // _LSH_BANDS
    mh_cols = ",\n                   ".join(
        f"min(md5('{i}|' || w)) AS mh{i}" for i in range(_LSH_HASHES)
    )
    band_selects = "\n              UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {expr} AS bucket FROM sigs".format(
            b=b,
            expr=" || ',' || ".join(f"mh{b * rows + r}" for r in range(rows)),
        )
        for b in range(_LSH_BANDS)
    )
    jac = ("round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)"
           " / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4)")
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
          FROM documents
        ),
        sigs AS (
          SELECT doc_id,
                   {mh_cols}
          FROM toks GROUP BY doc_id
        ),
        buckets AS (
              {band_selects}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM buckets a
          JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.doc_id < b.doc_id
        ),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(string_split(lower(text), ' '),
                   w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS s
          FROM documents
        )
        SELECT doc_a, doc_b, {jac} AS jaccard
        FROM pairs
        JOIN sh sa ON sa.doc_id = doc_a
        JOIN sh sb ON sb.doc_id = doc_b
        WHERE {jac} >= 0.5
    """


#: SimHash fingerprint as pure DuckDB SQL — same md5 token halves and
#: bit-vote as crawler.textops.simhash64_expr; shared by the `simhash`
#: (fingerprints) and `simhash_dups` (pairs) oracles.
_SIMHASH_FP_CTES = r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(w), 9, 8))::BIGINT AS lo
      FROM toks
    ),
    votes AS (
      SELECT doc_id, b.b,
             sum(CASE WHEN (CASE WHEN b.b < 32 THEN (lo >> b.b)
                                 ELSE (hi >> (b.b - 32)) END) & 1 = 1
                      THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(generate_series(0, 63)) AS b) b
      GROUP BY doc_id, b.b
    ),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN v > 0 AND b >= 32 THEN (1::BIGINT << (b - 32)) ELSE 0 END) AS sim_hi,
             sum(CASE WHEN v > 0 AND b < 32 THEN (1::BIGINT << b) ELSE 0 END) AS sim_lo
      FROM votes GROUP BY doc_id
    )
"""


def _link_stats_oracle_sql() -> str:
    from crawler.graph import synth_edges_sql

    return f"""
        WITH edges AS ({synth_edges_sql()}),
        o AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
        i AS (SELECT dst AS node, count(*) AS indeg FROM edges GROUP BY dst)
        SELECT coalesce(o.node, i.node) AS doc_id,
               coalesce(outdeg, 0) AS outdeg,
               coalesce(indeg, 0) AS indeg
        FROM o FULL OUTER JOIN i ON o.node = i.node
    """


def _pagerank_oracle_sql() -> str:
    from crawler.graph import pagerank_oracle_sql, synth_edges_sql

    chain = pagerank_oracle_sql(synth_edges_sql(), n_iter=5, damping=0.85,
                                iter_dp=9)
    return f"""
        WITH {chain}
        SELECT node AS doc_id, round(rank, 6) AS rank
        FROM r5
        ORDER BY round(rank, 6) DESC, node ASC LIMIT 50
    """


def _dedup_clusters_oracle_sql() -> str:
    from crawler.graph import components_oracle_sql

    chain = components_oracle_sql(_ngram_lsh_oracle_sql())
    return f"""
        WITH RECURSIVE {chain},
        sizes AS (SELECT rep, count(*) AS cluster_size FROM comp GROUP BY rep)
        SELECT c.node AS doc_id, c.rep, s.cluster_size
        FROM comp c JOIN sizes s ON s.rep = c.rep
    """


def _hll_oracle_sql() -> str:
    from crawler.sketches import hll_estimate_sql

    est = hll_estimate_sql("events", "event_type", "event_type", "user_id", p=9)
    return f"""
        WITH est AS ({est}),
        exact AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type
        )
        SELECT event_type, hll_distinct, exact_distinct
        FROM est JOIN exact USING (event_type)
    """


def _heavy_hitters_oracle_sql() -> str:
    from crawler.sketches import countmin_topk_sql

    items = """
        SELECT tok AS item FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
        ) WHERE tok <> ''
    """
    inner = countmin_topk_sql(items, d=4, w=256, k=25)
    return f"SELECT item AS tok, cms_est, exact_cnt FROM ({inner})"


def _pii_oracle_sql() -> str:
    """Twin of _q_pii_redact: the SAME injection expression and the SAME
    pattern constants (imported from crawler.textops, not re-typed) in
    DuckDB — regexp_replace needs the explicit 'g' flag (DuckDB replaces
    first-match by default; Spark replaces all)."""
    from crawler.textops import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    def lit(pat: str) -> str:
        return "'" + pat.replace("'", "''") + "'"

    e, p, i = lit(PII_EMAIL_RE), lit(PII_PHONE_RE), lit(PII_IPV4_RE)
    return f"""
        WITH base AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                           || '@mail.example.org or +1-555-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                           || '.0.7'
                      ELSE text END AS t
          FROM documents
        ),
        s1 AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(t, {e})) AS INT) AS n_emails,
                 regexp_replace(t, {e}, '<EMAIL>', 'g') AS t
          FROM base
        ),
        s2 AS (
          SELECT doc_id, n_emails,
                 CAST(len(regexp_extract_all(t, {p})) AS INT) AS n_phones,
                 regexp_replace(t, {p}, '<PHONE>', 'g') AS t
          FROM s1
        ),
        s3 AS (
          SELECT doc_id, n_emails, n_phones,
                 CAST(len(regexp_extract_all(t, {i})) AS INT) AS n_ips,
                 regexp_replace(t, {i}, '<IP>', 'g') AS t
          FROM s2
        )
        SELECT doc_id, md5(t) AS clean_md5, n_emails, n_phones, n_ips FROM s3
    """


def _mix_sources_oracle_sql() -> str:
    """Twin of _q_mix_sources: same md5 coin, same integer thresholds."""
    cases = " ".join(
        f"WHEN source = '{s}' THEN CAST({int(w * 4294967296)} AS BIGINT)"
        for s, w in sorted(_MIX_WEIGHTS.items())
    )
    default = int(0.75 * 4294967296)
    return f"""
        SELECT doc_id, source
        FROM documents
        WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              < (CASE {cases} ELSE CAST({default} AS BIGINT) END)
    """


def oracle_sql() -> dict[str, str]:
    return {
        "status_filter": """
            SELECT event_id, user_id, round(value, 4) AS value
            FROM events WHERE value BETWEEN 200 AND 399
        """,
        "word_count_top25": """
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
            WHERE word <> ''
            GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 25
        """,
        "crawl_stats": """
            SELECT count(*) AS num_fetched,
                   CAST(sum(n_chars) AS BIGINT) AS num_bytes_fetched
            FROM documents
        """,
        "url_kernel": """
            WITH u AS (
              SELECT doc_id, source,
                     'http://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) || '/#frag' AS url
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(url, '#[^#]*$', ''), '/$', '') AS url_canon,
                   lower(source || '.example.com') AS host,
                   'example.com' AS tpd
            FROM u
        """,
        "tpd_extract": """
            SELECT doc_id,
                   CASE doc_id % 8
                     WHEN 0 THEN 'www.site' || k || '.com'
                     WHEN 1 THEN 'a.b.site' || k || '.co.uk'
                     WHEN 2 THEN 'h' || k || '.pvt.k12.ma.us'
                     WHEN 3 THEN 'foo' || k || '.bar' || k || '.ck'
                     WHEN 4 THEN 'www.ck'
                     WHEN 5 THEN 'b' || k || '.s3.amazonaws.com'
                     WHEN 6 THEN 'sub.site' || k || '.github.io'
                     ELSE 'bar' || k || '.ck'
                   END AS host,
                   -- expected registrable domain per template: exact
                   -- TLD / co.uk / deep suffix / *.ck wildcard /
                   -- !www.ck exception / private suffixes / a host
                   -- that IS a public suffix -> 'notpd'
                   CASE doc_id % 8
                     WHEN 0 THEN 'site' || k || '.com'
                     WHEN 1 THEN 'site' || k || '.co.uk'
                     WHEN 2 THEN 'h' || k || '.pvt.k12.ma.us'
                     WHEN 3 THEN 'foo' || k || '.bar' || k || '.ck'
                     WHEN 4 THEN 'www.ck'
                     WHEN 5 THEN 'b' || k || '.s3.amazonaws.com'
                     WHEN 6 THEN 'site' || k || '.github.io'
                     ELSE 'notpd'
                   END AS tpd
            FROM (SELECT doc_id, CAST(doc_id AS VARCHAR) AS k FROM documents)
        """,
        "robots_eval": """
            -- closed-form EXPECTED verdict per robots template: the
            -- Spark side parses+matches the rendered robots.txt with
            -- the real RFC-9309 engine; equality proves the semantics.
            SELECT doc_id,
                   CAST(doc_id % 8 AS INT) AS tmpl,
                   '/sec' || p || '/page' || k ||
                     (CASE WHEN doc_id % 3 = 0 THEN '?q=' || p ELSE '' END)
                     AS target,
                   CASE doc_id % 8
                     WHEN 0 THEN p IN ('0', '1')          -- prefix rules
                     WHEN 1 THEN p = '3'                  -- specific group only
                     WHEN 2 THEN p <> '2'                 -- longest-match
                     WHEN 3 THEN doc_id % 3 = 0           -- /*? wildcard
                     WHEN 4 THEN p = '2' AND doc_id % 3 <> 0  -- $ anchor
                     WHEN 5 THEN FALSE                    -- group w/o path rules
                     WHEN 6 THEN p = '0'                  -- implicit *; tie->allow
                     ELSE p = CAST(doc_id % 2 AS VARCHAR) -- case/comment lenience
                   END AS blocked
            FROM (SELECT doc_id, CAST(doc_id AS VARCHAR) AS k,
                         CAST(doc_id % 5 AS VARCHAR) AS p
                  FROM documents)
        """,
        "provenance_cap": """
            WITH p AS (
              SELECT doc_id,
                     list_append(string_split(text, ' '), source) AS prov2
              FROM documents
            )
            SELECT doc_id,
                   least(len(prov2), 10) AS prov_len,
                   md5(list_aggregate(prov2[greatest(len(prov2) - 9, 1):], 'string_agg', '|')) AS prov_md5
            FROM p
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id) AS doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_first_wins": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "minhash_words": """
            SELECT doc_id,
                   min(md5('0|' || word)) AS mh0,
                   min(md5('1|' || word)) AS mh1,
                   min(md5('2|' || word)) AS mh2,
                   min(md5('3|' || word)) AS mh3
            FROM (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS word
                  FROM documents)
            GROUP BY doc_id
        """,
        "ngram_jaccard_dups": _ngram_lsh_oracle_sql(),
        "simhash": _SIMHASH_FP_CTES + r"""
            SELECT d.doc_id,
                   CAST(coalesce(fp.sim_hi, 0) AS BIGINT) AS sim_hi,
                   CAST(coalesce(fp.sim_lo, 0) AS BIGINT) AS sim_lo
            FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
        """,
        "simhash_dups": _SIMHASH_FP_CTES + r""",
            sig AS (
              SELECT d.doc_id,
                     CAST(coalesce(fp.sim_hi, 0) AS BIGINT) AS hi,
                     CAST(coalesce(fp.sim_lo, 0) AS BIGINT) AS lo
              FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
            ),
            chunks AS (
              SELECT doc_id, hi, lo, c.c AS chunk_id,
                     CASE WHEN c.c < 2 THEN (lo >> (c.c * 16)) & 65535
                          ELSE (hi >> ((c.c - 2) * 16)) & 65535 END AS chunk
              FROM sig, (SELECT unnest(generate_series(0, 3)) AS c) c
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.hi, b.hi))
                        + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
            FROM chunks a
            JOIN chunks b
              ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
             AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        """,
        "knn_lsh": _knn_lsh_oracle_sql(),
        "dedup_embedding": _dedup_embedding_oracle_sql(),
        "knn_ivf": _KNN_IVF_ORACLE,
        "curate_corpus": f"""
            WITH scored AS (
              SELECT doc_id, md5(text) AS fp,
                     len(string_split(lower(text), ' ')) AS n_tokens,
                     round(least(greatest(len(string_split(lower(text), ' ')), 1) / 100.0, 1.0) * 0.5
                           + (CAST(len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
                              / greatest(len(text), 1)) * 0.5, 6) AS quality,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                                          w -> list_contains({_SW_SQL}, w))) AS DOUBLE)
                       / greatest(len(string_split(lower(text), ' ')), 1) AS swr
              FROM documents
            ),
            kept AS (SELECT * FROM scored WHERE swr >= 0.08 AND quality >= 0.6),
            first AS (SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp)
            SELECT k.doc_id, k.n_tokens, k.quality
            FROM kept k JOIN first USING (fp, doc_id)
        """,
        "media_decode": _MEDIA_DECODE_ORACLE,
        "media_features": """
            WITH refs AS (
              SELECT 'img://' || CAST(doc_id AS VARCHAR) AS media_ref
              FROM documents WHERE doc_id < 500
            )
            SELECT media_ref, 'img' AS kind,
                   CAST(length(media_ref) AS BIGINT) AS n_bytes,
                   round(('0x' || substr(md5(media_ref), 1, 2))::INT / 255.0, 6) AS f0,
                   round(('0x' || substr(md5(media_ref), 3, 2))::INT / 255.0, 6) AS f1,
                   round(('0x' || substr(md5(media_ref), 5, 2))::INT / 255.0, 6) AS f2,
                   round(('0x' || substr(md5(media_ref), 7, 2))::INT / 255.0, 6) AS f3
            FROM refs
        """,
        "knn_cosine": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 6) AS cos_sim
            FROM embeddings, q WHERE vec_id != 0
            ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
        """,
        "langid": f"""
            SELECT doc_id,
                   CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                                                  w -> list_contains({_SW_SQL}, w))) AS DOUBLE)
                             / greatest(len(string_split(lower(text), ' ')), 1) >= 0.08
                        THEN 'en' ELSE 'other' END AS lang_pred
            FROM documents
        """,
        "quality": """
            SELECT doc_id,
                   len(string_split(lower(text), ' ')) AS n_tokens,
                   round(least(greatest(len(string_split(lower(text), ' ')), 1) / 100.0, 1.0) * 0.5
                         + (CAST(len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
                            / greatest(len(text), 1)) * 0.5, 6) AS quality
            FROM documents
        """,
        "token_counts": """
            SELECT doc_id,
                   len(string_split(lower(text), ' ')) AS ws_tokens,
                   CAST(ceil(len(text) / 4.0) AS BIGINT) AS subword_est
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(substr(lower(regexp_replace(text, '\\s+', ' ', 'g')), 1, 64)) AS fp_prefix,
                   CAST(floor(len(text) / 256) AS BIGINT) AS len_bucket
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_nations": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY revenue DESC, n_name ASC LIMIT 10
        """,
        "events_window": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "link_stats": _link_stats_oracle_sql(),
        "pagerank": _pagerank_oracle_sql(),
        "dedup_clusters": _dedup_clusters_oracle_sql(),
        "gopher_repetition": """
            WITH t AS (
              SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, len(toks) AS n_tokens,
                     CASE WHEN len(toks) >= 2
                       THEN list_transform(generate_series(1, len(toks) - 1),
                                           i -> toks[i] || ' ' || toks[i + 1])
                       ELSE CAST([] AS VARCHAR[]) END AS grams
              FROM t
            ),
            base AS (
              SELECT doc_id, n_tokens, len(grams) AS n_grams,
                     round(CASE WHEN len(grams) > 0
                           THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                      / len(grams)
                           ELSE 0.0 END, 6) AS dup_2gram_frac,
                     grams
              FROM g
            ),
            cnt AS (
              SELECT doc_id, gram, count(*) AS c
              FROM (SELECT doc_id, unnest(grams) AS gram FROM base) _e
              GROUP BY doc_id, gram
            ),
            top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY doc_id)
            SELECT b.doc_id, b.n_tokens, b.dup_2gram_frac,
                   round(coalesce(CAST(tp.top_c AS DOUBLE)
                                  / nullif(b.n_grams, 0), 0.0), 6)
                     AS top_2gram_share,
                   (b.dup_2gram_frac <= 0.2
                    AND round(coalesce(CAST(tp.top_c AS DOUBLE)
                                       / nullif(b.n_grams, 0), 0.0), 6) <= 0.2)
                     AS keep
            FROM base b LEFT JOIN top tp USING (doc_id)
        """,
        "paragraph_dedup": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
            ),
            paras AS (
              SELECT doc_id, i AS para_idx,
                     array_to_string(tk[i * 10 + 1 : i * 10 + 10], ' ') AS para
              FROM toks,
                   LATERAL (SELECT unnest(generate_series(0, (len(tk) - 1) // 10)) AS i) g
            ),
            ranked AS (
              SELECT doc_id, para_idx, para,
                     row_number() OVER (PARTITION BY md5(para)
                                        ORDER BY doc_id, para_idx) = 1 AS keep
              FROM paras
            )
            SELECT doc_id, count(*) AS n_paras,
                   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   md5(coalesce(string_agg(CASE WHEN keep THEN para END, ' '
                                           ORDER BY para_idx), '')) AS kept_md5
            FROM ranked GROUP BY doc_id
        """,
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
            ),
            sh AS (
              SELECT doc_id, array_to_string(tk[i : i + 2], ' ') AS sh
              FROM toks,
                   LATERAL (SELECT unnest(generate_series(1, len(tk) - 2)) AS i) g
            ),
            bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
            train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0)
            SELECT t.doc_id, count(DISTINCT t.sh) AS n_overlap
            FROM train t JOIN bench b USING (sh)
            GROUP BY t.doc_id
        """,
        "stratified_sample": """
            SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (
              SELECT lang, doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR)), doc_id
                     ) AS rk
              FROM documents
            ) WHERE rk <= 20
        """,
        "tfidf_top": """
            WITH words AS (
              SELECT source, unnest(string_split(lower(text), ' ')) AS word
              FROM documents
            ),
            tf AS (
              SELECT source, word, count(*) AS tf FROM words
              WHERE word <> '' GROUP BY source, word
            ),
            df_ AS (SELECT word, count(*) AS dfreq FROM tf GROUP BY word),
            scored AS (
              SELECT source, word, tf, dfreq,
                     CAST(tf AS DOUBLE) / dfreq AS score
              FROM tf JOIN df_ USING (word)
            )
            SELECT source, word, tf, dfreq, round(score, 6) AS score,
                   CAST(rk AS INT) AS rk
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY score DESC, word ASC) AS rk
                  FROM scored)
            WHERE rk <= 5
        """,
        "sessionize": """
            WITH o AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 21600000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM o
            )
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   count(*) AS n_events,
                   min(epoch_us(ts)) AS start_us,
                   max(epoch_us(ts)) AS end_us,
                   round(CAST(sum(CAST(value AS DECIMAL(18, 4))) AS DOUBLE), 4)
                     AS total_value
            FROM s GROUP BY user_id, session_seq
        """,
        "kmeans": _kmeans_oracle_sql(),
        "semdedup": _semdedup_oracle_sql(),
        "substring_dedup": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
            ),
            wins AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - 4, 0)),
                       i -> ('0x' || substr(md5(array_to_string(t[i : i + 4], ' ')),
                                            1, 15))::BIGINT))) AS w
              FROM toks
            ),
            owner AS (SELECT w, min(doc_id) AS owner FROM wins GROUP BY w)
            SELECT doc_id, count(*) AS dup_windows, min(owner) AS first_owner
            FROM wins JOIN owner USING (w)
            WHERE owner < doc_id
            GROUP BY doc_id
        """,
        "anchor_stats": """
            -- closed-form EXPECTED links per doc; the Spark side renders
            -- the HTML and extracts with the real tokenizer UDF, so
            -- equality proves strip + tag scan + attr walk + text()
            WITH d AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
            ),
            links AS (
              SELECT doc_id,
                     'http://site' || CAST((doc_id * 7 + i) % 40 AS VARCHAR)
                       || '.example.com/p/' || CAST((doc_id + i) % 100 AS VARCHAR)
                       AS href,
                     trim(CASE i
                       WHEN 0 THEN coalesce(t[1], 'w') || ' page ' || CAST(doc_id % 100 AS VARCHAR)
                       WHEN 1 THEN coalesce(t[2], 'w') || ' page ' || CAST((doc_id + 1) % 100 AS VARCHAR)
                       ELSE coalesce(t[3], 'w') || ' & ' || CAST((doc_id + 2) % 100 AS VARCHAR)
                     END) AS anchor
              FROM d, (SELECT unnest(generate_series(0, 2)) AS i) i
              WHERE i <= doc_id % 3
            ),
            agg AS (
              SELECT href, count(*) AS n_refs, count(DISTINCT doc_id) AS n_docs
              FROM links GROUP BY href
            ),
            pa AS (
              SELECT href, anchor, count(*) AS cnt FROM links GROUP BY href, anchor
            ),
            top AS (
              SELECT href, anchor AS top_anchor FROM (
                SELECT href, anchor, row_number() OVER (
                         PARTITION BY href ORDER BY cnt DESC, anchor ASC) AS rn
                FROM pa
              ) WHERE rn = 1
            )
            SELECT a.href, n_refs, n_docs, top_anchor FROM agg a JOIN top USING (href)
        """,
        "domain_stats": f"""
            WITH scored AS (
              SELECT 'site' || CAST(doc_id % 40 AS VARCHAR)
                       || (CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.co.uk' END)
                       AS tpd,
                     CAST(round((least(greatest(len(string_split(lower(text), ' ')), 1)
                                       / 100.0, 1.0) * 0.5
                                 + (CAST(len(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                                         AS DOUBLE) / greatest(len(text), 1)) * 0.5)
                                * 1000000) AS BIGINT) AS q6,
                     CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                                                    w -> list_contains({_SW_SQL}, w)))
                               AS DOUBLE)
                               / greatest(len(string_split(lower(text), ' ')), 1) >= 0.08
                          THEN 1 ELSE 0 END AS is_en
              FROM documents
            )
            SELECT tpd, count(*) AS n_docs,
                   round(sum(q6) / (count(*) * 1000000.0), 6) AS mean_quality,
                   round(sum(is_en) / CAST(count(*) AS DOUBLE), 6) AS en_fraction,
                   (count(*) >= 3 AND sum(q6) / (count(*) * 1000000.0) >= 0.45) AS keep
            FROM scored GROUP BY tpd
        """,
        "gopher_quality": f"""
            WITH g AS (
              SELECT doc_id,
                     string_split(lower(text), ' ') AS t,
                     CAST(len(replace(text, ' ', '')) AS DOUBLE)
                       / greatest(len(string_split(lower(text), ' ')), 1) AS mwl,
                     (CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
                      + (len(text) - len(replace(text, '...', ''))) / 3)
                       / greatest(len(string_split(lower(text), ' ')), 1) AS sym,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                                          w -> regexp_matches(w, '[a-zA-Z]')))
                          AS DOUBLE)
                       / greatest(len(string_split(lower(text), ' ')), 1) AS alpha,
                     len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                                        {_SW_SQL})) AS n_sw
              FROM documents
            )
            SELECT doc_id,
                   len(t) AS n_tokens,
                   round(mwl, 6) AS mean_word_len,
                   round(sym, 6) AS symbol_ratio,
                   round(alpha, 6) AS alpha_frac,
                   n_sw AS n_stopwords,
                   (len(t) >= 50 AND len(t) <= 100000
                    AND mwl >= 3.0 AND mwl <= 10.0
                    AND sym < 0.1 AND alpha > 0.8 AND n_sw >= 2) AS keep
            FROM g
        """,
        # DuckDB's native ASOF LEFT JOIN — an independent engine
        # implementation of the same backward-≤ semantics
        "asof_join": """
            WITH c AS (
              SELECT event_id AS click_id, user_id, ts, value AS click_value
              FROM events WHERE event_type = 'click'
            ),
            v AS (
              SELECT user_id, ts AS vts, event_id AS view_id,
                     value AS view_value
              FROM events WHERE event_type = 'view'
            )
            SELECT c.click_id, c.user_id,
                   epoch_us(c.ts) AS click_us, c.click_value,
                   coalesce(v.view_id, -1) AS view_id,
                   coalesce(epoch_us(v.vts), -1) AS view_us,
                   coalesce(v.view_value, -1.0) AS view_value,
                   coalesce(epoch_us(c.ts) - epoch_us(v.vts), -1) AS stale_us
            FROM c ASOF LEFT JOIN v
              ON c.user_id = v.user_id AND v.vts <= c.ts
        """,
        # bare inequality join — DuckDB plans this as IEJoin, an
        # independent algorithm from the bucket-explode equi-join
        "range_join": """
            SELECT o.o_orderkey,
                   count(*) AS n_shipped,
                   round(CAST(sum(CAST(l.l_quantity AS DECIMAL(18, 4)))
                              AS DOUBLE), 4) AS sum_qty
            FROM orders o JOIN lineitem l
              ON l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
            WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity >= 48
            GROUP BY o.o_orderkey
        """,
        # independent formulation: three UNION ALL'd single-grain
        # GROUP BYs vs Spark's one-pass GROUPING SETS
        "hypertable_rollup": """
            SELECT 'hour' AS grain,
                   epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18, 4))) AS DOUBLE), 4)
                     AS total_value
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'day', epoch_us(date_trunc('day', ts)), event_type,
                   count(*),
                   round(CAST(sum(CAST(value AS DECIMAL(18, 4))) AS DOUBLE), 4)
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'week', epoch_us(date_trunc('week', ts)), event_type,
                   count(*),
                   round(CAST(sum(CAST(value AS DECIMAL(18, 4))) AS DOUBLE), 4)
            FROM events GROUP BY 2, 3
        """,
        # every resized pixel recomputed from the md5 hex stream:
        # src = (dst * src_dim) // out_dim, p = (sy*w + sx)*3 + ch,
        # byte = md5(ref ':' p//16)[p%16] — pixel-for-pixel resize check
        "media_resize": """
            WITH refs AS (
              SELECT 'img://' || CAST(doc_id AS VARCHAR) AS media_ref
              FROM documents WHERE doc_id < 100
            ),
            dims AS (
              SELECT media_ref,
                     8 + (('0x' || substr(md5(media_ref), 1, 2))::INT % 25) AS w,
                     8 + (('0x' || substr(md5(media_ref), 3, 2))::INT % 25) AS h
              FROM refs
            ),
            grid AS (
              SELECT media_ref, w, h, i.i AS i,
                     (i.i // 12) AS y, ((i.i // 3) % 4) AS x, (i.i % 3) AS ch
              FROM dims,
                   LATERAL (SELECT unnest(generate_series(0, 47)) AS i) i
            ),
            vals AS (
              SELECT media_ref, w, h, i, ch,
                     ('0x' || substr(
                        md5(media_ref || ':' ||
                            CAST((((((y * h) // 4) * w + ((x * w) // 4)) * 3
                                   + ch) // 16) AS VARCHAR)),
                        ((((((y * h) // 4) * w + ((x * w) // 4)) * 3 + ch)
                          % 16) * 2) + 1, 2))::INT AS b
              FROM grid
            )
            SELECT media_ref, w AS width, h AS height,
                   4 AS out_w, 4 AS out_h,
                   string_agg(CAST(b AS VARCHAR), ',' ORDER BY i)
                     AS pixels_csv,
                   round(avg(CASE WHEN ch = 0 THEN b END), 6) AS r_mean,
                   round(avg(CASE WHEN ch = 1 THEN b END), 6) AS g_mean,
                   round(avg(CASE WHEN ch = 2 THEN b END), 6) AS b_mean
            FROM vals GROUP BY media_ref, w, h
        """,
        # sampled frames (0, 3, 6, …) regenerated from the md5 stream:
        # global pixel p = f*w*h*3 + i over the whole video
        "frame_sample": """
            WITH refs AS (
              SELECT 'vid://' || CAST(doc_id AS VARCHAR) AS media_ref
              FROM documents WHERE doc_id < 100
            ),
            dims AS (
              SELECT media_ref,
                     4 + (('0x' || substr(md5(media_ref), 1, 2))::INT % 13) AS nf,
                     4 + (('0x' || substr(md5(media_ref), 3, 2))::INT % 9) AS w,
                     4 + (('0x' || substr(md5(media_ref), 5, 2))::INT % 9) AS h
              FROM refs
            ),
            fr AS (
              SELECT media_ref, nf, w, h, f.f AS f
              FROM dims,
                   LATERAL (SELECT unnest(generate_series(0, nf - 1, 3)) AS f) f
            ),
            vals AS (
              SELECT media_ref, nf, w, h, f, i.i AS i,
                     ('0x' || substr(
                        md5(media_ref || ':' ||
                            CAST(((f * w * h * 3 + i.i) // 16) AS VARCHAR)),
                        (((f * w * h * 3 + i.i) % 16) * 2) + 1, 2))::INT AS b
              FROM fr,
                   LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS i) i
            )
            SELECT media_ref, CAST(f AS INT) AS frame_idx,
                   CAST(nf AS INT) AS n_frames,
                   CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                   round(avg(b), 6) AS mean,
                   max(CASE WHEN i = 0 THEN b END) AS first_byte
            FROM vals GROUP BY media_ref, f, nf, w, h
        """,
        # independent exact-quantile implementation (DuckDB
        # quantile_cont) vs Spark's histogram-based percentile —
        # identical linear interpolation, probed bit-exact
        "length_quantiles": f"""
            WITH d AS (
              SELECT CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                                                    w -> list_contains({_SW_SQL}, w)))
                               AS DOUBLE)
                               / greatest(len(string_split(lower(text), ' ')), 1)
                               >= 0.08
                          THEN 'en' ELSE 'other' END AS lang_pred,
                     len(string_split(lower(text), ' ')) AS n
              FROM documents
            )
            SELECT lang_pred, count(*) AS n_docs,
                   round(quantile_cont(n, 0.5), 6) AS p50,
                   round(quantile_cont(n, 0.9), 6) AS p90,
                   round(quantile_cont(n, 0.99), 6) AS p99
            FROM d GROUP BY lang_pred
        """,
        "shipping_priority": """
            SELECT l_orderkey,
                   epoch_us(o_orderdate) AS orderdate_us,
                   o_orderpriority,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                                  * CAST(1.0 - l_discount AS DECIMAL(18, 2)))
                              AS DOUBLE), 4) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "hll_distinct": _hll_oracle_sql(),
        "heavy_hitters": _heavy_hitters_oracle_sql(),
        "pii_redact": _pii_oracle_sql(),
        "unigram_lm": """
            WITH toks AS (
              SELECT doc_id, t.w AS word
              FROM documents, unnest(string_split(lower(text), ' ')) AS t(w)
              WHERE t.w <> ''
            ),
            counts AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
            tot AS (SELECT sum(cnt) AS corpus_total FROM counts),
            per_doc AS (
              SELECT doc_id, count(*) AS n_tokens, sum(cnt) AS sum_cnt
              FROM toks JOIN counts USING (word) GROUP BY doc_id
            )
            SELECT doc_id, n_tokens,
                   round(CAST(sum_cnt AS DOUBLE)
                         / CAST(n_tokens * corpus_total AS DOUBLE),
                         9) AS mean_unigram_p
            FROM per_doc, tot
        """,
        "bigram_lm": """
            WITH ws AS (
              SELECT string_split(lower(text), ' ') AS w FROM documents
            ),
            pairs AS (
              SELECT w[i] AS w1, w[i + 1] AS w2
              FROM ws, unnest(range(1, len(w))) AS t(i)
              WHERE w[i] <> '' AND w[i + 1] <> ''
            ),
            c2 AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2),
            c1 AS (SELECT w1, sum(cnt) AS w1_cnt FROM c2 GROUP BY w1)
            SELECT w1, w2, cnt,
                   round(CAST(cnt AS DOUBLE) / CAST(w1_cnt AS DOUBLE), 9) AS p_cond
            FROM c2 JOIN c1 USING (w1)
            ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT 100
        """,
        "mix_sources": _mix_sources_oracle_sql(),
        # closed-form mirror of politeness.schedule_wave over the same
        # synthesized frontier: wave 0, no host state ⇒ start = win_start
        # + delay, fetch_ms = rn·delay; both the top-k cap and the
        # window-end filter are mirrored (the salted prune is lossless,
        # so a plain row_number is the correct oracle)
        "frontier_schedule": """
            WITH pending AS (
              SELECT
                'http://h' || CAST(user_id % 97 AS VARCHAR) || '.example.com/e/'
                  || CAST(event_id AS VARCHAR) AS url,
                'h' || CAST(user_id % 97 AS VARCHAR) || '.example.com' AS tpd,
                CAST(event_id % 5 AS DOUBLE) AS priority,
                event_id AS seq
              FROM events
            ), d AS (
              SELECT *,
                     CASE WHEN tpd = 'h7.example.com' THEN 2000 ELSE 500 END AS delay_ms
              FROM pending
            ), r AS (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY tpd ORDER BY priority DESC, seq ASC, url ASC
                     ) AS rn
              FROM d
            )
            SELECT url, tpd, priority, seq, delay_ms,
                   CAST(rn * delay_ms AS BIGINT) AS fetch_ms
            FROM r
            WHERE rn <= CAST(ceil(10000.0 / delay_ms) AS BIGINT)
              AND rn * delay_ms < 10000
        """,
    }
