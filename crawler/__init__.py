"""crawler — a PySpark-native URL-frontier + fetch scheduler.

A from-scratch reimplementation of the *semantics* of
dennybritz/crawler-scala ("blikk-crawler") as batch-iterative DataFrame
waves over snapshot-committed tables of interleaved text+media span
documents.  The reference is an Akka-Streams + RabbitMQ dataflow system;
this package re-expresses each of its operators (SURVEY.md §2) with
DataFrame transforms, vectorized Arrow/pandas UDFs, and a driver-side
wave loop — no actor wiring, no per-row Python.

Module map (SURVEY.md §7):
  config      CrawlConfig — politeness delays, bloom sizing, wave budget
  session     tuned SparkSession builder (AQE, Arrow, shuffle partitions)
  schemas     StructTypes for frontier / documents_spans / url_seen / lineage
  hashing     Spark-compatible murmur3_x86_32 + bloom position math
  urlnorm     canonicalize / host / tpd / base_uri (JVM exprs + pandas twins)
  extract     link extraction over span arrays (Arrow UDF + explode)
  synth       deterministic synthetic web graph + span documents (seed=42)
  warehouse   versioned-snapshot parquet tables (Iceberg-protocol stand-in)
  bloom       sharded bloom filter + cuckoo tier (numpy, mergeable blobs)
  dedup       URL-seen wave dedup: bloom prefilter + exact anti-join backstop
  politeness  per-TPD scheduler — salted top-k + closed-form JVM tick emit
  fetchsim    network-free fetch stage: headers/content-type, gzip/deflate
              entity decode (P9), join vs pages
  frontier    frontier merge / seq assignment / salted skew partitioning
  robots      robots.txt fetch + RFC-9309 rule cache (UA groups, Allow/
              Disallow longest-match, * and $ wildcards)
  psl         vendored public-suffix-list snapshot (tpd data)
  streaming   Structured-Streaming seed intake (idempotent foreachBatch)
  consume     multi-instance fetched-stream consumption (claim-per-file)
  export      ElasticSearch bulk-API projection (reference JSON shape)
  lineage     per-wave per-partition metrics + atomic commit + resume
  loop        the [DRV] wave loop: schedule→fetch→extract→dedup→merge
  job         spark-submit --py-files entrypoint + crawler.zip packaging
  oracle      single-threaded reference-semantics crawler (golden generator)
  textops     training-data ops: dedup (minhash/simhash), knn, langid, quality
  timeseries  as-of join (union+window), bucketized range join, one-pass
              GROUPING SETS hypertable rollup
  graph       link-graph analytics: degrees, pagerank, connected components
"""

__version__ = "0.1.0"
