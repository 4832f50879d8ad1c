"""Link-graph analytics over the crawl corpus.

The graph-shaped operators a 100 TB training-data pipeline needs on
top of crawl output: per-document link statistics, PageRank document
scoring (crawl prioritization / quality weighting at corpus scale),
and connected-component resolution of near-duplicate PAIRS into
clusters with a canonical representative — the missing last step of
the dedup story (crawler/textops.py detects pairs; a curation job
needs one kept doc per cluster).

All algorithms are public:

- PageRank: Brin & Page 1998, fixed-iteration power method with
  damping.  Implemented WITHOUT dangling-mass redistribution (nodes
  with no out-links simply leak their mass; the synthesized bench
  graph gives every node out-links so the term is zero there) — the
  variant is stated so the DuckDB oracle can mirror it term for term.
  Ranks are rounded to ``iter_dp`` decimals AFTER EVERY ITERATION in
  both engines, so cross-engine float drift cannot compound: each
  iteration's inputs are bit-identical and only the final
  sum-of-a-few-doubles differs by ulps before the round.

- Connected components: alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  ACM SoCC 2014) — O(log n) rounds, each round two keyed
  aggregations + joins; the edge set never grows beyond the input
  (star operations only re-point edges) and no component's
  transitive closure is ever materialized.  This matters at scale:
  naive min-label propagation needs O(diameter) rounds and a
  closure-based approach is O(sum of component sizes squared).

Reference parity: dennybritz/crawler-scala has no graph analytics —
these extend the training-data operator suite the brief asks for
beyond the reference's own inventory.

Scale notes (100 TB):
- ``pagerank``: the ranks table is O(nodes), never O(edges).  Each
  iteration is one shuffle on ``src`` (rank join; the edge table is
  pre-joined with out-degree and persisted ONCE, reused every
  iteration) and one partial/final aggregate on ``dst`` (map-side
  combine halves the shuffle).  ``localCheckpoint`` every
  ``checkpoint_every`` rounds truncates the lineage — without it the
  plan tree doubles per round and the DRIVER becomes the bottleneck
  long before the cluster does.
- ``connected_components``: per round two groupBy/join pairs keyed on
  a node id; convergence is checked with a count + a bounded
  ``isEmpty`` on a one-way set difference (no closure, no collect of
  edges).  Each round's edge set is ``localCheckpoint``ed — the edge
  set is referenced ~6x per round, so without lineage truncation the
  LOGICAL plan multiplies ~6x/round and the driver OOMs building
  plan trees long before any executor sees data (persist alone does
  not cut the analyzer's tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


# --------------------------------------------------------------------------
# deterministic link-graph synthesis (shared formula with the DuckDB oracle)
# --------------------------------------------------------------------------

#: out-edges per document in the synthesized graph
SYNTH_OUT_DEG = 3
#: multipliers in the synthesized dst formula — coprime-ish constants so
#: the graph mixes well; the DuckDB oracle states the SAME formula
SYNTH_MUL_SRC = 31
SYNTH_MUL_J = 97


def synth_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic directed link graph over ``doc_id`` 0..n_docs-1.

    For each doc d and j in 1..SYNTH_OUT_DEG:
        raw = (d*31 + j*97) mod N;  dst = raw == d ? (d+1) mod N : raw
    then DISTINCT (two j may collide).  Every node has >= 2 out-edges,
    so the graph has no dangling nodes and the no-dangling-mass
    PageRank variant is exact on it.  The formula is pure JVM column
    arithmetic — the synthesis itself is scan -> project, no shuffle.
    """
    js = F.explode(F.array(*[F.lit(j) for j in range(1, SYNTH_OUT_DEG + 1)]))
    src = F.col("src")
    raw = F.pmod(src * SYNTH_MUL_SRC + F.col("j") * SYNTH_MUL_J, F.lit(n_docs))
    dst = F.when(raw == src, F.pmod(src + 1, F.lit(n_docs))).otherwise(raw)
    return (
        docs.select(F.col("doc_id").cast("long").alias("src"), js.alias("j"))
        .select("src", dst.cast("long").alias("dst"))
        .distinct()
    )


def synth_edges_sql(docs_table: str = "documents") -> str:
    """The DuckDB mirror of :func:`synth_edges` (same formula, same
    DISTINCT), as a CTE body producing (src, dst)."""
    return f"""
        SELECT DISTINCT src,
               CASE WHEN raw = src THEN (src + 1) % n ELSE raw END AS dst
        FROM (
          SELECT CAST(doc_id AS BIGINT) AS src,
                 (CAST(doc_id AS BIGINT) * {SYNTH_MUL_SRC} + j * {SYNTH_MUL_J})
                   % n AS raw,
                 n
          FROM {docs_table}
          CROSS JOIN (SELECT unnest([{", ".join(str(j) for j in range(1, SYNTH_OUT_DEG + 1))}]) AS j)
          CROSS JOIN (SELECT count(*) AS n FROM {docs_table})
        )
    """


# --------------------------------------------------------------------------
# link statistics
# --------------------------------------------------------------------------

def link_stats(edges: DataFrame) -> DataFrame:
    """Per-node out-degree / in-degree over a directed edge list.

    One partial/final aggregate per direction, joined on the node id
    (full outer, so sinks and sources both appear).  At scale this is
    two map-side-combined shuffles on a long key — the cheapest
    possible degree computation."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("indeg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
        )
    )


# --------------------------------------------------------------------------
# PageRank (power iteration, fixed rounds, per-round rounding)
# --------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    iter_dp: int = 9,
    checkpoint_every: int = 0,
    n_nodes: int | None = None,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst).

    Returns (node, rank).  ``iter_dp`` rounds the rank after every
    iteration (cross-engine determinism — see module docstring);
    ``checkpoint_every`` (0 = off) localCheckpoints the rank table
    every k rounds to truncate lineage on long runs.  Nodes without
    in-links get the teleport term only; nodes without out-links leak
    mass (documented variant).

    ``nodes`` lets a caller that already KNOWS the node set (e.g. the
    synthesized bench graph, where every doc_id is a src) pass it as a
    (node) DataFrame and skip the union+distinct+persist+count
    derivation — at sf0.1 that derivation was 2 extra jobs and ~1.5 s
    of exchanges over the edge list for a set the caller had for free
    (guide §2.4: a distinct on data that is already unique).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .persist()  # re-joined every iteration; without this the
            # node derivation (2 aggs over the edge scan) re-executes
            # per round
        )
    if n_nodes is None:
        n_nodes = nodes.count()
    odeg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    # pre-joined once, reused by every iteration's rank join
    ew = edges.join(odeg, "src").select("src", "dst", "odeg").persist()
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), iter_dp).alias("rank")
    )
    for i in range(n_iter):
        contribs = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("odeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(damping) * F.coalesce("c", F.lit(0.0)),
                iter_dp,
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_oracle_sql(
    edges_cte: str,
    n_iter: int = 5,
    damping: float = 0.85,
    iter_dp: int = 9,
) -> str:
    """Unrolled DuckDB twin of :func:`pagerank`: one CTE per iteration,
    same teleport/damping literals, same per-iteration round.  Returns
    a CTE chain ending in ``r{n_iter}`` (node, rank); the caller
    appends its own final SELECT."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, round(1.0 / n, {iter_dp}) AS rank"
        "  FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""r{i} AS (
              SELECT n.node,
                     round((1.0 - {damping}) / nn.n
                           + {damping} * coalesce(s.c, 0.0), {iter_dp}) AS rank
              FROM nodes n
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank / o.odeg) AS c
                FROM edges e
                JOIN r{i - 1} r ON r.node = e.src
                JOIN odeg o ON o.src = e.src
                GROUP BY e.dst
              ) s ON s.node = n.node
            )"""
        )
    return ",\n        ".join(parts)


# --------------------------------------------------------------------------
# connected components (alternating large-star / small-star)
# --------------------------------------------------------------------------

def _canon(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Unordered pair canonical form (a < b), self-loops dropped."""
    return (
        df.where(F.col(x) != F.col(y))
        .select(
            F.least(x, y).alias("a"),
            F.greatest(x, y).alias("b"),
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 30,
    assume_canonical: bool = False,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns (node, rep) where rep = the component's minimum node id —
    the canonical-representative pick a dedup pipeline keys on.  Only
    nodes that appear in ``pairs`` are returned (singletons have no
    pairs to resolve).

    Alternating large-star / small-star (Kiveris et al. 2014): each
    round re-points edges toward component minima; at the fixpoint the
    edge set is a star forest (every edge = (root, member)).  The edge
    count never exceeds the input's, rounds are O(log n), and each
    round is two keyed aggregate+join pairs — no closure, no driver
    materialization beyond a bounded convergence probe.
    """
    # localCheckpoint (NOT persist) each round: persist truncates
    # re-execution but not the LOGICAL plan — `e` is referenced ~6x per
    # round, so the analyzer's tree multiplies ~6x/round and the driver
    # OOMs building plans long before any executor sees data.
    # localCheckpoint cuts the lineage to a materialized RDD scan.
    #
    # The INPUT edge set only needs persist(), not localCheckpoint():
    # its lineage is one plan deep (no per-round multiplication yet) and
    # persist serves both pre-round references from cache —
    # checkpointing 5.9M input pairs cost ~6 s more than persisting
    # them at sf0.1.
    # assume_canonical=True lets a caller whose pairs are already
    # (a < b, distinct, no self-loops) BY CONSTRUCTION — e.g. the
    # first-band-wins LSH pair stream — skip the _canon distinct, which
    # at sf0.1 is a full exchange of the 5.9M-row pair set
    # (guide §2.4: a distinct on data that is already unique).
    src = (
        pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
        if assume_canonical
        else _canon(pairs, a, b)
    )
    e0 = src.persist()
    # ---- min-contraction pre-round (hash-to-min, one round) --------
    # m(u) = min(N(u) ∪ {u}); contract every edge (a, b) to
    # (m(a), m(b)) and drop the self-loops.  The quotient of a
    # connected graph over ANY node partition is connected, so the
    # contracted graph has exactly the input's components, and the
    # component minimum w survives contraction as itself (every
    # neighbor of w is larger, so m(w) = w) — star-resolving the
    # contracted graph and composing through the node→m mapping is
    # therefore EXACT.  Why this beats running large-star directly on
    # the input (measured at sf0.1, 5.9M near-dup-clique pairs):
    #   * the input cache is scanned twice total (min aggregation +
    #     contraction join) and freed before the star loop — no third
    #     pass, no up-front count job;
    #   * `mins` is persisted+counted BEFORE the contraction join, so
    #     the planner sees its real size (one row per node) and picks
    #     the join strategy from accurate stats — at sf0.1 that is a
    #     broadcast join straight off the cache, where the same join
    #     planned from the aggregate's pessimistic estimate started
    #     sort-merge and paid a full 5.9M-row exchange write before
    #     AQE flipped it (guide §3.1);
    #   * near-dup components are clique-ish, so one contraction
    #     collapses them to their minimum and the star loop runs on a
    #     ~1000x smaller edge set (5.9M → ~5k).  Worst case (a long
    #     path) contracts poorly and merely costs one extra linear
    #     pass before the unchanged O(log n) star rounds.
    sym0 = e0.select(
        F.explode(
            F.array(
                F.struct(F.col("a"), F.col("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    mins0 = (
        sym0.groupBy("a")
        .agg(F.min("b").alias("mn"))
        .select(F.col("a").alias("node"), F.least("mn", F.col("a")).alias("m"))
        .persist()
    )
    mins0.count()  # materializes e0's cache + mins0; accurate join stats
    contracted = _canon(
        e0.join(mins0.select(F.col("node").alias("a"), F.col("m").alias("ma")), "a")
        .join(mins0.select(F.col("node").alias("b"), F.col("m").alias("mb")), "b")
        .select(F.col("ma").alias("x"), F.col("mb").alias("y"))
    )
    e = contracted.persist()
    n_e = e.count()
    e0.unpersist()
    # ---- bounded driver fallback for a SMALL contracted graph ------
    # Near-dup components are clique-ish, so contraction typically
    # leaves a residual graph orders of magnitude smaller than the
    # input (5.9M → ~1k edges at sf0.1); running 2-3 distributed star
    # rounds on a few hundred rows is then pure stage latency (~6 jobs
    # a round).  A residual at or under the same measured 250k-edge
    # threshold the big_round persist gate uses is collected — a
    # BOUNDED collect, ≤250k pairs of longs ≈ 4 MB, the same class as
    # the engine's other bounded collects (centroid fetches, shard-id
    # lists) — and resolved with exact union-find (union-by-min, so
    # rep = component minimum, identical to the star fixpoint).  Any
    # larger residual (e.g. path-shaped graphs that contract poorly)
    # takes the unchanged O(log n) star rounds below: the scale path
    # stays distributed, gated on the measured count, not a cluster
    # constant.
    if 0 < n_e <= 250_000:
        parent: dict = {}

        def _find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in e.collect():
            ra, rb = _find(r[0]), _find(r[1])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        e.unpersist()
        labels_c = e.sparkSession.createDataFrame(
            [(x, _find(x)) for x in parent],
            schema="m {t}, rep {t}".format(t=e.schema[0].dataType.simpleString()),
        )
        return mins0.join(labels_c, "m", "left").select(
            "node", F.coalesce("rep", F.col("m")).alias("rep")
        )
    for _ in range(max_iter if n_e else 0):
        # large-star: per node u, m = min(N(u) + {u}); connect every
        # STRICTLY LARGER neighbor to m
        # both edge directions come from ONE inline explode, not a
        # union of two selects: the union form scans the (cached) edge
        # set twice per reference and `sym` is referenced twice per
        # round — four multi-million-row cache scans at sf0.1 where two
        # suffice (guide §2.4)
        sym = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(
                        F.col("b").alias("a"), F.col("a").alias("b")
                    ),
                )
            ).alias("p")
        ).select("p.a", "p.b")
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least("mn", F.col("a")).alias("m"))
        )
        # large-star joins the CANONICAL edge set, not the symmetric
        # view: with a < b, only the (a→b) direction survives the
        # "strictly larger neighbor" filter (the flipped (b→a) row has
        # a < b and is always dropped), so {(b, m(a)) per canonical
        # edge} IS the large-star output and the join pass reads half
        # the rows (5.9M vs 11.8M at sf0.1; the symmetric view is still
        # what the min aggregation needs)
        large = _canon(
            e.join(mins, "a").select(F.col("b").alias("x"), F.col("m").alias("y")),
        )
        # persist pays off only while the edge set is big: `large` is
        # referenced 3× below, but once the stars have collapsed the
        # graph (n_e small), three recomputes of a tiny in-memory
        # lineage cost less than a cache materialization round-trip —
        # the threshold is a recompute-vs-materialize tradeoff on the
        # CURRENT round's measured edge count, not a cluster-size
        # constant
        big_round = n_e > 250_000
        if big_round:
            large = large.persist()
        # small-star: edges already point larger -> smaller in canonical
        # form (b > a); per node u = b, m = min of its smaller
        # neighborhood; connect u AND each smaller neighbor to m
        mins2 = large.groupBy("b").agg(F.min("a").alias("m"))
        with_min = large.join(mins2, "b")
        small = _canon(
            with_min.select(F.col("a").alias("x"), F.col("m").alias("y"))
            .union(with_min.select(F.col("b").alias("x"), F.col("m").alias("y"))),
        ).localCheckpoint()
        n_small = small.count()
        # both sides are DISTINCT canonical sets: equal count + empty
        # one-way difference <=> set equality (bounded probe, no collect)
        converged = n_small == n_e and small.subtract(e).isEmpty()
        if big_round:
            large.unpersist()
        # free the superseded edge set eagerly — `small` is already an
        # eager localCheckpoint, so nothing re-reads the old blocks;
        # without this every round's multi-million-row edge snapshot
        # stays in the block manager until the context cleaner's next
        # sweep (guide §5: unpersist when done)
        e.unpersist()
        e, n_e = small, n_small
        if converged:
            break
    # star-forest labels of the CONTRACTED graph (covers every
    # contracted node with at least one surviving edge) ...
    labels_c = (
        e.select(F.col("b").alias("m"), F.col("a").alias("rep"))
        .union(e.select(F.col("a").alias("m"), F.col("a").alias("rep")))
        .distinct()
    )
    # ... composed through the node→m mapping: rep(u) = rep_c(m(u)),
    # falling back to m(u) itself when its contracted component is a
    # singleton (all of its edges collapsed — then m(u) IS the
    # component minimum, see the contraction note above).  mins0 has
    # exactly one row per node appearing in `pairs`, preserving the
    # output contract.  mins0 stays persisted: the returned plan reads
    # it, and the context cleaner reclaims it when the caller drops
    # the DataFrame (same lifetime the star forest's checkpoint blocks
    # already have).
    return mins0.join(labels_c, "m", "left").select(
        "node", F.coalesce("rep", F.col("m")).alias("rep")
    )


def components_oracle_sql(pairs_cte: str) -> str:
    """DuckDB twin of :func:`connected_components`: transitive closure
    via a recursive CTE (semi-naive; fine at oracle scale, exactly the
    quadratic-blowup shape the Spark side avoids), rep = min reachable.
    ``pairs_cte``: a full SELECT producing (doc_a, doc_b).  Returns a
    WITH RECURSIVE chain ending in ``comp`` (node, rep)."""
    return f"""
        pairs AS (SELECT * FROM ({pairs_cte}) _pairs_q),
        und AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        reach(s, t) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM und) _n
          UNION
          SELECT r.s, e.v FROM reach r JOIN und e ON e.u = r.t
        ),
        comp AS (
          SELECT s AS node, min(t) AS rep FROM reach GROUP BY s
        )"""
