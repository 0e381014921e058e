"""Graph analytics over the relational tables: integer-exact PageRank.

The customer–supplier interaction graph (who bought from whom, via
orders ⋈ lineitem) is the TPC-H-shaped stand-in for the link graphs a
training-data pipeline ranks (domain graphs for crawl prioritization,
citation graphs for source weighting).

Why integer fixed-point: PageRank is a per-node SUM of float
contributions, and Spark's tree aggregation and DuckDB's sequential
aggregation sum in different orders — the classic cross-engine hash
killer. Holding ranks as BIGINT trillionths and dividing with integer
DIV makes every iteration bit-exact on both engines (the same trick as
functions/exact.py), so even the 5th iteration hash-matches.

Scale shape: one shuffle per iteration (contributions grouped by
destination), the same join-partitioning reused every round, and a
localCheckpoint per iteration so the lazy plan stays constant-size (the
connected-components discipline from dedup.py). The iteration count is
fixed (5) — the driver never inspects convergence, so there is NO
per-round driver traffic at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_migrator_spark.functions.exact import int_div
from database_migrator_spark.plans.registry import query
from database_migrator_spark.sources import table

_SCALE = 1_000_000_000_000  # ranks in trillionths
_DAMP_NUM, _DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio
_ITERATIONS = 5


def pagerank_fixed_point(
    edges: DataFrame, iterations: int = _ITERATIONS
) -> DataFrame:
    """Undirected PageRank in BIGINT trillionths over distinct (u, v)
    edges (both directions present). Returns (u, r) after ``iterations``
    rounds of r'(v) = (15·⌊SCALE/N⌋ + 85·Σ_{u~v} ⌊r(u)/deg(u)⌋) DIV 100.

    Every node in an undirected edge list has deg ≥ 1 and receives mass
    each round, so there is no dangling-mass term to redistribute."""
    from pyspark.sql import Window

    und = edges.localCheckpoint(eager=True)
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    # r15 (guide §3.3, join-then-explode): each round used to join the
    # rank vector against the EDGE-ROW list (one row per edge, total
    # degree pre-joined), shuffling edge-scale rows through the join
    # every iteration. The static adjacency is instead grouped ONCE into
    # neighbor ARRAYS, so the per-round join is node-scale and the
    # per-node r DIV d is computed once per node, with the edge-scale
    # fan-out happening AFTER the join via explode (same bytes, far
    # fewer join rows; interleaved A/B at sf0.1: min 4.60 → 3.10 s,
    # −33%). Arrays are CHUNKED at _ADJ_CHUNK neighbors via a
    # deterministic hash of the neighbor id so a web-scale hot node can
    # never become one giant row (skew/OOM guard; d stays the TOTAL
    # degree via a window, so r DIV d is unchanged and chunk sums add
    # exactly).
    adj = (
        und.withColumn("d", F.count("*").over(Window.partitionBy("u")))
        .withColumn(
            "ch",
            F.pmod(
                F.xxhash64("v"), F.ceil(F.col("d") / F.lit(_ADJ_CHUNK))
            ).cast("int"),
        )
        .groupBy("u", "ch")
        .agg(F.collect_list("v").alias("vs"), F.min("d").alias("d"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()  # one scalar action at setup, none per iteration
    base = _SCALE // n
    r = deg.select("u", F.lit(base).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (
            r.join(adj, "u")
            .withColumn("c", F.expr("r DIV d"))
            .select(F.explode("vs").alias("u"), "c")
        )
        r = (
            contrib.groupBy("u")
            .agg(F.sum("c").alias("s"))
            .select(
                "u",
                # teleport term precomputed in Python; L-suffixed literals
                # keep Spark SQL in BIGINT (bare ints are 32-bit and
                # 15*base overflows INT under ANSI)
                F.expr(
                    f"CAST(({(_DAMP_DEN - _DAMP_NUM) * base}L "
                    f"+ {_DAMP_NUM}L * s) DIV {_DAMP_DEN}L AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # constant plan per round
        )
    return r


@query(
    "q110_pagerank",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), und AS (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), deg AS (
        SELECT u, COUNT(*) AS d FROM und GROUP BY u
    ), nn AS (
        SELECT COUNT(*) AS n FROM deg
    ), pr AS (
        SELECT u, CAST({_SCALE} // n AS BIGINT) AS r, 0 AS it FROM deg, nn
        UNION ALL
        SELECT und.v AS u,
               CAST((15 * ({_SCALE} // (SELECT n FROM nn))
                     + 85 * SUM(pr.r // deg.d)) // 100 AS BIGINT) AS r,
               pr.it + 1 AS it
        FROM pr
        JOIN deg ON deg.u = pr.u
        JOIN und ON und.u = pr.u
        WHERE pr.it < {_ITERATIONS}
        GROUP BY und.v, pr.it
    )
    SELECT CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           CAST(u // 2 AS BIGINT) AS key,
           CAST(r AS DOUBLE) / CAST({_SCALE} AS DOUBLE) AS rank
    FROM pr WHERE it = {_ITERATIONS}
    ORDER BY rank DESC, kind, key
    LIMIT 20
    """,
    tags=("graph", "pagerank", "iterative", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q110_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank over the undirected customer–supplier purchase
    graph after 5 fixed iterations, in exact BIGINT trillionths — the
    oracle replays the identical integer recurrence as ONE recursive CTE
    (aggregation over the working table, same ⌊·⌋ divisions), so ranks
    hash-match bit-for-bit. Customers get even node ids, suppliers odd,
    which also proves the two partitions never collide."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    r = pagerank_fixed_point(und)
    return (
        r.select(
            F.when(F.col("u") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("u DIV 2").cast("long").alias("key"),
            (F.col("r").cast("double") / F.lit(float(_SCALE))).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "kind", "key")
        .limit(20)
    )


_BFS_MAX_HOPS = 6

# Max neighbors per adjacency-array row in the PageRank-family loops: the
# grouped adjacency makes the per-round join node-scale (guide §3.3), but
# an UNCAPPED collect_list would turn a web-scale hot node into one giant
# row (straggler/OOM). Chunking by a deterministic neighbor-id hash keeps
# every row bounded while the windowed total degree keeps the recurrence
# bit-identical.
_ADJ_CHUNK = 1024


@query(
    "q147_bfs_reachability",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), und AS (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), src AS (
        SELECT MIN(u) AS s FROM und
    ), reach(u, d) AS (
        SELECT s AS u, 0 AS d FROM src
        UNION
        SELECT und.v AS u, reach.d + 1 AS d
        FROM reach JOIN und ON und.u = reach.u
        WHERE reach.d < {_BFS_MAX_HOPS}
    ), dist AS (
        SELECT u, MIN(d) AS hops FROM reach GROUP BY u
    )
    SELECT CAST(hops AS BIGINT) AS hops,
           COUNT(*)             AS n_nodes,
           CAST(MIN(u) AS BIGINT) AS min_node,
           CAST(MAX(u) AS BIGINT) AS max_node
    FROM dist
    GROUP BY hops
    ORDER BY hops
    """,
    tags=("graph", "bfs", "iterative", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q147_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the undirected customer–supplier purchase
    graph (the crawl-frontier / link-expansion primitive): per hop count
    (≤ 6 = _BFS_MAX_HOPS), the number of nodes first reached at that depth
    plus min/max node id — a frontier-expansion loop, the third iterative
    class next to min-label components (q72) and PageRank (q110).

    Spark shape: each round joins the FRONTIER (not the full distance
    table) against the static edge list, anti-joins already-visited
    nodes, and localCheckpoints both frames — constant plan per round,
    shuffles keyed on node id, zero per-round driver traffic (the
    convergence probe is an isEmpty on the frontier). The oracle replays
    the same expansion as a recursive CTE with UNION-dedup (bounded to
    N·hops rows) and takes MIN(d) per node.

    Cites the reference only for contrast: Database::Migrator has no
    graph surface; this is pipeline-mandated capability (SURVEY.md §2B).
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    und = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    src = und.agg(F.min("u").alias("u")).select("u", F.lit(0).alias("hops"))
    dist = src.localCheckpoint(eager=True)
    frontier = dist.select("u")
    for d in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(und, "u")
            .select(F.col("v").alias("u"))
            .distinct()
            .join(dist.select("u"), "u", "left_anti")
            .select("u", F.lit(d).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("u")
    return (
        dist.groupBy("hops")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("u").alias("min_node"),
            F.max("u").alias("max_node"),
        )
        .select(
            F.col("hops").cast("long").alias("hops"),
            "n_nodes",
            "min_node",
            "max_node",
        )
        .orderBy("hops")
    )


@query(
    "q180_degree_assortativity",
    oracle="""
    WITH e AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), und AS (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), deg AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT)            AS m2,
               CAST(SUM(da.d) AS BIGINT)           AS sx,
               CAST(SUM(db.d) AS BIGINT)           AS sy,
               CAST(SUM(da.d * db.d) AS BIGINT)    AS sxy,
               CAST(SUM(da.d * da.d) AS BIGINT)    AS sxx,
               CAST(SUM(db.d * db.d) AS BIGINT)    AS syy
        FROM und
        JOIN deg da ON da.u = und.u
        JOIN deg db ON db.u = und.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           CAST(m2 / 2 AS BIGINT) AS n_edges,
           CAST(ROUND(
               CAST(m2 * sxy - sx * sy AS DOUBLE)
               / (sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(m2 * syy - sy * sy AS DOUBLE)))
               * 1000000000) AS BIGINT) / 1000000000.0 AS assortativity
    FROM sums
    WHERE m2 * sxx > sx * sx AND m2 * syy > sy * sy
    """,
    tags=("graph", "assortativity", "degree", "statistics", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q180_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman's r) of the undirected customer–
    supplier purchase graph — do high-degree nodes attach to high-degree
    nodes? The one-number mixing diagnostic a crawl/link pipeline reads
    before trusting PageRank-style propagation (q110): strongly
    disassortative graphs concentrate rank in hubs. Pearson correlation
    of endpoint degrees over the 2m directed edge slots, folded as exact
    BIGINT sums (q170's recipe) after two node-keyed joins of the edge
    list against the degree table — both corpus-sized, both pinned
    shuffle_merge (never broadcast an unbounded derived table), keyed on
    the SAME node id the degree aggregate shuffles on. One double
    expression + 1e-9 fixed-point rounding at the end; degenerate
    (regular) graphs excluded by the integer guard. Integer bound:
    2m·Σd² < 2^63 holds through ~10^9 edges of max degree ~10^4."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    und = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)  # consumed by deg AND both sum joins
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    da = deg.select(F.col("u").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("ub"), F.col("d").alias("db"))
    sums = (
        und.join(da.hint("shuffle_merge"), und["u"] == da["ua"])
        .join(db.hint("shuffle_merge"), und["v"] == db["ub"])
        .agg(
            F.count("*").alias("m2"),
            F.sum("da").alias("sx"),
            F.sum("db").alias("sy"),
            F.sum(F.col("da") * F.col("db")).alias("sxy"),
            F.sum(F.col("da") * F.col("da")).alias("sxx"),
            F.sum(F.col("db") * F.col("db")).alias("syy"),
        )
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    r = (F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.sqrt((F.col("m2") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("m2") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return (
        sums.crossJoin(F.broadcast(n_nodes))
        .where(
            (F.col("m2") * F.col("sxx") > F.col("sx") * F.col("sx"))
            & (F.col("m2") * F.col("syy") > F.col("sy") * F.col("sy"))
        )
        .select(
            "n_nodes",
            F.expr("m2 DIV 2").cast("long").alias("n_edges"),
            (F.round(r * F.lit(1e9)).cast("long") / F.lit(1e9)).alias("assortativity"),
        )
    )


@query(
    "q194_kcore_3core",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), und AS (
        SELECT u, v FROM base UNION ALL SELECT v AS u, u AS v FROM base
    ), peel(it, u, v) AS (
        SELECT 0, u, v FROM und
        UNION ALL
        SELECT p.it + 1, p.u, p.v
        FROM peel p
        JOIN (SELECT u, COUNT(*) AS d FROM peel GROUP BY u) da ON da.u = p.u
        JOIN (SELECT u, COUNT(*) AS d FROM peel GROUP BY u) db ON db.u = p.v
        WHERE p.it < 6 AND da.d >= 3 AND db.d >= 3
    ), agg AS (
        SELECT
          (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) FROM peel WHERE it = 6)
              AS n_nodes_core,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM peel WHERE it = 6) AS m2_6,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM peel WHERE it = 5) AS m2_5
    )
    SELECT CAST(3 AS BIGINT) AS k, CAST(6 AS BIGINT) AS rounds,
           n_nodes_core, CAST(m2_6 // 2 AS BIGINT) AS n_edges_core,
           CAST(CASE WHEN m2_6 = m2_5 THEN 1 ELSE 0 END AS BIGINT) AS converged
    FROM agg
    """,
    tags=("graph", "kcore", "iterative", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q194_kcore_3core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the customer–supplier graph by iterative peeling — the
    dense-subgraph extractor (spam-farm / boilerplate-ring detection in
    link graphs; the "stable community" filter before PageRank-weighted
    sampling): repeatedly delete nodes of degree < 3 until stable.
    Fixed 6 peel rounds on BOTH engines (the BFS/PageRank discipline —
    no driver-side convergence inspection; the `converged` column
    REPORTS whether round 6 changed anything instead), so results are
    bit-identical by construction: each round recomputes exact integer
    degrees on the surviving edge set and keeps edges whose BOTH
    endpoints have degree >= 3, i.e. two left-semi joins against the
    same degree aggregate, localCheckpointed per round to hold the lazy
    plan constant-size.  The oracle replays the identical peel as a
    DuckDB recursive CTE (aggregation + multiple working-table
    references, the q106 BPE precedent).  Per-round cost at 100 TB is
    one degree shuffle + two semi joins on the shrinking edge set —
    never more than the edge list, never all-pairs."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    cur = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    prev = cur
    for _ in range(6):
        prev = cur
        deg = cur.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= 3).select("u")
        cur = (
            cur.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    m6 = cur.agg(F.count("*").alias("m2_6"))
    m5 = prev.agg(F.count("*").alias("m2_5"))
    nodes = cur.select("u").distinct().agg(F.count("*").alias("n_nodes_core"))
    return (
        m6.crossJoin(F.broadcast(m5))
        .crossJoin(F.broadcast(nodes))
        .select(
            F.lit(3).cast("long").alias("k"),
            F.lit(6).cast("long").alias("rounds"),
            "n_nodes_core",
            F.expr("m2_6 DIV 2").cast("long").alias("n_edges_core"),
            F.when(F.col("m2_6") == F.col("m2_5"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("converged"),
        )
    )


def pagerank_weighted_fixed_point(
    und: DataFrame, iterations: int = _ITERATIONS
) -> DataFrame:
    """WEIGHTED PageRank in BIGINT trillionths over a symmetric weighted
    edge list (u, v, w) — q110's integer recurrence with each neighbor's
    mass split in proportion to edge weight instead of 1/deg:
    r'(v) = (15·⌊SCALE/N⌋ + 85·Σ_{u~v} ⌊r(u)·w(u,v) / W(u)⌋) DIV 100,
    W(u) = Σ_x w(u,x). r ≤ SCALE (mass conservation + teleport), so
    r·w stays under 2^63 while w < ~9e6; the guard fails loudly past
    that (rescale weights — only RATIOS w/W matter)."""
    from database_migrator_spark.functions.exact import exactness_guard

    # r15 note: the q110 chunked-adjacency shape was A/B'd here too and
    # REVERTED — q241's co-occurrence graph is VOCABULARY-bounded (nodes
    # are words), so the join-row reduction is small while the
    # window+chunk substrate adds string-keyed sorts; interleaved A/B at
    # sf0.1: edge rows med 1.81 s vs adjacency med 1.91 s. Edge rows
    # stay.
    und = und.localCheckpoint(eager=True)
    wd = und.groupBy("u").agg(F.sum("w").alias("tw"))
    und_wd = (
        und.join(wd, "u")
        .where(
            exactness_guard(
                F.col("w") < F.lit(9_000_000),
                "pagerank_weighted: edge weight >= 9e6 — r*w would exceed "
                "2^63; rescale weights (only w/W ratios matter)",
            )
        )
        .localCheckpoint(eager=True)
    )
    n = wd.count()  # one scalar action at setup, none per iteration
    base = _SCALE // n
    r = wd.select("u", F.lit(base).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = r.join(und_wd, "u").select(
            F.col("v").alias("u"), F.expr("(r * w) DIV tw").alias("c")
        )
        r = (
            contrib.groupBy("u")
            .agg(F.sum("c").alias("s"))
            .select(
                "u",
                F.expr(
                    f"CAST(({(_DAMP_DEN - _DAMP_NUM) * base}L "
                    f"+ {_DAMP_NUM}L * s) DIV {_DAMP_DEN}L AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # constant plan per round
        )
    return r


@query(
    "q241_textrank_keywords",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> len(t) >= 3) AS t
        FROM documents
    ), bg AS (
        SELECT LEAST(pair[1], pair[2]) AS u,
               GREATEST(pair[1], pair[2]) AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> [t[i], t[i+1]])) AS pair
            FROM toks WHERE len(t) >= 2
        ) WHERE pair[1] <> pair[2]
        GROUP BY 1, 2
    ), und AS (
        SELECT u, v, w FROM bg UNION ALL SELECT v AS u, u AS v, w FROM bg
    ), wd AS (
        SELECT u, CAST(SUM(w) AS BIGINT) AS tw FROM und GROUP BY u
    ), nn AS (
        SELECT COUNT(*) AS n FROM wd
    ), pr AS (
        SELECT u, CAST({_SCALE} // n AS BIGINT) AS r, 0 AS it FROM wd, nn
        UNION ALL
        SELECT und.v AS u,
               CAST((15 * ({_SCALE} // (SELECT n FROM nn))
                     + 85 * SUM((pr.r * und.w) // wd.tw)) // 100
                    AS BIGINT) AS r,
               pr.it + 1 AS it
        FROM pr
        JOIN wd ON wd.u = pr.u
        JOIN und ON und.u = pr.u
        WHERE pr.it < {_ITERATIONS}
        GROUP BY und.v, pr.it
    )
    SELECT u AS word, CAST(r AS DOUBLE) / {_SCALE}.0 AS rank
    FROM pr WHERE it = {_ITERATIONS}
    ORDER BY rank DESC, word LIMIT 20
    """,
    tags=("graph", "textrank", "keywords", "iterative", "llm-pipeline"),
    checkpointed_substrate=True,
)
def q241_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): WEIGHTED
    PageRank over the word co-occurrence graph — nodes are corpus words
    (len ≥ 3), edges connect adjacent tokens with weight = corpus-wide
    co-occurrence count, and a word's rank is its stationary mass. The
    unsupervised keyword ranker of extractive-summarization pipelines:
    unlike raw frequency (q91) it rewards words that co-occur with
    many OTHER central words. Weighted mass-splitting (r·w DIV W)
    differentiates hubs even on near-complete graphs, where unweighted
    PageRank collapses to the uniform vector.

    Same exactness discipline as q110: BIGINT trillionths, integer
    floor divisions, 5 fixed iterations, one recursive-CTE oracle
    replaying the identical recurrence — hash-matched bit-for-bit.
    Shape at scale: the (u,v,w) co-occurrence build is one
    bigram-vocabulary aggregate off one corpus scan; each round is one
    rank⋈edges join + one destination-keyed aggregate, localCheckpoint
    per round (constant plan), zero per-round driver traffic."""
    from database_migrator_spark.operators.dedup import tokens_of

    d = table(spark, sf_dir, "documents")
    # adjacency over the FILTERED token sequence (the oracle's semantics:
    # dropping short tokens splices their neighbors together), via one
    # positional zip of the filtered array with its own tail — the
    # doc_bigrams fold shape, never per-pair lambdas
    toks = F.filter(tokens_of("text"), lambda t: F.length(t) >= 3)
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        d.where(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .where(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("u"),
            F.greatest("w1", "w2").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )
    und = bg.union(bg.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    r = pagerank_weighted_fixed_point(und)
    return (
        r.select(
            F.col("u").alias("word"),
            (F.col("r").cast("double") / F.lit(float(_SCALE))).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "word")
        .limit(20)
    )


# --- q272: label-propagation communities ------------------------------------
#
# Synchronous LPA with the deterministic tie-break "highest neighbour-label
# count, then smallest label", packed into one BIGINT so a single MIN
# aggregate resolves both keys: enc = (2^31 - c)·2^32 + lab.  c ≥ 1 keeps
# the product under 2^63; labels are node ids, guarded < 2^32 so the
# decode `enc % 2^32` is exact.
_LPA_ROUNDS = 4
_LPA_C_BASE = 2_147_483_648  # 2^31
_LPA_LAB_MOD = 4_294_967_296  # 2^32


@query(
    "q272_label_propagation_communities",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), und AS (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), labels(u, lab, r) AS (
        SELECT DISTINCT u, u AS lab, 0 AS r FROM und
        UNION ALL
        SELECT u,
               CAST(MIN(({_LPA_C_BASE} - c) * {_LPA_LAB_MOD} + lab)
                    % {_LPA_LAB_MOD} AS BIGINT) AS lab,
               r + 1 AS r
        FROM (
            SELECT und.u AS u, l.lab AS lab, COUNT(*) AS c,
                   ANY_VALUE(l.r) AS r
            FROM und JOIN labels l ON und.v = l.u
            WHERE l.r < {_LPA_ROUNDS}
            GROUP BY und.u, l.lab
        )
        GROUP BY u, r
    )
    SELECT CAST(lab AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(u) AS BIGINT) AS min_part
    FROM labels WHERE r = {_LPA_ROUNDS}
    GROUP BY lab
    ORDER BY n_nodes DESC, community
    """,
    tags=("graph", "community", "label-propagation", "iterative"),
    checkpointed_substrate=True,
)
def q272_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the part
    CO-PURCHASE graph (parts that share an order; TPC-H orders hold ≤ 7
    lines, so the per-order pair fan-out is bounded — the projection is
    scale-safe, unlike a shared-key projection with unbounded groups).
    Each of the {_LPA_ROUNDS} rounds every node adopts its most frequent
    neighbour label, ties to the SMALLEST label — both keys resolved by
    one MIN over a packed BIGINT, so the recurrence is pure integer
    arithmetic and the DuckDB recursive CTE replays it bit-for-bit
    (q110's single-statement-oracle pattern). Per-round localCheckpoint
    keeps the lazy plan constant (CLAUDE.md iterative invariant); the
    co-purchase substrate is sketched once. Unlike min-label propagation
    (= connected components, q72), frequency voting splits the giant
    component into co-purchase communities."""
    from database_migrator_spark.functions.exact import exactness_guard

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    und = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select("u")
        .distinct()
        .where(
            exactness_guard(
                F.col("u") < F.lit(_LPA_LAB_MOD),
                "q272: node id must fit the 2^32 label-packing bound",
            )
        )
        .select("u", F.col("u").alias("lab"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_LPA_ROUNDS):
        nb = und.join(
            labels.select(F.col("u").alias("v"), "lab"), "v"
        ).select("u", "lab")
        # r15: ONE explicit repartition(u) feeds BOTH per-round
        # aggregations — HashPartitioning(u) satisfies the clustering of
        # groupBy(u, lab) (subset rule) and of groupBy(u), so the round
        # does one exchange after the join instead of two (guide §2.4).
        # Bytes are not worse: the old first exchange carried the
        # (u, lab) rows with near-zero map-side reduction (labels are
        # distinct per node early on) PLUS a second exchange of the
        # counts; interleaved A/B at sf0.1: min 6.76 → 6.02 s (−11%).
        nb = nb.repartition(F.col("u"))
        cnt = nb.groupBy("u", "lab").agg(F.count("*").alias("c"))
        enc = (F.lit(_LPA_C_BASE) - F.col("c")) * F.lit(_LPA_LAB_MOD) + F.col("lab")
        labels = (
            cnt.groupBy("u")
            .agg(F.min(enc).alias("enc"))
            .select("u", F.pmod(F.col("enc"), F.lit(_LPA_LAB_MOD)).alias("lab"))
            # constant plan per round. Cadence experiments measured and
            # REVERTED (docs/ROUND13_NOTES.md): every-2nd-round ~28%
            # slower (re-executes the skipped round's join), lazy ~3%.
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy("lab")
        .agg(F.count("*").alias("n_nodes"), F.min("u").alias("min_part"))
        .select(
            F.col("lab").cast("long").alias("community"),
            "n_nodes",
            F.col("min_part").cast("long").alias("min_part"),
        )
        .orderBy(F.col("n_nodes").desc(), "community")
    )


# --- q296: time-respecting earliest-arrival reachability ---------------------

_TR_ROUNDS = 4  # synchronous Bellman-Ford relaxation rounds (both engines)
_TR_EPOCH = "1992-01-01"  # day-0 anchor; arrivals are exact integer days


@query(
    "q296_temporal_reachability",
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v,
               date_diff('day', DATE '{_TR_EPOCH}', o_orderdate) AS t
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), te AS (
        SELECT u, v, t FROM e UNION ALL SELECT v AS u, u AS v, t FROM e
    ), ta AS (
        SELECT (SELECT MIN(u) FROM te) AS node,
               CAST(0 AS BIGINT) AS arr, 0 AS it
        UNION ALL
        (
        SELECT node, MIN(arr) AS arr, MIN(it) + 1 AS it
        FROM (
            SELECT ta.node, ta.arr, ta.it FROM ta WHERE ta.it < {_TR_ROUNDS}
            UNION ALL
            SELECT te.v AS node, CAST(te.t AS BIGINT) AS arr, ta.it
            FROM ta JOIN te ON te.u = ta.node AND te.t >= ta.arr
            WHERE ta.it < {_TR_ROUNDS}
        ) rel
        GROUP BY node
        )
    )
    SELECT arr // 30 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers,
           CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppliers,
           CAST(MIN(arr) AS BIGINT) AS min_arrival_day,
           CAST(MAX(arr) AS BIGINT) AS max_arrival_day,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM ta WHERE it = {_TR_ROUNDS}
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("graph", "temporal", "reachability", "iterative"),
    checkpointed_substrate=True,
)
def q296_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RESPECTING earliest-arrival reachability (temporal-graph
    diffusion: Holme & Saramäki's temporal paths) — the FOURTH iterative
    class, distinct from frontier-set BFS (q147: membership expands),
    min-label components (q72: labels contract) and power iteration
    (q110/q276: dense linear recurrence): here a VALUE relaxes over the
    min-plus semiring. An interaction (customer, supplier, order day t)
    is a bidirectional temporal edge usable only at times >= the
    carrier's own arrival, so information flowing from the seed node
    must traverse edges with NON-DECREASING timestamps — static
    reachability (q147) overstates true diffusion whenever the only
    connecting path runs backwards in time.

    {_TR_ROUNDS} synchronous Bellman-Ford rounds on exact integer days:
    arr'[v] = min(arr[v], min(t : edge (u,v,t), t >= arr[u])), both
    engines replaying the identical schedule (the oracle's recursive
    CTE carries the full arrival table with an iteration counter, the
    q110/q252 pattern). Spark shape: per round ONE node-keyed
    shuffle-merge join of the arrival table against the checkpointed
    edge list + a min-merge aggregate, arrival table localCheckpointed
    per round (constant plan). The arrival table is NODE-scale —
    unbounded at 100 TB — so the join is pinned shuffle_merge, never
    broadcast. Output: monthly arrival-wave histogram (bucket =
    arr intdiv 30; non-negative, so floor == truncate)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
            F.datediff(F.col("o_orderdate"), F.lit(_TR_EPOCH)).cast("long").alias("t"),
        )
        .distinct()
    )
    te = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), "t")
    ).localCheckpoint(eager=True)
    ta = (
        te.agg(F.min("u").alias("node"))
        .select("node", F.lit(0).cast("long").alias("arr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_TR_ROUNDS):
        # r15: the raw relaxation rows (v, t) feed the union's
        # groupBy(node).min directly — the former per-round
        # groupBy(v).min pre-aggregate re-reduced the SAME key the outer
        # aggregate reduces, and the outer aggregate's map-side partial
        # min performs the identical reduction before its exchange, so
        # dropping the inner aggregate removes one exchange + stage per
        # round at zero shuffle-byte cost (min is associative;
        # interleaved A/B at sf0.1: med 5.1 → 4.2 s, every rep faster).
        relax = (
            ta.hint("shuffle_merge")
            .join(te, (ta["node"] == te["u"]) & (te["t"] >= ta["arr"]))
            .select(F.col("v").alias("node"), F.col("t").alias("arr"))
        )
        ta = (
            ta.unionByName(relax)
            .groupBy("node")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=True)
        )
    return (
        ta.groupBy(int_div(F.col("arr"), F.lit(30)).alias("bucket"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_customers"),
            F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_suppliers"),
            F.min("arr").alias("min_arrival_day"),
            F.max("arr").alias("max_arrival_day"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("bucket")
    )
