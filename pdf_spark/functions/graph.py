"""Link-graph operators (the crawl-stack graph tier).

A web corpus IS a graph: rank-by-link-structure (PageRank) decides crawl
priority and quality weighting at every serious crawler. The synthetic
edge set is derived arithmetically from doc_ids (out-degree doc_id%3+1,
targets (u*7+k) % N) so both engines construct the identical graph with
no external data, matching the qx-family's generator-derived style.

Scale shape (10^12 nodes): each PageRank iteration is one explode of the
(tiny per-node) adjacency + one shuffle on the destination key — the
classic Spark formulation. Iteration count is fixed (2) and unrolled in
the DuckDB oracle; the Spark side runs the same two rounds as a loop
over DataFrames, the way a real driver schedules it (same driver-feedback
pattern as qs10's Lloyd iterations). Scores are FIXED-POINT BIGINTs
(1e-12 grain): float PageRank needs a per-iteration ROUND whose halfway
semantics differ across engines (Spark HALF_UP vs DuckDB HALF_EVEN on
doubles — this structured value set lands EXACTLY on .5 boundaries, seen
at sf0.1), while integer sums are order-independent and integer division
of positives floors identically everywhere. pr = pr_fp / 1e12; damping
0.85 = 17/20 and teleport 0.15 = 3/20 stay exact rationals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_spark.functions.tables import load, register_views

QUERIES = {}
ORACLE = {}

_DAMP = 0.85


_SCALE = 10**12  # fixed-point grain: pr = pr_fp / 1e12


def _qg01(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id")
    n = docs.count()  # node count: tiny driver-side scalar, like qs10's K
    deg = docs.select(
        F.col("doc_id").alias("u"),
        (F.col("doc_id") % 3 + 1).cast("long").alias("d"),
    )
    edges = deg.select(
        "u",
        "d",
        F.explode(F.expr("sequence(1, CAST(d AS INT))")).alias("k"),
    ).select(
        "u", "d", ((F.col("u") * 7 + F.col("k")) % n).cast("long").alias("v")
    )
    # pr0 = SCALE/n everywhere; two damped iterations, all-integer:
    # pr' = (3*SCALE) div (20n) + (17 * mass) div 20,
    # mass = sum over in-edges of (pr div d)
    pr = docs.select("doc_id", F.lit(_SCALE // n).alias("pr_fp"))
    for _ in range(2):
        contrib = (
            edges.join(pr, edges["u"] == pr["doc_id"])
            .select("v", F.expr("pr_fp div d").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("mass"))
        )
        pr = (
            docs.join(contrib, docs["doc_id"] == contrib["v"], "left")
            .select(
                "doc_id",
                (
                    F.lit((3 * _SCALE) // (20 * n))
                    + F.expr("(17 * coalesce(mass, 0L)) div 20")
                ).cast("long").alias("pr_fp"),
            )
        )
    return pr.select("doc_id", F.col("pr_fp").alias("pagerank_fp"))


QUERIES["qg01_pagerank"] = _qg01
ORACLE["qg01_pagerank"] = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d FROM documents),
edges AS (
  SELECT u, d, CAST((u * 7 + t.k) % (SELECT n FROM nn) AS BIGINT) AS v
  FROM deg, LATERAL unnest(range(1, d + 1)) t(k)
),
pr0 AS (SELECT doc_id, {_SCALE} // (SELECT n FROM nn) AS pr_fp FROM documents),
m1 AS (
  SELECT e.v, SUM(p.pr_fp // e.d) AS mass
  FROM edges e JOIN pr0 p ON e.u = p.doc_id GROUP BY e.v
),
pr1 AS (
  SELECT d.doc_id,
         CAST((3 * {_SCALE}) // (20 * (SELECT n FROM nn))
              + ((17 * COALESCE(m.mass, 0)) // 20) AS BIGINT) AS pr_fp
  FROM documents d LEFT JOIN m1 m ON d.doc_id = m.v
),
m2 AS (
  SELECT e.v, SUM(p.pr_fp // e.d) AS mass
  FROM edges e JOIN pr1 p ON e.u = p.doc_id GROUP BY e.v
),
pr2 AS (
  SELECT d.doc_id,
         CAST((3 * {_SCALE}) // (20 * (SELECT n FROM nn))
              + ((17 * COALESCE(m.mass, 0)) // 20) AS BIGINT) AS pr_fp
  FROM documents d LEFT JOIN m2 m ON d.doc_id = m.v
)
SELECT doc_id, pr_fp AS pagerank_fp FROM pr2
"""


# --- qg02: degree profile ------------------------------------------------------
#
# The link-graph sanity dashboard: in/out degree distribution. One edge
# construction + two tiny aggregations; at corpus scale both group-bys
# are map-side-combined on small-integer keys.

_QG02_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
indeg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ind FROM edges GROUP BY v)
SELECT ind AS in_degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM indeg GROUP BY ind
"""

QUERIES["qg02_degree_profile"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(
        _QG02_BODY.replace(
            "{EDGE_SRC}",
            "(SELECT u, d, explode(sequence(1, CAST(d AS INT))) AS k FROM deg)",
        )
    )
)
ORACLE["qg02_degree_profile"] = _QG02_BODY.replace(
    "{EDGE_SRC}", "deg, LATERAL unnest(range(1, d + 1)) t(k)"
)


# --- qg03: triangle counting ----------------------------------------------------
#
# The standard graph-analytics benchmark op (clustering-coefficient
# numerator). Edges undirected-ize and canonicalize to u < v, so each
# triangle {a<b<c} is counted exactly once by the (a,b)x(b,c)->(a,c)
# wedge-close join. The canonical-ordering trick is ALSO the scale trick:
# joining only low->high halves the wedge count and bounds the self-join
# by the degree distribution (here deg<=~6 after undirection; at web
# scale this is where you'd cap/sample hub degrees first).

_QG03_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
raw AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
und AS (
  SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
  FROM raw WHERE u <> v
),
wedges AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1 JOIN und e2 ON e1.b = e2.a
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM wedges w JOIN und e3 ON w.a = e3.a AND w.c = e3.b
"""

_EDGE_SRC_SPARK = (
    "(SELECT u, d, explode(sequence(1, CAST(d AS INT))) AS k FROM deg)"
)
_EDGE_SRC_DUCK = "deg, LATERAL unnest(range(1, d + 1)) t(k)"

QUERIES["qg03_triangle_count"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG03_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg03_triangle_count"] = _QG03_BODY.replace(
    "{EDGE_SRC}", _EDGE_SRC_DUCK
)


def _qg04(spark: SparkSession, sf: str) -> DataFrame:
    """Redirect-chain resolution by POINTER DOUBLING (path contraction).

    Crawls accumulate 3xx chains (http->https, www rewrites, moved
    pages); the canonical-destination map is a per-node "follow until
    terminal" walk. The naive formulation is h sequential joins for
    chains of length h; this one doubles the pointer each round —
    after k rounds every node knows its 2^k-th ancestor (clamped at the
    terminal, which points to itself) — so 10^12 rows resolve in
    ceil(log2(h_max)) shuffles, not h_max. Three rounds cover chains of
    length <= 8; nodes still unresolved after that (cycles, longer
    chains) would surface as resolved=false, the production escape
    hatch. Hop counts ride the same doubling (dist' = dist_a + dist_b),
    so the chain length is verified exactly, not just the endpoint.

    Chain structure (constructed-answer oracle): doc i redirects to i-1
    unless i % 8 == 0 (the block head is terminal), so final = i - i%8
    and hops = i%8 — but the ENGINE walks real per-row edges; only the
    oracle uses the closed form."""
    docs = load(spark, sf, "documents").select("doc_id")
    i = F.col("doc_id")
    url = lambda c: F.concat(  # noqa: E731
        F.lit("https://s"), (c % 10).cast("string"), F.lit(".ex.org/p/"),
        c.cast("string"),
    )
    terminal = (i % 8) == 0
    m = docs.select(
        i.alias("node"),
        F.when(terminal, i).otherwise(i - 1).cast("long").alias("parent"),
        F.when(terminal, F.lit(0)).otherwise(F.lit(1))
        .cast("long")
        .alias("dist"),
        terminal.alias("done"),
    )
    # Each round self-joins m, referencing it twice: without a
    # materialization barrier the logical plan doubles per round (2^k
    # scan subtrees), which at 10^12 rows means recomputing the base k
    # extra times and an optimizer blow-up. localCheckpoint truncates
    # lineage so every round reads the PREVIOUS round's result once —
    # k shuffles total, the whole point of pointer doubling.
    for _ in range(3):  # 2^3 = 8 >= h_max
        m = m.localCheckpoint(eager=False)
        a, b = m.alias("a"), m.alias("b")
        m = a.join(b, F.col("a.parent") == F.col("b.node")).select(
            F.col("a.node").alias("node"),
            F.col("b.parent").alias("parent"),
            (F.col("a.dist") + F.col("b.dist")).alias("dist"),
            F.col("b.done").alias("done"),
        )
    return m.select(
        F.col("node").alias("doc_id"),
        url(F.col("parent")).alias("final_url"),
        F.col("dist").alias("hops"),
        F.col("done").alias("resolved"),
    )


QUERIES["qg04_redirect_resolution"] = _qg04
ORACLE["qg04_redirect_resolution"] = """
SELECT doc_id,
       'https://s' || ((doc_id - doc_id % 8) % 10) || '.ex.org/p/'
         || (doc_id - doc_id % 8) AS final_url,
       CAST(doc_id % 8 AS BIGINT) AS hops,
       CAST('t' AS BOOLEAN) AS resolved
FROM documents
"""


# --- qg05: host-graph aggregation + reciprocity ---------------------------------
#
# Crawlers reason about HOSTS, not pages: the page-level graph collapses
# to a host graph (who links to whom, how often) for politeness budgets,
# spam detection (link farms show near-total reciprocity) and domain-
# level rank. Hosts reuse qg04's url scheme (host = doc_id % 10).
#
# Scale shape: host extraction is a map-side projection, the collapse is
# ONE groupBy on (src_host, dst_host) — bounded by hosts^2 regardless of
# corpus size — and reciprocity is a self-join on the REVERSED key of the
# already-collapsed (tiny) host table, never of the page edges. Self
# links (intra-host navigation) are excluded before the shuffle, where
# they die cheapest.

_QG05_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
hg AS (
  SELECT CAST(u % 10 AS BIGINT) AS src_host,
         CAST(v % 10 AS BIGINT) AS dst_host,
         CAST(COUNT(*) AS BIGINT) AS n_links
  FROM edges
  WHERE u % 10 <> v % 10
  GROUP BY u % 10, v % 10
)
SELECT a.src_host, a.dst_host, a.n_links,
       (b.n_links IS NOT NULL) AS reciprocal
FROM hg a LEFT JOIN hg b
  ON a.src_host = b.dst_host AND a.dst_host = b.src_host
"""

QUERIES["qg05_host_graph"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG05_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg05_host_graph"] = _QG05_BODY.replace("{EDGE_SRC}", _EDGE_SRC_DUCK)


# --- qg06: two-round HITS (hubs & authorities) ----------------------------------
#
# Kleinberg's HITS as the second rank signal next to qg01's PageRank:
# authority = linked-from-good-hubs, hub = links-to-good-authorities.
# UNNORMALIZED integer iterates: the per-round L2 normalization only
# rescales (ranking-invariant — what crawl prioritization consumes), and
# dropping it keeps every score an exact BIGINT sum (the qg01 lesson:
# float normalization would be order-dependent across engines). With
# h0 = 1: a1 = indegree, h1 = sum of a1 over out-links, a2 = sum of h1
# over in-links. Each round is one explode + one shuffle on the
# destination key — same dataflow (and same 10^12-row cost model) as a
# PageRank round.

_QG06_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
a1 AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY v),
h1 AS (
  SELECT e.u, CAST(SUM(COALESCE(a1.a, 0)) AS BIGINT) AS h
  FROM edges e LEFT JOIN a1 ON e.v = a1.v GROUP BY e.u
),
a2 AS (
  SELECT e.v, CAST(SUM(COALESCE(h1.h, 0)) AS BIGINT) AS a
  FROM edges e LEFT JOIN h1 ON e.u = h1.u GROUP BY e.v
)
SELECT d.doc_id,
       CAST(COALESCE(h1.h, 0) AS BIGINT) AS hub_fp,
       CAST(COALESCE(a2.a, 0) AS BIGINT) AS authority_fp
FROM documents d
LEFT JOIN h1 ON d.doc_id = h1.u
LEFT JOIN a2 ON d.doc_id = a2.v
"""

QUERIES["qg06_hits"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG06_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg06_hits"] = _QG06_BODY.replace("{EDGE_SRC}", _EDGE_SRC_DUCK)


# --- qg07: label-propagation communities (2 synchronous rounds) ------------------
#
# Raghavan et al.'s LPA — the near-linear community detector crawl
# pipelines run to find link farms and topic clusters — with the two
# nondeterminism sources pinned: SYNCHRONOUS rounds (every node updates
# from the previous round's labels, not a mix) and a total tie-break
# (most-frequent neighbor label, ties to the SMALLEST label). Labels
# start as node ids; two unrolled rounds (the qg06 pattern — iteration
# count is the contract, convergence is not). Edges are undirected with
# multiplicity (a double link is a stronger vote). Output is each
# node's community plus the community size.
#
# Scale shape: each round is one shuffle-join of the edge list against
# the O(N) label table on dst + one (node, label) groupBy with map-side
# combine + one per-node ROW_NUMBER window over its distinct neighbor
# labels (bounded by degree). Nothing is ever collected; rounds are a
# fixed unroll so the lineage stays flat.

_QG07_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
nbr AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION ALL
  SELECT v, u FROM edges WHERE u <> v
),
l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
v1 AS (
  SELECT n.u AS node, l.lbl, COUNT(*) AS c
  FROM nbr n JOIN l0 l ON n.v = l.node
  GROUP BY n.u, l.lbl
),
l1 AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl) AS rn
    FROM v1) t
  WHERE rn = 1
),
v2 AS (
  SELECT n.u AS node, l.lbl, COUNT(*) AS c
  FROM nbr n JOIN l1 l ON n.v = l.node
  GROUP BY n.u, l.lbl
),
l2 AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, lbl) AS rn
    FROM v2) t
  WHERE rn = 1
)
SELECT node, CAST(lbl AS BIGINT) AS community,
       CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
FROM l2
"""

QUERIES["qg07_label_propagation"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG07_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg07_label_propagation"] = _QG07_BODY.replace(
    "{EDGE_SRC}", _EDGE_SRC_DUCK
)


# -- qg08: k-core peel (2 synchronous rounds, k=2) ---------------------------------
#
# Link farms and spam rings live in dense cores; legitimate long-tail
# pages peel off early. The classic k-core decomposition peels nodes
# with degree < k until fixed point — here 2 SYNCHRONOUS unrolled
# rounds at k=2 (the qg06/qg07 iteration-count-is-the-contract
# pattern): a node's peel ROUND is the signal (early peel = periphery,
# survivor = core candidate). Degrees count DISTINCT undirected
# neighbors. Per round: one map-side-combined groupBy + two anti-joins
# against the O(peeled) removal set — no windows, no collects; at
# 10^12 edges each round is one shuffle on the node key.

_QG08_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
nbr AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM edges WHERE u <> v
    UNION ALL
    SELECT v, u FROM edges WHERE u <> v
  ) t
),
d0 AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM nbr GROUP BY u),
r1 AS (SELECT node FROM d0 WHERE deg < 2),
d1 AS (
  SELECT n.u AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM nbr n
  WHERE n.u NOT IN (SELECT node FROM r1)
    AND n.v NOT IN (SELECT node FROM r1)
  GROUP BY n.u
)
SELECT d0.node, d0.deg AS deg0,
       CAST(CASE WHEN d0.deg < 2 THEN 1
                 WHEN coalesce(d1.deg, 0) < 2 THEN 2
                 ELSE 0 END AS BIGINT) AS peeled_round
FROM d0 LEFT JOIN d1 ON d0.node = d1.node
"""

QUERIES["qg08_kcore_peel"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG08_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg08_kcore_peel"] = _QG08_BODY.replace("{EDGE_SRC}", _EDGE_SRC_DUCK)


# --- qg09: common-neighbor link prediction (the missing-edge miner) -------------
#
# Crawl-frontier prioritization and related-page suggestions both score
# NON-edges by shared neighborhood: pairs (x, y) with no edge but many
# common neighbors w (x->w, w->y) are the next links to fetch/suggest.
# The dataflow is the qg03 wedge join — und-edge self-join on the
# middle node w — NEVER an all-pairs product: candidate pairs exist
# only where a wedge exists. x < y halves the symmetric space; existing
# edges are removed with a LEFT-null anti-join; the shortlist is a
# deterministic global top-20 (count desc, then pair) — TakeOrdered on
# Spark, ORDER BY + LIMIT on DuckDB, identical ANSI text. 100 TB: the
# wedge join shuffles on w; hub nodes make it quadratic-in-degree, the
# standard mitigation (cap/sample neighbor lists per node before the
# join) composes map-side, and the synthetic degree here is bounded by
# construction (d <= 3).

_QG09_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
und AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
cand AS (
  SELECT a.u AS x, b.v AS y, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM und a JOIN und b ON a.v = b.u AND a.u < b.v
  GROUP BY a.u, b.v
),
nonedge AS (
  SELECT c.x, c.y, c.n_common
  FROM cand c LEFT JOIN und e ON c.x = e.u AND c.y = e.v
  WHERE e.u IS NULL
)
SELECT x, y, n_common
FROM nonedge
ORDER BY n_common DESC, x, y
LIMIT 20
"""

QUERIES["qg09_link_prediction"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG09_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg09_link_prediction"] = _QG09_BODY.replace(
    "{EDGE_SRC}", _EDGE_SRC_DUCK
)


# --- qg10: degree-distribution log2 histogram (power-law profile) ---------------
#
# Web graphs are scale-free; the OPERATIONAL use of that fact is skew
# planning — the log2 degree histogram says how heavy the hub tail is
# before any join is sized (qg09's wedge join, qt31's salting factor).
# Integer-exact bucketing: floor(log2(d)) computed as LENGTH(BIN(d))-1
# (both engines print minimal binary strings — no float log anywhere
# near a power-of-2 boundary). Undirected distinct-neighbor degrees
# (the qg08 convention); one groupBy on node then a tiny groupBy on
# bucket — the second aggregate is O(log maxdeg) rows.

_QG10_BODY = """
WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
             FROM documents),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS v
  FROM {EDGE_SRC}
),
und AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
degs AS (SELECT u, CAST(COUNT(DISTINCT v) AS BIGINT) AS nd
         FROM und GROUP BY u)
SELECT CAST(LENGTH(BIN(nd)) - 1 AS BIGINT) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(nd) AS BIGINT) AS min_deg,
       CAST(MAX(nd) AS BIGINT) AS max_deg
FROM degs
GROUP BY LENGTH(BIN(nd)) - 1
"""

QUERIES["qg10_degree_histogram"] = lambda spark, sf: (
    register_views(spark, sf)
    or spark.sql(_QG10_BODY.replace("{EDGE_SRC}", _EDGE_SRC_SPARK))
)
ORACLE["qg10_degree_histogram"] = _QG10_BODY.replace(
    "{EDGE_SRC}", _EDGE_SRC_DUCK
)


# --- qg11: large-star / small-star connected components -------------------------
#
# The canonical shuffle-bounded CC algorithm (Kiveris et al. 2014,
# "Connected Components in MapReduce and Beyond") as the algorithmic
# complement to qt14's min-label propagation: alternating LARGE-STAR
# (every neighbor v > u repoints to u's star minimum — strictly
# decreases large-neighbor edges) and SMALL-STAR (neighbors v <= u and
# u itself repoint to the minimum) rounds converge in O(log^2 n) with
# per-round cost ONE groupBy(u) for the star minima + one join back —
# never a transitive closure. The DuckDB oracle unrolls two full LS/SS
# iterations as CTE text; the Spark side runs THE SAME two rounds as a
# DataFrame loop with a lazy localCheckpoint per star step. The
# checkpoint is load-bearing, not cosmetic: each step references its
# symmetrized edge set twice (the per-star minimum aggregate joins back
# to the edges it was computed from), so inlined CTE text doubles the
# logical subtree per round — 4 rounds deep that is a 2^4 plan blowup
# the optimizer re-expands on every reference, which measured 47.9 s at
# sf0.01 yet 33.7 s at sf0.1 (plan-bound, not data-bound). With the
# barrier every round reads the previous round's materialized edges
# exactly once: one groupBy + one join per star step, O(rounds)
# shuffles total, the published cost model. What the oracle certifies
# is the ROUND SEMANTICS (labels after the fixed iterations are
# deterministic), not full convergence — on the synthetic
# single-component graph two iterations contract 500 nodes to ~30
# partial stars (measured); `star_components` below iterates the same
# certified step to fixpoint with the monotone-sum stop.

_QG11_STEP = """
sym{K} AS MATERIALIZED (
  SELECT u, v FROM {SRC} WHERE u <> v
  UNION
  SELECT v, u FROM {SRC} WHERE u <> v
),
min{K} AS MATERIALIZED (
  SELECT u, LEAST(u, MIN(v)) AS m FROM sym{K} GROUP BY u
),
{OUT} AS MATERIALIZED (
  SELECT s.v AS u, m.m AS v
  FROM sym{K} s JOIN min{K} m ON s.u = m.u
  WHERE {COND}
  {EXTRA}
)"""


def _qg11_sql(edge_src: str) -> str:
    parts = [
        "WITH deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT)"
        " AS d FROM documents),",
        "edges AS (SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM"
        " documents) AS BIGINT) AS v FROM " + edge_src + "),",
    ]
    src = "edges"
    k = 0
    for _round in range(2):
        # large-star
        k += 1
        parts.append(
            _QG11_STEP.format(
                K=k, SRC=src, OUT=f"ls{k}", COND="s.v > s.u", EXTRA=""
            ).lstrip("\n")
            + ","
        )
        src = f"ls{k}"
        # small-star
        k += 1
        parts.append(
            _QG11_STEP.format(
                K=k,
                SRC=src,
                OUT=f"ss{k}",
                COND="s.v <= s.u",
                EXTRA=f"UNION SELECT u, m FROM min{k}",
            ).lstrip("\n")
            + ","
        )
        src = f"ss{k}"
    parts.append(
        f"final_sym AS (SELECT u, v FROM {src} WHERE u <> v"
        f" UNION SELECT v, u FROM {src} WHERE u <> v)"
    )
    parts.append(
        "SELECT u AS node, CAST(LEAST(u, MIN(v)) AS BIGINT) AS label"
        " FROM final_sym GROUP BY u"
    )
    return "\n".join(parts)


def _star_sym(df: DataFrame, dedup: bool = True) -> DataFrame:
    """Symmetrize an edge list (the sym{K} CTE; ``dedup`` = SQL UNION).

    Duplicates never change a star minimum, the final labels, or the
    SS-output edge SET (its own distinct dedups), so the iterate path
    passes ``dedup=False`` and saves one full-edge-list shuffle per
    star step — symmetrize is then a narrow union. The dedup form is
    kept because it is the oracle CTE's literal semantics and bounds
    join fan-out on multigraph inputs.
    """
    f = df.where(F.col("u") != F.col("v")).select("u", "v")
    out = f.union(f.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return out.distinct() if dedup else out


def _star_step(cur: DataFrame, large: bool) -> DataFrame:
    """One star step (large or small) over edge list (u, v).

    Each step lazily checkpoints its deduped symmetrized edges before
    the min-aggregate joins back to them, so the twice-referenced
    subtree is computed once and the loop's lineage stays O(1) per
    round (the qg04 pointer-doubling pattern). Dedup at every
    materialization point keeps the per-round edge volume at the TRUE
    edge-set size (measured faster end-to-end at 2M nodes than any
    dedup-skipping variant — star outputs are duplicate-heavy, so
    skipped dedups triple the next step's shuffle volume).
    """
    s = _star_sym(cur).localCheckpoint(eager=False)
    mn = s.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    joined = s.join(mn, "u")
    if large:
        return joined.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    # small-star: neighbors v <= u and u itself repoint to the minimum
    return (
        joined.where(F.col("v") <= F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mn.select("u", F.col("m").alias("v")))
        .distinct()
    )


def _star_round(cur: DataFrame) -> DataFrame:
    """One LS+SS iteration over edge list (u, v); returns the new edges."""
    return _star_step(_star_step(cur, large=True), large=False)


def _star_labels(cur: DataFrame) -> DataFrame:
    """Final labels: least(u, min(v)) over the symmetrized edge set."""
    return _star_sym(cur, dedup=False).groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).cast("long").alias("label")
    ).select(F.col("u").alias("node"), "label")


def star_components(
    edges: DataFrame, max_rounds: int = 20
) -> tuple[DataFrame, int]:
    """Large-star/small-star CC iterated to fixpoint (Kiveris et al. 2014).

    Production-mode counterpart of qg11's fixed-round certification:
    runs LS/SS rounds to the fixpoint of the (deterministic) round
    function. qt14's per-node monotone label sum is not defined here —
    absorbed nodes legitimately drop out of the star edge list between
    rounds — so the stability scalar is the edge list itself:
    (count, overflow-free decimal sum of xxhash64(u,v)) over the
    round's checkpointed output.
    An unchanged pair means the edge set (and therefore every label,
    including their sum) is unchanged, i.e. the fixpoint; it costs ONE
    narrow scan of rows already materialized by the round's checkpoint
    — no extra shuffle, one driver-side scalar per round (the qt14
    cadence). Eager per-round checkpoints truncate lineage; O(log^2 n)
    rounds on adversarial graphs. Returns (labels, rounds).
    """
    cur = edges
    prev_sig: object = object()
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        cur = _star_round(cur).localCheckpoint()
        sig = tuple(
            cur.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).collect()[0]
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    return _star_labels(cur), rounds


def _qg11(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id")
    n = docs.count()  # driver-side scalar, same as qg01
    deg = docs.select(
        F.col("doc_id").alias("u"),
        (F.col("doc_id") % 3 + 1).cast("long").alias("d"),
    )
    cur = deg.select(
        "u", F.explode(F.expr("sequence(1, CAST(d AS INT))")).alias("k")
    ).select("u", ((F.col("u") * 7 + F.col("k")) % n).cast("long").alias("v"))
    for _round in range(2):
        cur = _star_round(cur)
    return _star_labels(cur)


QUERIES["qg11_star_components"] = _qg11
ORACLE["qg11_star_components"] = _qg11_sql(_EDGE_SRC_DUCK)


# --- qg12: personalized PageRank (seed-restricted teleport) ---------------------
#
# The crawl-stack's topical ranking: identical to qg01 except the
# teleport mass lands ONLY on a seed set (here doc_id % 50 == 0 — the
# "trusted pages" whitelist of TrustRank / topic-sensitive PageRank).
# Scores then measure closeness to the seeds rather than global
# centrality — the quality-propagation signal a corpus uses to weight
# pages by "link distance from known-good sites". All-integer
# fixed-point exactly as qg01 (teleport 3*SCALE div (20*|S|) on seeds,
# 0 elsewhere; damped mass 17/20), two unrolled rounds. 100 TB: same
# explode + shuffle-on-dst per round as qg01; the seed indicator is a
# map-side expression, never a join.


def _qg12(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    docs = load(spark, sf, "documents").select("doc_id")
    n = docs.count()
    n_seeds = docs.where((F.col("doc_id") % 50) == 0).count()
    deg = docs.select(
        F.col("doc_id").alias("u"),
        (F.col("doc_id") % 3 + 1).cast("long").alias("d"),
    )
    edges = deg.select(
        "u",
        "d",
        F.explode(F.expr("sequence(1, CAST(d AS INT))")).alias("k"),
    ).select(
        "u", "d", ((F.col("u") * 7 + F.col("k")) % n).cast("long").alias("v")
    )
    seed_fp = F.when(
        (F.col("doc_id") % 50) == 0, F.lit(_SCALE // n_seeds)
    ).otherwise(F.lit(0))
    teleport = F.when(
        (F.col("doc_id") % 50) == 0, F.lit((3 * _SCALE) // (20 * n_seeds))
    ).otherwise(F.lit(0))
    pr = docs.select("doc_id", seed_fp.cast("long").alias("pr_fp"))
    for _ in range(2):
        contrib = (
            edges.join(pr, edges["u"] == pr["doc_id"])
            .select("v", F.expr("pr_fp div d").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("mass"))
        )
        pr = docs.join(contrib, docs["doc_id"] == contrib["v"], "left").select(
            "doc_id",
            (teleport + F.expr("(17 * coalesce(mass, 0L)) div 20"))
            .cast("long")
            .alias("pr_fp"),
        )
    return pr.select("doc_id", F.col("pr_fp").alias("ppr_fp"))


QUERIES["qg12_personalized_pagerank"] = _qg12
ORACLE["qg12_personalized_pagerank"] = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM documents
       WHERE doc_id % 50 = 0),
deg AS (SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d
        FROM documents),
edges AS (
  SELECT u, d, CAST((u * 7 + t.k) % (SELECT n FROM nn) AS BIGINT) AS v
  FROM deg, LATERAL unnest(range(1, d + 1)) t(k)
),
pr0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0
              THEN {_SCALE} // (SELECT s FROM ns) ELSE 0 END AS pr_fp
  FROM documents),
m1 AS (
  SELECT e.v, SUM(p.pr_fp // e.d) AS mass
  FROM edges e JOIN pr0 p ON e.u = p.doc_id GROUP BY e.v
),
pr1 AS (
  SELECT d.doc_id,
         CAST(CASE WHEN d.doc_id % 50 = 0
                   THEN (3 * {_SCALE}) // (20 * (SELECT s FROM ns))
                   ELSE 0 END
              + ((17 * COALESCE(m.mass, 0)) // 20) AS BIGINT) AS pr_fp
  FROM documents d LEFT JOIN m1 m ON d.doc_id = m.v
),
m2 AS (
  SELECT e.v, SUM(p.pr_fp // e.d) AS mass
  FROM edges e JOIN pr1 p ON e.u = p.doc_id GROUP BY e.v
),
pr2 AS (
  SELECT d.doc_id,
         CAST(CASE WHEN d.doc_id % 50 = 0
                   THEN (3 * {_SCALE}) // (20 * (SELECT s FROM ns))
                   ELSE 0 END
              + ((17 * COALESCE(m.mass, 0)) // 20) AS BIGINT) AS pr_fp
  FROM documents d LEFT JOIN m2 m ON d.doc_id = m.v
)
SELECT doc_id, pr_fp AS ppr_fp FROM pr2
"""


# --- qg13: host-graph reciprocity (mutual-link ratio) ---------------------------
#
# Link reciprocity separates organic linking (news sites citing each
# other) from link-scheme rings and pure broadcast hubs — a standard
# web-graph health metric (Newman's reciprocity, public). Host-level
# directed edges derive arithmetically (src = doc_id % 40, dst =
# (doc_id * 3 + k) % 40, k <= doc_id % 2 + 1, self-loops dropped,
# DISTINCT pairs); an edge (a,b) is reciprocated iff (b,a) exists —
# ONE self hash-join on the reversed key, never a matrix product.
# Per-host: out-degree, reciprocated count, integer per-mille ratio.
# 100 TB: distinct-pair reduction shuffles on the (src,dst) hash; the
# reversal join reuses the same key space; host keys are bounded so
# the final rollup is map-side combinable.

_QG13_BODY = """
WITH raw_edges AS (
  SELECT DISTINCT doc_id % 40 AS src,
         (doc_id * 3 + t.k) % 40 AS dst
  FROM documents {LATERAL}
),
edges AS (
  SELECT src, dst FROM raw_edges WHERE src <> dst),
marked AS (
  SELECT e.src, e.dst,
         CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS recip
  FROM edges e
  LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src)
SELECT src AS host,
       CAST(COUNT(*) AS BIGINT) AS out_deg,
       CAST(SUM(recip) AS BIGINT) AS n_recip,
       CAST(1000 * SUM(recip) {IDIV} COUNT(*) AS BIGINT)
           AS recip_permille
FROM marked
GROUP BY src
"""

QUERIES["qg13_reciprocity"] = lambda spark, sf: (
    register_views(spark, sf),
    spark.sql(
        _QG13_BODY.replace(
            "{LATERAL}",
            "LATERAL VIEW explode(sequence(1, CAST(doc_id % 2 + 1 AS INT)))"
            " t AS k",
        ).replace("{IDIV}", "DIV")
    ),
)[1]
ORACLE["qg13_reciprocity"] = _QG13_BODY.replace(
    "{LATERAL}", ", LATERAL unnest(range(1, doc_id % 2 + 2)) t(k)"
).replace("{IDIV}", "//")


# --- qg14: degree assortativity sums (integer-exact Pearson components) ---------
#
# Whether hubs link to hubs (assortative) or to leaves (dis-,
# the web's signature): Pearson assortativity over edges' endpoint
# degrees. The coefficient itself is a ratio of sums — so the query
# emits the INTEGER sums (n_edges, sum of deg products, per-end sums
# and sums of squares) and the caller divides; every component is an
# exact BIGINT both engines agree on bit-for-bit (the qg01 lesson:
# never ship a float through the oracle when the algebra is integer).
# Same derived edge set as qg13. 100 TB: degree table = one groupBy;
# two hash joins decorate edges with endpoint degrees; final rollup
# is a single scalar row.

_QG14_BODY = """
WITH raw_edges AS (
  SELECT DISTINCT doc_id % 40 AS src,
         (doc_id * 3 + t.k) % 40 AS dst
  FROM documents {LATERAL}
),
edges AS (SELECT src, dst FROM raw_edges WHERE src <> dst),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT src AS node FROM edges
    UNION ALL SELECT dst AS node FROM edges)
  GROUP BY node),
decorated AS (
  SELECT ds.d AS d_src, dd.d AS d_dst
  FROM edges e
  JOIN deg ds ON ds.node = e.src
  JOIN deg dd ON dd.node = e.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(d_src * d_dst) AS BIGINT) AS sum_prod,
       CAST(SUM(d_src) AS BIGINT) AS sum_src,
       CAST(SUM(d_dst) AS BIGINT) AS sum_dst,
       CAST(SUM(d_src * d_src) AS BIGINT) AS sum_src_sq,
       CAST(SUM(d_dst * d_dst) AS BIGINT) AS sum_dst_sq
FROM decorated
"""

QUERIES["qg14_assortativity_sums"] = lambda spark, sf: (
    register_views(spark, sf),
    spark.sql(
        _QG14_BODY.replace(
            "{LATERAL}",
            "LATERAL VIEW explode(sequence(1, CAST(doc_id % 2 + 1 AS INT)))"
            " t AS k",
        )
    ),
)[1]
ORACLE["qg14_assortativity_sums"] = _QG14_BODY.replace(
    "{LATERAL}", ", LATERAL unnest(range(1, doc_id % 2 + 2)) t(k)"
)


# --- qg15: partition-cut audit (edge locality under hash partitioning) ----------
#
# The number that motivates graph partitioning: with nodes hashed
# into P workers, what fraction of edges cross partitions (each cut
# edge is a network message per iteration in qg01/qg06-style
# propagation)? Random hashing cuts ~ (P-1)/P of edges — the audit
# certifies the measured cut against that expectation and reports
# per-partition internal/external edge counts; a production system
# compares this against a locality-aware assignment to justify the
# repartition cost. Same derived edge set as qg13/qg14; P = 8 via
# the qt82 nibble-table md5 parse (engine-portable).

_QG15_BODY = """
WITH raw_edges AS (
  SELECT DISTINCT doc_id % 40 AS src,
         (doc_id * 3 + t.k) % 40 AS dst
  FROM documents {LATERAL}
),
edges AS (SELECT src, dst FROM raw_edges WHERE src <> dst),
parts AS (
  SELECT e.src, e.dst,
         instr('0123456789abcdef',
               substr(md5(CAST(e.src AS {STR})), 1, 1)) % 8 AS p_src,
         instr('0123456789abcdef',
               substr(md5(CAST(e.dst AS {STR})), 1, 1)) % 8 AS p_dst
  FROM edges e)
SELECT p_src AS partition_id,
       CAST(COUNT(*) AS BIGINT) AS n_out_edges,
       CAST(SUM(CASE WHEN p_src = p_dst THEN 1 ELSE 0 END) AS BIGINT)
           AS n_internal,
       CAST(1000 * SUM(CASE WHEN p_src <> p_dst THEN 1 ELSE 0 END)
            {IDIV} COUNT(*) AS BIGINT) AS cut_permille
FROM parts
GROUP BY p_src
"""

QUERIES["qg15_partition_cut"] = lambda spark, sf: (
    register_views(spark, sf),
    spark.sql(
        _QG15_BODY.replace(
            "{LATERAL}",
            "LATERAL VIEW explode(sequence(1, CAST(doc_id % 2 + 1 AS INT)))"
            " t AS k",
        ).replace("{STR}", "STRING").replace("{IDIV}", "DIV")
    ),
)[1]
ORACLE["qg15_partition_cut"] = (
    _QG15_BODY.replace(
        "{LATERAL}", ", LATERAL unnest(range(1, doc_id % 2 + 2)) t(k)"
    ).replace("{STR}", "VARCHAR").replace("{IDIV}", "//")
)


# --- qg16: host-graph edge churn between crawl snapshots ------------------------
#
# qt33 tracks URL-level crawl deltas; link-structure churn is its
# graph twin: how much of the host graph rewires between snapshots
# (stable link neighborhoods = stable ranking signals; high churn =
# SEO volatility or template migration). Two derived snapshots (odd /
# even doc_ids — same generator family as qg13) produce edge sets A
# and B; FULL OUTER on the edge key classifies kept/added/removed,
# and per-host Jaccard stability of out-neighborhoods comes from the
# same join — one pass, no recomputation per class. 100 TB: edge
# construction is map-side; the outer join shuffles once on the
# (src,dst) hash.

_QG16_BODY = """
WITH snap_a AS (
  SELECT DISTINCT doc_id % 40 AS src, (doc_id * 3 + t.k) % 40 AS dst
  FROM documents {LATERAL}
  WHERE doc_id % 2 = 0),
snap_b AS (
  SELECT DISTINCT doc_id % 40 AS src, (doc_id * 7 + t.k) % 40 AS dst
  FROM documents {LATERAL}
  WHERE doc_id % 2 = 1),
ea AS (SELECT src, dst FROM snap_a WHERE src <> dst),
eb AS (SELECT src, dst FROM snap_b WHERE src <> dst),
classified AS (
  SELECT COALESCE(a.src, b.src) AS src,
         CASE WHEN a.src IS NULL THEN 'added'
              WHEN b.src IS NULL THEN 'removed'
              ELSE 'kept' END AS status
  FROM ea a FULL OUTER JOIN eb b
    ON a.src = b.src AND a.dst = b.dst)
SELECT src AS host,
       CAST(SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_added,
       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
       CAST(1000 * SUM(CASE WHEN status = 'kept' THEN 1 ELSE 0 END)
            {IDIV} COUNT(*) AS BIGINT) AS stability_permille
FROM classified
GROUP BY src
"""

QUERIES["qg16_edge_churn"] = lambda spark, sf: (
    register_views(spark, sf),
    spark.sql(
        _QG16_BODY.replace(
            "{LATERAL}",
            "LATERAL VIEW explode(sequence(1, CAST(doc_id % 2 + 1 AS INT)))"
            " t AS k",
        ).replace("{IDIV}", "DIV")
    ),
)[1]
ORACLE["qg16_edge_churn"] = _QG16_BODY.replace(
    "{LATERAL}", ", LATERAL unnest(range(1, doc_id % 2 + 2)) t(k)"
).replace("{IDIV}", "//")


# --- qg17: converged connected components vs exact transitive closure -----------
#
# The production endgame qg11 certifies per-round: star_components
# iterated to ITS FIXPOINT, certified against the exact transitive
# closure (a DuckDB recursive CTE over the identical edge list). This
# is the strongest label contract the dedup tier has — every node's
# label equals the true component minimum, not just a fixed-round
# contraction state — and it runs the same per-round checkpointed
# dataflow measured at 2M nodes in scripts/cc_convergence.py.


def _qg17(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id")
    n = docs.count()  # driver-side scalar, same as qg01/qg11
    deg = docs.select(
        F.col("doc_id").alias("u"),
        (F.col("doc_id") % 3 + 1).cast("long").alias("d"),
    )
    edges = deg.select(
        "u", F.explode(F.expr("sequence(1, CAST(d AS INT))")).alias("k")
    ).select("u", ((F.col("u") * 7 + F.col("k")) % n).cast("long").alias("v"))
    labels, _rounds = star_components(edges)
    return labels


QUERIES["qg17_cc_fixpoint"] = _qg17
ORACLE["qg17_cc_fixpoint"] = """
WITH RECURSIVE deg AS (
  SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d FROM documents
),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT)
         AS v
  FROM deg, LATERAL unnest(range(1, d + 1)) t(k)
),
und AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
reach(node, r) AS (
  SELECT u, u FROM und
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.node
)
SELECT node, CAST(MIN(r) AS BIGINT) AS label FROM reach GROUP BY node
"""


# --- qg18: bow-tie decomposition of the host graph ------------------------------
#
# The Broder et al. (WWW'00) macro-structure census: relative to the
# giant strongly-connected core, every node is SCC (forward AND
# backward reachable from a pivot in the core), IN (reaches the core),
# OUT (reached from it), or OTHER (tendrils/tubes/disconnected —
# lumped, as the census' remainder bucket). Crawl planning reads this
# directly: IN pages are discoverable only by seed injection, OUT
# pages cannot lead back to fresh frontier. Engine: two checkpointed
# frontier-BFS fixpoints over the contracted host graph (forward on
# src->dst, backward on dst->src), each round one join + anti-join —
# the qg04/qg17 per-round localCheckpoint discipline, so the plan
# stays one base-edges scan per round at any scale. Oracle: two
# recursive-CTE closures over the identical edge set. Pivot = MIN
# host (deterministic, degree-independent).

def _bfs_closure(edges: DataFrame, pivot: int, forward: bool) -> DataFrame:
    """Reachable-set fixpoint from ``pivot`` via checkpointed rounds."""
    src, dst = ("src", "dst") if forward else ("dst", "src")
    spark = edges.sparkSession
    visited = spark.createDataFrame([(pivot,)], "node: long").localCheckpoint()
    frontier = visited
    for _ in range(64):  # diameter cap; host graph is contracted/tiny
        grown = (
            edges.join(frontier, edges[src] == frontier["node"])
            .select(edges[dst].alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        if not grown.take(1):
            break
        visited = visited.union(grown).localCheckpoint()
        frontier = grown
    return visited


def _qg18(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    edges = spark.sql(
        """
        WITH raw_edges AS (
          SELECT DISTINCT doc_id % 40 AS src, (doc_id * 3 + t.k) % 40 AS dst
          FROM documents
          LATERAL VIEW explode(sequence(1, CAST(doc_id % 2 + 1 AS INT)))
            t AS k
        )
        SELECT CAST(src AS LONG) AS src, CAST(dst AS LONG) AS dst
        FROM raw_edges WHERE src <> dst
        """
    ).localCheckpoint()  # edge set reused by both closures + the census
    pivot = edges.agg(F.min("src")).collect()[0][0]  # driver scalar
    fwd = _bfs_closure(edges, pivot, forward=True).withColumn(
        "in_f", F.lit(1)
    )
    bwd = _bfs_closure(edges, pivot, forward=False).withColumn(
        "in_b", F.lit(1)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        nodes.join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .select(
            "node",
            F.when(F.col("in_f").isNotNull() & F.col("in_b").isNotNull(),
                   "scc")
            .when(F.col("in_b").isNotNull(), "in")
            .when(F.col("in_f").isNotNull(), "out")
            .otherwise("other")
            .alias("cls"),
        )
    )


QUERIES["qg18_bowtie"] = _qg18
ORACLE["qg18_bowtie"] = """
WITH RECURSIVE raw_edges AS (
  SELECT DISTINCT doc_id % 40 AS src, (doc_id * 3 + t.k) % 40 AS dst
  FROM documents, LATERAL unnest(range(1, doc_id % 2 + 2)) t(k)
),
edges AS (SELECT src, dst FROM raw_edges WHERE src <> dst),
piv AS (SELECT MIN(src) AS p FROM edges),
fwd(node) AS (
  SELECT p FROM piv
  UNION
  SELECT e.dst FROM edges e JOIN fwd f ON e.src = f.node
),
bwd(node) AS (
  SELECT p FROM piv
  UNION
  SELECT e.src FROM edges e JOIN bwd b ON e.dst = b.node
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  ) u
)
SELECT CAST(n.node AS BIGINT) AS node,
       CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'scc'
            WHEN b.node IS NOT NULL THEN 'in'
            WHEN f.node IS NOT NULL THEN 'out'
            ELSE 'other' END AS cls
FROM nodes n
LEFT JOIN fwd f ON n.node = f.node
LEFT JOIN bwd b ON n.node = b.node
"""


# --- qg19: all-pairs distances + harmonic centrality (contracted hosts) ---------
#
# The crawl-prioritization centrality that is robust on DISCONNECTED
# graphs (unreachable pairs contribute zero instead of poisoning the
# mean): harmonic centrality H(v) = sum over u != v of 1/d(u, v).
# Engine: round-indexed multi-source frontier BFS over the contracted
# host graph — state is (src, node) pairs, each round one join +
# anti-join with per-round localCheckpoint (the qg18 discipline); the
# round number IS the distance at first reach, so no per-edge weights
# or re-relaxation. Scores are integer-exact: sum of floor(1000/d)
# per reached pair (the same fixed-point discipline as qg01's 1e-12
# grain). Oracle: recursive-CTE min-distance closure. At 10^12 pages
# the host contraction (qg05) makes |V| small; state is |V|^2 pairs
# max — the standard scale shape for exact APSP on contracted graphs.

def _qg19(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    edges = spark.sql(
        """
        WITH raw_edges AS (
          SELECT DISTINCT doc_id % 40 AS src, (doc_id * 3 + t.k) % 40 AS dst
          FROM documents
          LATERAL VIEW explode(sequence(1, CAST(doc_id % 2 + 1 AS INT)))
            t AS k
        )
        SELECT CAST(src AS LONG) AS u, CAST(dst AS LONG) AS v
        FROM raw_edges WHERE src <> dst
        """
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # reached: (src, node, d); frontier starts as d=0 self-pairs
    reached = nodes.select(
        F.col("node").alias("src"), "node", F.lit(0).alias("d")
    ).localCheckpoint()
    frontier = reached
    for rnd in range(1, 64):
        grown = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select("src", edges["v"].alias("node"))
            .distinct()
            .join(reached, ["src", "node"], "left_anti")
            .withColumn("d", F.lit(rnd))
            .localCheckpoint()
        )
        if not grown.take(1):
            break
        reached = reached.union(grown).localCheckpoint()
        frontier = grown
    return (
        reached.filter(F.col("d") > 0)
        .groupBy(F.col("node"))
        .agg(
            F.count("*").cast("long").alias("n_reached_by"),
            F.sum(F.floor(1000 / F.col("d"))).cast("long")
            .alias("harmonic_milli"),
        )
        .select("node", "n_reached_by", "harmonic_milli")
    )


QUERIES["qg19_harmonic_centrality"] = _qg19
ORACLE["qg19_harmonic_centrality"] = """
WITH RECURSIVE raw_edges AS (
  SELECT DISTINCT doc_id % 40 AS src, (doc_id * 3 + t.k) % 40 AS dst
  FROM documents, LATERAL unnest(range(1, doc_id % 2 + 2)) t(k)
),
edges AS (SELECT src, dst FROM raw_edges WHERE src <> dst),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  ) u
),
walk(src, node, d) AS (
  SELECT node, node, 0 FROM nodes
  UNION
  SELECT w.src, e.dst, w.d + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.d < 64
),
dist AS (
  SELECT src, node, MIN(d) AS d FROM walk GROUP BY src, node
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_reached_by,
       CAST(SUM(1000 // d) AS BIGINT) AS harmonic_milli
FROM dist
WHERE d > 0
GROUP BY node
"""
