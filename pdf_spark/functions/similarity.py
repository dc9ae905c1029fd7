"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

- brute-force cosine top-k (the correctness baseline): JVM-side
  ``aggregate``/``zip_with`` dot products — no Python in the loop;
- LSH-bucketed variant (the scale path): sign-random-projection buckets
  from fixed deterministic hyperplanes (seeded from the dimension index),
  candidate generation joins on the bucket key — at 10^9 vectors the
  brute-force scan is one pass per query batch, the LSH path turns it into
  an equi-join;
- per-label centroids (posexplode + groupBy — the distributed reduction
  shape for k-means-style iteration).

All arithmetic is cast to DOUBLE on both engines before accumulating so the
float32 inputs round-trip identically; results round to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdf_spark.functions.tables import register_views

QUERIES = {}
ORACLE = {}


def _pair(name: str, spark_sql: str, duck_sql: str | None):
    def fn(spark: SparkSession, sf: str, _sql=spark_sql) -> DataFrame:
        register_views(spark, sf)
        return spark.sql(_sql)

    QUERIES[name] = fn
    if duck_sql is not None:
        ORACLE[name] = duck_sql


# dot(a,b), norm via aggregate; query vector = vec_id 0's embedding
_COS_SPARK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         aggregate(zip_with(e.embedding, q.qv,
                            (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(e.embedding, CAST(0.0 AS DOUBLE),
                           (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
            * sqrt(aggregate(q.qv, CAST(0.0 AS DOUBLE),
                             (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
)
"""

_COS_DUCK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label,
         list_aggregate(list_transform(range(1, 65),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), 'sum')
         / (sqrt(list_aggregate(list_transform(e.embedding,
                 v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(q.qv,
                 v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')))
           AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0
)
"""

_pair(
    "qs01_cosine_threshold",
    _COS_SPARK + "SELECT vec_id, label, ROUND(cos_sim, 4) AS sim FROM scored WHERE cos_sim > 0.15",
    _COS_DUCK + "SELECT vec_id, label, ROUND(cos_sim, 4) AS sim FROM scored WHERE cos_sim > 0.15",
)

_pair(
    "qs02_cosine_topk",
    _COS_SPARK
    + """SELECT vec_id, ROUND(cos_sim, 4) AS sim FROM scored
         ORDER BY ROUND(cos_sim, 4) DESC, vec_id LIMIT 10""",
    _COS_DUCK
    + """SELECT vec_id, ROUND(cos_sim, 4) AS sim FROM scored
         ORDER BY ROUND(cos_sim, 4) DESC, vec_id LIMIT 10""",
)

# L2 norms
_pair(
    "qs03_l2_norms",
    """SELECT vec_id,
              ROUND(sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE),
                    (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), 4)
                AS l2_norm
       FROM embeddings""",
    """SELECT vec_id,
              ROUND(sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')), 4)
                AS l2_norm
       FROM embeddings""",
)

# per-label centroids: flat (label, pos, cval) rows
_pair(
    "qs04_label_centroids",
    # `+ 0.0` folds IEEE -0.0 to 0.0 so signed zero can't split the hash
    """SELECT label, pos, ROUND(AVG(CAST(v AS DOUBLE)), 4) + 0.0 AS cval
       FROM (SELECT label, posexplode(embedding) AS (pos, v) FROM embeddings)
       GROUP BY label, pos""",
    """SELECT label, pos, ROUND(AVG(v), 4) + 0.0 AS cval FROM (
         SELECT label,
                CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                CAST(unnest(embedding) AS DOUBLE) AS v
         FROM embeddings)
       GROUP BY label, pos""",
)

# sign-random-projection LSH buckets: hyperplane h_j has +1 weight on
# dimensions where (i*31 + j*17) % 7 < 3, else -1 — fixed, seedless, and
# expressible in both engines; bucket = 4-bit signature
_PROJ_TERMS_SPARK = " + ".join(
    f"""CASE WHEN aggregate(zip_with(embedding,
            transform(sequence(0, 63),
                      i -> CASE WHEN (i * 31 + {j} * 17) % 7 < 3
                           THEN 1.0D ELSE -1.0D END),
            (x, w) -> CAST(x AS DOUBLE) * w),
          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0
        THEN {1 << j} ELSE 0 END"""
    for j in range(4)
)
_PROJ_TERMS_DUCK = " + ".join(
    f"""CASE WHEN list_aggregate(list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE) *
                 (CASE WHEN ((i - 1) * 31 + {j} * 17) % 7 < 3
                  THEN 1.0 ELSE -1.0 END)), 'sum') > 0
        THEN {1 << j} ELSE 0 END"""
    for j in range(4)
)

_pair(
    "qs05_srp_lsh_buckets",
    f"""SELECT CAST({_PROJ_TERMS_SPARK} AS INT) AS bucket,
               COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
        FROM embeddings GROUP BY 1""",
    f"""SELECT CAST({_PROJ_TERMS_DUCK} AS INT) AS bucket,
               COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
        FROM embeddings GROUP BY 1""",
)

# LSH candidate-pair counts per bucket (the ANN scale path's join stage)
_pair(
    "qs06_srp_lsh_pair_counts",
    f"""WITH b AS (
          SELECT vec_id, CAST({_PROJ_TERMS_SPARK} AS INT) AS bucket
          FROM embeddings)
        SELECT bucket, CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT)
                 AS n_pairs
        FROM b GROUP BY bucket""",
    f"""WITH b AS (
          SELECT vec_id, CAST({_PROJ_TERMS_DUCK} AS INT) AS bucket
          FROM embeddings)
        SELECT bucket, CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT)
                 AS n_pairs
        FROM b GROUP BY bucket""",
)

# -- IVF-style ANN (coarse quantize -> search only the query's cell) ----------
#
# The scale path the brute-force scan graduates to: per-label centroids act
# as the coarse quantizer (K = #labels), every vector is assigned to its
# nearest centroid (argmax cosine), and the query searches ONLY its own
# cell — at 10^9 vectors this turns a full scan into (K dots) + (scan of
# ~N/K). Fully SQL-expressible, so DuckDB-oracled on both engines.

_IVF_BODY = """
WITH cents AS (
  SELECT label AS clabel, pos, AVG(CAST(v AS DOUBLE)) AS c
  FROM ({EXPLODE})
  GROUP BY label, pos
),
vecpos AS (
  SELECT vec_id, pos, CAST(v AS DOUBLE) AS x FROM ({EXPLODE})
),
dots AS (
  SELECT v.vec_id, c.clabel,
         SUM(v.x * c.c)
           / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(c.c * c.c))) AS cos
  FROM vecpos v JOIN cents c ON v.pos = c.pos
  GROUP BY v.vec_id, c.clabel
),
cells AS (
  SELECT vec_id, clabel AS cell FROM (
    SELECT vec_id, clabel,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
    FROM dots
  ) WHERE rn = 1
),
qcell AS (SELECT cell FROM cells WHERE vec_id = 0),
incell AS (
  SELECT s.vec_id FROM cells s JOIN qcell q ON s.cell = q.cell
  WHERE s.vec_id <> 0
),
q AS (SELECT pos, x AS qx FROM vecpos WHERE vec_id = 0),
scored AS (
  SELECT v.vec_id,
         SUM(v.x * q.qx)
           / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.qx * q.qx))) AS cos_sim
  FROM vecpos v
  JOIN incell i ON v.vec_id = i.vec_id
  JOIN q ON v.pos = q.pos
  GROUP BY v.vec_id
)
SELECT vec_id, ROUND(cos_sim, 4) AS sim
FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 5
"""

_EXPLODE_SPARK = (
    "SELECT vec_id, label, pos, v FROM embeddings "
    "LATERAL VIEW posexplode(embedding) t AS pos, v"
)
_EXPLODE_DUCK = (  # fixed 64-dim embeddings (range() can't be lateral)
    "SELECT vec_id, label, i - 1 AS pos, embedding[CAST(i AS INT)] AS v "
    "FROM embeddings, range(1, 65) t(i)"
)

_pair(
    "qs07_ivf_topk",
    _IVF_BODY.replace("{EXPLODE}", _EXPLODE_SPARK),
    _IVF_BODY.replace("{EXPLODE}", _EXPLODE_DUCK),
)

# -- embedding near-dup: LSH candidates -> exact cosine verify -----------------
#
# The embedding analog of the MinHash candidates->verify dedup shape: the
# SRP bucket equi-join proposes pairs (N^2/2/2^bits of the corpus, spread
# across bucket-keyed hash-join partitions), and only candidates pay the
# exact cosine. At 10^9 vectors this is the near-dup path that replaces
# the all-pairs product; a hot bucket (duplicate-heavy corpora) gets AQE
# skew-splitting on the bucket key.

_NEARDUP_BODY = """
WITH b AS (
  SELECT vec_id, CAST({PROJ} AS INT) AS bucket FROM embeddings
),
cand AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
),
vecpos AS ({EXPLODE}),
scored AS (
  SELECT cd.vec_a, cd.vec_b,
         SUM(CAST(pa.v AS DOUBLE) * CAST(pb.v AS DOUBLE))
           / (SQRT(SUM(CAST(pa.v AS DOUBLE) * CAST(pa.v AS DOUBLE)))
              * SQRT(SUM(CAST(pb.v AS DOUBLE) * CAST(pb.v AS DOUBLE))))
           AS cos_sim
  FROM cand cd
  JOIN vecpos pa ON pa.vec_id = cd.vec_a
  JOIN vecpos pb ON pb.vec_id = cd.vec_b AND pb.pos = pa.pos
  GROUP BY cd.vec_a, cd.vec_b
)
SELECT vec_a, vec_b, ROUND(cos_sim, 4) AS sim
FROM scored WHERE cos_sim >= 0.3
"""

_pair(
    "qs08_lsh_cosine_neardup",
    _NEARDUP_BODY.replace("{PROJ}", _PROJ_TERMS_SPARK).replace(
        "{EXPLODE}", _EXPLODE_SPARK
    ),
    _NEARDUP_BODY.replace("{PROJ}", _PROJ_TERMS_DUCK).replace(
        "{EXPLODE}", _EXPLODE_DUCK
    ),
)

# --- qs09: int8 embedding quantization ----------------------------------------
#
# Storage-tier op: symmetric per-vector int8 quantization (the faiss
# SQ8/"scalar quantizer" layout) — scale = 127/max|x|, q_i =
# floor(x_i * scale + 0.5). Cuts a 10^12-vector embedding store 4x and is
# the precursor to int8 SIMD distance kernels. Pure map-side: one scan,
# zero exchanges, output one row per vector. floor(x+0.5) instead of
# ROUND inside the lambda because Spark's round() on doubles and DuckDB's
# round() agree only through the ROUND(...,n) display path — floor is a
# single exactly-specified IEEE op in both. The all-zero vector guards to
# scale=0 / q=0 rather than dividing by zero.

_QS09_SPARK = """
WITH m AS (
  SELECT vec_id, embedding,
         array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
  FROM embeddings
)
SELECT vec_id,
       ROUND(CASE WHEN maxabs = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(127 AS DOUBLE) / maxabs END, 6) AS scale,
       transform(embedding,
                 x -> CAST(CASE WHEN maxabs = 0 THEN CAST(0 AS DOUBLE)
                           ELSE floor(CAST(x AS DOUBLE)
                                      * (CAST(127 AS DOUBLE) / maxabs) + 0.5)
                           END AS INT)) AS q
FROM m
"""

_QS09_DUCK = """
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
  FROM embeddings
)
SELECT vec_id,
       ROUND(CASE WHEN maxabs = 0 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(127 AS DOUBLE) / maxabs END, 6) AS scale,
       list_transform(embedding,
                      x -> CAST(CASE WHEN maxabs = 0 THEN CAST(0 AS DOUBLE)
                                ELSE floor(CAST(x AS DOUBLE)
                                           * (CAST(127 AS DOUBLE) / maxabs) + 0.5)
                                END AS INT)) AS q
FROM m
"""

_pair("qs09_int8_quantize", _QS09_SPARK, _QS09_DUCK)

# --- qs10: k-means (Lloyd's), two deterministic iterations ---------------------
#
# The iterative-algorithm shape on Spark: per-iteration state is K
# centroids — TINY — so each round is (a) one narrow scan computing
# argmin distance against the K centroids embedded as broadcast literal
# arrays (no join, no shuffle for assignment), (b) one
# map-side-combined groupBy to re-average centroids, collected to the
# driver (K*64 doubles). At 10^9 vectors the assignment stage dominates
# and is embarrassingly parallel; the reduce moves K*64 doubles per
# partition. That driver-feedback loop IS how MLlib's KMeans schedules
# Lloyd's — expressed here directly in DataFrame algebra.
#
# Determinism across engines (the oracle unrolls the same two rounds in
# SQL): init = the vectors with vec_id < 4 (seedless); distances are
# left-to-right folds of (x-c)^2 in double, bit-identical in both
# engines (same op sequence, proven by qs01-qs03); argmin ties break to
# the LOWEST centroid id (array_position-of-min / ROW_NUMBER ORDER BY
# d2, cid); updated centroids are ROUND(avg, 4)-ed — double-sum
# associativity drift (~1e-13) cannot move a 1e-4 grid except on an
# astronomically unlikely boundary, the same contract qs04 ships.

_KMEANS_K = 4


def _qs10(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    init = spark.sql(
        f"""SELECT vec_id AS cid,
                   transform(embedding, x -> CAST(x AS DOUBLE)) AS c
            FROM embeddings WHERE vec_id < {_KMEANS_K} ORDER BY vec_id"""
    ).collect()
    cents = [(int(r.cid), list(r.c)) for r in init]

    def dist(c: list) -> str:
        lits = ", ".join(f"{v!r}D" for v in c)
        return (
            f"aggregate(zip_with(embedding, array({lits}), "
            "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
            "0.0D, (a, v) -> a + v)"
        )

    def assign(cents_: list) -> DataFrame:
        darr = "array(" + ", ".join(dist(c) for _cid, c in cents_) + ")"
        cmap = "array(" + ", ".join(str(cid) for cid, _c in cents_) + ")"
        return spark.sql(
            f"""SELECT vec_id,
                       CAST({cmap}[CAST(array_position({darr},
                                        array_min({darr})) AS INT) - 1]
                            AS INT) AS cluster
                FROM embeddings"""
        )

    a1 = assign(cents)
    a1.createOrReplaceTempView("qs10_assign1")
    upd = spark.sql(
        """SELECT a.cluster AS cid, p.pos,
                  ROUND(AVG(CAST(p.v AS DOUBLE)), 4) AS c
           FROM qs10_assign1 a
           JOIN (SELECT vec_id, posexplode(embedding) AS (pos, v)
                 FROM embeddings) p ON a.vec_id = p.vec_id
           GROUP BY a.cluster, p.pos"""
    ).collect()
    by_cid: dict[int, dict[int, float]] = {}
    for r in upd:
        by_cid.setdefault(int(r.cid), {})[int(r.pos)] = float(r.c)
    cents2 = [
        (cid, [pos_map[p] for p in range(len(pos_map))])
        for cid, pos_map in sorted(by_cid.items())
    ]
    return assign(cents2)


QUERIES["qs10_kmeans_lloyd"] = _qs10
ORACLE["qs10_kmeans_lloyd"] = f"""
WITH init AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM embeddings WHERE vec_id < {_KMEANS_K}
),
d1 AS (
  SELECT e.vec_id, i.cid,
         list_aggregate(list_transform(range(1, 65),
           j -> (CAST(e.embedding[j] AS DOUBLE) - i.c[j])
              * (CAST(e.embedding[j] AS DOUBLE) - i.c[j])), 'sum') AS d2
  FROM embeddings e CROSS JOIN init i
),
a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1) WHERE rn = 1
),
upd AS (
  SELECT a1.cluster AS cid, t.j AS pos,
         ROUND(AVG(CAST(e.embedding[t.j] AS DOUBLE)), 4) AS c
  FROM a1 JOIN embeddings e USING (vec_id)
  CROSS JOIN range(1, 65) AS t(j)
  GROUP BY cid, pos
),
c2 AS (SELECT cid, list(c ORDER BY pos) AS c FROM upd GROUP BY cid),
dd AS (
  SELECT e.vec_id, c2.cid,
         list_aggregate(list_transform(range(1, 65),
           j -> (CAST(e.embedding[j] AS DOUBLE) - c2.c[j])
              * (CAST(e.embedding[j] AS DOUBLE) - c2.c[j])), 'sum') AS d2
  FROM embeddings e CROSS JOIN c2
)
SELECT vec_id, CAST(cid AS INT) AS cluster FROM (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM dd) WHERE rn = 1
"""

# --- qs11: product quantization codes ------------------------------------------
#
# The IVF-PQ storage layout's second half (qs07 is the IVF half): the
# 64-dim vector splits into 8 subvectors of 8 dims; each subvector maps
# to a 4-bit code = the sign pattern of 4 fixed hyperplanes (the qs05
# SRP family restricted to the subspace). 8 codes x 4 bits = a 4-byte
# sketch per vector — the 64x compression that makes 10^12-vector
# rerank-from-RAM possible. Pure map-side; sign tests are deterministic
# because both engines fold the identical dot product left-to-right
# (the qs05/qs06 contract).

def _pq_codes(dialect: str) -> str:
    codes = []
    for m in range(8):
        b = 8 * m
        terms = []
        for j in range(4):
            if dialect == "spark":
                dot = (
                    f"aggregate(transform(sequence(0, 7), k -> "
                    f"CAST(embedding[{b} + k] AS DOUBLE) * "
                    f"(CASE WHEN (({b} + k) * 31 + {j} * 17) % 7 < 3 "
                    f"THEN 1.0D ELSE -1.0D END)), 0.0D, (a, v) -> a + v)"
                )
            else:
                dot = (
                    f"list_aggregate(list_transform(range(0, 8), k -> "
                    f"CAST(embedding[{b} + k + 1] AS DOUBLE) * "
                    f"(CASE WHEN (({b} + k) * 31 + {j} * 17) % 7 < 3 "
                    f"THEN 1.0 ELSE -1.0 END)), 'sum')"
                )
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
        codes.append("CAST(" + " + ".join(terms) + " AS INT)")
    inner = ", ".join(codes)
    arr = f"array({inner})" if dialect == "spark" else f"[{inner}]"
    return f"SELECT vec_id, {arr} AS pq_code FROM embeddings"


_pair("qs11_product_quantization", _pq_codes("spark"), _pq_codes("duck"))


# --- qs12: SemDeDup — semantic dedup inside embedding cells --------------------
#
# The SemDeDup recipe (Abbas et al. 2023): cluster the embedding space,
# then dedup ONLY within each cluster — the clustering turns an O(N^2)
# cosine dedup into K independent in-cell problems, the same
# candidates-then-verify economics as qt11/qs08 but driven by semantic
# cells instead of hash buckets. Cells here are the K=8 lowest-id
# vectors as fixed centroids (deterministic, seedless — qs10's init
# rule); assignment is a K-row broadcast hash join + argmin, so the
# 10^12-row side never shuffles for assignment. Within a cell, a vector
# is dropped when an earlier (lower vec_id) cell-mate has cosine >= the
# threshold — the one-pass keep-first rule, exactly how production
# SemDeDup resolves groups without iterating. Output one row per vector
# (vec_id, cell, kept) so the result is hash-comparable at any scale.

_SEMDEDUP_BODY = """
WITH init AS (
  SELECT vec_id AS cid, {DBL_VEC} AS c
  FROM embeddings WHERE vec_id < 8
),
d AS (
  SELECT e.vec_id, i.cid, {D2} AS d2
  FROM embeddings e CROSS JOIN init i
),
a AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d) WHERE rn = 1
),
cand AS (
  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.cell
  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
),
vecpos AS ({EXPLODE}),
scored AS (
  SELECT cd.vec_b,
         SUM(CAST(pa.v AS DOUBLE) * CAST(pb.v AS DOUBLE))
           / (SQRT(SUM(CAST(pa.v AS DOUBLE) * CAST(pa.v AS DOUBLE)))
              * SQRT(SUM(CAST(pb.v AS DOUBLE) * CAST(pb.v AS DOUBLE))))
           AS cos_sim
  FROM cand cd
  JOIN vecpos pa ON pa.vec_id = cd.vec_a
  JOIN vecpos pb ON pb.vec_id = cd.vec_b AND pb.pos = pa.pos
  GROUP BY cd.vec_a, cd.vec_b
),
dropped AS (SELECT DISTINCT vec_b FROM scored WHERE cos_sim >= 0.3)
SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
       dr.vec_b IS NULL AS kept
FROM a LEFT JOIN dropped dr ON a.vec_id = dr.vec_b
"""

_SEMDEDUP_D2_SPARK = (
    "aggregate(zip_with(e.embedding, i.c, "
    "(x, cc) -> (CAST(x AS DOUBLE) - cc) * (CAST(x AS DOUBLE) - cc)), "
    "0.0D, (acc, v) -> acc + v)"
)
_SEMDEDUP_D2_DUCK = (
    "list_aggregate(list_transform(range(1, 65), "
    "j -> (CAST(e.embedding[j] AS DOUBLE) - i.c[j]) "
    "* (CAST(e.embedding[j] AS DOUBLE) - i.c[j])), 'sum')"
)

_pair(
    "qs12_semdedup",
    _SEMDEDUP_BODY
    .replace("{DBL_VEC}", "transform(embedding, x -> CAST(x AS DOUBLE))")
    .replace("{D2}", _SEMDEDUP_D2_SPARK)
    .replace("{EXPLODE}", _EXPLODE_SPARK),
    _SEMDEDUP_BODY
    .replace("{DBL_VEC}", "list_transform(embedding, x -> CAST(x AS DOUBLE))")
    .replace("{D2}", _SEMDEDUP_D2_DUCK)
    .replace("{EXPLODE}", _EXPLODE_DUCK),
)

# --- qs13: IVF recall contract ---------------------------------------------------
#
# The recall certification for the qs07 scale path — the qr31/qt35
# "contract query" pattern applied to ANN: compute the EXACT brute-force
# top-10 for the query vector (the qs02 ground truth) and the IVF
# answer at nprobe=1 and nprobe=2 (searching the query's 1 or 2 nearest
# centroid cells), and report hits@10 / recall@10 per nprobe. This is
# the number a 10^9-vector deployment tunes against: nprobe trades scan
# fraction (nprobe/K of the corpus) for recall, and the cross-engine
# hash-equality of this query certifies the whole chain — centroid
# build, cell assignment, probe ranking, in-cell top-k — is
# deterministic. Rankings order by ROUND(sim, 4) with vec_id tie-break
# (the qs02 contract) so float summation order can't flip adjacent
# ranks between engines. Monotonicity (recall@nprobe=2 >= @nprobe=1)
# holds by construction since the candidate set only grows.

_QS13_BODY = """
WITH cents AS (
  SELECT label AS clabel, pos, AVG(CAST(v AS DOUBLE)) AS c
  FROM ({EXPLODE}) GROUP BY label, pos
),
vecpos AS (
  SELECT vec_id, pos, CAST(v AS DOUBLE) AS x FROM ({EXPLODE})
),
dots AS (
  SELECT v.vec_id, c.clabel,
         SUM(v.x * c.c) / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(c.c * c.c))) AS cos
  FROM vecpos v JOIN cents c ON v.pos = c.pos
  GROUP BY v.vec_id, c.clabel
),
cells AS (
  SELECT vec_id, clabel AS cell FROM (
    SELECT vec_id, clabel,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
    FROM dots) t WHERE rn = 1
),
qrank AS (
  SELECT clabel AS cell,
         ROW_NUMBER() OVER (ORDER BY cos DESC, clabel) AS cell_rank
  FROM dots WHERE vec_id = 0
),
q AS (SELECT pos, x AS qx FROM vecpos WHERE vec_id = 0),
scored AS (
  SELECT v.vec_id,
         ROUND(SUM(v.x * q.qx)
               / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.qx * q.qx))), 4) AS sim
  FROM vecpos v JOIN q ON v.pos = q.pos
  WHERE v.vec_id <> 0
  GROUP BY v.vec_id
),
exact AS (
  SELECT vec_id FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn
    FROM scored) t WHERE rn <= 10
),
probes AS (SELECT 1 AS nprobe UNION ALL SELECT 2 AS nprobe),
ivf AS (
  SELECT p.nprobe, s.vec_id,
         ROW_NUMBER() OVER (PARTITION BY p.nprobe
                            ORDER BY s.sim DESC, s.vec_id) AS rn
  FROM probes p
  JOIN qrank r ON r.cell_rank <= p.nprobe
  JOIN cells c ON c.cell = r.cell AND c.vec_id <> 0
  JOIN scored s ON s.vec_id = c.vec_id
),
hits AS (
  SELECT i.nprobe, COUNT(*) AS n_hits
  FROM ivf i JOIN exact e ON i.vec_id = e.vec_id
  WHERE i.rn <= 10 GROUP BY i.nprobe
)
SELECT p.nprobe,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS hits_at_10,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 10.0 AS recall_at_10
FROM probes p LEFT JOIN hits h ON p.nprobe = h.nprobe
ORDER BY p.nprobe
"""

_pair(
    "qs13_ivf_recall",
    _QS13_BODY.replace("{EXPLODE}", _EXPLODE_SPARK),
    _QS13_BODY.replace("{EXPLODE}", _EXPLODE_DUCK),
)

# --- qs14: Matryoshka dimension-truncation contract -------------------------------
#
# The embedding-STORAGE counterpart of qs13's index contract: serving
# stacks (MRL — Kusupati et al. 2022 — and every "shortlist on the
# first d dims, rerank on all" design) rank with a PREFIX of the vector
# to cut memory/bandwidth 4x and rerank survivors at full width. This
# query measures what that truncation costs on THIS corpus: top-10 by
# full 64-dim cosine vs top-10 by 16-dim-prefix cosine, reported as
# overlap@10 — and certifies the safety property shortlisting relies
# on: a shortlist of 3x the final k already contains the entire full-
# width top-10 — reported as shortlist_needed, the max truncated rank
# over the full top-10, i.e. the EXACT shortlist depth at which prefix
# ranking + full rerank is lossless on this corpus (the number a
# deployment sets its shortlist multiplier from). Rankings order by
# ROUND(sim, 4) + vec_id (the qs02 tie contract).

_QS14_BODY = """
WITH vecpos AS (
  SELECT vec_id, pos, CAST(v AS DOUBLE) AS x FROM ({EXPLODE})
),
q AS (SELECT pos, x AS qx FROM vecpos WHERE vec_id = 0),
full_sim AS (
  SELECT v.vec_id,
         ROUND(SUM(v.x * q.qx)
               / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.qx * q.qx))), 4) AS sim
  FROM vecpos v JOIN q ON v.pos = q.pos
  WHERE v.vec_id <> 0 GROUP BY v.vec_id
),
trunc_sim AS (
  SELECT v.vec_id,
         ROUND(SUM(v.x * q.qx)
               / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.qx * q.qx))), 4) AS sim
  FROM vecpos v JOIN q ON v.pos = q.pos
  WHERE v.vec_id <> 0 AND v.pos < 16 AND q.pos < 16
  GROUP BY v.vec_id
),
full_top AS (
  SELECT vec_id, rn FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn
    FROM full_sim) t WHERE rn <= 10
),
trunc_rank AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rn
  FROM trunc_sim
)
SELECT CAST(10 AS BIGINT) AS k,
       CAST(SUM(CASE WHEN tr.rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS overlap_at_10,
       ROUND(CAST(SUM(CASE WHEN tr.rn <= 10 THEN 1 ELSE 0 END) AS DOUBLE)
             / 10.0, 6) AS overlap_frac,
       CAST(MAX(tr.rn) AS BIGINT) AS shortlist_needed
FROM full_top f JOIN trunc_rank tr ON f.vec_id = tr.vec_id
"""

_pair(
    "qs14_matryoshka_truncation",
    _QS14_BODY.replace("{EXPLODE}", _EXPLODE_SPARK),
    _QS14_BODY.replace("{EXPLODE}", _EXPLODE_DUCK),
)


# --- qs15: binary (sign-bit) quantization + Hamming shortlist -------------------
#
# The 1-bit storage tier below qs09's int8 and qs11's PQ: each 64-dim
# float vector compresses to 64 sign bits (x > 0), a 256x byte
# reduction, and candidate generation is a Hamming-distance scan over
# the packed codes — the layout RaBitQ-class systems and faiss's
# IndexBinaryFlat use for the coarse pass before exact rerank (qs13's
# recall-contract pattern certifies such shortlists). Codes pack into
# TWO 32-bit words per vector, not one 64-bit word, because bit 63 of
# a signed BIGINT would overflow the integer-sum construction in both
# engines; dims 0-31 -> word 0, dims 32-63 -> word 1. The probe is the
# vec_id 0 vector (a broadcast scalar, same as qs02), distance =
# popcount(xor) summed over the words, shortlist = top-50 by
# (hamming, vec_id) — every value integer-exact.
#
# 100 TB: code build is map-side (one scan, zero exchanges); the scan
# against the broadcast probe is narrow + TakeOrdered(50) — no global
# sort materializes. At 10^12 vectors the binary store is 8 TB where
# the float store was 256 TB — the whole point of the tier.

_QS15_BODY = """
WITH codes AS (
  SELECT vec_id,
         {PACK0} AS c0,
         {PACK1} AS c1
  FROM embeddings
),
probe AS (
  SELECT c0 AS q0, c1 AS q1 FROM codes WHERE vec_id = 0
)
SELECT c.vec_id,
       CAST(bit_count({XOR}(c.c0, p.q0))
            + bit_count({XOR}(c.c1, p.q1)) AS BIGINT) AS hamming
FROM codes c CROSS JOIN probe p
WHERE c.vec_id <> 0
ORDER BY hamming, c.vec_id
LIMIT 50
"""

_PACK_SPARK = (
    "aggregate(sequence(0, 31), CAST(0 AS BIGINT),"
    " (acc, i) -> acc + CASE WHEN element_at(embedding, i + {BASE} + 1) > 0"
    " THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)"
)
_PACK_DUCK = (
    "list_sum(list_transform(range(32),"
    " i -> CASE WHEN embedding[i + {BASE} + 1] > 0"
    " THEN 1::BIGINT << i ELSE 0::BIGINT END))"
)

_pair(
    "qs15_binary_quantization",
    _QS15_BODY.replace("{PACK0}", _PACK_SPARK.replace("{BASE}", "0"))
    .replace("{PACK1}", _PACK_SPARK.replace("{BASE}", "32"))
    .replace("{XOR}(c.c0, p.q0)", "(c.c0 ^ p.q0)")
    .replace("{XOR}(c.c1, p.q1)", "(c.c1 ^ p.q1)"),
    _QS15_BODY.replace("{PACK0}", _PACK_DUCK.replace("{BASE}", "0"))
    .replace("{PACK1}", _PACK_DUCK.replace("{BASE}", "32"))
    .replace("{XOR}", "xor"),
)


# --- qs16: embedding-store hygiene audit ----------------------------------------
#
# Vector QA before anything consumes the store: zero vectors poison
# cosine (0/0), non-finite components poison everything, and wildly
# off-scale norms flag a bad producer batch. Norms are made integer-
# exact by the qs09 fixed-point move — q = floor(x*1000 + 0.5) per
# component (one exactly-specified IEEE op), sqnorm = sum q^2 — and the
# norm BAND is floor(log2(sqnorm+1)) via length(bin(...))-1, so the
# audit's histogram is bit-identical across engines. Pure map-side.

_QS16_BODY = """
WITH q AS (
  SELECT vec_id,
         {SQNORM} AS sqnorm,
         {NONFINITE} AS n_nonfinite
  FROM embeddings
)
SELECT vec_id,
       CAST(CASE WHEN sqnorm = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_zero,
       CAST(n_nonfinite AS BIGINT) AS n_nonfinite,
       CAST(sqnorm AS BIGINT) AS sqnorm_fp,
       CAST(length(bin(sqnorm + 1)) - 1 AS BIGINT) AS norm_band
FROM q
"""

_QS16_SQ_SPARK = (
    "aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> acc"
    " + CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)"
    " * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
)
_QS16_NF_SPARK = (
    "aggregate(embedding, 0, (acc, x) -> acc + CASE WHEN isnan(x)"
    " OR abs(CAST(x AS DOUBLE)) > 1e308 THEN 1 ELSE 0 END)"
)
_QS16_SQ_DUCK = (
    "list_sum(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
    " * 1000 + 0.5) AS BIGINT) * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)"
    " AS BIGINT)))"
)
_QS16_NF_DUCK = (
    "list_sum(list_transform(embedding, x -> CASE WHEN isnan(x)"
    " OR abs(CAST(x AS DOUBLE)) > 1e308 THEN 1 ELSE 0 END))"
)

_pair(
    "qs16_embedding_hygiene",
    _QS16_BODY.replace("{SQNORM}", _QS16_SQ_SPARK)
    .replace("{NONFINITE}", _QS16_NF_SPARK),
    _QS16_BODY.replace("{SQNORM}", _QS16_SQ_DUCK)
    .replace("{NONFINITE}", _QS16_NF_DUCK),
)


# --- qs17: Johnson-Lindenstrauss random projection (deterministic ±1) -------------
#
# The dimensionality-reduction tier BETWEEN the full vector and the
# qs15 sign bits: a ±1 (Achlioptas/JL) projection to K=8 dims preserves
# pairwise distances within (1±eps) while cutting the ANN candidate
# scan 16x. The projection matrix is never materialized: sign(k, i) =
# parity of the first hex char of md5('k:i') — deterministic, identical
# in both engines, and each executor recomputes it inline (zero
# broadcast, zero state). Components are the qs09 fixed-point integers,
# so every projected coordinate is an exact BIGINT. 100 TB: pure
# map-side, one in-row pass per output dim; the hash replaces the
# usual seeded-RNG matrix (same trick as qt44's rendezvous hashing).

_QS17_K = 8


def _qs17_dim(engine: str, k: int) -> str:
    if engine == "spark":
        idx = "CAST(i + 1 AS STRING)"
        return (
            f"aggregate(transform(embedding, (x, i) ->"
            f" (1 - 2 * (ascii(substr(md5(concat('{k}:', {idx})), 1, 1)) % 2))"
            f" * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)),"
            f" CAST(0 AS BIGINT), (a, v) -> a + v) AS p{k}"
        )
    return (
        f"coalesce(list_sum(list_transform(embedding, (x, i) ->"
        f" (1 - 2 * (ascii(substr(md5(concat('{k}:', CAST(i AS VARCHAR))), 1, 1)) % 2))"
        f" * CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))), 0)"
        f" AS p{k}"
    )


_QS17_SPARK = "SELECT vec_id,\n       " + ",\n       ".join(
    _qs17_dim("spark", k) for k in range(_QS17_K)
) + "\nFROM embeddings"
_QS17_DUCK = "SELECT vec_id,\n       " + ",\n       ".join(
    _qs17_dim("duck", k) for k in range(_QS17_K)
) + "\nFROM embeddings"

_pair("qs17_jl_projection", _QS17_SPARK, _QS17_DUCK)


# -- qs18: batched ANN JOIN (many queries at once, bucket co-partitioned) --------
#
# qs02 answers ONE query vector and qs08 finds near-dup PAIRS; the
# retrieval workload a training pipeline actually runs is the ANN JOIN:
# a whole BATCH of query vectors (here every vec_id % 61 = 0) each
# needs its top-k neighbors. All-pairs is the trap at both ends; the
# join shape is the same SRP bucket equi-join as qs08 — queries and
# corpus co-partition by bucket, only same-bucket candidates pay the
# exact cosine, and per-query top-3 comes from a window PARTITIONED BY
# query id (never a global sort). Ranking compares ROUND(cos, 4) with
# vec_id tie-break so both engines order identically. At 10^9 x 10^5
# this is one hash join on bucket + one bounded window — the classic
# distributed ANN-join plan.

_ANN_JOIN_BODY = """
WITH b AS (
  SELECT vec_id, CAST({PROJ} AS INT) AS bucket FROM embeddings
),
qset AS (SELECT vec_id AS qid, bucket FROM b WHERE vec_id % 61 = 0),
cand AS (
  SELECT q.qid, c.vec_id
  FROM qset q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.qid
),
vecpos AS ({EXPLODE}),
scored AS (
  SELECT cd.qid, cd.vec_id,
         SUM(CAST(pa.v AS DOUBLE) * CAST(pb.v AS DOUBLE))
           / (SQRT(SUM(CAST(pa.v AS DOUBLE) * CAST(pa.v AS DOUBLE)))
              * SQRT(SUM(CAST(pb.v AS DOUBLE) * CAST(pb.v AS DOUBLE))))
           AS cos_sim
  FROM cand cd
  JOIN vecpos pa ON pa.vec_id = cd.qid
  JOIN vecpos pb ON pb.vec_id = cd.vec_id AND pb.pos = pa.pos
  GROUP BY cd.qid, cd.vec_id
),
ranked AS (
  SELECT qid, vec_id, ROUND(cos_sim, 4) AS sim,
         ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY ROUND(cos_sim, 4) DESC, vec_id
         ) AS rk
  FROM scored
)
SELECT qid, vec_id, sim, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
"""

_pair(
    "qs18_ann_join",
    _ANN_JOIN_BODY.replace("{PROJ}", _PROJ_TERMS_SPARK).replace(
        "{EXPLODE}", _EXPLODE_SPARK
    ),
    _ANN_JOIN_BODY.replace("{PROJ}", _PROJ_TERMS_DUCK).replace(
        "{EXPLODE}", _EXPLODE_DUCK
    ),
)


# --- qs19: JL projection fidelity audit (sign agreement, integer-exact) ---------
#
# The CONTRACT check for qs17's 8-dim ±1 projection: on a fixed probe
# set of vector pairs (every vec_id % 41 = 0 paired with id+17, pairs
# past the table edge dropped by the inner join identically in both
# engines), compare the SIGN of the exact fixed-point dot product in
# the original 64-dim space against the sign in the projected 8-dim
# space. Everything is BIGINT (qs09 fixed-point components, qs17
# exact-BIGINT projections, integer products) so the audit is engine-
# exact — the qs13 recall-contract pattern applied to the JL tier.

_QS19_PAIR_DOT = " + ".join(f"a.p{k} * b.p{k}" for k in range(_QS17_K))

_QS19_BODY = """
WITH proj AS ({PROJ}),
vecpos AS ({EXPLODE}),
fx AS (
  SELECT vec_id, pos,
         CAST(floor(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS q
  FROM vecpos),
pairs AS (
  SELECT vec_id AS va, vec_id + 17 AS vb FROM embeddings
  WHERE vec_id % 41 = 0),
orig AS (
  SELECT p.va, p.vb, SUM(fa.q * fb.q) AS dot0
  FROM pairs p
  JOIN fx fa ON fa.vec_id = p.va
  JOIN fx fb ON fb.vec_id = p.vb AND fb.pos = fa.pos
  GROUP BY p.va, p.vb),
pd AS (
  SELECT p.va, p.vb, ({PAIRDOT}) AS dotp
  FROM pairs p
  JOIN proj a ON a.vec_id = p.va
  JOIN proj b ON b.vec_id = p.vb)
SELECT o.va, o.vb,
       CAST(SIGN(o.dot0) AS BIGINT) AS sign_orig,
       CAST(SIGN(pd.dotp) AS BIGINT) AS sign_proj,
       (SIGN(o.dot0) = SIGN(pd.dotp)) AS agree
FROM orig o JOIN pd ON o.va = pd.va AND o.vb = pd.vb
"""

_pair(
    "qs19_jl_fidelity",
    _QS19_BODY.replace("{PROJ}", _QS17_SPARK)
    .replace("{EXPLODE}", _EXPLODE_SPARK)
    .replace("{PAIRDOT}", _QS19_PAIR_DOT),
    _QS19_BODY.replace("{PROJ}", _QS17_DUCK)
    .replace("{EXPLODE}", _EXPLODE_DUCK)
    .replace("{PAIRDOT}", _QS19_PAIR_DOT),
)


# --- qs20: retrieval-quality evaluation (MRR@10, integer-exact) -----------------
#
# The metric an ANN deployment actually tunes: for a probe set (vec_ids
# 0..9, the qs18 batched-query shape), where does the TRUE nearest
# neighbor (exact cosine, qs02 ROUND(sim,4)+vec_id contract) land in
# the SRP-LSH candidate ranking (same-bucket candidates, the qs05
# hyperplanes)? Reciprocal rank is made engine-exact by scaling with
# 2520 = lcm(1..10): rr_scaled = 2520 DIV rank for rank <= 10, else 0
# — every value an exact integer, so MRR@10 = avg(rr_scaled)/2520
# reconstructs without ever comparing floats. A probe whose true NN
# hashes to a different bucket scores 0 — the miss the metric exists
# to expose (qs13 measures set recall; this measures RANK quality).
# 100 TB: sims is the qs18 batched-probe join (10 probes x corpus,
# probe side broadcast); candidate filtering is a bucket equi-join.

_QS20_BODY = """
WITH vecpos AS (
  SELECT vec_id, pos, CAST(v AS DOUBLE) AS x FROM ({EXPLODE})
),
b AS (
  SELECT vec_id, CAST({PROJ} AS INT) AS bucket FROM embeddings
),
sims AS (
  SELECT q.vec_id AS qid, v.vec_id,
         ROUND(SUM(v.x * q.x)
               / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.x * q.x))), 4) AS sim
  FROM vecpos v JOIN vecpos q ON v.pos = q.pos
  WHERE q.vec_id < 10 AND v.vec_id <> q.vec_id
  GROUP BY q.vec_id, v.vec_id
),
exact AS (
  SELECT qid, vec_id AS nn_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, vec_id) AS rn
    FROM sims) t WHERE rn = 1
),
approx AS (
  SELECT s.qid, s.vec_id,
         ROW_NUMBER() OVER (PARTITION BY s.qid
                            ORDER BY s.sim DESC, s.vec_id) AS rnk
  FROM sims s
  JOIN b bq ON bq.vec_id = s.qid
  JOIN b bc ON bc.vec_id = s.vec_id AND bc.bucket = bq.bucket
)
SELECT e.qid, e.nn_id,
       CAST(a.rnk AS BIGINT) AS nn_rank,
       CAST(CASE WHEN a.rnk IS NOT NULL AND a.rnk <= 10
                 THEN 1 ELSE 0 END AS INTEGER) AS found_at_10,
       CAST(CASE WHEN a.rnk IS NOT NULL AND a.rnk <= 10
                 THEN 2520 {IDIV} a.rnk ELSE 0 END AS BIGINT) AS rr_scaled
FROM exact e
LEFT JOIN approx a ON a.qid = e.qid AND a.vec_id = e.nn_id
"""

_pair(
    "qs20_mrr_eval",
    _QS20_BODY.replace("{EXPLODE}", _EXPLODE_SPARK)
    .replace("{PROJ}", _PROJ_TERMS_SPARK)
    .replace("{IDIV}", "DIV"),
    _QS20_BODY.replace("{EXPLODE}", _EXPLODE_DUCK)
    .replace("{PROJ}", _PROJ_TERMS_DUCK)
    .replace("{IDIV}", "//"),
)


# --- qs21: dot-product vs cosine ranking divergence ---------------------------
#
# The serving-stack contract qs16's norm audit motivates but doesn't
# close: MIPS indexes rank by raw inner product, cosine indexes by
# normalized angle — on UNnormalized embeddings the two top-k sets
# disagree exactly where norm skew lives, and a pipeline that trains
# on cosine neighbors but serves dot-product neighbors ships that
# divergence as silent quality loss. Per probe (vec_ids 0..4):
# top-5 under each metric (ROUND 4 + vec_id tie-break, the qs02
# contract) and their overlap + top-1 agreement. 100 TB: one batched
# probe join (the qs18 shape) computes BOTH metrics from the same
# partial sums — norms are per-vector aggregates reused across probes.

_QS21_BODY = """
WITH vecpos AS (
  -- deterministic norm skew (scale by 1 + vec_id % 5): cosine is
  -- scale-invariant, dot is not -- the divergence this query measures
  SELECT vec_id, pos,
         CAST(v AS DOUBLE) * (1 + vec_id % 5) AS x
  FROM ({EXPLODE})
),
pairs AS (
  SELECT q.vec_id AS qid, v.vec_id,
         SUM(v.x * q.x) AS dot,
         SUM(v.x * q.x)
           / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.x * q.x))) AS cos
  FROM vecpos v JOIN vecpos q ON v.pos = q.pos
  WHERE q.vec_id < 5 AND v.vec_id <> q.vec_id
  GROUP BY q.vec_id, v.vec_id
),
rdot AS (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY ROUND(dot, 4) DESC, vec_id) AS rk
  FROM pairs
),
rcos AS (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY ROUND(cos, 4) DESC, vec_id) AS rk
  FROM pairs
)
SELECT d.qid,
       CAST(COUNT(c.vec_id) AS BIGINT) AS n_overlap_at_5,
       CAST(MAX(CASE WHEN d.rk = 1 AND c.rk = 1 THEN 1 ELSE 0 END)
            AS INTEGER) AS top1_same
FROM rdot d
LEFT JOIN rcos c
  ON c.qid = d.qid AND c.vec_id = d.vec_id AND c.rk <= 5
WHERE d.rk <= 5
GROUP BY d.qid
"""

_pair(
    "qs21_metric_divergence",
    _QS21_BODY.replace("{EXPLODE}", _EXPLODE_SPARK),
    _QS21_BODY.replace("{EXPLODE}", _EXPLODE_DUCK),
)


# --- qs22: IVF cell-balance audit (the operational skew metric) ----------------
#
# qs13 certifies IVF recall; this certifies the other half of the
# nprobe=1 cost model: scan fraction is ~|largest probed cell|/N, so
# CELL SKEW -- not K -- decides worst-case latency, and every IVF
# deployment monitors it (imbalance factor = K * max_cell / N, and
# the share of the corpus in the biggest cell). Reuses the exact
# qs07/qs13 cell assignment (per-label centroids, argmax cosine,
# ROUND+label tie-break) so the audited cells ARE the serving cells.
# 100 TB: assignment is the one corpus-wide pass (K dots per vector,
# map-side vs broadcast centroids); the audit itself aggregates K
# rows.

_QS22_BODY = """
WITH cents AS (
  SELECT label AS clabel, pos, AVG(CAST(v AS DOUBLE)) AS c
  FROM ({EXPLODE}) GROUP BY label, pos
),
vecpos AS (
  SELECT vec_id, pos, CAST(v AS DOUBLE) AS x FROM ({EXPLODE})
),
dots AS (
  SELECT v.vec_id, c.clabel,
         SUM(v.x * c.c) / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(c.c * c.c))) AS cos
  FROM vecpos v JOIN cents c ON v.pos = c.pos
  GROUP BY v.vec_id, c.clabel
),
cells AS (
  SELECT vec_id, clabel AS cell FROM (
    SELECT vec_id, clabel,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, clabel) AS rn
    FROM dots) t WHERE rn = 1
),
sizes AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM cells GROUP BY cell),
tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k FROM sizes)
SELECT s.cell, s.n_vecs,
       CAST((1000 * s.n_vecs) {IDIV} (SELECT n FROM tot) AS BIGINT)
           AS share_permille,
       CAST(((SELECT k FROM tot) * 1000 * s.n_vecs)
            {IDIV} (SELECT n FROM tot) AS BIGINT)
           AS imbalance_milli
FROM sizes s
"""

_pair(
    "qs22_ivf_balance",
    _QS22_BODY.replace("{EXPLODE}", _EXPLODE_SPARK).replace("{IDIV}", "DIV"),
    _QS22_BODY.replace("{EXPLODE}", _EXPLODE_DUCK).replace("{IDIV}", "//"),
)


# --- qs23: multi-probe LSH (one-bit-flip bucket expansion) ----------------------
#
# The recall lever BETWEEN nprobe-style IVF scanning and brute force:
# instead of more hash tables (memory) or bigger cells (scan), probe
# the buckets whose signature differs from the query's by ONE
# hyperplane sign (Lv et al. 2007 — the perturbation most likely to
# hold near-misses). Candidates at probe=1 (exact bucket) vs probe=5
# (exact + 4 one-bit flips) feed the qs13 recall@10 contract; the
# candidate SET GROWS monotonically, so recall@5probes >= recall@1 by
# construction and the measured gap is the technique's value on this
# corpus. 100 TB: probe expansion is 5 bucket keys per query — still
# an equi-join, never a scan; XOR bit flips are integer arithmetic on
# the qs05 bucket ids.

_QS23_BODY = """
WITH vecpos AS (
  SELECT vec_id, pos, CAST(v AS DOUBLE) AS x FROM ({EXPLODE})
),
b AS (
  SELECT vec_id, CAST({PROJ} AS INT) AS bucket FROM embeddings
),
probes AS (
  SELECT 0 AS flip UNION ALL SELECT 1 UNION ALL SELECT 2
  UNION ALL SELECT 4 UNION ALL SELECT 8
),
qbuckets AS (  -- the query's probe set: its bucket + 4 one-bit flips
  SELECT bq.vec_id AS qid, {XOR} AS pbucket, p.flip
  FROM b bq CROSS JOIN probes p
  WHERE bq.vec_id < 5
),
sims AS (
  SELECT q.vec_id AS qid, v.vec_id,
         ROUND(SUM(v.x * q.x)
               / (SQRT(SUM(v.x * v.x)) * SQRT(SUM(q.x * q.x))), 4) AS sim
  FROM vecpos v JOIN vecpos q ON v.pos = q.pos
  WHERE q.vec_id < 5 AND v.vec_id <> q.vec_id
  GROUP BY q.vec_id, v.vec_id
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY sim DESC, vec_id) AS rn
    FROM sims) t WHERE rn <= 10
),
plans AS (SELECT 1 AS n_probes UNION ALL SELECT 5),
cand AS (
  SELECT DISTINCT pl.n_probes, qb.qid, bc.vec_id
  FROM plans pl
  JOIN qbuckets qb ON (pl.n_probes = 5 OR qb.flip = 0)
  JOIN b bc ON bc.bucket = qb.pbucket AND bc.vec_id <> qb.qid
),
hits AS (
  SELECT c.n_probes, c.qid, COUNT(*) AS n_hits
  FROM cand c JOIN exact e ON e.qid = c.qid AND e.vec_id = c.vec_id
  GROUP BY c.n_probes, c.qid
)
SELECT p.n_probes, q.qid,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS hits_at_10,
       CAST(100 * COALESCE(h.n_hits, 0) {IDIV} 10 AS BIGINT)
           AS recall_pct
FROM plans p
CROSS JOIN (SELECT DISTINCT vec_id AS qid FROM embeddings
            WHERE vec_id < 5) q
LEFT JOIN hits h ON h.n_probes = p.n_probes AND h.qid = q.qid
"""

_QS23_XOR_SPARK = "CAST(bq.bucket ^ p.flip AS INT)"
_QS23_XOR_DUCK = "CAST(xor(bq.bucket, p.flip) AS INT)"

_pair(
    "qs23_multiprobe_lsh",
    _QS23_BODY.replace("{EXPLODE}", _EXPLODE_SPARK)
    .replace("{PROJ}", _PROJ_TERMS_SPARK)
    .replace("{XOR}", _QS23_XOR_SPARK)
    .replace("{IDIV}", "DIV"),
    _QS23_BODY.replace("{EXPLODE}", _EXPLODE_DUCK)
    .replace("{PROJ}", _PROJ_TERMS_DUCK)
    .replace("{XOR}", _QS23_XOR_DUCK)
    .replace("{IDIV}", "//"),
)
