"""Similarity-search operators (SURVEY.md §2.B [NS]: sim_search_topk,
sim_search_ivf, join_similarity_text).

Grounding papers (PAPERS.md): ICDE'22 compressed-index string-similarity
join (prefilter-then-verify shape of join_similarity_text), EDBT'20
incremental top-k similarity search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import sql_cosine, vec_cosine
from ..registry import query
from ..tables import load, load_parallel

_QUERY_VEC_ID = 0
_TOP_K = 20


@query(
    "sim_search_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
SELECT e.vec_id,
       ROUND({sql_cosine('e.embedding', 'q.qvec')}, 6) AS cos_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id != {_QUERY_VEC_ID}
ORDER BY ROUND({sql_cosine('e.embedding', 'q.qvec')}, 6) DESC, e.vec_id
LIMIT {_TOP_K}
""",
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vector, score every
    row with codegen'd higher-order functions, TakeOrderedAndProject
    keeps per-partition heaps — the exact-baseline ANN every approximate
    method is measured against. One scan, no shuffle beyond the k-row
    merge; at 100 TB this is embarrassingly parallel and
    scan-bandwidth-bound."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    # ordering on the ROUNDED cosine: selection/rank boundaries must not
    # depend on last-ulp fold-order differences between engines
    cos = F.round(vec_cosine("embedding", "qvec"), 6)
    return (
        e.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_N_CELLS = 16
_N_PROBE = 4


@query("sim_search_ivf")
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: partition vectors into _N_CELLS Voronoi cells
    around fixed seed centroids (vec_id < _N_CELLS — deterministic,
    training-free; production runs a few k-means rounds), then search
    only the _N_PROBE cells nearest the query. Scales the top-k scan by
    nprobe/ncells at a recall cost (bounded in tests vs the brute-force
    baseline). Rows-only check: cell assignment is an engine-internal
    detail with no ANSI-SQL twin worth maintaining.

    At 100 TB the cell id becomes a *partition column* of the stored
    table, so a query prunes to nprobe partitions at the file level."""
    e = load(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cvec")
    )

    # Assign every vector to its nearest centroid (argmax cosine).
    scored = e.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cell_id",
        vec_cosine("embedding", "cvec").alias("c_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cell_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell_id")
    )

    # Probe list: the _N_PROBE cells whose centroids best match the query.
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    probe = (
        cents.join(F.broadcast(q))
        .select("cell_id", vec_cosine("cvec", "qvec").alias("c_cos"))
        .orderBy(F.desc("c_cos"), F.asc("cell_id"))
        .limit(_N_PROBE)
        .select("cell_id")
    )

    cos = F.round(vec_cosine("embedding", "qvec"), 6)
    return (
        assigned.join(F.broadcast(probe), "cell_id", "leftsemi")
        .filter(F.col("vec_id") != _QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_LSH_PLANES = 6  # bits per band → 2^6 buckets per band table
_LSH_BANDS = 2  # independent plane-sets; candidates = union over bands


def _lsh_plane(band: int, j: int, dim: int) -> list[float]:
    """Pseudo-random hyperplane (band, j), components in [-1, 1] derived
    from an md5 lattice — deterministic across runs/engines/partitions
    with no RNG state to ship (same trick as the MinHash permutations)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"lshrp:{band}:{j}:{d}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def _lsh_bucket(vec_col: str, band: int, dim: int) -> F.Column:
    """Signed-random-projection bucket id for one band:
    bit j = sign(v · plane_j)."""
    bucket = F.lit(0)
    for j in range(_LSH_PLANES):
        arr = F.array(*[F.lit(v) for v in _lsh_plane(band, j, dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


@query("sim_search_lsh_rp")
def sim_search_lsh_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (the cosine cousin of MinHash): bit j of
    a vector's band-bucket is the sign of its projection onto
    deterministic hyperplane (band, j), so vectors at small angle
    collide with high probability. A candidate matches the query's
    bucket — or any hamming-1 flip of it (multiprobe) — in ANY of the
    _LSH_BANDS independent band tables; only candidates are
    brute-force-scored, ~B·(P+1)/2^P of the corpus. Bands are the
    recall knob: each added band trades a bucket's worth of extra scan
    for an independent chance to catch a neighbor the other bands
    hashed apart. Rows-only check (bucket geometry has no ANSI twin);
    recall is bounded in tests against the brute-force baseline.

    Scale shape: bucketing is a row-local codegen'd fold (zero
    shuffle, same as ml_kmeans_refine's assignment); the candidate
    filter is one broadcast of a single probe row (B·(P+1) bucket ids)
    — no shuffle anywhere before the final k-row merge. At 100 TB the
    band-0 bucket becomes the stored partition/cluster column so the
    dominant probe prunes at the file level, with the other bands as
    in-file cluster columns (row-group skipping)."""
    e = load(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").head().embedding)  # setup-time scalar
    assigned = e
    for b in range(_LSH_BANDS):
        assigned = assigned.withColumn(f"b{b}", _lsh_bucket("embedding", b, dim))

    # One probe row: the query vector plus, per band, the array of its
    # bucket id and every hamming-1 flip (multiprobe).
    def flips(col: str) -> F.Column:
        return F.array(
            F.col(col),
            *[F.col(col).bitwiseXOR(F.lit(1 << j)) for j in range(_LSH_PLANES)],
        )

    q = assigned.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec"),
        *[flips(f"b{b}").alias(f"p{b}") for b in range(_LSH_BANDS)],
    )

    hit = F.lit(False)
    for b in range(_LSH_BANDS):
        hit = hit | F.array_contains(F.col(f"p{b}"), F.col(f"b{b}"))
    cos = F.round(vec_cosine("embedding", "qvec"), 6)
    return (
        assigned.join(F.broadcast(q))
        .filter(hit & (F.col("vec_id") != _QUERY_VEC_ID))
        .select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(_TOP_K)
    )


_KNN_K = 3


@query(
    "sim_knn_join",
    oracle=f"""
SELECT vec_id, neighbor_id, cos_sim, rnk
FROM (
    SELECT a.vec_id,
           b.vec_id AS neighbor_id,
           ROUND({sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND({sql_cosine('a.embedding', 'b.embedding')}, 6) DESC,
                        b.vec_id
           ) AS BIGINT) AS rnk
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id != b.vec_id
) t
WHERE rnk <= {_KNN_K}
""",
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join: top-{_KNN_K} nearest neighbors for EVERY vector (not a
    single probe) within its blocking cell — the all-pairs workhorse
    behind embedding near-dup clustering and retrieval-index build.
    Blocked self-join on label (≡ IVF cell / LSH bucket at scale: the
    block bounds candidates per row), cosine scored by codegen'd
    higher-order functions, per-vector window rank keeps k. At 100 TB
    the block key is the stored partition column, so each cell's
    all-pairs runs co-located, and rank uses the cell-local window —
    no global shuffle beyond the blocked join itself."""
    e = load(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    # rank over the ROUNDED cosine (see sim_search_topk)
    cos = F.round(vec_cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    scored = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(
            Window.partitionBy("vec_id").orderBy(
                F.desc("cos_sim"), F.asc("neighbor_id")
            )
        ))
    )
    return (
        scored.filter(F.col("rnk") <= _KNN_K)
        .select("vec_id", "neighbor_id", "cos_sim", F.col("rnk").cast("long").alias("rnk"))
    )


@query(
    "join_similarity_text",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS lev
FROM names a
JOIN names b
  ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
)
def join_similarity_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join over name variants (the market/commodity name
    normalization problem of the reference's string dimensions):
    blocking prefilter on a shared token → exact edit-distance verify.
    The prefilter-then-verify shape is the ICDE'22 string-similarity-join
    pattern; blocking turns O(n²) levenshtein into per-bucket work, and
    the buckets are equi-join keys (shuffle-friendly, AQE-skew-safe)."""
    p = load(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    a = names.alias("a")
    b = names.alias("b")
    # try_element_at: null (not an ANSI error) when a name has <2 tokens
    key = lambda side: F.try_element_at(F.split(F.col(f"{side}.p_name"), " "), F.lit(2))  # noqa: E731
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (key("a") == key("b")) & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(lev <= 4)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.cast("long").alias("lev"),
        )
    )


@query(
    "agg_vector_centroid",
    oracle="""
SELECT label, idx,
       CAST(SUM(CAST(FLOOR(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*)
         AS centroid_v
FROM (
  SELECT label,
         generate_subscripts(embedding, 1) AS idx,
         UNNEST(embedding) AS v
  FROM embeddings
)
GROUP BY label, idx
""",
)
def agg_vector_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label element-wise centroid of the embedding column — the
    cluster-center computation every embedding pipeline needs (IVF
    coarse quantizers, k-means steps, class prototypes).

    posexplode → groupBy(label, idx) makes each dimension an independent
    partial-aggregable SUM/COUNT: one shuffle of #labels × dim rows, no
    vector ever held whole on the reduce side — at 100 TB and dim=1024
    the shuffle stays tiny while the map side streams. (The dense
    alternative — `F.aggregate` over zip_with accumulating an
    array<double> — is one fewer explode but makes the combiner a
    full-width array merge; long-form wins at scale.)

    Determinism: float32 components have no exact decimal form, so the
    DECIMAL(30,6) sum rule would *re-quantize* each value and the two
    engines round those quantizations differently. Instead sum on an
    exact integer lattice — FLOOR(v·1e9) is the same IEEE product and
    floor on both engines, the BIGINT sum is order-independent, and one
    shared division at the end restores scale (headroom: ~9e9 rows per
    group before BIGINT overflow at |v|≤1; widen the scale factor down
    or sum as DECIMAL(38,0) beyond that)."""
    e = load_parallel(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("idx"))
        .agg(
            (
                F.sum(F.floor(F.col("v") * 1e9)).cast("double")
                / F.lit(1e9)
                / F.count("*")
            ).alias("centroid_v")
        )
    )


_KM_K = 8  # coarse-quantizer cells for the k-means refinement proof


def _argmax_cell(cells_col: str, vec_col: str):
    """Row-local argmax over a broadcast array of (cell_id, cvec)
    structs: best (rounded) cosine, ties to the smallest cell_id —
    via array_max over (cos, -cell_id) structs, so each O(dim) cosine
    is evaluated exactly once per (vector, cell) pair and struct
    ordering supplies the tie-break. NaN cosines (zero-norm vector or
    centroid) are mapped to +inf, matching the oracle: DuckDB sorts
    NaN above +inf, so ROW_NUMBER ... ORDER BY cos DESC picks the
    NaN cell with the smallest id, exactly what +inf yields here."""
    best = F.array_max(
        F.transform(
            F.col(cells_col),
            lambda c: F.struct(
                F.nanvl(
                    F.round(vec_cosine(F.col(vec_col), c.cvec), 6),
                    F.lit(float("inf")),
                ).alias("cos"),
                (-c.cell_id).alias("neg_id"),
            ),
        )
    )
    return (-best.neg_id).cast("long")


@query(
    "ml_kmeans_refine",
    oracle=f"""
WITH seeds AS (
  SELECT vec_id AS cell_id, embedding AS cvec
  FROM embeddings WHERE vec_id < {_KM_K}
), a0 AS (
  SELECT e.vec_id, e.embedding, s.cell_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({sql_cosine('e.embedding', 's.cvec')}, 6) DESC,
                    s.cell_id) AS rn
  FROM embeddings e CROSS JOIN seeds s
), assign0 AS (
  SELECT vec_id, embedding, cell_id FROM a0 WHERE rn = 1
), cent AS (
  SELECT cell_id, idx,
         CAST(SUM(CAST(FLOOR(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*)
           AS cv
  FROM (SELECT cell_id, generate_subscripts(embedding, 1) AS idx,
               UNNEST(embedding) AS v
        FROM assign0)
  GROUP BY cell_id, idx
), carr AS (
  SELECT cell_id, list(cv ORDER BY idx) AS cvec FROM cent GROUP BY cell_id
), a1 AS (
  SELECT e.vec_id, c.cell_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({sql_cosine('e.embedding', 'c.cvec')}, 6) DESC,
                    c.cell_id) AS rn
  FROM embeddings e CROSS JOIN carr c
), assign1 AS (
  SELECT vec_id, cell_id FROM a1 WHERE rn = 1
)
SELECT c0.cell_id, c0.n AS n_seeded, COALESCE(c1.n, 0) AS n_refined
FROM (SELECT cell_id, COUNT(*) AS n FROM assign0 GROUP BY cell_id) c0
LEFT JOIN (SELECT cell_id, COUNT(*) AS n FROM assign1 GROUP BY cell_id) c1
  ON c0.cell_id = c1.cell_id
""",
)
def ml_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full k-means refinement round over the embedding corpus —
    the training step `sim_search_ivf` defers to ("production runs a
    few k-means rounds"): seed centroids (vec_id < k), assign every
    vector by best cosine, recompute centroids as per-cell element
    means, re-assign, and report per-cell membership before/after.
    Looping the middle two stages is the production trainer; one
    unrolled round keeps the whole iteration oracle-checkable.

    Scale shape (the point of the exercise): ASSIGNMENT IS A ROW-LOCAL
    FOLD over the broadcast (cell_id, centroid) array — zero shuffle,
    no per-vector window, embarrassingly parallel at 100 TB. The only
    fact-sized exchange per round is the centroid update's long-form
    partial aggregate (k × dim rows out of each task, same as
    `agg_vector_centroid`). The oracle states the identical semantics
    as window-argmax; the two coincide because (rounded cosine,
    cell_id) is a strict total order per vector.

    Determinism: centroid means ride the FLOOR(v·1e9) integer lattice
    (exact, order-independent); cosines against those bitwise-identical
    centroids are ROUND(6)ed before every comparison so rank boundaries
    never hinge on fold-order ulps (registry.py rules)."""
    e = load_parallel(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cvec")
    )
    seed_arr = seeds.agg(
        F.collect_list(F.struct("cell_id", "cvec")).alias("cells")
    )
    assign0 = (
        e.join(F.broadcast(seed_arr))
        .select(
            "vec_id",
            "embedding",
            _argmax_cell("cells", "embedding").alias("cell_id"),
        )
    )
    cent = (
        assign0.select("cell_id", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cell_id", (F.col("pos") + 1).cast("long").alias("idx"))
        .agg(
            (
                F.sum(F.floor(F.col("v") * 1e9)).cast("double")
                / F.lit(1e9)
                / F.count("*")
            ).alias("cv")
        )
    )
    carr = cent.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "cv"))), lambda s: s.cv
        ).alias("cvec")
    )
    new_arr = carr.agg(
        F.collect_list(F.struct("cell_id", "cvec")).alias("cells")
    )
    assign1 = (
        e.join(F.broadcast(new_arr))
        .select(
            "vec_id",
            _argmax_cell("cells", "embedding").alias("cell_id"),
        )
    )
    c0 = assign0.groupBy("cell_id").agg(F.count("*").alias("n_seeded"))
    c1 = assign1.groupBy("cell_id").agg(F.count("*").alias("n1"))
    return (
        c0.join(c1, "cell_id", "left")
        .select(
            "cell_id",
            "n_seeded",
            F.coalesce(F.col("n1"), F.lit(0)).cast("long").alias("n_refined"),
        )
    )
