"""Vector similarity search (SURVEY.md §2.11 L3).

Cosine is computed with built-in array HOFs (zip_with + left-fold
aggregate) in double precision — JVM codegen, deterministic evaluation
order, no Python crossing. The same fold order (left-to-right) is what
DuckDB's list_reduce uses, so results are bit-identical cross-engine.

Scale path: brute-force top-k is a single map + TakeOrderedAndProject
(fine for one query vector over any corpus size); for query *sets* the
sign-LSH bucket join (lsh_sign_bucket) turns it into an equi-join that
only compares same-bucket candidates — IVF-style pruning without an
index structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a, b) over two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_array(c: Column) -> Column:
    """Exact float→double widening so arithmetic happens in f64."""
    return F.transform(c, lambda x: x.cast("double"))


def topk_cosine(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k cosine neighbors of a single query vector.

    ``query`` is a 1-row DataFrame holding ``q`` (array<double>); it is
    broadcast, so the corpus is scanned exactly once with no shuffle —
    the top-k itself is TakeOrderedAndProject (per-partition heaps)."""
    joined = vectors.crossJoin(F.broadcast(query))
    sims = joined.select(
        F.col(id_col),
        cosine_similarity_col(as_double_array(F.col(vec_col)), F.col("q")).alias("cosine_sim"),
    )
    return sims.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def lsh_sign_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: the concatenated signs of the first
    ``n_planes`` coordinates (axis-aligned hyperplanes — deterministic
    and oracle-portable, unlike random projections). Vectors in the
    same orthant are cosine-close candidates."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(vec, 1, n_planes),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )


def bucketed_near_pairs(
    vectors: DataFrame,
    threshold: float,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs: equi-join on the sign-LSH bucket,
    then exact cosine on the (few) same-bucket candidates. The bucket
    join bounds the candidate set to ~n²/2^planes instead of n² — the
    scale path for pairwise similarity."""
    b = vectors.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("v"),
        lsh_sign_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    )
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
            cosine_similarity_col(F.col("l.v"), F.col("r.v")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def label_centroids(
    vectors: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label element-wise mean vector as posexplode → hash agg →
    re-assemble. The per-coordinate sum runs in decimal(38,10) (the
    decimal canon, functions/canonical.py): exact and order-free, so
    the centroid doubles — and every cosine computed from them — are
    bit-identical at any partition count and portable to a SQL oracle.

    Scale path: the shuffle is on (label, pos) — n_labels × dim cells
    regardless of corpus size, with map-side partial aggregation doing
    the heavy lifting; the result is index *metadata* (n_labels rows),
    broadcastable to any consumer."""
    flat = vectors.select(
        label_col, F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "x")
    )
    return (
        flat.groupBy(label_col, "pos")
        .agg(
            (F.sum(F.col("x").cast("decimal(38,10)")).cast("double") / F.count("x")).alias("cx")
        )
        .groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s.cx
            ).alias("centroid")
        )
    )


def ivf_build(
    vectors: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF index build: k-means coarse quantizer (spark.ml, seeded) +
    every vector assigned to its nearest centroid's inverted list.

    Returns ``(assigned, centers)``: the corpus with a ``list_id``
    column, and the k centroid vectors (a python list — index
    *metadata*, k × dim floats, legitimately driver-sized; the corpus
    itself never leaves executors). At 100 TB the build is one ml
    fit over a sample plus one transform pass; the assigned table is
    what gets written out, partitioned by list_id, so probes prune
    partitions."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.withColumn("_fv", array_to_vector(as_double_array(F.col(vec_col))))
    model = KMeans(k=n_lists, seed=42, featuresCol="_fv", predictionCol="list_id").fit(feat)
    assigned = model.transform(feat).drop("_fv")
    centers = [c.tolist() for c in model.clusterCenters()]
    return assigned, centers


def ivf_topk(
    assigned: DataFrame,
    centers: list,
    query: DataFrame | list,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, scan only the
    ``nprobe`` nearest inverted lists, exact top-k within them.

    ``query`` is a 1-row DataFrame with column ``q array<double>`` (a
    plain Python list is also accepted for ad-hoc use). The whole probe
    is JVM-side: centroids (k × dim floats of index metadata) become a
    tiny DataFrame, the query row never round-trips through the driver,
    and the candidate restriction is a broadcast join on ``list_id`` —
    at scale, with the assigned table written partitioned by list_id,
    that broadcast join drives dynamic partition pruning, so non-probed
    lists are never read. ``nprobe = n_lists`` degrades gracefully to
    exact brute force; smaller nprobe trades recall for scanning
    ~nprobe/n_lists of the corpus."""
    spark = assigned.sparkSession
    qdf = query if isinstance(query, DataFrame) else spark.createDataFrame([(query,)], "q array<double>")
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "list_id int, c array<double>",
    )
    probe = (
        centers_df.crossJoin(F.broadcast(qdf))
        .select("list_id", cosine_similarity_col(F.col("c"), F.col("q")).alias("_sim"))
        .orderBy(F.col("_sim").desc(), "list_id")
        .limit(nprobe)
        .select("list_id")
    )
    cand = assigned.join(F.broadcast(probe), "list_id")
    return topk_cosine(cand, qdf, k=k, vec_col=vec_col, id_col=id_col)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_salt: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact k-NN join: top-k cosine neighbors in ``corpus`` for EVERY
    row of ``queries`` (columns ``query_id``, ``q`` array<double>).

    ``queries`` is broadcast (the batch-of-queries ANN shape: small
    query set, huge corpus), so candidate generation is a map-only
    corpus scan. The per-query top-k then runs in two stages: stage 1
    takes top-k within (query_id, salt) — ``n_salt`` sub-keys per
    query, so the shuffle spreads over query×salt keys instead of
    hot-keying a handful of query_ids — stage 2 reduces the q·salt·k
    survivors (tiny) to the exact global top-k. Exact because any
    global top-k row is necessarily top-k within its own salt."""
    from pyspark.sql import Window

    sim = cosine_similarity_col(
        as_double_array(F.col(vec_col)), F.col("q")
    ).alias("cosine_sim")
    pairs = (
        corpus.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, sim)
        .withColumn("_salt", F.pmod(F.hash(F.col(id_col)), F.lit(n_salt)))
    )
    order = [F.col("cosine_sim").desc(), F.col(id_col)]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        pairs.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
    )
