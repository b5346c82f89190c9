"""Deduplication operators (SURVEY.md §2.11 L1/L2): exact, n-gram
Jaccard, SimHash, and MinHash-LSH.

Scale design (the L7 rule): nothing here materializes pairs across the
whole corpus. Exact dedup is a hash group-by; Jaccard joins only pairs
sharing a token (inverted-index join, not cross join); SimHash reduces
each doc to 64 bits groupable by band; MinHash-LSH (spark.ml) buckets
by band hashes so candidate generation is equi-join shaped. At 100 TB
the pairwise step only ever sees same-bucket candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_programming_spark.operators.text import tokenize


def normalize_text(text: Column) -> Column:
    """Canonical text form for exact dedup: lowercase + collapsed
    whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_dedup_keys(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: md5 key, surviving doc_id
    (deterministically the smallest), duplicate count."""
    return (
        docs.select(
            F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("content_hash"),
            "doc_id",
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


#: Default hot-token document-frequency cap for :func:`jaccard_pairs`.
#: JACCARD_ORACLE_SQL bakes in the SAME constant, so the Spark result
#: and the DuckDB twin drop identical tokens at ANY scale — the cap
#: can trigger without a silent hash divergence (ADVICE r4 item 2).
MAX_TOKEN_DF = 100_000


def spread_fanout_input(docs: DataFrame, id_col: str) -> DataFrame:
    """Guarantee cluster-wide parallelism before a quadratic fan-out
    (r12 optimization, guide §2.5 — "one huge unsplittable file …
    repartition immediately after the read").

    The exact pairwise ops below explode each doc into shingles and
    fan every shingle out to its f join matches; ALL of that work runs
    in the *scan task* (the verify join broadcasts one side, so there
    is no exchange to redistribute it). When the input yields fewer
    scan partitions than the cluster has slots — one small/unsplittable
    file; the sf0.1 fixture is ONE 594 KB parquet = ONE task — the
    entire fan-out serializes on one core while the rest idle: measured
    l2g at sf0.1 = 236 s single-task vs 8 s spread over 32 cores (the
    769M-row intersection count behind it is the same either way).

    A deterministic hash repartition on the doc id (not round-robin:
    no sort-before-repartition, retry-stable — §2.5) costs one exchange
    of the PRE-explode doc rows, negligible beside the fan-out, and is
    skipped entirely whenever the scan already carries >= cluster
    parallelism — every real-scale table — so 100 TB plans are
    unchanged."""
    spark = docs.sparkSession
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() >= target:
        return docs
    return docs.repartition(target, F.col(id_col))


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token_df: int | None = MAX_TOKEN_DF,
) -> DataFrame:
    """Exact token-set Jaccard similarity for all pairs sharing ≥1 token.

    Inverted-index formulation: explode distinct tokens, self-join on
    token (equi-join — shuffles on token, never a cross join), count
    shared tokens per pair, then |A∩B| / (|A|+|B|-|A∩B|). The
    production path at scale is MinHash-LSH banding
    (minhash_lsh_candidates below); this operator is its ground-truth
    twin for recall testing (SURVEY.md §7 hard-part 4).

    ``max_token_df`` bounds the quadratic blow-up a single hot token
    would cause (a token in k docs emits k² join rows): tokens whose
    document frequency exceeds the cap are dropped from the inverted
    index via a broadcast anti-join (hot tokens are by definition few).
    JACCARD_ORACLE_SQL applies the SAME cap (the shared MAX_TOKEN_DF
    constant), so the two engines drop identical tokens and stay
    hash-identical even when the cap triggers; pass a non-default cap
    only on non-oracle paths. Dropping a >100k-df token barely moves
    Jaccard for near-dup purposes: such tokens are stopwords shared by
    essentially every candidate pair."""
    docs = spread_fanout_input(docs, id_col)
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("token"),
    )
    if max_token_df is not None:  # None = caller vouches, skip the df pass
        hot = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_token_df)
            .select("token")
        )
        toks = toks.join(F.broadcast(hot), "token", "left_anti")
    sizes = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("n_tokens"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_tokens").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_tokens").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


JACCARD_ORACLE_SQL = f"""
WITH toks0 AS (
  SELECT doc_id AS doc, UNNEST(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), toks AS (
  -- same hot-token df cap as jaccard_pairs(max_token_df=MAX_TOKEN_DF):
  -- both engines drop identical tokens, so the cap triggering at a
  -- larger SF cannot silently diverge the hash
  SELECT doc, token FROM toks0
  QUALIFY COUNT(*) OVER (PARTITION BY token) <= {MAX_TOKEN_DF}
), sizes AS (
  SELECT doc, COUNT(*) AS n_tokens FROM toks GROUP BY doc
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n_tokens + sb.n_tokens - n_shared) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_tokens + sb.n_tokens - n_shared) >= {{threshold}}
"""


def _token_hash60(token: Column) -> Column:
    """Deterministic 60-bit integer hash of a token via md5 — portable
    to DuckDB (same md5, same hex-prefix parse; 15 hex digits so the
    value fits a signed 64-bit int in both engines)."""
    return F.conv(F.substring(F.md5(token.cast("binary")), 1, 15), 16, 10).cast("long")


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash signature over token hashes: for each bit position, sum
    +1/-1 votes across the document's distinct tokens; the sign vector
    is the signature (emitted as a bit string — near-duplicate docs
    differ in few positions).

    Plan shape (r11 optimization): ``bits`` conditional integer sums in
    ONE per-doc hash aggregate — explode(token) → groupBy(doc). The
    previous shape exploded a second time (×bits rows), aggregated by
    (doc, bit), and needed a second exchange plus an ObjectHashAggregate
    (collect_list + array_sort) to assemble the signature; measured at
    sf0.1 the rewrite removes that exchange and the ×16 row fan-out
    (2 Exchange → 1, ObjectHashAggregate → none). Votes are exact
    integer sums either way, so the signature is bit-identical."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("token"),
    ).select(id_col, _token_hash60(F.col("token")).alias("h"))
    bit_cols = [
        F.when(
            F.sum(
                F.when((F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
            )
            > 0,
            F.lit("1"),
        )
        .otherwise(F.lit("0"))
        .alias(f"_b{b}")
        for b in range(bits)
    ]
    return (
        toks.groupBy(id_col)
        .agg(*bit_cols)
        .select(
            id_col,
            F.concat(*[F.col(f"_b{b}") for b in range(bits)]).alias("simhash_bits"),
        )
    )


SIMHASH_ORACLE_SQL = """
WITH toks AS (
  SELECT doc_id,
         CAST(CONCAT('0x', SUBSTRING(md5(t.token), 1, 15)) AS BIGINT) AS h
  FROM documents, UNNEST(list_distinct(string_split(text, ' '))) AS t(token)
), votes AS (
  SELECT doc_id, b.bit,
         CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM toks, (SELECT UNNEST(generate_series(0, {maxbit})) AS bit) b
), signs AS (
  SELECT doc_id, bit, CASE WHEN SUM(vote) > 0 THEN '1' ELSE '0' END AS s
  FROM votes GROUP BY doc_id, bit
)
SELECT doc_id, STRING_AGG(s, '' ORDER BY bit) AS simhash_bits
FROM signs GROUP BY doc_id
"""


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 32,
    margin: float = 0.1,
) -> DataFrame:
    """Near-duplicate *candidate* pairs via spark.ml MinHashLSH.

    tokens → HashingTF sparse vectors → MinHash signatures →
    approxSimilarityJoin. Candidate generation is a band-bucket
    equi-join (linear shuffle), never all-pairs; seeded, so
    deterministic for a fixed input.

    ``margin`` over-fetches: the join's distance filter runs on the
    *hashed-feature* Jaccard, which drifts a few percent from true
    token Jaccard for borderline pairs (HashingTF bucket collisions),
    so the distance cut is loosened by ``margin`` and the precise cut
    is left to the exact-verify stage (:func:`minhash_dedup_pairs`) —
    the standard over-fetch-then-verify shape of production dedup."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("tokens")).filter(
        F.size(F.array_distinct("tokens")) > 0
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(
        feat, feat, 1.0 - jaccard_threshold + margin, distCol="dist"
    )
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (1.0 - F.col("dist")).alias("est_jaccard"),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates exact-verified against true token Jaccard — the
    full production near-dedup pipeline (generate ∪ verify), whose
    output equals the ground-truth all-pairs computation while only
    ever scoring same-bucket candidates. 32 hash tables put the
    candidate-miss probability for a true ≥0.5 pair below 1e-9, so the
    result is oracle-checkable against the exact formulation."""
    cand = minhash_lsh_candidates(docs, text_col, id_col, jaccard_threshold=threshold)
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("token"),
    )
    sizes = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("n_tokens"))
    ta = toks.select(F.col("doc").alias("doc_a"), "token")
    tb = toks.select(F.col("doc").alias("doc_b"), "token")
    shared = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_tokens").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_tokens").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


#: Mersenne prime 2^31-1 for the universal-hash family below. Token
#: base hashes are 28-bit (7 hex digits of md5), multipliers < 2^31,
#: so a*h + b < 2^60 — no 64-bit overflow in either engine.
_MINHASH_PRIME = 2147483647


def _minhash_constants(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k universal hash functions
    h_s(x) = (a_s * x + b_s) mod P, derived from md5 of the seed index
    so the SAME literals are embedded in the Spark plan and the DuckDB
    oracle — the whole LSH pipeline replays bit-for-bit cross-engine."""
    import hashlib

    out = []
    for s in range(num_hashes):
        d = hashlib.md5(f"bdps-minhash-{s}".encode()).hexdigest()
        a = int(d[:7], 16) % (_MINHASH_PRIME - 1) + 1
        b = int(d[7:14], 16) % _MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The MinHash SIGNATURE relation ``(doc, sig: array<long>)`` —
    computed IN-ROW (distinct tokens -> 28-bit md5 base hashes -> k
    universal-hash minima, one array-HOF chain in whole-stage
    codegen). Exposed as its own stage because the signature table IS
    the persistence artifact of an incremental dedup pipeline (lm8):
    k longs per doc, never the text. Twin of the ``sigs`` CTE in
    :func:`minhash_signatures_sql`."""
    consts = _minhash_constants(num_hashes)
    toks_arr = F.array_distinct(tokenize(F.col(text_col)))
    base = docs.select(F.col(id_col).alias("doc"), toks_arr.alias("ts")).filter(
        F.size("ts") > 0
    )
    hv = base.select(
        "doc",
        F.transform(
            F.col("ts"),
            lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 7), 16, 10).cast(
                "long"
            ),
        ).alias("h"),
    )

    def _uhash(a: int, b: int):
        # closure factory: Spark infers HOF arity from the lambda
        # signature, so the constants must be captured, not defaulted
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(_MINHASH_PRIME)

    return hv.select(
        "doc",
        F.array(
            *[
                F.array_min(F.transform(F.col("h"), _uhash(a, b)))
                for (a, b) in consts
            ]
        ).alias("sig"),
    )


def minhash_bands(
    sig: DataFrame, num_hashes: int = 24, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding of a signature relation: ``(doc, band, key)`` rows,
    one per band, key = the band's signature slots joined as a string.
    Exposed separately so the incremental path (lm8) can band the
    history and the new batch independently of candidate generation."""
    n_bands = num_hashes // rows_per_band
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.element_at("sig", j * rows_per_band + i + 1).cast(
                                    "string"
                                )
                                for i in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.key")


def minhash_band_candidates(
    docs: DataFrame,
    num_hashes: int = 24,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CANDIDATE stage of :func:`minhash_banded_pairs`, exposed so
    the banding itself is auditable (l2n measures its recall against
    exact-Jaccard ground truth): distinct ``(doc_a, doc_b)`` pairs
    agreeing on all slots of >= 1 LSH band — before any exact
    verification. Twin of :func:`minhash_band_candidates_sql`."""
    docs = spread_fanout_input(docs, id_col)
    sig = minhash_signatures(
        docs, num_hashes=num_hashes, text_col=text_col, id_col=id_col
    )
    bands = minhash_bands(sig, num_hashes=num_hashes, rows_per_band=rows_per_band)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_banded_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 24,
    rows_per_band: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via hand-rolled MinHash + LSH banding, pure SQL
    expressions end to end (no spark.ml) — the from-first-principles
    twin of :func:`minhash_dedup_pairs`.

    Per doc, IN-ROW (no explode, no shuffle): distinct tokens →
    28-bit md5 base hashes → k=``num_hashes`` universal-hash minima =
    the MinHash signature — one array HOF chain inside whole-stage
    codegen. Banding: k/r bands of r signature slots each; docs
    agreeing on ALL slots of some band become candidates via a
    (band_idx, band_key) equi-join — the only shuffle moves
    (doc, band_key) rows, never token lists. Candidates are then
    exact-verified against true token Jaccard (candidates-only join).

    The signature step costs O(tokens × k) multiply-mods as a pure
    map; at 100 TB this is the canonical dedup shape (the GPL-free
    rewrite of every web-dedup pipeline). Banding recall for a true
    pair at similarity J is 1-(1-J^r)^(k/r): r=2, k=24 → 97% at
    J=0.5, >99.9% at J=0.7; missed borderline pairs are missed
    IDENTICALLY by the oracle, because the hash constants are shared
    literals — the oracle certifies cross-engine determinism of the
    full pipeline (recall vs ground truth is l2n's audit).

    Verify stage (r12 optimization, guide §2.3/§3.3 — do not explode
    before a join): the old shape exploded every candidate doc's
    tokens and re-joined on (doc, token) — at sf0.1 that is 11.65M
    candidate pairs × ~40 tokens ≈ 470M skinny rows through TWO hash
    joins (measured 29 s of the query's 61). Attaching each side's
    distinct-token ARRAY instead and intersecting in-row
    (``size(array_intersect(..))``, whole-stage codegen — the l2f
    banded-verify idiom) computes the identical |A∩B|: both arrays are
    array_distinct outputs, so the intersection cardinality IS the
    shared-token count, and |A| rides along as ``size(ts)`` with no
    separate sizes aggregate. Two joins carrying 11.65M array-bearing
    rows replace two joins carrying 470M exploded rows; output values
    are bit-identical (integer count, same ratio arithmetic)."""
    docs = spread_fanout_input(docs, id_col)
    cand = minhash_band_candidates(
        docs, num_hashes=num_hashes, rows_per_band=rows_per_band,
        text_col=text_col, id_col=id_col,
    )
    tok_sets = docs.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(tokenize(F.col(text_col))).alias("ts"),
    )
    sa = tok_sets.select(
        F.col("doc").alias("doc_a"), F.col("ts").alias("ts_a"),
        F.size("ts").alias("n_a"),
    )
    sb = tok_sets.select(
        F.col("doc").alias("doc_b"), F.col("ts").alias("ts_b"),
        F.size("ts").alias("n_b"),
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "n_shared",
            F.size(F.array_intersect("ts_a", "ts_b")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


def minhash_signatures_sql(num_hashes: int = 24) -> str:
    """DuckDB twin of :func:`minhash_signatures` — the base/hv/sigs
    CTE fragment (``sigs`` ends the chain with columns (doc, sig)),
    exposed so lm8's incremental oracle composes the identical
    signature arithmetic."""
    consts = _minhash_constants(num_hashes)
    sig_items = ",\n           ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {_MINHASH_PRIME}))"
        for (a, b) in consts
    )
    return f"""base AS (
  SELECT doc_id AS doc, list_distinct(string_split(text, ' ')) AS ts
  FROM documents
), hv AS (
  SELECT doc,
         list_transform(ts, t -> CAST(CONCAT('0x', SUBSTRING(md5(t), 1, 7)) AS BIGINT)) AS h
  FROM base WHERE len(ts) > 0
), sigs AS (
  SELECT doc,
         [{sig_items}] AS sig
  FROM hv
)"""


def minhash_band_key_sql(rows_per_band: int = 2) -> str:
    """DuckDB spelling of one band's key over ``sig`` with band index
    ``j`` in scope — twin of the key construction in
    :func:`minhash_bands`."""
    return " || '-' || ".join(
        f"CAST(sig[j * {rows_per_band} + {i + 1}] AS VARCHAR)"
        for i in range(rows_per_band)
    )


def minhash_band_candidates_sql(
    num_hashes: int = 24, rows_per_band: int = 2
) -> str:
    """DuckDB twin of :func:`minhash_band_candidates` — the candidate
    CTE of the banded oracle, exposed for l2n's recall audit."""
    n_bands = num_hashes // rows_per_band
    return f"""
WITH {minhash_signatures_sql(num_hashes)}, bands AS (
  SELECT doc, g.j AS band, {minhash_band_key_sql(rows_per_band)} AS key
  FROM sigs, (SELECT UNNEST(generate_series(0, {n_bands - 1})) AS j) g
)
SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
"""


def minhash_banded_oracle_sql(
    threshold: float = 0.5, num_hashes: int = 24, rows_per_band: int = 2
) -> str:
    """DuckDB identical-arithmetic twin of :func:`minhash_banded_pairs`
    — same md5 base hashes, same (a, b) literals, same banding, same
    exact-verify arithmetic, so the output (including any banding
    misses) matches value-for-value."""
    return f"""
WITH cand AS (
  SELECT * FROM ({minhash_band_candidates_sql(num_hashes, rows_per_band)})
), toks AS (
  SELECT doc_id AS doc, UNNEST(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), sizes AS (
  SELECT doc, COUNT(*) AS n_tokens FROM toks GROUP BY doc
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_shared
  FROM cand c
  JOIN toks a ON a.doc = c.doc_a
  JOIN toks b ON b.doc = c.doc_b AND b.token = a.token
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n_tokens + sb.n_tokens - n_shared) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_tokens + sb.n_tokens - n_shared) >= {threshold}
"""


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-gram shingles of a string column, as an
    array. Pure in-row array construction — whole-stage codegen, no
    Python. Callers must pre-filter ``length(text) >= n`` (Spark's
    ``sequence(1, 0)`` would count DOWN, not return empty)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (n - 1)),
            lambda i: F.substring(text, i, F.lit(n)),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact character-n-gram Jaccard near-duplicate pairs.

    Shingling on character n-grams (vs whitespace tokens in
    :func:`jaccard_pairs`) is order-sensitive: shared vocabulary in a
    different arrangement scores near zero, while true edits/rewrites
    of the same passage keep most of their shingles — the standard
    near-dup signal for web-scale corpora. Shape is the same
    inverted-index equi-join (shuffle on the shingle, never a cross
    join), with one extra scale lever: shingles are md5-hashed to
    60-bit ints BEFORE the shuffle, so the exchange moves 8-byte keys
    instead of n-char strings. The hash is portable (same md5 bytes,
    same hex-prefix parse in DuckDB), so the oracle replays it
    bit-for-bit. Exact-but-quadratic worst case, like jaccard_pairs:
    the 100 TB production path is MinHash-LSH banding; this is the
    n-gram ground truth it is recall-tested against."""
    docs = spread_fanout_input(docs, id_col)
    grams = docs.filter(F.length(F.col(text_col)) >= n).select(
        F.col(id_col).alias("doc"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hashed = grams.select("doc", _token_hash60(F.col("gram")).alias("h"))
    sizes = hashed.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = hashed.alias("a"), hashed.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "jaccard")
    )


NGRAM_JACCARD_ORACLE_SQL = """
WITH grams AS (
  SELECT doc_id AS doc,
         CAST(CONCAT('0x', SUBSTRING(md5(g.gram), 1, 15)) AS BIGINT) AS h
  FROM documents,
       UNNEST(list_distinct(list_transform(
         generate_series(1, length(text) - {nm1}),
         i -> substr(text, i, {n})))) AS g(gram)
  WHERE length(text) >= {n}
), sizes AS (
  SELECT doc, COUNT(*) AS n_grams FROM grams GROUP BY doc
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared
  FROM grams a JOIN grams b ON a.h = b.h AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n_grams + sb.n_grams - n_shared) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_grams + sb.n_grams - n_shared) >= {threshold}
"""


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-n-gram CONTAINMENT near-dup pairs: |A∩B| / min(|A|,|B|).

    The subset-detection complement of :func:`ngram_jaccard_pairs`:
    when a short document is embedded inside a much longer one (quote
    farms, boilerplate wrappers, concatenated crawls), Jaccard
    collapses toward |A|/|B| and misses the pair, while containment
    stays ~1. Same scale shape — in-row shingling, 60-bit hashed
    shingles, inverted-index equi-join, never a cross join; only the
    final scoring arithmetic differs (min() instead of union size),
    so the two measures share one candidate pass in a fused
    deployment. Exact-but-quadratic ground truth like its Jaccard
    twin; the LSH-banded path is the production route."""
    docs = spread_fanout_input(docs, id_col)
    grams = docs.filter(F.length(F.col(text_col)) >= n).select(
        F.col(id_col).alias("doc"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hashed = grams.select("doc", _token_hash60(F.col("gram")).alias("h"))
    sizes = hashed.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = hashed.alias("a"), hashed.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.col("n_shared").cast("double") / F.least("n_a", "n_b"),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_shared", "containment")
    )


NGRAM_CONTAINMENT_ORACLE_SQL = """
WITH grams AS (
  SELECT doc_id AS doc,
         CAST(CONCAT('0x', SUBSTRING(md5(g.gram), 1, 15)) AS BIGINT) AS h
  FROM documents,
       UNNEST(list_distinct(list_transform(
         generate_series(1, length(text) - {nm1}),
         i -> substr(text, i, {n})))) AS g(gram)
  WHERE length(text) >= {n}
), sizes AS (
  SELECT doc, COUNT(*) AS n_grams FROM grams GROUP BY doc
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared
  FROM grams a JOIN grams b ON a.h = b.h AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared AS DOUBLE) / LEAST(sa.n_grams, sb.n_grams) AS containment
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE CAST(n_shared AS DOUBLE) / LEAST(sa.n_grams, sb.n_grams) >= {threshold}
"""


def winnowed_span_stats(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-corpus duplicated-span statistics via
    winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003, the
    MOSS algorithm), the distributed stand-in for Lee et al. 2022's
    suffix-array ExactSubstr dedup; l2k is the catalog wrapper.

    Construction (all in-row, per document): md5 every k-token gram,
    then in each sliding window of w consecutive gram hashes keep the
    minimum — the winnowed fingerprint set. Selection is CONTENT-
    DEFINED: a gram's hash decides whether it is kept, so two
    documents sharing a token run select the same fingerprints from
    it regardless of where the run sits in each document (a fixed
    stride grid does not have this property — runs at different
    alignments mod stride would hash disjoint window sets and be
    missed). Winnowing theorem: any shared run of >= w+k-1 tokens
    shares at least one fingerprint, so both documents are flagged —
    a worst-case guarantee, not an expectation. A fingerprint is
    "duplicated" when it occurs in >= 2 DISTINCT documents, so a
    document's internal repetition (l4h's signal) does not count as
    corpus duplication.

    Output: ``(id, n_fingerprints, n_dup_fingerprints, dup_frac)``.

    Scale shape: fingerprinting is a pure map (array HOFs, ~2/(w+1)
    of gram positions survive); the dup-set aggregate and the join
    back are skew-free md5-keyed equi-shuffles with map-side combine;
    the per-doc rollup is one hash aggregate. No all-pairs, no suffix
    array — linear in corpus tokens, which is what runs at 100 TB.
    """
    n = F.size("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), i, k)).cast("binary")
        ),
    )
    t = docs.select(id_col, F.split(F.col(text_col), " ").alias("toks")).select(
        id_col, grams.alias("grams")
    )
    m = F.size("grams")
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(1))),
        lambda j: F.array_min(F.slice(F.col("grams"), j, w)),
    )
    fps = t.select(id_col, F.explode(F.array_distinct(mins)).alias("h"))
    dup = (
        fps.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        fps.join(dup, "h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup_fingerprints"),
        )
        .select(
            id_col,
            "n_fingerprints",
            "n_dup_fingerprints",
            (
                F.col("n_dup_fingerprints").cast("double") / F.col("n_fingerprints")
            ).alias("dup_frac"),
        )
    )


def winnowed_span_extents(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Duplicated-span EXTENTS — the actual removal artifact of Lee et
    al. 2022's ExactSubstr dedup: per document, the merged
    ``[span_start, span_end]`` token ranges (1-based, inclusive)
    covered by cross-corpus duplicated runs, ready for a cut-and-
    reassemble pass (l5f's chunk-strip machinery consumes exactly this
    shape). l2k reports per-doc *fractions*; this emits the offsets.

    Construction: winnowing as in :func:`winnowed_span_stats`, but
    each window keeps the POSITION of its minimal gram (first-index
    tie-break — ``array_position``/``list_position`` agree on first
    occurrence), so every selected fingerprint carries the token
    offset where its k-gram starts. A fingerprint duplicated across
    >= 2 distinct documents marks the k-token extent at each of its
    selected positions; per document, marked extents sorted by start
    merge when the next start is within k of the previous (equal
    extent lengths make the lag test exact — no running-max needed),
    and each merged group becomes one output span, clamped to the
    document's token count.

    Coverage contract (documented approximation vs the suffix-array
    original): inside any shared run of >= w+k-1 tokens, winnowing
    selects a fingerprint at least every w positions, and w < k
    chains those marks into ONE merged span — so every such run is
    reported as a single span covering it to within < w+k tokens of
    slack at the edges; runs shorter than w+k-1 may be missed (the
    same threshold l2k inherits from the winnowing theorem).

    Scale shape: selection is in-row (array HOFs); the dup aggregate
    and the mark join are md5-keyed skew-free shuffles; the merge
    window partitions by doc_id over MARKED positions only (bounded
    by the duplication volume, not corpus tokens). Linear, no suffix
    array, no all-pairs.

    Materialization (the semdedup/l5e4 discipline, r6 advisor
    finding): the selected-fingerprint relation feeds TWO consumers —
    the duplicated-fingerprint aggregate and the semi-join mark probe
    — so an unmaterialized run tokenizes and winnows the corpus
    twice. ``materialize=True`` (the default, and what the registered
    l2k2/l2k3 queries use) persists it (spill-safe MEMORY_AND_DISK)
    at exactly the point a production ExactSubstr pipeline writes its
    fingerprint table out between the select and dedup stages;
    ``materialize=False`` exposes the raw lineage for plan tests and
    tiny-input property tests. Same lifetime note as semdedup: no
    in-function release point (the return is lazy); callers that loop
    can release via session.release_caches(spark)."""
    from pyspark.sql import Window

    n = F.size("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), i, k)).cast("binary")
        ),
    )
    t = docs.select(
        id_col, F.split(F.col(text_col), " ").alias("toks")
    ).select(id_col, n.alias("n_toks"), grams.alias("grams"))
    m = F.size("grams")
    min_pos = F.transform(
        F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(1))),
        lambda j: (
            j.cast("bigint")
            - 1
            + F.array_position(
                F.slice(F.col("grams"), j, w),
                F.array_min(F.slice(F.col("grams"), j, w)),
            )
        ),
    )
    sel = t.select(
        id_col,
        "n_toks",
        "grams",
        F.explode(F.array_distinct(min_pos)).alias("pos"),
    ).select(
        id_col, "n_toks", "pos", F.element_at("grams", F.col("pos").cast("int")).alias("h")
    )
    if materialize:
        from pyspark.storagelevel import StorageLevel

        sel = sel.persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        sel.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    marked = sel.join(dup, "h", "semi").select(id_col, "n_toks", "pos")
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.lag("pos").over(wdoc).isNull()
        | (F.col("pos") > F.lag("pos").over(wdoc) + k),
        1,
    ).otherwise(0)
    grp = marked.select(id_col, "n_toks", "pos", brk.alias("brk")).select(
        id_col, "n_toks", "pos", F.sum("brk").over(wdoc).alias("grp")
    )
    span_end = F.least(F.max("pos") + (k - 1), F.max("n_toks"))
    return grp.groupBy(id_col, "grp").agg(
        F.min("pos").alias("span_start"),
        span_end.alias("span_end"),
        (span_end - F.min("pos") + 1).alias("span_tokens"),
    ).select(id_col, "span_start", "span_end", "span_tokens")


def winnowed_extents_oracle_sql(k: int = 8, w: int = 4) -> str:
    """DuckDB twin of :func:`winnowed_span_extents` — identical gram
    hashing, identical first-index argmin selection, identical merge
    rule and clamping."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id, LEN(toks) AS n_toks,
         list_transform(generate_series(1, GREATEST(LEN(toks) - {k - 1}, 1)),
                        i -> md5(array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS grams
  FROM t
), sel AS (
  SELECT DISTINCT doc_id, n_toks, u.pos, list_extract(grams, u.pos) AS h
  FROM (SELECT doc_id, n_toks, grams,
               list_transform(generate_series(1, GREATEST(LEN(grams) - {w - 1}, 1)),
                              j -> j - 1 + list_position(list_slice(grams, j, j + {w - 1}),
                                                         list_min(list_slice(grams, j, j + {w - 1})))) AS mins
        FROM g),
       UNNEST(mins) AS u(pos)
), dup AS (
  SELECT h FROM sel GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
  SELECT doc_id, n_toks, pos FROM sel WHERE h IN (SELECT h FROM dup)
), b AS (
  SELECT doc_id, n_toks, pos,
         CASE WHEN LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) + {k}
              THEN 1 ELSE 0 END AS brk
  FROM marked
), grps AS (
  SELECT doc_id, n_toks, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM b
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(LEAST(MAX(pos) + {k - 1}, MAX(n_toks)) AS BIGINT) AS span_end,
       CAST(LEAST(MAX(pos) + {k - 1}, MAX(n_toks)) - MIN(pos) + 1 AS BIGINT) AS span_tokens
FROM grps
GROUP BY doc_id, grp
"""


def winnowed_span_oracle_sql(k: int = 8, w: int = 4) -> str:
    """DuckDB twin of :func:`winnowed_span_stats` — identical gram
    hashing, identical window-min selection, identical dup rule."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id,
         list_transform(generate_series(1, GREATEST(LEN(toks) - {k - 1}, 1)),
                        i -> md5(array_to_string(list_slice(toks, i, i + {k - 1}), ' '))) AS grams
  FROM t
), fp AS (
  SELECT DISTINCT doc_id, u.h
  FROM (SELECT doc_id,
               list_transform(generate_series(1, GREATEST(LEN(grams) - {w - 1}, 1)),
                              j -> list_min(list_slice(grams, j, j + {w - 1}))) AS mins
        FROM g),
       UNNEST(mins) AS u(h)
), dup AS (
  SELECT h FROM fp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT fp.doc_id,
       COUNT(*) AS n_fingerprints,
       COUNT(*) FILTER (WHERE dup.h IS NOT NULL) AS n_dup_fingerprints,
       CAST(COUNT(*) FILTER (WHERE dup.h IS NOT NULL) AS DOUBLE)
         / COUNT(*) AS dup_frac
FROM fp LEFT JOIN dup ON fp.h = dup.h
GROUP BY 1
"""
