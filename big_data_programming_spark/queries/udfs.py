"""UDF / UDAF / UDTF surface UD1-UD7 (SURVEY.md §2.10, §7 M7).

These are the documented *escape hatches* — every one of them crosses
the executor-JVM → Python-worker boundary, which is the expensive
crossing in the whole engine (SURVEY.md §3.2). The rules encoded here:

* Row-at-a-time UDFs (UD1) exist for parity but are the slow path —
  each exemplar notes the built-in expression that replaces it.
* Everything else rides Arrow batches (pandas UDFs / applyInPandas /
  mapInPandas), amortizing the crossing to ~free per row.
* Python float arithmetic must stay order-independent to hash-match
  the oracle: per-row math only, or integer/exactly-representable
  sums — never accumulate doubles across an unordered batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from big_data_programming_spark.registry import register
from big_data_programming_spark.sources.loaders import load


@register(
    "ud1_row_udf",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'platinum'
            WHEN o_totalprice >= 150000 THEN 'gold'
            ELSE 'standard' END AS tier
FROM orders
""",
    tags=("UD1",),
)
def ud1_row_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (tier bucketing). Deliberately the
    worst implementation in the repo: one Python call per row. The
    same logic as a built-in expression is F.when(...)— shown in the
    oracle — and is what production code must use; this entry exists
    to cover the API surface and to let the bench quantify the gap."""

    @F.udf(returnType=StringType())
    def tier(total: float) -> str:
        if total >= 300000:
            return "platinum"
        if total >= 150000:
            return "gold"
        return "standard"

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier("o_totalprice").alias("tier"))


@register(
    "ud2_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS discounted,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
FROM lineitem
""",
    tags=("UD2",),
)
def ud2_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: vectorized revenue math over Arrow batches.
    Per-row double arithmetic is bit-identical to the JVM/DuckDB
    expression, so this hash-matches with no canon needed."""

    @F.pandas_udf(DoubleType())
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    @F.pandas_udf(DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@register(
    "ud3_iterator_pandas",
    oracle="""
SELECT doc_id,
       CAST(n_chars AS DOUBLE) / 5000.0 AS rel_length,
       LEAST(CAST(n_chars AS DOUBLE) / 5000.0, 1.0) AS clipped
FROM documents
""",
    tags=("UD3",),
)
def ud3_iterator_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF: the per-batch loop makes one-time
    setup (model load, dictionary mmap) amortizable across a whole
    partition — here the 'model' is just a normalization constant, the
    point is the shape."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def rel_length(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        norm = 5000.0  # stand-in for expensive per-worker init
        for s in batches:
            yield s.astype("float64") / norm

    d = load(spark, sf_dir, "documents")
    out = d.select("doc_id", rel_length("n_chars").alias("rel_length"))
    return out.withColumn("clipped", F.least(F.col("rel_length"), F.lit(1.0)))


@register(
    "ud4_grouped_map",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       CASE WHEN MAX(o_totalprice) OVER w = MIN(o_totalprice) OVER w THEN 0.0
            ELSE ROUND((o_totalprice - MIN(o_totalprice) OVER w)
                       / (MAX(o_totalprice) OVER w - MIN(o_totalprice) OVER w), 6)
       END AS price_minmax
FROM orders
WINDOW w AS (PARTITION BY o_custkey)
""",
    tags=("UD4",),
)
def ud4_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer min-max normalization of
    order totals. Min/max are order-independent (unlike mean/std), so
    the Python result is bit-identical to the SQL window formulation in
    the oracle — which is also the implementation to prefer when the
    per-group logic IS expressible as window algebra; applyInPandas
    earns its shuffle only for genuinely imperative per-group code."""

    def minmax(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        rng = hi - lo
        if rng > 0:
            norm = (pdf["o_totalprice"] - lo) / rng
        else:
            norm = pd.Series(0.0, index=pdf.index)
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "o_totalprice": pdf["o_totalprice"],
                "price_minmax": (norm).round(6),
            }
        )

    # Project BEFORE the grouped map (r12, guide §4.1): applyInPandas is
    # opaque to column pruning — without the select, all six orders
    # columns (incl. o_orderstatus/o_orderdate/o_orderpriority strings)
    # are read from parquet, shuffled by o_custkey, and shipped through
    # the Arrow boundary; the function touches three.
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return o.groupBy("o_custkey").applyInPandas(
        minmax,
        schema="o_custkey long, o_orderkey long, o_totalprice double, price_minmax double",
    )


@register(
    "ud5_grouped_agg",
    oracle="""
SELECT lang,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars_udaf
FROM documents
GROUP BY lang
""",
    tags=("UD5",),
)
def ud5_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (custom UDAF): mean document length per
    language. The sum runs over int64 — exact, order-free — and the
    single final division matches the oracle bit-for-bit. Usable in
    both .agg() and Window.over(); registered here through .agg()."""

    @F.pandas_udf(DoubleType())
    def avg_chars(n: pd.Series) -> float:
        return float(n.sum()) / len(n)

    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(avg_chars("n_chars").alias("avg_chars_udaf"))


@register(
    "ud6_map_in_pandas",
    oracle="""
SELECT event_id, user_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents
FROM events
""",
    tags=("UD6", "F6"),
)
def ud6_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: whole-partition transform with a different output
    schema — JSON props parsed in Python (json module) batch by batch.
    The built-in F.get_json_object does this JVM-side and is preferred;
    this demonstrates the arbitrary-reshape escape hatch used when the
    parse genuinely needs Python (custom binary formats, tokenizers)."""
    import json

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "k": [json.loads(p).get("k") for p in pdf["props"]],
                    "value_cents": (pdf["value"] * 100 + 0.5).astype("int64"),
                }
            )

    # Project BEFORE the opaque map (r12, guide §4.1): mapInPandas ships
    # every column of its input — without the select, ts and event_type
    # are read from parquet and cross the Arrow boundary unused.
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value", "props")
    return e.mapInPandas(
        parse, schema="event_id long, user_id long, k long, value_cents long"
    )


@register(
    "ud7_python_udtf",
    oracle="""
SELECT doc_id, t.token, CAST(t.pos AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS token,
         UNNEST(generate_series(1, LEN(string_split(text, ' ')))) AS pos
  FROM documents
) AS t(doc_id, token, pos)
WHERE doc_id < 100
""",
    tags=("UD7", "F4"),
)
def ud7_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): text → (token, position)
    rows via a lateral join. The SQL-expressible twin is
    posexplode(split(...)) — shown in the oracle as UNNEST — which is
    the production path; the UDTF form is for tokenizers that need
    real Python (BPE, sentencepiece)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: long")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    spark.udtf.register("bdps_tokenize", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("bdps_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM bdps_udtf_docs d, LATERAL bdps_tokenize(d.text) t
        WHERE d.doc_id < 100
        """
    )


@register(
    "ud8_cogroup",
    oracle="""
SELECT COALESCE(o.k, e.k) AS id,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.order_cents, 0) AS order_cents,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.value_cents, 0) AS value_cents
FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS order_cents
      FROM orders GROUP BY 1) o
FULL JOIN
     (SELECT user_id AS k, COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1) e
  ON o.k = e.k
""",
    tags=("UD8", "UD4", "J2b"),
)
def ud8_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: align each key's order rows AND event
    rows in one Python function — the two-sided escape hatch (custom
    per-entity reconciliation, feature joins pandas can express but
    SQL can't). Both sides shuffle once on the key, then Arrow ships
    each (key, left-frame, right-frame) pair to Python. Money is
    summed in integer cents so the result is order-independent and the
    plain full-outer-join SQL is an exact oracle."""

    def reconcile(key: tuple, orders: pd.DataFrame, events: pd.DataFrame) -> pd.DataFrame:
        def cents(s: pd.Series) -> int:
            return int((s * 100 + 0.5).astype("int64").sum()) if len(s) else 0

        return pd.DataFrame(
            {
                "id": [key[0]],
                "n_orders": [len(orders)],
                "order_cents": [cents(orders["o_totalprice"]) if len(orders) else 0],
                "n_events": [len(events)],
                "value_cents": [cents(events["value"]) if len(events) else 0],
            }
        )

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    e = load(spark, sf_dir, "events").select("user_id", "value")
    return (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            schema=(
                "id long, n_orders long, order_cents long, "
                "n_events long, value_cents long"
            ),
        )
    )


@register(
    "ud9_map_in_arrow",
    oracle="""
SELECT s_suppkey,
       CAST(OCTET_LENGTH(encode(s_name)) AS BIGINT) AS name_bytes,
       CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
FROM supplier
""",
    tags=("UD9", "UD6"),
)
def ud9_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python boundary — raw
    pyarrow.RecordBatch in, RecordBatch out, no pandas conversion on
    either side. The right seam for libraries that speak Arrow
    natively (tokenizers, polars, duckdb-in-executor). Arithmetic is
    integer-only so the result is exactly the SQL twin."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def arrow_features(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            name_bytes = pc.binary_length(pc.cast(b.column("s_name"), pa.binary()))
            cents = pc.cast(
                pc.floor(
                    pc.add(pc.multiply(b.column("s_acctbal"), pa.scalar(100.0)), pa.scalar(0.5))
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("s_suppkey"), pc.cast(name_bytes, pa.int64()), cents],
                names=["s_suppkey", "name_bytes", "acctbal_cents"],
            )

    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return s.mapInArrow(
        arrow_features, schema="s_suppkey long, name_bytes long, acctbal_cents long"
    )


@register(
    "ud10_arrow_python_udf",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'platinum'
            WHEN o_totalprice >= 150000 THEN 'gold'
            ELSE 'standard' END AS tier,
       LENGTH(o_orderpriority) + o_orderkey % 7 AS mix
FROM orders
""",
    tags=("UD1", "UD2"),
)
def ud10_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Arrow-optimized Python UDF (`useArrow=True`): same
    per-ROW programming model as ud1, but serialization crosses the
    JVM↔Python boundary in Arrow record batches instead of pickled
    rows — the drop-in upgrade when row logic can't be vectorized but
    the pickle tax is the bottleneck. Sits between ud1 (row + pickle)
    and ud2 (pandas-vectorized) on the measured slow-path ladder;
    output is logic-identical to ud1's tier oracle plus a second
    column proving multi-arg scalar support. Still a Python crossing:
    the built-in CASE WHEN remains the production answer."""

    @F.udf(returnType=StringType(), useArrow=True)
    def tier(total: float) -> str:
        if total >= 300000:
            return "platinum"
        if total >= 150000:
            return "gold"
        return "standard"

    @F.udf(returnType=LongType(), useArrow=True)
    def mix(prio: str, key: int) -> int:
        return len(prio) + key % 7

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        tier("o_totalprice").alias("tier"),
        mix("o_orderpriority", "o_orderkey").alias("mix"),
    )


@register(
    "ud11_polymorphic_udtf",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         GREATEST(1, LEN(string_split(text, ' ')) // 3) AS per
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       array_to_string(list_slice(toks, 1, per), ' ') AS piece_0,
       array_to_string(list_slice(toks, per + 1, 2 * per), ' ') AS piece_1,
       array_to_string(list_slice(toks, 2 * per + 1, LEN(toks)), ' ') AS piece_2
FROM t
""",
    tags=("UD7", "F1"),
)
def ud11_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is computed
    at ANALYSIS time from the literal argument (`analyze()` returns
    an AnalyzeResult with n_pieces columns) — the table function
    equivalent of generics, which fixed-schema ud7 cannot express.
    Splitting each doc into 3 near-equal token spans is the
    shard-for-context-window shape; called per-row via LATERAL
    correlation. Scale posture matches every UDTF: a Python crossing
    per row, so it belongs at the edge of a pipeline, not in the hot
    path; the win here is API coverage with an arithmetic the oracle
    replays exactly (per = max(1, n_tokens // 3), last piece takes
    the remainder)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"piece_{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            per = max(1, len(toks) // n)
            out = []
            for i in range(n):
                hi = (i + 1) * per if i < n - 1 else len(toks)
                out.append(" ".join(toks[i * per : hi]))
            yield tuple(out)

    spark.udtf.register("bdps_split_fixed", SplitFixed)
    from big_data_programming_spark.sources.loaders import register_views

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, s.piece_0, s.piece_1, s.piece_2
        FROM documents d, LATERAL bdps_split_fixed(d.text, 3) s
        WHERE d.doc_id < 100
        """
    )
