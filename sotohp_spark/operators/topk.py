"""Exhaustive (non-WAND) BM25 as a pure DataFrame plan.

Used two ways:
- as the SQL-expressible flagship query over the `documents` testdata
  table (whitespace tokenization so a DuckDB oracle can replicate it
  exactly);
- as the correctness guard the WAND path is pytest-compared against.

Entirely JVM-side: split/explode/groupBy/join/window — no Python in
the plan, whole-stage codegen end to end.  The small per-term DF/IDF
side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simple_tokens(col):
    """Whitespace tokenizer (documents.text is space-separated); keeps
    empty-string filtering consistent with DuckDB's string_split."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def ensure_scan_parallelism(df):
    """Spread a narrow scan across the cluster before per-row-heavy
    work (tokenize/shingle explodes).  A small parquet input with one
    row group plans as 1-2 scan tasks, serializing everything above it
    on one core (guide §2.5: input skew from an unsplittable file —
    repartition right after the read).  SCALE-ADAPTIVE, not a local
    constant: when the scan already has at least half the cluster's
    default parallelism in splits — any real corpus — this is a no-op
    and no shuffle is added."""
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    p = df.sparkSession.sparkContext.defaultParallelism
    if n * 2 < p:
        return df.repartition(p)
    return df


def doc_term_tf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf) from whitespace tokens — explode + groupBy."""
    return (
        docs.select(id_col, F.explode(simple_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive BM25 over whitespace tokens; returns (doc_id, score).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); score summed over distinct
    query terms (qtf=1 — the oracle SQL does the same).

    Plan shape (r08): the old plan exploded EVERY token and shuffled
    the full (doc, term, tf) table just to derive per-doc lengths and
    collection stats.  dl == token count is a per-row array size (no
    shuffle), N/avgdl one tiny agg over it (exact: dl sums in long),
    and only QUERY-term tokens are exploded into the tf shuffle —
    carried with their doc's dl so no dl join remains (guide §2.3:
    shuffle fewer bytes / aggregate narrow; §2.4: drop the dl join).
    Per-(doc, term) tf and every float operand are value-identical to
    the old plan, so scores match the DuckDB oracle unchanged.
    """
    qt = sorted(set(query_terms))
    toks = ensure_scan_parallelism(docs.select(id_col, text_col)).select(
        id_col, simple_tokens(F.col(text_col)).alias("_toks")
    )
    dl_df = toks.select(
        id_col, F.size("_toks").alias("dl")
    ).where(F.col("dl") > 0)
    n_avg = dl_df.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )

    cand = (
        toks.select(
            id_col,
            F.size("_toks").alias("dl"),
            F.explode(
                F.filter(F.col("_toks"), lambda t: t.isin(qt))
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
    )
    df_t = cand.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    scored = (
        cand.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_avg))
        .withColumn(
            "idf", F.log1p((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    return scored


def bm25_topk(
    docs: DataFrame, query_terms: list, k: int = 10, **kw
) -> DataFrame:
    return (
        bm25_scores(docs, query_terms, **kw)
        .orderBy(F.col("score").desc(), F.col(kw.get("id_col", "doc_id")).asc())
        .limit(k)
    )


def bm25_oracle_sql(query_terms: list, k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB SQL equivalent of bm25_topk over the `documents` view."""
    qt = sorted(set(query_terms))
    terms_list = ", ".join(f"('{t}')" for t in qt)
    return f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, LATERAL (
    SELECT unnest(string_split(text, ' ')) AS term
  ) t
  WHERE t.term <> ''
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id
),
g AS (
  SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl
),
q(term) AS (VALUES {terms_list}),
dft AS (
  SELECT tf.term, count(DISTINCT tf.doc_id)::BIGINT AS df
  FROM tf JOIN q ON tf.term = q.term GROUP BY tf.term
),
scored AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (g.n - dft.df + 0.5) / (dft.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / g.avgdl))), 6) AS score
  FROM tf
  JOIN dft ON tf.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN g
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list,
    query_vec: list,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused with reciprocal-rank
    fusion (the ES 8 `rrf` retriever): BM25 top-k_each over the docs
    text and cosine top-k_each over the embeddings are each ranked
    (score desc, id asc — both arms' existing deterministic order),
    then fused as sum(1 / (rrf_k + rank)) over the arms a doc appears
    in; top-k of the fused score (desc, doc_id asc).

    Scale shape: each arm is its own full plan ending in
    TakeOrderedAndProject(k_each) — the fusion join and rank windows
    run over <= 2*k_each rows, so at 100 TB the cost IS the two arms
    (one corpus scan each, no shuffle beyond the k-row merges) and the
    fusion is free.  rrf_k=60 is the constant from the original RRF
    paper (Cormack et al.) and ES's default."""
    from pyspark.sql import Window

    from sotohp_spark.operators.ann import cosine_topk_bruteforce

    # rank windows run on k_each-row frames (post-limit) — the
    # single-partition WindowExec is over <= k_each rows by design
    lex = bm25_topk(docs, query_terms, k=k_each)
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex = lex.select(
        "doc_id", F.row_number().over(wl).alias("lex_rank")
    )
    sem = cosine_topk_bruteforce(embeddings, query_vec, k=k_each)
    ws = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    sem = sem.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(ws).alias("sem_rank"),
    )
    contrib = (
        F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("sem_rank")), F.lit(0.0))
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select("doc_id", F.round(contrib, 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def hybrid_rrf_oracle_sql(
    query_terms: list, query_vec: list, k: int = 10, k_each: int = 20,
    rrf_k: int = 60, k1: float = 1.2, b: float = 0.75,
) -> str:
    """DuckDB twin of hybrid_rrf over the `documents` + `embeddings`
    views (BM25 arm = bm25_oracle_sql's contract, cosine arm =
    cosine_topk_oracle_sql's, fused with the same rrf_k)."""
    qt = sorted(set(query_terms))
    terms_list = ", ".join(f"('{t}')" for t in qt)
    vec = "[" + ", ".join(f"{float(x)!r}" for x in query_vec) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, LATERAL (
    SELECT unnest(string_split(text, ' ')) AS term
  ) t
  WHERE t.term <> ''
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id
),
g AS (
  SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl
),
q(term) AS (VALUES {terms_list}),
dft AS (
  SELECT tf.term, count(DISTINCT tf.doc_id)::BIGINT AS df
  FROM tf JOIN q ON tf.term = q.term GROUP BY tf.term
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
  FROM (
    SELECT tf.doc_id AS doc_id,
           round(sum(ln(1 + (g.n - dft.df + 0.5) / (dft.df + 0.5))
               * tf.tf * ({k1} + 1.0)
               / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / g.avgdl))), 6)
             AS score
    FROM tf
    JOIN dft ON tf.term = dft.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN g
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id ASC
    LIMIT {k_each}
  )
),
sem AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS sem_rank
  FROM (
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], {vec}::DOUBLE[])
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product({vec}::DOUBLE[], {vec}::DOUBLE[]))), 6)
           AS cos_sim
    FROM embeddings
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT {k_each}
  )
)
SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       round(coalesce(1.0 / ({rrf_k} + lex_rank), 0.0)
             + coalesce(1.0 / ({rrf_k} + sem_rank), 0.0), 6) AS rrf_score
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""
