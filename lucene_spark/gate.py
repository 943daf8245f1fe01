"""Driver correctness-gate queries: Spark engine vs DuckDB oracle SQL.

Each entry pairs a Spark implementation (running through the real
index-build + decode pipeline wherever possible) with ANSI SQL that
DuckDB evaluates over the same parquet — the driver hash-compares rows.

The `documents` testdata text is plain ``[a-z0-9 ]``, so the
StandardAnalyzer chain degenerates to whitespace splitting on it and the
engine's inverted index is *exactly* reproducible by SQL `unnest(
regexp_split_to_array(...))` — letting us duel the whole distributed
dataflow (docID assignment, inversion, block codec round-trip, term
aggregation, top-k) against an independent engine.

BM25 duels use double-precision scores with exact doc lengths (from
docmap) so both engines compute the identical closed form; the
float32/byte4-quantized Lucene ranking path is validated separately
against the numpy oracle in tests/ (rank-identity contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark.index.builder import build_index
from lucene_spark.search.engine import IndexSearcher

K1, B = 1.2, 0.75
ROUND = 4

# fixed gate query terms (present across sf dirs per the generator vocab)
TERM_1 = "query"
TERMS_OR = ["table", "scan", "spark"]
TERMS_AND = ["value", "table"]
PREFIX = "val"
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


# --------------------------------------------------------------------------
# index cache per sf_dir
# --------------------------------------------------------------------------

_searchers: dict[str, IndexSearcher] = {}


def _index_dir_for(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join("/root/repo/.build/gate_idx", tag)


def _docs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table -> the engine's fixed input schema; sort key
    (repo,path,commit) == zero-padded doc_id so docID == doc_id rank."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.col("source").alias("repo"),
        F.format_string("%012d", F.col("doc_id")).alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def searcher_for(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    if sf_dir in _searchers:
        return _searchers[sf_dir]
    idx_dir = _index_dir_for(sf_dir)
    docs = _docs_df(spark, sf_dir)
    n = docs.count()
    manifest = os.path.join(idx_dir, "manifest.json")
    rebuild = True
    if os.path.exists(manifest):
        import json

        with open(manifest) as f:
            m = json.load(f)
        rebuild = m.get("doc_count") != n
    if rebuild:
        build_index(spark, docs, idx_dir, store_positions=True)
    s = IndexSearcher(spark, idx_dir)
    _searchers[sf_dir] = s
    return s


def _docid_map(s: IndexSearcher) -> DataFrame:
    """(docID, doc_id, dl) — path was the zero-padded doc_id."""
    return s.docmap.select(
        "docID", F.col("path").cast("long").alias("doc_id"), "dl", "norm"
    )


# --------------------------------------------------------------------------
# SQL fragments
# --------------------------------------------------------------------------

TOKENS_CTE = (
    "tok AS (SELECT doc_id, t AS term FROM (SELECT doc_id, unnest("
    "regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t FROM documents)"
    " WHERE t <> '')"
)
TF_CTE = "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term)"
DL_CTE = "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id)"


def byte4_sql(col: str) -> str:
    """SQL for SmallFloat.intToByte4 (integer-only, no float log)."""
    v = f"({col} - 24)"
    nb = (
        "(CASE "
        + " ".join(
            f"WHEN {v} >= {1 << k} THEN {k + 1}" for k in range(40, -1, -1)
        )
        + " ELSE 0 END)"
    )
    return (
        f"(CASE WHEN {col} < 24 THEN {col} "
        f"WHEN {nb} < 4 THEN 24 + {v} "
        f"ELSE 24 + ((({v} >> ({nb} - 4)) & 7) | (({nb} - 3) << 3)) END)"
    )


def _bm25_sql(terms: list[str], mode: str, k: int = 10) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    return f"""
WITH {TOKENS_CTE}, {TF_CTE}, {DL_CTE},
n AS (SELECT count(*)::BIGINT AS n FROM documents),
ad AS (SELECT sum(dl)::DOUBLE / (SELECT n FROM n) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN ({tlist}) GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ln(1 + ((SELECT n FROM n) - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / (SELECT avgdl FROM ad))) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id)
)
SELECT doc_id, round(sum(s), {ROUND}) AS score
FROM scored GROUP BY doc_id {having}
ORDER BY sum(s) DESC, doc_id ASC LIMIT {k}
"""


# --------------------------------------------------------------------------
# Spark-side BM25 in double precision from the index tables
# --------------------------------------------------------------------------

def _bm25_spark(spark: SparkSession, sf_dir: str, terms: list[str], mode: str, k: int = 10) -> DataFrame:
    s = searcher_for(spark, sf_dir)
    n = s.manifest["doc_count"]
    avgdl_exact = s.manifest["sum_total_term_freq"] / n
    tf = s.postings_tf(terms)
    stats = s.term_stats(terms)
    df_map = F.create_map(
        *[F.lit(x) for t in set(terms) if t in stats for x in (t, float(stats[t].df))]
    )
    dm = _docid_map(s)
    scored = (
        tf.join(F.broadcast(dm), "docID")
        .withColumn("dfv", df_map[F.col("term")])
        .withColumn(
            "s",
            F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("dfv") + 0.5) / (F.col("dfv") + 0.5))
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl_exact))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("s").alias("ssum"), F.count("*").alias("nm")
    )
    if mode == "and":
        agg = agg.filter(F.col("nm") == len(terms))
    return (
        agg.select("doc_id", F.round(F.col("ssum"), ROUND).alias("score"), F.col("ssum"))
        .orderBy(F.desc("ssum"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )


# --------------------------------------------------------------------------
# query registry
# --------------------------------------------------------------------------

def q_term_postings(spark, sf_dir):
    """Full inverted index decode: (doc_id, term, tf). Exercises docID
    assignment, analysis, inversion, and the block codec round-trip."""
    s = searcher_for(spark, sf_dir)
    dm = _docid_map(s)
    return (
        s.postings_tf()
        .join(F.broadcast(dm.select("docID", "doc_id")), "docID")
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"))
    )


def q_term_stats(spark, sf_dir):
    s = searcher_for(spark, sf_dir)
    return s.terms_table.select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )


def q_doc_norms(spark, sf_dir):
    s = searcher_for(spark, sf_dir)
    return _docid_map(s).select(
        "doc_id", F.col("dl").cast("long").alias("dl"), F.col("norm").cast("long").alias("norm")
    )


def q_collection_stats(spark, sf_dir):
    s = searcher_for(spark, sf_dir)
    m = s.manifest
    return spark.createDataFrame(
        [
            (
                m["doc_count"],
                m["sum_total_term_freq"],
                m["sum_doc_freq"],
                m["distinct_terms"],
            )
        ],
        "doc_count long, sum_total_term_freq long, sum_doc_freq long, distinct_terms long",
    )


def q_bm25_top10_term(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, [TERM_1], "or")


def q_bm25_top10_or(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, TERMS_OR, "or")


def q_bm25_top10_and(spark, sf_dir):
    return _bm25_spark(spark, sf_dir, TERMS_AND, "and")


def q_bool_and_docs(spark, sf_dir):
    """Conjunction (leapfrog analog): all doc_ids containing both terms."""
    s = searcher_for(spark, sf_dir)
    tf = s.postings_tf(TERMS_AND)
    dm = _docid_map(s)
    hits = (
        tf.groupBy("docID")
        .agg(F.count("*").alias("nm"))
        .filter(F.col("nm") == len(TERMS_AND))
        .join(F.broadcast(dm.select("docID", "doc_id")), "docID")
        .select("doc_id")
    )
    return hits


def q_count_term(spark, sf_dir):
    s = searcher_for(spark, sf_dir)
    return spark.createDataFrame([(s.count(TERM_1),)], "cnt long")


def q_prefix_df(spark, sf_dir):
    """Multi-term (prefix) query term expansion via the term dictionary."""
    s = searcher_for(spark, sf_dir)
    return s.terms_table.filter(F.col("term").startswith(PREFIX)).select(
        "term", F.col("df").cast("long").alias("df")
    )


def q_top_cf_terms(spark, sf_dir):
    s = searcher_for(spark, sf_dir)
    return (
        s.terms_table.orderBy(F.desc("cf"), F.asc("term"))
        .limit(20)
        .select("term", F.col("cf").cast("long").alias("cf"))
    )


def q_exact_dedup(spark, sf_dir):
    """Exact duplicate detection by content hash (training-data dedup)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_md5"))
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("cnt") > 1)
        .select("content_md5", F.col("cnt").cast("long").alias("cnt"), "keep_doc")
    )


def q_text_quality(spark, sf_dir):
    """Text-analysis scoring: token count, stopword ratio, quality score."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("t"),
    ).filter(F.col("t") != "")
    sw = [F.lit(w) for w in STOPWORDS]
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("t").isin(STOPWORDS), 1).otherwise(0)).alias("n_stop"),
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_stop") / F.col("n_tokens"), ROUND).alias("stop_ratio"),
        F.round(
            F.log(F.lit(1.0) + F.col("n_tokens"))
            * (F.lit(1.0) - F.col("n_stop") / F.col("n_tokens")),
            ROUND,
        ).alias("quality"),
    )


def q_cosine_top10(spark, sf_dir):
    """Brute-force cosine top-k over the embeddings table (ANN baseline)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qlit = F.array(*[F.lit(float(x)) for x in qrow])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda a: a.cast("double") * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qn = float(sum(float(x) * float(x) for x in qrow) ** 0.5)
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(dot / (nrm * F.lit(qn)), ROUND).alias("cos"),
            (dot / (nrm * F.lit(qn))).alias("raw"),
        )
        .orderBy(F.desc("raw"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cos")
    )


# ---- rows-only entries (non-SQL-expressible: float32 Lucene ranking) -----

def q_lucene_bm25_top10(spark, sf_dir):
    """The real Lucene-semantics path: float32 BM25 over byte4 norms with
    block-max pruning. Rank-identity is asserted against the numpy oracle
    in tests/test_e2e_spark.py; the driver records a rows-only check."""
    s = searcher_for(spark, sf_dir)
    dm = _docid_map(s)
    res = s.search(" ".join(TERMS_OR), k=10, mode="or", prune=True)
    return res.join(F.broadcast(dm.select("docID", "doc_id")), "docID").select(
        "doc_id", "score"
    )


def q_phrase_top10(spark, sf_dir):
    s = searcher_for(spark, sf_dir)
    dm = _docid_map(s)
    res = s.search_phrase(f"{TERMS_AND[0]} {TERMS_AND[1]}", k=10)
    return res.join(F.broadcast(dm.select("docID", "doc_id")), "docID").select(
        "doc_id", "score"
    )


QUERIES = {
    "term_postings": q_term_postings,
    "term_stats": q_term_stats,
    "doc_norms": q_doc_norms,
    "collection_stats": q_collection_stats,
    "bm25_top10_term": q_bm25_top10_term,
    "bm25_top10_or": q_bm25_top10_or,
    "bm25_top10_and": q_bm25_top10_and,
    "bool_and_docs": q_bool_and_docs,
    "count_term": q_count_term,
    "prefix_df": q_prefix_df,
    "top_cf_terms": q_top_cf_terms,
    "exact_dedup": q_exact_dedup,
    "text_quality": q_text_quality,
    "cosine_top10": q_cosine_top10,
    "lucene_bm25_top10": q_lucene_bm25_top10,
    "phrase_top10": q_phrase_top10,
}


def oracle_sql() -> dict[str, str]:
    tlist_and = ", ".join(f"'{t}'" for t in TERMS_AND)
    sqls = {
        "term_postings": f"WITH {TOKENS_CTE} SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term",
        "term_stats": f"WITH {TOKENS_CTE}, {TF_CTE} SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term",
        "doc_norms": f"WITH {TOKENS_CTE}, {DL_CTE} SELECT doc_id, dl, {byte4_sql('dl')}::BIGINT AS norm FROM dl",
        "collection_stats": f"""WITH {TOKENS_CTE}, {TF_CTE}
            SELECT (SELECT count(*)::BIGINT FROM documents) AS doc_count,
                   sum(tf)::BIGINT AS sum_total_term_freq,
                   count(*)::BIGINT AS sum_doc_freq,
                   count(DISTINCT term)::BIGINT AS distinct_terms FROM tf""",
        "bm25_top10_term": _bm25_sql([TERM_1], "or"),
        "bm25_top10_or": _bm25_sql(TERMS_OR, "or"),
        "bm25_top10_and": _bm25_sql(TERMS_AND, "and"),
        "bool_and_docs": f"""WITH {TOKENS_CTE}
            SELECT doc_id FROM tok WHERE term IN ({tlist_and})
            GROUP BY doc_id HAVING count(DISTINCT term) = {len(TERMS_AND)}""",
        "count_term": f"WITH {TOKENS_CTE} SELECT count(DISTINCT doc_id)::BIGINT AS cnt FROM tok WHERE term = '{TERM_1}'",
        "prefix_df": f"""WITH {TOKENS_CTE}, {TF_CTE}
            SELECT term, count(*)::BIGINT AS df FROM tf WHERE term LIKE '{PREFIX}%' GROUP BY term""",
        "top_cf_terms": f"""WITH {TOKENS_CTE}, {TF_CTE},
            cfs AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term)
            SELECT term, cf FROM cfs ORDER BY cf DESC, term ASC LIMIT 20""",
        "exact_dedup": """SELECT md5(text) AS content_md5, count(*)::BIGINT AS cnt,
            min(doc_id) AS keep_doc FROM documents GROUP BY md5(text) HAVING count(*) > 1""",
        "text_quality": f"""WITH {TOKENS_CTE},
            agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                    sum(CASE WHEN term IN ({', '.join(repr(w) for w in STOPWORDS)}) THEN 1 ELSE 0 END) AS n_stop
                    FROM tok GROUP BY doc_id)
            SELECT doc_id, n_tokens,
                   round(n_stop::DOUBLE / n_tokens, {ROUND}) AS stop_ratio,
                   round(ln(1.0 + n_tokens) * (1.0 - n_stop::DOUBLE / n_tokens), {ROUND}) AS quality
            FROM agg""",
        "cosine_top10": """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)::DOUBLE[]), 4) AS cos
            FROM embeddings WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)::DOUBLE[]) DESC, vec_id ASC
            LIMIT 10""",
    }
    return sqls
