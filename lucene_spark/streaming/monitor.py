"""Monitor / percolator: the inverted search problem.

Reference: lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:42
— REGISTER queries, STREAM documents, emit (query, doc) matches. Lucene
builds an ephemeral single-doc index per batch and runs every candidate
query against it, with a "presearcher" index over the queries to prune
candidates.

The Spark-first shape is a broadcast join, which subsumes both halves:
the registered queries' terms ARE the presearcher index (a small
DataFrame, broadcast to every executor), each incoming batch is
tokenized once with the SAME analyzer as the main index, and a
(term-join -> groupBy(query, doc) -> count distinct matched terms)
implements the boolean matrix for every query simultaneously:

    matched_terms == n_terms      -> AND query matched
    matched_terms >= msm          -> minimumShouldMatch
    matched_terms >= 1            -> OR query matched

Per batch this is one narrow tokenize pass + one broadcast hash join +
one aggregation — no shuffle of the corpus, O(matches) output. At 100
TB/day the registered-query side stays driver-small (thousands of
alerts) while the document side streams through unmodified.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_TOK_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("term", StringType()),
    ]
)


def _distinct_terms(docs: DataFrame, token_filters: tuple[str, ...] = ()) -> DataFrame:
    """(repo, path, term) — DISTINCT analyzed terms per document, via the
    same vectorized window tokenizer the index builder uses."""
    from lucene_spark.analysis.porter import chain_can_drop
    from lucene_spark.index.builder import _window_codes

    def tok(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, uniq, dls = _window_codes(
                pdf["content"].tolist(), token_filters=tuple(token_filters)
            )[:3]
            if len(codes) == 0:
                continue
            uniq_arr = np.asarray(uniq, dtype=object)
            doc_idx = np.repeat(np.arange(len(pdf)), dls)
            if chain_can_drop(token_filters):
                # dropping filters leave -1 codes in the stream; no
                # positions here, so just drop them before keying
                keep = codes >= 0
                codes, doc_idx = codes[keep], doc_idx[keep]
                if len(codes) == 0:
                    continue
            # distinct (doc, code) pairs without materializing strings
            key = doc_idx.astype(np.int64) * (len(uniq_arr) + 1) + codes
            uk = np.unique(key)
            d, c = uk // (len(uniq_arr) + 1), uk % (len(uniq_arr) + 1)
            yield pd.DataFrame(
                {
                    "repo": pdf["repo"].to_numpy()[d],
                    "path": pdf["path"].to_numpy()[d],
                    "term": uniq_arr[c],
                }
            )

    return docs.select("repo", "path", "content").mapInPandas(
        tok, schema=_TOK_SCHEMA
    )


class Monitor:
    """Registered-query store + batch matcher.

    queries: list of (query_id, terms, mode) where mode is 'or', 'and',
    or 'msmN' (at least N of the terms). Terms pass through the given
    analyzer filter chain once at registration, mirroring how the main
    index analyzes documents."""

    def __init__(
        self,
        spark: SparkSession,
        queries: list[tuple[str, list[str], str]],
        token_filters: tuple[str, ...] = (),
    ):
        from lucene_spark.analysis import analyze

        self.spark = spark
        self.token_filters = tuple(token_filters)
        fns = []
        sh_n = None
        if self.token_filters:
            from lucene_spark.analysis.porter import (
                resolve_filter,
                split_chain,
            )

            vocab_chain, sh_n = split_chain(self.token_filters)
            fns = [resolve_filter(n) for n in vocab_chain]
        rows = []
        self._need: dict[str, int] = {}
        for qid, terms, mode in queries:
            toks: list[str] = []
            for t in terms:
                toks.extend(analyze(t))
            for fn in fns:
                toks = [fn(t) if t is not None else None for t in toks]
            # dropping filters (stop/length) remove the clause, like the
            # query-side analyzer in IndexSearcher._parse
            toks = [t for t in toks if t]
            if sh_n is not None:
                # a shingle-field monitor matches on grams (each query's
                # token stream shingles like the document side)
                from lucene_spark.analysis.porter import shingle_tokens

                toks = shingle_tokens(toks, sh_n)
            toks = list(dict.fromkeys(toks))
            if mode == "and":
                need = len(toks)
            elif mode.startswith("msm"):
                need = int(mode[3:])
            else:
                need = 1
            self._need[qid] = need
            rows.extend((qid, t) for t in toks)
        self._qterms = spark.createDataFrame(
            rows, "query_id string, term string"
        )
        self._needs = spark.createDataFrame(
            list(self._need.items()), "query_id string, need long"
        )

    def match_batch(self, docs: DataFrame) -> DataFrame:
        """(query_id, repo, path) for every registered query matching a
        document of the batch. One tokenize pass, one broadcast join."""
        toks = _distinct_terms(docs, self.token_filters)
        hits = (
            toks.join(F.broadcast(self._qterms), "term")
            .groupBy("query_id", "repo", "path")
            .agg(F.count("*").alias("nmatch"))
            .join(F.broadcast(self._needs), "query_id")
            .where(F.col("nmatch") >= F.col("need"))
            .select("query_id", "repo", "path")
        )
        return hits

    def run_stream(self, stream_df: DataFrame, sink_fn, **write_opts):
        """Structured-Streaming entry: foreachBatch(match_batch -> sink).
        sink_fn(matches_df, batch_id) persists/forwards the alerts."""

        def _per_batch(batch_df: DataFrame, batch_id: int) -> None:
            sink_fn(self.match_batch(batch_df), batch_id)

        return (
            stream_df.writeStream.foreachBatch(_per_batch)
            .options(**write_opts)
            .start()
        )
