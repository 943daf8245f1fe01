"""End-to-end codec interchangeability: an index built with
SPARK_GRAFT_CODEC=groupvint (in a subprocess, because the codec choice
must reach the Spark python workers' environment at session start)
returns bit-identical search results to the default vbyte index, and
the vbyte-default process can open and search the groupvint index
directly (decode dispatches on the per-payload tag, never the env)."""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, sys
sys.path.insert(0, {repo!r})
from lucene_spark.session import get_spark
from lucene_spark.corpus import corpus_spark_df
from lucene_spark.index.builder import build_index
from lucene_spark.search.engine import IndexSearcher

spark = get_spark(cpus=4)
spark.sparkContext.setLogLevel("ERROR")
docs = corpus_spark_df(spark, 200, partitions=4)
m = build_index(spark, docs, {out!r}, partitions=4)
s = IndexSearcher(spark, {out!r})
hits = [tuple(r) for r in s.search("table", k=10).collect()]
print("RESULT " + json.dumps({{"codec": m["codec"], "hits": hits}}))
"""


def test_groupvint_index_matches_vbyte_and_is_cross_readable(
    spark, built_index, tmp_path
):
    from lucene_spark.corpus import corpus_spark_df
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    out = str(tmp_path / "gv_index")
    env = dict(os.environ, SPARK_GRAFT_CODEC="groupvint")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=_REPO, out=out)],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    child = json.loads(line[len("RESULT "):])
    assert child["codec"] == "groupvint-v1"

    # same corpus through the default-codec session: identical ranking
    # AND identical float32 scores (the codec must be score-invisible)
    vb_out = str(tmp_path / "vb_index")
    docs = corpus_spark_df(spark, 200, partitions=4)
    m = build_index(spark, docs, vb_out, partitions=4)
    assert m["codec"] == "vbyte-v1"
    vb_hits = [
        list(r)
        for r in IndexSearcher(spark, vb_out).search("table", k=10).collect()
    ]
    assert [list(h) for h in child["hits"]] == vb_hits

    # cross-readability: this (vbyte-default) process opens the
    # groupvint index and reproduces the same hits
    gv_reader = IndexSearcher(spark, out)
    assert [
        list(r) for r in gv_reader.search("table", k=10).collect()
    ] == vb_hits
