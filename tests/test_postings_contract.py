"""Postings format contract (BasePostingsFormatTestCase /
RandomPostingsTester analog, lucene/test-framework/.../index/
BasePostingsFormatTestCase.java:121-1773): random posting lists pushed
through the ACTUAL builder kernels — run flush encode, run merge,
256-block encode — must decode back exactly, including ghosts
(empty), singletons, dense/sparse docIDs, big tfs, and multi-run
merges with disjoint doc ranges. Pure kernels, no Spark session."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from lucene_spark.index.builder import BLOCK_SIZE, _merge_runs_to_blocks
from lucene_spark.util.blockcodec import decode_block as decode
from lucene_spark.util.blockcodec import encode_block as encode
from lucene_spark.util.varbyte import (
    delta_decode,
    delta_encode,
    segmented_delta_decode,
    segmented_delta_encode,
)


def _make_run(doc_ids, tfs, norms, positions_flat):
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    nb = np.asarray(norms, dtype=np.uint8)
    p = np.asarray(positions_flat, dtype=np.int64)
    return {
        "term": "t",
        "first_doc": int(d[0]),
        "docs_vb": encode(delta_encode(d)),
        "tfs_vb": encode(t),
        "norms_b": nb.tobytes(),
        "pos_vb": encode(segmented_delta_encode(p, t)),
    }


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=50),      # docID gap
        st.integers(min_value=1, max_value=300),     # tf
        st.integers(min_value=0, max_value=255),     # norm byte
    ),
    min_size=1,
    max_size=700,
)


@given(posting_lists, st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_run_merge_block_roundtrip(entries, n_runs):
    rng = np.random.RandomState(7)
    gaps = np.array([e[0] for e in entries], dtype=np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = np.array([e[1] for e in entries], dtype=np.int64)
    norms = np.array([e[2] for e in entries], dtype=np.uint8)
    # positions: per doc, sorted increasing, tf of them
    pos_flat = np.concatenate(
        [np.cumsum(rng.randint(1, 9, size=int(f))) for f in tfs]
    )

    # split into n_runs contiguous chunks (disjoint ascending doc ranges,
    # exactly what per-range flushes produce)
    cuts = sorted(rng.choice(np.arange(1, len(doc_ids)), size=min(n_runs - 1, len(doc_ids) - 1), replace=False)) if len(doc_ids) > 1 and n_runs > 1 else []
    bounds = [0, *cuts, len(doc_ids)]
    pos_ends = np.cumsum(tfs)
    runs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        p0 = pos_ends[a - 1] if a else 0
        runs.append(
            _make_run(doc_ids[a:b], tfs[a:b], norms[a:b], pos_flat[p0:pos_ends[b - 1]])
        )
    pdf = pd.DataFrame(runs).sample(frac=1.0, random_state=3)  # shuffle row order

    blocks = _merge_runs_to_blocks(("t", 0), pdf)

    # decode all blocks back, in block_seq order
    got_d, got_t, got_n, got_p = [], [], [], []
    for r in blocks.sort_values("block_seq").itertuples():
        d = delta_decode(decode(r.docs_vb))
        t = decode(r.tfs_vb)
        assert d.size == r.ndocs <= BLOCK_SIZE
        assert d[0] == r.min_doc and d[-1] == r.max_doc
        assert t.max() == r.max_tf
        nb = np.frombuffer(r.norms_b, dtype=np.uint8)
        assert nb.min() == r.min_norm
        got_d.append(d)
        got_t.append(t)
        got_n.append(nb)
        got_p.append(segmented_delta_decode(decode(r.pos_vb), t))
    assert (np.concatenate(got_d) == doc_ids).all()
    assert (np.concatenate(got_t) == tfs).all()
    assert (np.concatenate(got_n) == norms).all()
    assert (np.concatenate(got_p) == pos_flat).all()


def test_singleton_and_ghost_runs():
    # singleton posting
    run = _make_run([5], [1], [7], [3])
    blocks = _merge_runs_to_blocks(("t", 0), pd.DataFrame([run]))
    assert len(blocks) == 1 and blocks.iloc[0]["ndocs"] == 1
    assert delta_decode(decode(blocks.iloc[0]["docs_vb"])).tolist() == [5]
    # huge docID (10^12-file scale)
    big = 10**12 + 17
    run2 = _make_run([big], [2], [0], [1, 4])
    b2 = _merge_runs_to_blocks(("t", 0), pd.DataFrame([run2]))
    assert b2.iloc[0]["min_doc"] == big == b2.iloc[0]["max_doc"]
