"""Hypothesis property test: the Spark context-window chunker agrees
with an independent pure-Python reference implementation for ANY token
count — including the degenerate shapes the parquet corpus never
exercises (1-token docs, exact window multiples, window-1/window+1
boundaries)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from greenplum_dwh_spark.operators.curation import (CHUNK_STRIDE,
                                                    CHUNK_WINDOW,
                                                    chunk_docs)


def _ref_chunks(doc_id: int, toks: list[str]):
    """Reference model: slide a CHUNK_WINDOW window by CHUNK_STRIDE
    until the window reaches the end; always at least one chunk."""
    w, s = CHUNK_WINDOW, CHUNK_STRIDE
    n = len(toks)
    out = []
    cid = 0
    while True:
        start = cid * s + 1
        end = min(cid * s + w, n)
        text = " ".join(toks[start - 1:end])
        out.append((doc_id, cid, start, end,
                    hashlib.md5(text.encode()).hexdigest()))
        if end >= n:
            break
        cid += 1
    return out


@given(st.lists(st.integers(min_value=1, max_value=3 * CHUNK_WINDOW + 7),
                min_size=1, max_size=12))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_chunker_matches_reference_model(spark, token_counts):
    docs = [(i, " ".join(f"w{i}x{j}" for j in range(n)))
            for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted((r.doc_id, r.chunk_id, r.tok_start, r.tok_end,
                  r.chunk_md5)
                 for r in chunk_docs(df).collect())
    want = sorted(c for i, n in enumerate(token_counts)
                  for c in _ref_chunks(
                      i, [f"w{i}x{j}" for j in range(n)]))
    assert got == want
