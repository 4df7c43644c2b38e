"""Text-pipeline operator tests: chunking semantics (coverage/overlap/short
docs) and PII scrubbing."""

from __future__ import annotations

import pytest

from stac_catalog_builder_spark.operators.textops import chunk_documents, clean_text


def test_chunk_documents_semantics(spark):
    doc = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=40, overlap=10).orderBy("chunk_idx").collect()
    # step=30, n=100 -> ceil(90/30)=3 chunks
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    c0, c1, c2 = (r.chunk_text.split(" ") for r in rows)
    assert c0[0] == "t0" and c1[0] == "t30" and c2[0] == "t60"
    assert c0[-10:] == c1[:10]  # overlap preserved
    assert rows[2].n_chunk_tokens == 40
    covered = set().union(c0, c1, c2)
    assert len(covered) == 100  # every token lands in some chunk


def test_chunk_documents_short_doc_and_validation(spark):
    short = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    rows = chunk_documents(short, chunk_tokens=40, overlap=10).collect()
    assert len(rows) == 1 and rows[0].n_chunk_tokens == 3 and rows[0].chunk_idx == 0
    with pytest.raises(ValueError):
        chunk_documents(short, chunk_tokens=10, overlap=10)


def test_clean_text_masks_and_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "  hello   a.b-c_d@ex-ample.co.uk world https://x.io/p?q=1 end  ")],
        "doc_id long, text string",
    )
    r = clean_text(df).collect()[0]
    assert r.clean_text == "hello <EMAIL> world <URL> end"
    assert r.n_chars_clean == len(r.clean_text)


def test_decontaminate_ngram_overlap(spark):
    """Docs sharing a 5-gram with the benchmark are dropped and reported;
    clean docs survive untouched; short docs (< n tokens) never match;
    n-gram boundary semantics are exact (4-token overlap does NOT trip a
    5-gram rule)."""
    from stac_catalog_builder_spark.operators.textops import decontaminate

    bench = spark.createDataFrame(
        [("what is the capital of france",), ("the quick brown fox jumps",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "trivia time what is the capital of france everyone knows"),
            (2, "an innocent document about gardens and rivers flowing south"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "quick brown fox jumps"),  # only 4 shared tokens < n
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    clean, report = decontaminate(docs, bench, n=5)
    kept = {r.doc_id for r in clean.collect()}
    hits = {r.doc_id: r.n_hits for r in report.collect()}
    assert kept == {2, 4, 5}
    assert set(hits) == {1, 3}
    assert hits[1] >= 2  # sliding 6-token phrase -> two 5-gram hits
    assert hits[3] == 1
    # clean docs keep their full schema/rows
    assert clean.columns == docs.columns

    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 1"):
        decontaminate(docs, bench, n=0)


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The fact side must never shuffle against the BENCHMARK grams: the
    overlap join carries an explicit broadcast hint (bench suites are
    dimension-sized by construction). The clean-set anti-join is deliberately
    NOT hinted (contaminated-doc count is data-dependent and unbounded —
    ADVICE r4), so AQE picks its strategy; at this size the finalized
    adaptive plan still broadcasts it."""
    from stac_catalog_builder_spark.operators.textops import decontaminate

    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 5).select("text")
    clean, report = decontaminate(docs, bench, n=8)
    # the semi side (report lineage) must be broadcast by construction
    rplan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in rplan and "SortMergeJoin" not in rplan
    # contaminated: the benchmark docs themselves (identical text)
    assert {r.doc_id for r in report.collect()} >= {0, 1, 2, 3, 4}
    rows = clean.collect()  # finalize clean's own adaptive plan
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert len(rows) + report.count() == docs.count()


# --- inverted_postings -------------------------------------------------------


def test_inverted_postings_counter_twin(spark):
    """tf/df must equal a python Counter over the same whitespace
    tokenization; pruning bounds df on every surviving row."""
    from collections import Counter, defaultdict

    from stac_catalog_builder_spark.operators.textops import inverted_postings

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat cat cat"),
        (4, ""),  # empty doc contributes nothing
        (5, "unique_term"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = inverted_postings(df, min_df=1).collect()
    tf_want: dict = defaultdict(Counter)
    for d, text in rows:
        for t in text.split(" "):
            if t:
                tf_want[t][d] += 1
    got = {(r.term, r.doc_id): (r.tf, r.df) for r in out}
    assert set(got) == {(t, d) for t, c in tf_want.items() for d in c}
    for (t, d), (tf, dfreq) in got.items():
        assert tf == tf_want[t][d]
        assert dfreq == len(tf_want[t])
    # min_df prunes hapax terms entirely; max_df prunes stopword-like ones
    pruned = inverted_postings(df, min_df=2).collect()
    assert {r.term for r in pruned} == {
        t for t, c in tf_want.items() if len(c) >= 2
    }
    capped = inverted_postings(df, min_df=1, max_df=1).collect()
    assert {r.term for r in capped} == {
        t for t, c in tf_want.items() if len(c) == 1
    }  # "the"/"cat"/"sat" (df=2) are capped out; hapax terms survive
    import pytest as _pytest

    with _pytest.raises(ValueError):
        inverted_postings(df, min_df=0)
    with _pytest.raises(ValueError):
        inverted_postings(df, min_df=5, max_df=4)


def test_inverted_postings_df_join_is_broadcast(spark):
    """The df attach must be a broadcast join (the term table is
    dimension-sized after pruning); the fact-side postings never shuffle
    for it."""
    from stac_catalog_builder_spark.operators.textops import inverted_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        inverted_postings(docs, min_df=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


# --- bm25_topk ---------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    """Scores must match a from-scratch python BM25 (same Okapi-with-floor
    formulation) to 1e-6, with the same top-k ordering."""
    import math
    from collections import Counter

    from stac_catalog_builder_spark.operators.textops import bm25_topk

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick quick fox"),
        (3, "the lazy dog sleeps"),
        (4, "brown bears eat fish"),
        (5, "fox fox fox fox"),
        (6, "completely unrelated text about spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    query = ["quick", "fox"]
    k1, b = 1.2, 0.75

    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = Counter()
    for t in toks.values():
        dfreq.update(set(t))
    want = {}
    for d, t in toks.items():
        tf = Counter(t)
        s = 0.0
        hit = 0
        for q in set(query):
            if tf[q] == 0:
                continue
            hit += 1
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
            s += idf * tf[q] * (k1 + 1) / (tf[q] + k1 * (1 - b + b * len(t) / avgdl))
        if hit:
            want[d] = (s, hit)
    out = bm25_topk(df, query, k=4, k1=k1, b=b).collect()
    assert [r.doc_id for r in out] == [
        d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
    ][:4]
    for r in out:
        assert abs(r.score - want[r.doc_id][0]) < 1e-6
        assert r.n_terms_hit == want[r.doc_id][1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk(df, [])
    with _pytest.raises(ValueError):
        bm25_topk(df, ["fox"], k=0)


def test_bm25_only_touches_query_posting_lists(spark):
    """Documents sharing no query term must not appear (the broadcast
    semi-filter on the postings table is also the correctness boundary)."""
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.operators.textops import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    first = docs.first().text.split(" ")[:2]
    out = bm25_topk(docs, first, k=5).collect()
    assert 0 < len(out) <= 5
    texts = {
        r.doc_id: r.text
        for r in docs.where(F.col("doc_id").isin([o.doc_id for o in out])).collect()
    }
    for o in out:
        assert any(t in texts[o.doc_id].split(" ") for t in first)
