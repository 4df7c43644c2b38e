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
