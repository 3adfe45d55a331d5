"""Unit tests for operators/curation.py (decontaminate / pii / chunk)."""

from __future__ import annotations

import hashlib

import pytest

from readwise_vector_db_spark.operators.curation import (
    chunk_overlap,
    decontaminate,
    pii_scrub,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_decontaminate_flags_shared_kgrams(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about spark partitions and shuffles here"),
            (3, "the quick brown fox jumps over the moon instead of dogs"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "we note the quick brown fox jumps over the lazy dog often")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate(corpus, eval_set, k=5).collect()
    }
    # doc 1 shares several 5-grams; doc 3 shares the leading ones; doc 2 none
    assert set(out) == {1, 3}
    assert out[1] > out[3] > 0


def test_pii_scrub_counts_and_redacts(spark):
    text = "reach me at a.b@x.org or 192.168.0.1 tel +1 23456789 end"
    docs = spark.createDataFrame([(1, text), (2, "no pii here")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ip"], rows[1]["n_phone"]) == (1, 1, 1)
    assert rows[1]["clean_md5"] == _md5(
        "reach me at <EMAIL> or <IP> tel <PHONE> end"
    )
    assert (rows[2]["n_email"], rows[2]["n_ip"], rows[2]["n_phone"]) == (0, 0, 0)
    assert rows[2]["clean_md5"] == _md5("no pii here")


def test_chunk_overlap_windows(spark):
    toks = [f"t{i}" for i in range(100)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_overlap(docs, window=64, stride=48).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts at 0, 48, 96 → lengths 64, 52, 4
    assert [(r["chunk_idx"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 64),
        (1, 52),
        (2, 4),
    ]
    assert rows[0]["chunk_md5"] == _md5(" ".join(toks[0:64]))
    assert rows[1]["chunk_md5"] == _md5(" ".join(toks[48:100]))
    assert rows[2]["chunk_md5"] == _md5(" ".join(toks[96:100]))


def test_chunk_overlap_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_overlap(docs, window=64, stride=48).collect()
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 3
    assert rows[0]["chunk_md5"] == _md5("a b c")


def test_chunk_overlap_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_overlap(docs, window=8, stride=9)
