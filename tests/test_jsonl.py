"""JSONL(.gz) document source/sink (sources/jsonl.py): gzip shards
round-trip, corrupt lines degrade to rows (never tasks), missing ids
derive deterministically, and the read feeds the documents-shaped
operators unchanged."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from bdqc_spark.sources.jsonl import (
    jsonl_documents,
    read_jsonl_documents,
    write_jsonl_documents,
)


def _fixture(tmp_path, lines, name="part-0.jsonl.gz"):
    d = tmp_path / "shards"
    d.mkdir(exist_ok=True)
    with gzip.open(d / name, "wt", encoding="utf-8") as f:
        for ln in lines:
            f.write(ln + "\n")
    return str(d)


def test_read_clean_and_corrupt_lines(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": "a", "text": "hello world", "lang": "en", "source": "web"}),
        json.dumps({"text": "no id here", "lang": "fr"}),  # id derived
        '{"text": "truncated json...',                      # corrupt JSON
        json.dumps({"doc_id": "d", "lang": "en"}),          # no text -> corrupt
        json.dumps({"doc_id": "e", "text": "", "extra": 1}),  # empty text ok
    ]
    path = _fixture(tmp_path, lines)
    df = read_jsonl_documents(spark, path)
    rows = {r.doc_id: r for r in df.collect() if r.doc_id is not None}
    n_corrupt = df.where("corrupt").count()
    assert n_corrupt == 2
    assert rows["a"].text == "hello world" and rows["a"].n_chars == 11
    assert rows["e"].text == "" and rows["e"].n_chars == 0
    # derived id is deterministic across reads
    derived = [r.doc_id for r in df.collect() if r.text == "no id here"]
    derived2 = [r.doc_id for r in read_jsonl_documents(spark, path).collect()
                if r.text == "no id here"]
    assert derived == derived2 and derived[0] is not None
    # defaults fill
    assert rows[derived[0]].lang == "fr" and rows[derived[0]].source == "jsonl"
    clean = jsonl_documents(spark, path)
    assert clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert clean.count() == 3


def test_round_trip_through_gzip_shards(spark, tmp_path):
    docs = spark.range(200).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("text body "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.length(F.concat(F.lit("text body "), F.col("id"))).cast("bigint").alias("n_chars"),
    )
    out = str(tmp_path / "out")
    write_jsonl_documents(docs, out, n_shards=4)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == 4
    gz = [
        f
        for d in shard_dirs
        for f in os.listdir(os.path.join(out, d))
        if f.endswith(".json.gz")
    ]
    assert len(gz) == 4
    back = jsonl_documents(spark, out)
    assert back.count() == 200
    a = sorted((r.doc_id, r.text, r.lang, r.n_chars) for r in back.collect())
    b = sorted((r.doc_id, r.text, r.lang, r.n_chars) for r in docs.collect())
    assert a == b


def test_jsonl_feeds_documents_operators(spark, tmp_path):
    """The read output is drop-in for the documents-table operators
    (here: the Gopher rule table) — ingest is schema-complete."""
    from bdqc_spark.functions import text as TX

    lines = [
        json.dumps({"doc_id": str(i), "text": ("the cat sat with a dog and then ran off to find more " * 3)})
        for i in range(10)
    ]
    path = _fixture(tmp_path, lines)
    g = jsonl_documents(spark, path).select(
        "doc_id", TX.gopher_rules(F.col("text")).alias("g")
    )
    rows = g.collect()
    assert len(rows) == 10 and all(r.g.n_words == 39 for r in rows)
