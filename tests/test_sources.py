from __future__ import annotations

import os

from casf_spark.functions import text as TX
from casf_spark.sources import (read_stopwords, read_text_documents,
                                read_text_lines, write_parquet)


def test_text_sources_roundtrip(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("hello world\nsecond line")
    (d / "b.txt").write_text("another document")

    lines = read_text_lines(spark, str(d))
    assert lines.count() == 3
    assert lines.columns == ["line"]

    docs = read_text_documents(spark, str(d))
    got = {os.path.basename(r.doc_id): r.text for r in docs.collect()}
    assert got["a.txt"] == "hello world\nsecond line"
    assert got["b.txt"] == "another document"


def test_stopwords_file_feeds_antijoin(spark, tmp_path):
    sw_file = tmp_path / "stop.txt"
    sw_file.write_text("the\n a \n\nand\n")
    sw = read_stopwords(spark, str(sw_file))
    assert {r.word for r in sw.collect()} == {"the", "a", "and"}

    docs = spark.createDataFrame([(1, "the cat and the hat")],
                                 "doc_id long, text string")
    tc = TX.term_counts(docs, "doc_id", "text", stopwords=sw)
    assert {r.x for r in tc.collect()} == {"cat", "hat"}


def test_partitioned_parquet_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en", "x"), (2, "en", "y"), (3, "fr", "z")],
        "id long, lang string, text string")
    out = str(tmp_path / "out")
    write_parquet(df, out, partition_by=["lang"])
    assert os.path.isdir(f"{out}/lang=en")
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning: only the en directory is read
    pruned = back.where("lang = 'en'")
    assert pruned.count() == 2


def test_csv_json_roundtrip(spark, tmp_path):
    from casf_spark.sources.text import read_csv, read_json
    csv = tmp_path / "t.csv"
    csv.write_text("id,name\n1,alpha\n2,beta\n")
    df = read_csv(spark, str(csv), schema="id long, name string")
    assert {(r.id, r.name) for r in df.collect()} == {(1, "alpha"), (2, "beta")}

    js = tmp_path / "t.jsonl"
    js.write_text('{"id": 1, "tags": ["a", "b"]}\n{"id": 2, "tags": []}\n')
    jdf = read_json(spark, str(js), schema="id long, tags array<string>")
    got = {r.id: list(r.tags) for r in jdf.collect()}
    assert got == {1: ["a", "b"], 2: []}


def test_demo_example_runs(spark, sf_dir):
    import subprocess
    import sys
    res = subprocess.run(
        [sys.executable, "examples/keywords_demo.py", sf_dir],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    assert "similarity_value" in res.stdout
