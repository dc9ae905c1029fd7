"""Sharded JSONL training-data sink: roundtrip, determinism, manifest."""

import gzip
import json
import os

from pdf_spark.sources.jsonl import read_jsonl, write_jsonl


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_out):
    docs = _docs(spark, sf_dir)
    out = os.path.join(tmp_out, "shards")
    manifest = write_jsonl(docs, out, sort_cols=["doc_id"], num_shards=4)
    assert sum(n for _p, n in manifest) == docs.count()
    assert all(p.endswith(".jsonl.gz") for p, _n in manifest)

    back = read_jsonl(spark, out, schema=docs.schema)
    src = {tuple(r) for r in docs.collect()}
    rtd = {tuple(r) for r in back.collect()}
    assert src == rtd


def test_jsonl_deterministic_bytes(spark, sf_dir, tmp_out):
    docs = _docs(spark, sf_dir)
    outs = []
    for tag in ("a", "b"):
        out = os.path.join(tmp_out, tag)
        write_jsonl(docs, out, sort_cols=["doc_id"], num_shards=2)
        shards = sorted(os.listdir(out))
        outs.append(
            {s: open(os.path.join(out, s), "rb").read() for s in shards}
        )
    assert outs[0] == outs[1]  # identical shard names AND bytes


def test_jsonl_lines_are_valid_json(spark, sf_dir, tmp_out):
    docs = _docs(spark, sf_dir).limit(50)
    out = os.path.join(tmp_out, "s")
    manifest = write_jsonl(docs, out, num_shards=1)
    path, n = manifest[0]
    with gzip.open(path, "rt", encoding="utf-8") as f:
        lines = [json.loads(ln) for ln in f]
    assert len(lines) == n == 50
    assert set(lines[0]) == {"doc_id", "text", "lang", "source"}
