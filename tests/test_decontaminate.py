"""Decontamination writer: the clean corpus is exactly the training set
minus the oracle's contaminated doc_ids, and the observed counters
partition the input."""

from __future__ import annotations

import duckdb

from modape_spark.operators.decontaminate import (
    EVAL_MOD,
    EVAL_RES,
    _decontaminate_sql,
    write_clean_corpus,
)

# sf0.01, not sf0.001: the smaller fixture has ZERO n-gram collisions,
# which would leave the contaminated-removal path untested (sf0.01 has 5
# planted near-duplicates of eval docs)
SF_DIR = "/root/testdata/sf0.01"


def test_write_clean_corpus_matches_oracle(spark, tmp_path):
    out = str(tmp_path / "clean")
    counters = write_clean_corpus(spark, SF_DIR, out)
    assert counters["n_contaminated"] > 0  # the fixture plants dups

    con = duckdb.connect()
    con.execute(f"create view documents as "
                f"select * from '{SF_DIR}/documents.parquet'")
    dirty = {r[0] for r in
             con.execute(_decontaminate_sql("duck")).fetchall()}
    all_ids = {r[0] for r in
               con.execute("select doc_id from documents").fetchall()}
    eval_ids = {i for i in all_ids if i % EVAL_MOD == EVAL_RES}
    expect_clean = all_ids - eval_ids - dirty

    got = {r["doc_id"] for r in
           spark.read.parquet(out).select("doc_id").collect()}
    assert got == expect_clean
    assert counters["n_in"] == len(all_ids)
    assert counters["n_eval"] == len(eval_ids)
    assert counters["n_contaminated"] == len(dirty)
    assert counters["n_clean"] == len(expect_clean)
    # schema preserved (minus nothing): same columns as the source table
    assert set(spark.read.parquet(out).columns) == \
        {"doc_id", "text", "lang", "source", "n_chars"}
