"""Benchmark decontamination over ``documents``: flag training documents
that collide with a held-out eval set on long n-grams, and report the
clean-set composition after removing them.

The standard training-data hygiene step (GPT-3 appendix C / PaLM-style
13-gram collision, scaled to this corpus's short synthetic docs as 5-gram
collision): a training document is contaminated if any of its distinct
5-word n-grams appears verbatim in any benchmark/eval document.  This is
deliberately distinct from near-dup dedup (dedup.py): decontamination is
an asymmetric train-vs-eval containment test on LONG n-grams, not a
symmetric train-vs-train similarity join on short shingles.

The eval set is derived deterministically from the corpus itself
(``doc_id % 41 = 3`` — no external data): ~2.4% of docs play the role of
the benchmark, everything else is the training side.

Scale notes (100 TB training corpus, ~10^4..10^6 eval examples):
- the eval side is always tiny relative to the corpus — its exploded
  n-gram set is broadcast (hinted explicitly), so the training side is
  ONE scan + explode with NO shuffle for the join; the only shuffle is
  the per-doc group-by of the (rare) colliding rows.
- n-grams are position-generated per row (whole-stage codegen transform
  over the pre-materialized words array, same pattern as
  common.shingles_spark) — no per-row Python.
- the summary entry reuses the collision set as a broadcast semi-join
  against the corpus scan: composition of the post-filter clean set per
  source in one pass.

Reference analogue: the reference has no decontamination operator (it is
a remote-sensing pipeline); this extends the LLM-pipeline suite the same
way dedup/sampling do.  Semantics anchor: Brown et al. 2020 (GPT-3)
appendix C n-gram overlap filtering, re-expressed as Catalyst SQL with a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import register_views

NGRAM = 5          # words per collision n-gram
EVAL_MOD = 41      # doc_id % EVAL_MOD == EVAL_RES -> eval/benchmark doc
EVAL_RES = 3


def _grams_cte(dialect: str) -> str:
    """doc_id, gs (distinct 5-word n-grams of the lowercased text)."""
    if dialect == "spark":
        parts = ", ".join(f"w[i+{j}]" for j in range(NGRAM))
        return f"""
            words as (select doc_id, split(lower(text), ' ') as w
                      from documents),
            grams as (
                select doc_id,
                       array_distinct(transform(
                           sequence(0, size(w) - {NGRAM}),
                           i -> concat_ws(' ', {parts}))) as gs
                from words where size(w) >= {NGRAM}
            )
        """
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(NGRAM))
    return f"""
        words as (select doc_id, string_split(lower(text), ' ') as w
                  from documents),
        grams as (
            select doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(len(w) - {NGRAM - 1}, 0)),
                       i -> {parts})) as gs
            from words where len(w) >= {NGRAM}
        )
    """


def _sides_cte(dialect: str) -> str:
    """Exploded per-n-gram rows for the eval and training sides."""
    if dialect == "spark":
        # OUTER explode: a plain explode lets Catalyst infer
        # ``size(gs) > 0 AND isnotnull(gs)`` and push the whole
        # interpreted n-gram transform into the scan filter (an extra
        # single-task evaluation of the expensive expression per side —
        # the same InferFiltersFromGenerate hazard measured at 8 s on the
        # minhash pipeline, dedup._bands_cte).  ``size(w) >= NGRAM`` in
        # the grams CTE guarantees gs is non-empty, so outer emits
        # exactly the same rows.
        return f"""
            eval_grams as (
                select doc_id as eval_id, g
                from grams lateral view outer explode(gs) t as g
                where doc_id % {EVAL_MOD} = {EVAL_RES}
            ),
            train_grams as (
                select doc_id, g
                from grams lateral view outer explode(gs) t as g
                where doc_id % {EVAL_MOD} <> {EVAL_RES}
            )
        """
    return f"""
        eval_grams as (
            select doc_id as eval_id, unnest(gs) as g
            from grams where doc_id % {EVAL_MOD} = {EVAL_RES}
        ),
        train_grams as (
            select doc_id, unnest(gs) as g
            from grams where doc_id % {EVAL_MOD} <> {EVAL_RES}
        )
    """


def _decontaminate_sql(dialect: str) -> str:
    """Per contaminated training doc: distinct colliding n-grams, distinct
    eval docs hit, and the lowest-numbered eval doc hit."""
    hint = "/*+ BROADCAST(eval_grams) */ " if dialect == "spark" else ""
    cast = "cast(count(distinct t.g) as bigint)" \
        if dialect == "spark" else "count(distinct t.g)::bigint"
    cast_e = "cast(count(distinct e.eval_id) as bigint)" \
        if dialect == "spark" else "count(distinct e.eval_id)::bigint"
    cast_m = "cast(min(e.eval_id) as bigint)" \
        if dialect == "spark" else "min(e.eval_id)::bigint"
    return f"""
        with {_grams_cte(dialect)},
        {_sides_cte(dialect)}
        select {hint}t.doc_id,
               {cast} as n_hit_ngrams,
               {cast_e} as n_eval_docs,
               {cast_m} as first_eval_id
        from train_grams t join eval_grams e on e.g = t.g
        group by t.doc_id
        order by doc_id
    """


def _clean_stats_sql(dialect: str) -> str:
    """Post-decontamination clean-set composition per source: training doc
    counts, contaminated counts, and surviving characters."""
    hint = "/*+ BROADCAST(contaminated) */ " if dialect == "spark" else ""

    def b(expr: str) -> str:
        return f"cast({expr} as bigint)"

    return f"""
        with {_grams_cte(dialect)},
        {_sides_cte(dialect)},
        contaminated as (
            select distinct t.doc_id
            from train_grams t join eval_grams e on e.g = t.g
        )
        select {hint}d.source,
               {b('count(*)')} as n_train_docs,
               {b('count(c.doc_id)')} as n_contaminated,
               {b('sum(case when c.doc_id is null then d.n_chars else 0 end)')}
                   as clean_chars
        from documents d
        left join contaminated c on c.doc_id = d.doc_id
        where d.doc_id % {EVAL_MOD} <> {EVAL_RES}
        group by d.source
        order by d.source
    """


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_decontaminate_sql("spark"))


def q_decontaminate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_clean_stats_sql("spark"))


def _register_documents(spark: SparkSession, sf_dir: str) -> None:
    """Register ONLY the documents view (same spread/widening as
    register_views) — the writer surfaces run over any directory holding
    a documents.parquet, not just the full fixture set."""
    from .common import table

    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


def contaminated_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct contaminated training doc_ids (one column, tiny by
    construction — collisions are rare relative to the corpus)."""
    _register_documents(spark, sf_dir)
    return spark.sql(f"""
        with {_grams_cte("spark")},
        {_sides_cte("spark")}
        select /*+ BROADCAST(eval_grams) */ distinct t.doc_id
        from train_grams t join eval_grams e on e.g = t.g
    """)


def write_clean_corpus(spark: SparkSession, sf_dir: str,
                       out_path: str) -> dict:
    """Materialize the decontaminated training corpus: drop eval docs
    (row-local predicate) and contaminated docs (broadcast anti-join of
    the tiny flagged set) in ONE corpus scan + write; counters ride the
    write job as observed metrics (no separate count jobs) — the same
    pattern as the tier lengths sidecar (tiers._observe_lengths).

    Returns ``{"n_in": .., "n_eval": .., "n_contaminated": ..,
    "n_clean": ..}`` where n_in = n_eval + n_contaminated + n_clean.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from .common import table

    flagged = contaminated_ids(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_RES
    tagged = docs.join(
        F.broadcast(flagged.withColumn("_dirty", F.lit(True))),
        "doc_id", "left")
    obs = Observation()
    tagged = tagged.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.count(F.when(is_eval, 1)).alias("n_eval"),
        F.count(F.when(~is_eval & F.col("_dirty").isNotNull(), 1))
            .alias("n_contaminated"),
    )
    clean = tagged.filter(~is_eval & F.col("_dirty").isNull()) \
        .drop("_dirty")
    clean.write.mode("overwrite").parquet(out_path)
    got = obs.get
    got["n_clean"] = got["n_in"] - got["n_eval"] - got["n_contaminated"]
    return got


QUERIES = {
    "docs_decontaminate": q_decontaminate,
    "docs_decontaminate_stats": q_decontaminate_stats,
}

ORACLES = {
    "docs_decontaminate": _decontaminate_sql("duck"),
    "docs_decontaminate_stats": _clean_stats_sql("duck"),
}
