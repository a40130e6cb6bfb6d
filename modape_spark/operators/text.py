"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All four are declarative (pure Catalyst expressions — regexp/array
built-ins, no UDFs): filters and projections push to the parquet scan,
aggregation is map-side partial, and nothing leaves whole-stage codegen.
Each has a DuckDB oracle running the same logic in DuckDB's dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import P31, h32_duck, h32_spark, register_views

# BPE-ish token regex: letter runs, digit runs, single other non-space.
# (literal space in the negated class: '\s' escapes differently in Spark vs
# DuckDB string literals)
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# tiny per-language marker sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
}


def _stop_hits(words_expr: str, markers: tuple[str, ...], dialect: str) -> str:
    fn = "size" if dialect == "spark" else "len"
    filt = "filter" if dialect == "spark" else "list_filter"
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"{fn}({filt}({words_expr}, x -> x in ({lst})))"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(f"""
        select source,
               count(*) as n_docs,
               cast(sum(size(split(text, ' '))) as bigint) as ws_tokens,
               cast(sum(size(regexp_extract_all(text, '{TOKEN_RE}', 0))) as bigint)
                   as bpe_tokens,
               cast(sum(n_chars) as bigint) * 10000 div count(*) as avg_chars_x1e4
        from documents
        group by source
        order by source
    """)


# sums cast to BIGINT on both sides (DuckDB sums to HUGEINT by default) and
# the average kept in integer fixed-point (x1e4) so the value hash is
# representation-stable across engines.
ORACLE_TOKEN_COUNT = f"""
    select source,
           count(*) as n_docs,
           cast(sum(len(string_split(text, ' '))) as bigint) as ws_tokens,
           cast(sum(len(regexp_extract_all(text, '{TOKEN_RE}'))) as bigint)
               as bpe_tokens,
           cast(sum(n_chars) as bigint) * 10000 // count(*) as avg_chars_x1e4
    from documents
    group by source
    order by source
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return spark.sql(f"""
        with words as (
            select doc_id, source, n_chars, split(lower(text), ' ') as w
            from documents
        ),
        scored as (
            select doc_id, source,
                   size(w) as wc,
                   n_chars,
                   size(filter(w, x -> x in ({stop}))) as stop_hits
            from words
        ),
        q as (
            select source,
                   case when wc < 20 then 'short'
                        when stop_hits * 100 > 8 * wc then 'stopword_rich'
                        when n_chars * 10 > 60 * wc then 'long_words'
                        else 'ok' end as quality_bucket
            from scored
        )
        select source, quality_bucket, count(*) as n
        from q group by source, quality_bucket
        order by source, quality_bucket
    """)


ORACLE_QUALITY = f"""
    with scored as (
        select doc_id, source,
               len(string_split(text, ' ')) as wc,
               n_chars,
               len(list_filter(string_split(lower(text), ' '),
                               x -> x in ({', '.join(repr(s) for s in STOPWORDS)}))) as stop_hits
        from documents
    ),
    q as (
        select source,
               case when wc < 20 then 'short'
                    when stop_hits * 100 > 8 * wc then 'stopword_rich'
                    when n_chars * 10 > 60 * wc then 'long_words'
                    else 'ok' end as quality_bucket
        from scored
    )
    select source, quality_bucket, count(*) as n
    from q group by source, quality_bucket
    order by source, quality_bucket
"""


def _langid_case(dialect: str) -> str:
    # operates on a pre-materialized words column `w` — 20 inline splits
    # (4 languages x 5 markers under interpreted HOFs) otherwise
    hits = {L: _stop_hits("w", m, dialect) for L, m in LANG_MARKERS.items()}
    # argmax with deterministic tie-break order en > es > de > fr > unknown
    return f"""
        case when {hits['en']} >= {hits['es']} and {hits['en']} >= {hits['de']}
                  and {hits['en']} >= {hits['fr']} and {hits['en']} > 0 then 'en'
             when {hits['es']} >= {hits['de']} and {hits['es']} >= {hits['fr']}
                  and {hits['es']} > 0 then 'es'
             when {hits['de']} >= {hits['fr']} and {hits['de']} > 0 then 'de'
             when {hits['fr']} > 0 then 'fr'
             else 'unknown' end
    """


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(f"""
        with words as (
            select lang, split(lower(text), ' ') as w from documents
        )
        select {_langid_case('spark')} as lang_pred, lang, count(*) as n
        from words
        group by lang_pred, lang
        order by lang_pred, lang
    """)


ORACLE_LANGID = f"""
    with words as (
        select lang, string_split(lower(text), ' ') as w from documents
    )
    select {_langid_case('duck')} as lang_pred, lang, count(*) as n
    from words
    group by lang_pred, lang
    order by lang_pred, lang
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash over word hashes (Rabin-Karp style)."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(f"""
        select doc_id,
               aggregate(
                   transform(split(lower(text), ' '), w -> {h32_spark('w')} % {P31}),
                   0L, (acc, h) -> (acc * 31 + h) % {P31}
               ) as fingerprint
        from documents
        order by doc_id
    """)


ORACLE_FINGERPRINT = f"""
    select doc_id,
           list_reduce(
               list_prepend(0, list_transform(string_split(lower(text), ' '),
                                              w -> {h32_duck('w')} % {P31})),
               (acc, h) -> (acc * 31 + h) % {P31}
           ) as fingerprint
    from documents
    order by doc_id
"""


def _vocab_sql(dialect: str, k: int = 3) -> str:
    """Corpus word-frequency statistics: top-``k`` lowercased whitespace
    tokens per source by document frequency-weighted count — the
    counting pass a BPE/unigram tokenizer-training pipeline runs first.
    Ties broken lexically so the rank is total and engine-independent.
    Scale shape: explode -> (source, word) partial-agg groupBy (ONE
    shuffle; word cardinality is vocabulary-sized, far below row count)
    -> per-source top-k window over the already-aggregated counts."""
    if dialect == "spark":
        ex = ("select source, w from documents "
              "lateral view explode(split(lower(text), ' ')) t as w")
    else:
        ex = ("select source, unnest(string_split(lower(text), ' ')) as w "
              "from documents")
    return f"""
        with ex as ({ex}),
        counts as (
            select source, w, count(*) as cnt
            from ex group by source, w
        ),
        ranked as (
            select source, w, cnt,
                   row_number() over (partition by source
                                      order by cnt desc, w) as rnk
            from counts
        )
        select source, cast(rnk as int) as rnk, w as word,
               cast(cnt as bigint) as cnt
        from ranked
        where rnk <= {k}
        order by source, rnk
    """


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_vocab_sql("spark"))


QUERIES = {
    "docs_token_count": q_token_count,
    "docs_vocab_topk": q_vocab_topk,
    "docs_quality": q_quality,
    "docs_langid": q_langid,
    "docs_fingerprint": q_fingerprint,
}

ORACLES = {
    "docs_token_count": ORACLE_TOKEN_COUNT,
    "docs_vocab_topk": _vocab_sql("duck"),
    "docs_quality": ORACLE_QUALITY,
    "docs_langid": ORACLE_LANGID,
    "docs_fingerprint": ORACLE_FINGERPRINT,
}
