"""Dataset mixing operators over ``documents``: deterministic
train/val/test splitting and per-source token-budget sampling — the two
selection steps a training-data pipeline runs between dedup/quality and
tokenization (fix a split ONCE by content-stable hash; then sample each
source down to its token budget in the data mixture).

Both are pure Catalyst expressions (hash, window cumsum) with DuckDB
oracles.  Scale shape: the split is a stateless per-row projection (no
shuffle beyond the final aggregation); the budget sample is one window
over (source) ordered by a deterministic shuffle key — a single
hash-shuffle on source at 10^12 rows, skew-safe here because the window
only cumulates a bounded prefix per source (and a skewed deployment
splits the budget across salted sub-windows first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import h32_duck, h32_spark, register_views

# split fractions in percent: 98 / 1 / 1
_SPLIT_CASE = ("case when h < 98 then 'train' when h < 99 then 'val' "
               "else 'test' end")
TOKEN_BUDGET = 800    # per-source token budget: LOW enough that the
# prefix cut actually truncates every source at the driver SF — a
# budget that never clips would leave the window-cumsum path untested


def _split_sql(dialect: str) -> str:
    """Per-(source, split) doc/token accounting under a deterministic
    content-stable split: h32(md5('split:' || doc_id)) % 100 -> 98/1/1.
    The same doc lands in the same split on every engine and every run —
    the property that keeps eval sets leak-free across re-processing."""
    if dialect == "spark":
        h = h32_spark("concat('split:', cast(doc_id as string))")
        ntok = "size(split(text, ' '))"
    else:
        h = h32_duck("'split:' || doc_id")
        ntok = "len(string_split(text, ' '))"
    return f"""
        with assigned as (
            select doc_id, source, {ntok} as tok, {h} % 100 as h
            from documents
        )
        select source, {_SPLIT_CASE} as split,
               count(*) as n_docs,
               cast(sum(tok) as bigint) as ws_tokens,
               min(doc_id) as min_doc, max(doc_id) as max_doc
        from assigned
        group by source, split
        order by source, split
    """


def q_split_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_split_sql("spark"))


def _budget_sql(dialect: str, budget: int = TOKEN_BUDGET) -> str:
    """Per-source token-budget sampling: order each source's docs by a
    deterministic shuffle key (h32 of the doc id) and keep the prefix
    whose cumulative whitespace-token count fits the budget.  Unique
    (h, doc_id) ordering makes the window frame tie-free, so RANGE vs
    ROWS semantics cannot diverge between engines."""
    if dialect == "spark":
        h = h32_spark("concat('sample:', cast(doc_id as string))")
        ntok = "size(split(text, ' '))"
    else:
        h = h32_duck("'sample:' || doc_id")
        ntok = "len(string_split(text, ' '))"
    return f"""
        with t as (
            select doc_id, source, {ntok} as tok, {h} as h
            from documents
        ),
        c as (
            select doc_id, source, tok,
                   sum(tok) over (
                       partition by source order by h, doc_id
                       rows between unbounded preceding and current row
                   ) as cum
            from t
        )
        select source,
               count(*) as n_selected,
               cast(sum(tok) as bigint) as sel_tokens,
               cast(max(cum) as bigint) as budget_used,
               min(doc_id) as first_doc
        from c
        where cum <= {budget}
        group by source
        order by source
    """


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_budget_sql("spark"))


CONTEXT_LEN = 512   # packing context budget (whitespace tokens); low
# enough that every source spans multiple bins at the driver SF


def _pack_sql(dialect: str, ctx: int = CONTEXT_LEN) -> str:
    """Sequence packing, GPT-style concat-and-chunk: within each source,
    documents are concatenated in doc_id order and cut every ``ctx``
    tokens (docs may straddle a cut — the training-time packing that
    wastes zero tokens, as opposed to greedy bin packing whose
    keep-or-open-new-bin decision is inherently sequential).  A doc's
    bin is closed-form from the window cumsum: floor(tokens_before /
    ctx) — a doc is reported in the bin where it STARTS.

    Scale shape: packing is per-source (partition by source, order by
    doc_id) — ONE hash-shuffle, no global sort; a skewed deployment
    sub-shards the big source on a deterministic doc_id band first and
    offsets bin ids per shard.  Output: per-(source, bin) composition
    (doc count, packed tokens, doc_id span)."""
    if dialect == "spark":
        ntok = "size(split(text, ' '))"
        bin_expr = f"(coalesce(before, 0) div {ctx})"
    else:
        ntok = "len(string_split(text, ' '))"
        bin_expr = f"coalesce(before, 0) // {ctx}"
    return f"""
        with t as (
            select doc_id, source, {ntok} as tok
            from documents
        ),
        c as (
            select doc_id, source, tok,
                   sum(tok) over (
                       partition by source order by doc_id
                       rows between unbounded preceding and 1 preceding
                   ) as before
            from t
        )
        select source,
               cast({bin_expr} as bigint) as bin,
               count(*) as n_docs,
               cast(sum(tok) as bigint) as packed_tokens,
               min(doc_id) as first_doc,
               max(doc_id) as last_doc
        from c
        group by source, {bin_expr}
        order by source, bin
    """


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_pack_sql("spark"))


QUERIES = {
    "docs_split_mix": q_split_mix,
    "docs_token_budget_sample": q_token_budget_sample,
    "docs_pack_sequences": q_pack_sequences,
}

ORACLES = {
    "docs_split_mix": _split_sql("duck"),
    "docs_token_budget_sample": _budget_sql("duck"),
    "docs_pack_sequences": _pack_sql("duck"),
}
