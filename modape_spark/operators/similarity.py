"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

- brute-force cosine top-k: the exactness baseline.  Spark-side the dot
  product is `aggregate(zip_with(...))` — pure Catalyst, codegen'd, no UDF.
  At scale this is one broadcast of the (tiny) query set against a full
  scan: embarrassingly parallel, no shuffle except the final top-k.
- LSH-bucketed ANN: sign-bit bucketing against fixed random hyperplanes
  (literal constants so the DuckDB oracle computes the identical buckets).
  Scale path: candidates only join within a bucket.
- near-duplicate pairs by cosine threshold (embedding-cosine near-dup).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .common import register_views

K_NEIGHBOURS = 5
N_QUERY = 3          # vec_id < 3 are the query vectors
NEARDUP_TAU = 0.45   # sf-calibrated: max pairwise cosine in the data ~0.51
N_PLANES = 8
DIM = 64


def _planes() -> np.ndarray:
    """Deterministic pseudo-random hyperplanes, embedded as SQL literals."""
    rng = np.random.default_rng(20260816)
    return np.round(rng.standard_normal((N_PLANES, DIM)), 6)


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _dot_duck(a: str, b: str) -> str:
    # same sequential fold as Spark's aggregate, in double precision
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
        f"i -> {a}[i]::double * {b}[i]::double)), (acc, v) -> acc + v)"
    )


def _cosine(dialect: str, a: str, b: str) -> str:
    dot = _dot_spark if dialect == "spark" else _dot_duck
    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _knn_sql(dialect: str) -> str:
    # The cosine folds run in the same sequential order in both engines, so
    # the doubles are bit-identical; fixed-point via floor avoids any
    # rounding-mode divergence.
    cos = _cosine(dialect, "q.embedding", "c.embedding")
    return f"""
        with q as (select vec_id, embedding from embeddings where vec_id < {N_QUERY}),
        c as (select vec_id, embedding from embeddings where vec_id >= {N_QUERY}),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbour_id,
                   cast(floor({cos} * 10000 + 0.5) as bigint) as score_e4
            from q cross join c
        ),
        ranked as (
            select *, row_number() over (
                partition by query_id order by score_e4 desc, neighbour_id
            ) as rank
            from scored
        )
        select query_id, neighbour_id, score_e4, rank
        from ranked where rank <= {K_NEIGHBOURS}
        order by query_id, rank
    """


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_knn_sql("spark"))


def _neardup_sql(dialect: str) -> str:
    cos = _cosine(dialect, "a.embedding", "b.embedding")
    return f"""
        select a.vec_id as vec_a, b.vec_id as vec_b,
               cast(floor({cos} * 10000 + 0.5) as bigint) as cosine_e4
        from embeddings a join embeddings b on a.vec_id < b.vec_id
        where {cos} >= {NEARDUP_TAU}
        order by vec_a, vec_b
    """


def q_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_neardup_sql("spark"))


def _bucket_expr(dialect: str, emb: str) -> str:
    planes = _planes()
    bits = []
    for pi, plane in enumerate(planes):
        lits = ", ".join(f"{v}" for v in plane)
        if dialect == "spark":
            dot = (
                f"aggregate(zip_with({emb}, array({lits}), "
                f"(x, y) -> cast(x as double) * y), cast(0.0 as double), (acc, v) -> acc + v)"
            )
        else:
            dot = (
                f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
                f"i -> {emb}[i]::double * ([{lits}])[i])), (acc, v) -> acc + v)"
            )
        bits.append(f"(case when {dot} > 0 then {1 << pi} else 0 end)")
    return " + ".join(bits)


def _ann_lsh_sql(dialect: str) -> str:
    bucket = _bucket_expr(dialect, "embedding")
    return f"""
        with b as (select vec_id, {bucket} as bucket from embeddings)
        select bucket, count(*) as n_vectors, min(vec_id) as min_vec
        from b group by bucket
        order by bucket
    """


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_ann_lsh_sql("spark"))


QUERIES = {
    "emb_knn_brute": q_knn_brute,
    "emb_neardup_pairs": q_neardup,
    "emb_ann_lsh_buckets": q_ann_lsh_buckets,
}

ORACLES = {
    "emb_knn_brute": _knn_sql("duck"),
    "emb_neardup_pairs": _neardup_sql("duck"),
    "emb_ann_lsh_buckets": _ann_lsh_sql("duck"),
}
