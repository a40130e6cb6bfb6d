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


def _dot_spark_unrolled(a: str, b: str) -> str:
    """Unrolled 64-term dot product: ``0.0 + a[0]*b[0] + ... + a[63]*b[63]``.

    Bit-identical to the ``aggregate(zip_with(...))`` fold — the explicit
    chain is the same left-associative IEEE sequence (fold init 0.0, one
    product per element, sequential adds) — but Spark's higher-order
    functions execute INTERPRETED per element while this plain expression
    tree stays in whole-stage codegen.  ONLY used in the brute-force kNN
    projection, where it compiles and measured 1.7 -> 0.7 s at sf0.1; in
    the neardup/IVF join stages the unrolled chains exceed Janino's 64 KB
    method limit, dropping those stages to interpreted execution and
    making them SLOWER (measured 4 -> 42 s), so those keep the HOF fold."""
    terms = " + ".join(
        f"(cast({a}[{i}] as double) * cast({b}[{i}] as double))"
        for i in range(DIM))
    return f"(cast(0.0 as double) + {terms})"


def _knn_sql(dialect: str) -> str:
    # The cosine folds run in the same sequential order in both engines, so
    # the doubles are bit-identical; fixed-point via floor avoids any
    # rounding-mode divergence.
    if dialect == "spark":
        d = _dot_spark_unrolled
        # norms hoisted into the per-side projections: sqrt(dot(e, e)) is
        # the identical IEEE expression on the identical input whether it
        # runs once per ROW here or once per PAIR inline, and the final
        # combination keeps the same order (dot / (q_norm * c_norm)) — so
        # score_e4 is bit-identical (verified against the unchanged DuckDB
        # oracle).  What changes: each side's norm fold runs N times
        # instead of 3N times, and the scored projection codegen carries
        # ONE 64-term chain instead of three (3x less Janino/C2 work for
        # the join stage — the bench pays that compile on every fresh
        # session).
        q_sel = (f"select vec_id, embedding, "
                 f"sqrt({d('embedding', 'embedding')}) as nrm "
                 f"from embeddings")
        cos = (f"({d('q.embedding', 'c.embedding')} / "
               f"(q.nrm * c.nrm))")
        return f"""
        with q as ({q_sel} where vec_id < {N_QUERY}),
        c as ({q_sel} where vec_id >= {N_QUERY}),
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
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_knn_sql("spark"))


N_GRID_DIMS = 2      # projection dims for the epsilon-join grid
# cos(a,b) >= tau  <=>  ||a_hat - b_hat|| <= sqrt(2 - 2*tau)  (unit vectors)
GRID_R = float(np.sqrt(2.0 - 2.0 * NEARDUP_TAU))


def _unit_planes(k: int) -> np.ndarray:
    """First k hyperplanes, normalized to unit length (so Cauchy-Schwarz
    bounds the per-dimension projection gap by the pair distance)."""
    p = _planes()[:k]
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def _cell_exprs(dialect: str, emb: str, norm: str | None = None) -> list[str]:
    """Grid-cell index per projection dim: floor(p_hat . v_hat / R).

    The fold order, literals, and division sequence are identical in both
    dialects, so the doubles — and therefore the floor boundaries — agree
    bit-for-bit.  ``norm`` lets the Spark caller reference a pre-computed
    per-row sqrt(dot(e,e)) column — the identical IEEE value, computed
    once per row instead of once per cell dim."""
    if norm is None:
        norm = (f"sqrt({_dot_spark(emb, emb)})" if dialect == "spark"
                else f"sqrt({_dot_duck(emb, emb)})")
    out = []
    for plane in _unit_planes(N_GRID_DIMS):
        # repr(float(v)): numpy >= 2.0 reprs scalars as 'np.float64(x)',
        # which is invalid SQL — force plain Python floats
        lits = ", ".join(repr(float(v)) for v in plane)
        if dialect == "spark":
            dot = (f"aggregate(zip_with({emb}, array({lits}), "
                   f"(x, y) -> cast(x as double) * y), cast(0.0 as double), "
                   f"(acc, v) -> acc + v)")
        else:
            dot = (f"list_reduce(list_prepend(0.0, "
                   f"list_transform(generate_series(1, {DIM}), "
                   f"i -> {emb}[i]::double * ([{lits}])[i])), "
                   f"(acc, v) -> acc + v)")
        out.append(
            f"cast(floor(({dot} / {norm}) / {float(GRID_R)!r}) as bigint)")
    return out


def _neardup_sql(dialect: str) -> str:
    """Embedding-cosine near-duplicate pairs via a deterministic epsilon
    join (EXACT — not approximate).

    cos >= tau on normalized vectors is a radius search with
    r = sqrt(2 - 2*tau).  Each vector is hashed to a grid cell per unit
    projection; |p.(a_hat - b_hat)| <= ||a_hat - b_hat|| <= r means any
    qualifying pair differs by at most 1 cell per dimension.  One side
    explodes to the 3^k neighbouring cells and equi-joins the other side's
    home cell, so the shuffle is bounded by grid-cell collisions — no
    O(n^2) cross product — and each unordered pair matches exactly once
    (the needed offset per dim is unique).  The exact cosine filter then
    yields results identical to the all-pairs formulation.  (Sign-bit LSH
    cannot guarantee this: measured bucket hamming of true pairs at
    tau=0.45 reaches 6 of 8 bits.  At production near-dup thresholds,
    tau ~ 0.9, r shrinks to ~0.45 and the grid prunes much harder.)"""
    if dialect == "spark":
        # Per-row norm hoist (same reasoning as the kNN projection):
        # sqrt(dot(e,e)) is the identical IEEE expression whether it runs
        # once per ROW here (as an unrolled codegen chain — a plain
        # projection compiles fine; only the JOIN-stage unroll blew
        # Janino's method limit) or inside every cell expr and every
        # candidate pair's cosine.  The join stage then evaluates ONE
        # interpreted dot fold per cosine use instead of three, and the
        # cell projection none.  cos = dot/(na*nb) keeps _cosine's exact
        # combination order, so values match the unchanged DuckDB oracle
        # bit-for-bit (verified).
        nrm = f"sqrt({_dot_spark_unrolled('embedding', 'embedding')})"
        cells = _cell_exprs(dialect, "embedding", norm="nrm")
        cell_cols = ", ".join(f"{e} as c{i}" for i, e in enumerate(cells))
        probe_src = " ".join(
            f"lateral view explode(array(-1, 0, 1)) t{i} as o{i}"
            for i in range(N_GRID_DIMS))
        probe_cols = ", ".join(f"c{i} + o{i} as p{i}"
                               for i in range(N_GRID_DIMS))
        join_on = " and ".join(f"a.p{i} = b.c{i}"
                               for i in range(N_GRID_DIMS))
        cos = f"({_dot_spark('ea', 'eb')} / (na * nb))"
        return f"""
        with v0 as (
            select vec_id, embedding, {nrm} as nrm from embeddings
        ),
        v as (
            select vec_id, embedding, nrm, {cell_cols} from v0
        ),
        probes as (
            select vec_id, embedding, nrm, {probe_cols} from v {probe_src}
        ),
        cand as (
            select a.vec_id as vec_a, b.vec_id as vec_b,
                   a.embedding as ea, b.embedding as eb,
                   a.nrm as na, b.nrm as nb
            from probes a join v b
              on {join_on} and a.vec_id < b.vec_id
        )
        select vec_a, vec_b,
               cast(floor({cos} * 10000 + 0.5) as bigint) as cosine_e4
        from cand
        where {cos} >= {NEARDUP_TAU}
        order by vec_a, vec_b
    """
    cells = _cell_exprs(dialect, "embedding")
    cell_cols = ", ".join(f"{e} as c{i}" for i, e in enumerate(cells))
    probe_src = ", ".join(
        f"unnest([-1, 0, 1]) as t{i}(o{i})" for i in range(N_GRID_DIMS))
    probe_src = f"v, {probe_src}"
    probe_cols = ", ".join(f"c{i} + o{i} as p{i}" for i in range(N_GRID_DIMS))
    join_on = " and ".join(f"a.p{i} = b.c{i}" for i in range(N_GRID_DIMS))
    cos = _cosine(dialect, "ea", "eb")
    return f"""
        with v as (
            select vec_id, embedding, {cell_cols} from embeddings
        ),
        probes as (
            select vec_id, embedding, {probe_cols} from {probe_src}
        ),
        cand as (
            select a.vec_id as vec_a, b.vec_id as vec_b,
                   a.embedding as ea, b.embedding as eb
            from probes a join v b
              on {join_on} and a.vec_id < b.vec_id
        )
        select vec_a, vec_b,
               cast(floor({cos} * 10000 + 0.5) as bigint) as cosine_e4
        from cand
        where {cos} >= {NEARDUP_TAU}
        order by vec_a, vec_b
    """


def q_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_neardup_sql("spark"))


def _bucket_expr(dialect: str, emb: str) -> str:
    planes = _planes()
    bits = []
    for pi, plane in enumerate(planes):
        lits = ", ".join(repr(float(v)) for v in plane)
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
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_ann_lsh_sql("spark"))


N_CENTROIDS = 8
N_PROBE = 2


def _centroids() -> np.ndarray:
    """Deterministic coarse centroids (IVF codebook) as SQL literals.  A
    production build would k-means these; fixed literals keep the oracle
    exactly reproducible."""
    rng = np.random.default_rng(20260817)
    return np.round(rng.standard_normal((N_CENTROIDS, DIM)), 6)


def _centroid_scores(dialect: str, emb: str) -> str:
    """array of <emb . centroid_k> doubles, identical fold both engines."""
    dots = []
    for c in _centroids():
        lits = ", ".join(repr(float(v)) for v in c)  # plain-float literals
        if dialect == "spark":
            dots.append(
                f"aggregate(zip_with({emb}, array({lits}), "
                f"(x, y) -> cast(x as double) * y), cast(0.0 as double), "
                f"(acc, v) -> acc + v)")
        else:
            dots.append(
                f"list_reduce(list_prepend(0.0, "
                f"list_transform(generate_series(1, {DIM}), "
                f"i -> {emb}[i]::double * ([{lits}])[i])), "
                f"(acc, v) -> acc + v)")
    inner = ", ".join(dots)
    return f"array({inner})" if dialect == "spark" else f"[{inner}]"


def _ivf_sql(dialect: str) -> str:
    """IVF top-k: coarse-quantize every vector to its nearest centroid
    cell; queries probe their N_PROBE best cells; exact cosine top-k runs
    only within probed cells.  The scale path: candidate count bounded by
    cell occupancy, never a full cross join; the cell equi-join shuffles
    on cell id.  (Both engines compute bit-identical doubles — same
    literals, same fold order — so cell assignment and ranking agree.)

    Recall note: on the driver's UNIFORM synthetic embeddings recall vs
    brute is ~ N_PROBE/N_CENTROIDS (measured 4-5/15 at 2/8) because the
    data has no cluster structure for the codebook to exploit — the IVF
    premise is clustered corpora, where trained centroids concentrate
    true neighbours into probed cells.  The oracle checks the MECHANISM
    (assignment, probing, in-cell ranking) exactly; q_knn_brute remains
    the exactness baseline."""
    if dialect == "spark":
        arr_max, arr_pos = "array_max", "array_position"
        el = lambda a, j: f"element_at({a}, {j})"  # noqa: E731  (1-based)
        seq = f"sequence(1, {N_CENTROIDS})"
    else:
        arr_max, arr_pos = "list_max", "list_position"
        el = lambda a, j: f"{a}[{j}]"              # noqa: E731  (1-based)
        seq = f"generate_series(1, {N_CENTROIDS})"
    scores = _centroid_scores(dialect, "embedding")
    transform = "transform" if dialect == "spark" else "list_transform"
    masked = (f"{transform}({seq}, j -> case when j = cell1 "
              f"then -1e30 else {el('sc', 'j')} end)")
    if dialect == "spark":
        # Per-row norm hoist (see _neardup_sql / _knn_sql): the ranked
        # stage evaluated the 3-fold interpreted cosine TWICE per
        # candidate pair (projection + window order); with sqrt(dot(e,e))
        # computed once per row (unrolled codegen chain in a plain
        # projection) each evaluation is one dot fold.  Identical IEEE
        # expressions and combination order — bit-equal to the unchanged
        # DuckDB oracle (verified).
        nrm = f"sqrt({_dot_spark_unrolled('embedding', 'embedding')})"
        cos = f"({_dot_spark('qe', 'ce')} / (qn * cn))"
        return f"""
        with scored as (
            select vec_id, embedding, {nrm} as nrm, {scores} as sc
            from embeddings
        ),
        assigned as (
            select vec_id, embedding, nrm, sc,
                   cast({arr_pos}(sc, {arr_max}(sc)) as int) as cell1
            from scored
        ),
        probes as (
            select vec_id, embedding, nrm, cell1,
                   cast({arr_pos}({masked}, {arr_max}({masked})) as int)
                       as cell2
            from assigned
            where vec_id < {N_QUERY}
        ),
        probe_cells as (  -- one row per (query, probed cell): keeps the
                          -- candidate join a pure EQUI-join on cell id
            select vec_id, embedding, nrm, pc from probes
            lateral view explode(array(cell1, cell2)) t as pc
        ),
        cand as (
            select q.vec_id as query_id, c.vec_id as neighbour_id,
                   q.embedding as qe, c.embedding as ce,
                   q.nrm as qn, c.nrm as cn
            from probe_cells q
            join assigned c
              on c.cell1 = q.pc and c.vec_id >= {N_QUERY}
        ),
        ranked as (
            select query_id, neighbour_id,
                   cast(floor({cos} * 10000 + 0.5) as bigint) as score_e4,
                   row_number() over (
                       partition by query_id
                       order by {cos} desc, neighbour_id
                   ) as rank
            from cand
        )
        select query_id, neighbour_id, score_e4, rank
        from ranked where rank <= {K_NEIGHBOURS}
        order by query_id, rank
    """
    return f"""
        with scored as (
            select vec_id, embedding, {scores} as sc from embeddings
        ),
        assigned as (
            select vec_id, embedding, sc,
                   cast({arr_pos}(sc, {arr_max}(sc)) as int) as cell1
            from scored
        ),
        probes as (
            select vec_id, embedding, cell1,
                   cast({arr_pos}({masked}, {arr_max}({masked})) as int)
                       as cell2
            from assigned
            where vec_id < {N_QUERY}
        ),
        probe_cells as (  -- one row per (query, probed cell): keeps the
                          -- candidate join a pure EQUI-join on cell id
            select vec_id, embedding, pc from probes
            , unnest([cell1, cell2]) as t(pc)
        ),
        cand as (
            select q.vec_id as query_id, c.vec_id as neighbour_id,
                   q.embedding as qe, c.embedding as ce
            from probe_cells q
            join assigned c
              on c.cell1 = q.pc and c.vec_id >= {N_QUERY}
        ),
        ranked as (
            select query_id, neighbour_id,
                   cast(floor({_cosine(dialect, 'qe', 'ce')} * 10000 + 0.5)
                        as bigint) as score_e4,
                   row_number() over (
                       partition by query_id
                       order by {_cosine(dialect, 'qe', 'ce')} desc,
                                neighbour_id
                   ) as rank
            from cand
        )
        select query_id, neighbour_id, score_e4, rank
        from ranked where rank <= {K_NEIGHBOURS}
        order by query_id, rank
    """


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_ivf_sql("spark"))


def _label_stats_sql(dialect: str) -> str:
    """Per-label embedding distribution statistics — the aggregation a
    curation pipeline monitors for drift between corpus snapshots:
    element count, fixed-point sum (zeroth moment), position-weighted
    sum (first moment — catches any positional misalignment a plain sum
    would mask), and the min/max element.  Fixed point is the repo's
    floor(x*1e6+0.5) contract (no rounding-mode divergence between
    engines).  Scale shape: posexplode + one hash-shuffle on (label) —
    partial aggregation map-side; 10^12 x 64 elements reduce to
    n_labels rows."""
    if dialect == "spark":
        fp = "cast(floor(cast(e as double) * 1000000 + 0.5) as bigint)"
        ex = ("select label, pos, e from embeddings "
              "lateral view posexplode(embedding) t as pos, e")
    else:
        fp = "cast(floor(cast(e as double) * 1000000 + 0.5) as bigint)"
        # no WITH ORDINALITY in this DuckDB build: position join via
        # generate_series + 1-based list indexing instead
        ex = ("select m.label, s.pos, m.embedding[s.pos + 1] as e "
              "from embeddings m join generate_series(0, 255) s(pos) "
              "on s.pos < len(m.embedding)")
    return f"""
        with ex as ({ex}),
        fp as (select label, pos, {fp} as v from ex)
        select label,
               cast(count(*) as bigint) as n_elems,
               cast(sum(v) as bigint) as sum_fp,
               cast(sum(v * pos) as bigint) as moment_fp,
               cast(min(v) as bigint) as min_fp,
               cast(max(v) as bigint) as max_fp
        from fp
        group by label
        order by label
    """


def q_emb_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_label_stats_sql("spark"))


QUERIES = {
    "emb_knn_brute": q_knn_brute,
    "emb_label_stats": q_emb_label_stats,
    "emb_neardup_pairs": q_neardup,
    "emb_ann_lsh_buckets": q_ann_lsh_buckets,
    "emb_ivf_topk": q_ivf_topk,
}

ORACLES = {
    "emb_knn_brute": _knn_sql("duck"),
    "emb_label_stats": _label_stats_sql("duck"),
    "emb_neardup_pairs": _neardup_sql("duck"),
    "emb_ann_lsh_buckets": _ann_lsh_sql("duck"),
    "emb_ivf_topk": _ivf_sql("duck"),
}
