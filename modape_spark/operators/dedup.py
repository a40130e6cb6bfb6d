"""Deduplication operators over ``documents``: exact, MinHash+LSH banding,
SimHash, exact n-gram Jaccard.

Scale notes:
- exact dedup: one hash-groupBy (map-side partial agg, single shuffle on the
  content key).
- MinHash/LSH: signatures come from one exploded scan + codegen'd
  min-aggregates (no per-row HOF work); the inline form generates
  candidate pairs by grouping the SINGLE bands relation on
  (band, band_hash) and pairing within buckets — fan-out bounded by band
  collisions, not O(n^2), and the signature pipeline executes exactly
  once (a bands-vs-bands self-join re-ran it per side under Spark's
  per-reference CTE inlining).  The stored/bucketed forms keep the
  bucket JOIN against their materialized signature store — at 10^12
  signatures that join is the deployment shape (zero-exchange when
  bucketed).
- exact Jaccard: shingle explode + self-equi-join on the shingle; quadratic
  only within a shingle's posting list.  Kept as the verifier for LSH
  candidates (and as its own query at small SF).
All are pure Catalyst expressions with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    N_BANDS,
    N_MINHASH,
    P31,
    h32_duck,
    h32_spark,
    register_views,
    shingles_duck,
    shingles_spark,
    words_cte,
)

JACCARD_THRESHOLD = 0.2


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups on a normalized content key (first 8 words)."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql("""
        with keyed as (
            select doc_id,
                   md5(concat_ws(' ', slice(split(lower(text), ' '), 1, 8))) as content_key
            from documents
        )
        select content_key, count(*) as n_dups,
               min(doc_id) as min_doc, max(doc_id) as max_doc
        from keyed
        group by content_key
        having count(*) > 1
        order by n_dups desc, content_key
    """)


ORACLE_EXACT_DEDUP = """
    with keyed as (
        select doc_id,
               md5(array_to_string(string_split(lower(text), ' ')[1:8], ' ')) as content_key
        from documents
    )
    select content_key, count(*) as n_dups,
           min(doc_id) as min_doc, max(doc_id) as max_doc
    from keyed
    group by content_key
    having count(*) > 1
    order by n_dups desc, content_key
"""


def _minhash_sql_spark() -> str:
    """MinHash over a pre-hashed shingle array column ``hs`` (the md5 per
    shingle is computed ONCE, not once per permutation)."""
    els = ", ".join(
        f"array_min(transform(hs, h -> (({a} * h) % {P31} + {b}) % {P31}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"array({els})"


def _minhash_sql_duck() -> str:
    els = ", ".join(
        f"list_min(list_transform(hs, h -> (({a} * h) % {P31} + {b}) % {P31}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"[{els}]"


def _band_hash_scalar(j0: int) -> str:
    """Codegen'd scalar form of the band fold ``aggregate(slice(mh, j0+1,
    BAND_ROWS), 0L, (acc, v) -> (acc*31 + v) % P31)`` over the min columns
    m{j0}..m{j0+3}: integer arithmetic, so the unrolled expression is
    EXACTLY the interpreted fold's value (first step (0*31+v)%P == v since
    every minhash residue < P31), but it runs inside whole-stage codegen
    instead of Spark's interpreted higher-order ``aggregate``."""
    acc = f"cast(m{j0} as bigint)"
    for j in range(j0 + 1, j0 + BAND_ROWS):
        acc = f"((({acc}) * 31 + m{j}) % {P31})"
    return acc


def _bands_cte(mh_expr: str, dialect: str) -> str:
    """doc_id, band, band_hash rows; band hash = fold of the band's rows."""
    if dialect == "spark":
        # one exploded pass + 16 codegen'd min-aggregates (higher-order
        # functions are interpreted in Spark; a groupBy-min over the
        # exploded shingle hashes stays in whole-stage codegen and scans
        # the shingles ONCE for all permutations).  The per-shingle md5
        # runs as a SCALAR expression on the exploded rows — round-1..5
        # hashed inside an interpreted ``transform`` lambda over the
        # shingle array, which (a) ran interpreted and (b) was inlined by
        # Catalyst into the Generate's pushed-down null/size Filter, so
        # the whole md5 pipeline evaluated TWICE per row (plan audit,
        # plans/r06/docs_minhash_lsh_before.txt operators (2)/(5)); the
        # exploded scalar form hashes each shingle exactly once, in
        # codegen.  Band hashes are unrolled scalars for the same reason.
        mins = ", ".join(
            f"min((({a} * h) % {P31} + {b}) % {P31}) as m{j}"
            for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
        )
        arr = ", ".join(f"m{j}" for j in range(N_MINHASH))
        band_structs = ", ".join(
            f"named_struct('band', {b}, 'bh', {_band_hash_scalar(b * BAND_ROWS)})"
            for b in range(N_BANDS)
        )
        return f"""
            words as ({words_cte("spark")}),
            exploded as (
                -- OUTER explode: a plain explode makes Catalyst INFER
                -- ``size(shs) > 0 AND isnotnull(shs)`` and push both down,
                -- inlining the whole interpreted shingle transform into
                -- the pre-exchange scan filter (measured 8 s single-task
                -- at sf0.1 vs <1 s for the projection itself); outer
                -- generates are exempt from that inference, and the
                -- ``size(w) >= 3`` filter guarantees shs is non-empty, so
                -- outer emits exactly the same rows
                select doc_id, s.col as sh
                from (
                    select doc_id, {shingles_spark()} as shs
                    from words
                    where size(w) >= 3
                ) lateral view outer explode(shs) s as col
            ),
            hashed as (select doc_id, {h32_spark('sh')} % {P31} as h
                       from exploded),
            mins as (select doc_id, {mins} from hashed group by doc_id),
            bands as (
                select doc_id, array({arr}) as mh, b.band as band,
                       b.bh as band_hash
                from mins lateral view explode(array({band_structs})) t as b
            )
        """
    fold = (
        f"list_reduce(list_prepend(0, mh[band * {BAND_ROWS} + 1 : "
        f"band * {BAND_ROWS} + {BAND_ROWS}]), (acc, v) -> (acc * 31 + v) % {P31})"
    )
    return f"""
        words as ({words_cte("duck")}),
        hashed as (
            select doc_id,
                   list_transform({shingles_duck()}, s -> {h32_duck('s')} % {P31}) as hs
            from words
            where len(w) >= 3
        ),
        sigs as (select doc_id, {mh_expr} as mh from hashed),
        bands as (
            select doc_id, mh, band, {fold} as band_hash
            from sigs, (select unnest(generate_series(0, {N_BANDS - 1})) as band)
        )
    """


def _pairs_select(dialect: str) -> str:
    """Shared final projection over a ``cand`` (da, db, mha, mhb)
    relation — ONE definition for the grouped inline tail AND the
    stored/bucketed join tail, so the n_equal/est_jaccard semantics
    cannot drift between the forms that share a DuckDB oracle."""
    if dialect == "spark":
        n_eq = f"size(filter(sequence(0, {N_MINHASH - 1}), i -> mha[i] = mhb[i]))"
    else:
        n_eq = f"len(list_filter(generate_series(1, {N_MINHASH}), i -> mha[i] = mhb[i]))"
    return f"""
        select da as doc_a, db as doc_b,
               {n_eq} as n_equal_minhash,
               {n_eq} * {10000 // N_MINHASH} as est_jaccard_e4
        from cand
        order by doc_a, doc_b
    """


def _pairs_tail_sql(dialect: str, src: str = "bands") -> str:
    """The candidate-pair tail over a bands relation ``src``
    (doc_id, mh, band, band_hash)."""
    return f"""
        cand as (
            select x.doc_id as da, y.doc_id as db,
                   first(x.mh) as mha, first(y.mh) as mhb
            from {src} x join {src} y
              on x.band = y.band and x.band_hash = y.band_hash
             and x.doc_id < y.doc_id
            group by x.doc_id, y.doc_id
        ){_pairs_select(dialect)}"""


def _pairs_tail_grouped_spark() -> str:
    """Spark-only candidate-pair tail: bucket members gathered with ONE
    groupBy on (band, band_hash) + in-bucket pairing, instead of the
    bands-vs-bands self-join.  Spark inlines CTEs per reference, so the
    round-5 self-join executed the whole shingle->md5->min pipeline once
    per join side (plans/r06/docs_minhash_lsh_before.txt: two full scan
    subtrees, zero ReusedExchange); grouping the SINGLE bands relation by
    bucket runs the pipeline exactly once.  (A persist()+count
    materialization was tried in round 1 and measured 2x slower — the
    cache-build barrier serializes work; the groupBy form has no barrier
    and no cache.)  In-bucket pair fan-out is the same m^2 the join
    produced, bounded by band collisions.  Identical rows: same pair
    multiset -> same group-by + first() dedup.

    Skew limit, stated honestly: collect_list gathers a bucket into ONE
    array row, which cannot spill mid-row -- a pathologically hot band
    bucket (a corpus that is mostly copies of one document) that a
    sort-merge join could stream/spill might OOM here.  This inline form
    is the small/medium-corpus entry; a skewed deployment uses
    docs_minhash_lsh_stored / _bucketed, which keep the JOIN tail
    against the materialized signature store (zero-exchange in the
    bucketed form)."""
    return f"""
        buckets as (
            select band, band_hash,
                   collect_list(struct(doc_id, mh)) as ms
            from bands
            group by band, band_hash
        ),
        pairs as (
            select a.doc_id as da, b.doc_id as db, a.mh as mha, b.mh as mhb
            from buckets
            lateral view explode(ms) ta as a
            lateral view explode(ms) tb as b
            where a.doc_id < b.doc_id
        ),
        cand as (
            select da, db, first(mha) as mha, first(mhb) as mhb
            from pairs
            group by da, db
        ){_pairs_select("spark")}"""


def _minhash_pairs_sql(dialect: str) -> str:
    """Bands relation + candidate-pair tail.  The Spark form computes the
    signature pipeline ONCE (grouped tail, _pairs_tail_grouped_spark);
    the DuckDB oracle keeps the self-join formulation (DuckDB
    materializes CTEs, so its pipeline also runs once)."""
    mh = _minhash_sql_spark() if dialect == "spark" else _minhash_sql_duck()
    bands = _bands_cte(mh, dialect)
    if dialect == "spark":
        return f"with {bands}, {_pairs_tail_grouped_spark()}"
    return f"with {bands}, {_pairs_tail_sql(dialect)}"


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_minhash_pairs_sql("spark"))


def q_minhash_lsh_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10^12-row form of the LSH pair query: the signature/bands
    relation is WRITTEN once as a parquet table (the signature store
    every production dedup system keeps next to the corpus), so the
    shingle->md5->min pipeline executes exactly ONCE; the candidate
    self-join then reads the cheap stored table on both sides.  Plain
    parquet carries no bucketing metadata, so the join still shuffles
    both scan sides on (band, band_hash) — shuffling the compact
    signature rows, not recomputing the pipeline; a deployment with a
    catalog writes the store ``bucketBy(band, band_hash)`` and loses
    that exchange too.  Identical rows to docs_minhash_lsh (same DuckDB
    oracle); this entry exists so the stored-table plan sits under the
    driver's value-hash check."""
    import tempfile

    register_views(spark, sf_dir, ("documents",))
    # every call's store lives until interpreter exit: a lazy DataFrame
    # returned by an EARLIER call may be executed after a later call, so
    # no store is reaped mid-session (the stores are small signature
    # tables; atexit below owns cleanup)
    tmp = tempfile.mkdtemp(prefix="modape_sigstore_")
    _SIGSTORE_DIRS.append(tmp)
    n_files = max(2, spark.sparkContext.defaultParallelism // 4)
    spark.sql(
        f"with {_bands_cte(_minhash_sql_spark(), 'spark')} "
        "select doc_id, mh, band, band_hash from bands"
    ).repartition(n_files, "band") \
        .write.mode("overwrite").parquet(f"{tmp}/bands")
    spark.read.parquet(f"{tmp}/bands") \
        .createOrReplaceTempView("bands_stored")
    return spark.sql(f"with {_pairs_tail_sql('spark', 'bands_stored')}")


def q_minhash_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The catalog form of the signature store: the bands relation is
    written ONCE as a bucketed+sorted managed table
    (``bucketBy(N, band, band_hash).sortBy(...)``) — the layout a
    production deployment keeps next to the corpus.  Because the
    candidate self-join's keys are exactly the bucket keys, BOTH join
    sides read bucket-aligned files with NO Exchange and (one file per
    bucket) no Sort: the only shuffles left in the whole query are the
    post-join pair aggregation — at 10^12 signatures the join cost is a
    co-located merge, not a 2x table shuffle.  Works against the plain
    spark-warehouse catalog; no Iceberg needed.  Identical rows to
    docs_minhash_lsh (same DuckDB oracle); plan pinned by
    tests/test_streaming_and_plans.py."""
    import tempfile

    from pyspark.sql import functions as F

    register_views(spark, sf_dir, ("documents",))
    tmp = tempfile.mkdtemp(prefix="modape_sigbucket_")
    _SIGSTORE_DIRS.append(tmp)
    name = f"modape_sig_bands_v{len(_SIGSTORE_DIRS)}"
    spark.sql(f"drop table if exists {name}")
    n_buckets = max(4, spark.sparkContext.defaultParallelism // 4)
    bands = spark.sql(
        f"with {_bands_cte(_minhash_sql_spark(), 'spark')} "
        "select doc_id, mh, band, band_hash from bands"
    )
    # pre-partition on the bucket keys so every write task holds exactly
    # one bucket (repartition and bucketBy share the Murmur3 hash) ->
    # one file per bucket -> Spark trusts the sortBy order at read time
    (bands.repartition(n_buckets, F.col("band"), F.col("band_hash"))
     .write.bucketBy(n_buckets, "band", "band_hash")
     .sortBy("band", "band_hash")
     .option("path", f"{tmp}/bands")
     .mode("overwrite").format("parquet").saveAsTable(name))
    return spark.sql(f"with {_pairs_tail_sql('spark', name)}")


_SIGSTORE_DIRS: list = []
# the LAST store must outlive the returned lazy DataFrame (the driver
# collects it later), so it is reaped at interpreter exit, not here
import atexit as _atexit  # noqa: E402
import shutil as _shutil  # noqa: E402

def _reap_sigstores() -> None:
    # drop the catalog ENTRIES too, not just the backing dirs: with a
    # persistent warehouse/metastore a stale table pointing at a deleted
    # path would survive across sessions (ADVICE r4)
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            for i in range(len(_SIGSTORE_DIRS)):
                try:
                    spark.sql(f"drop table if exists modape_sig_bands_v{i + 1}")
                except Exception:
                    pass
    except Exception:
        pass
    for d in _SIGSTORE_DIRS:
        _shutil.rmtree(d, ignore_errors=True)


_atexit.register(_reap_sigstores)


def _simhash_sql(dialect: str) -> str:
    """16-bit SimHash (Charikar 2002) per document from shingle hashes.

    Words materialized once (see common.words_cte) and the per-shingle md5
    computed ONCE in the explode — not 16x inside the bit sums."""
    if dialect == "spark":
        # outer explode + explicit null guard: dodges Catalyst's
        # InferFiltersFromGenerate, which inlines the full interpreted
        # shingle transform into the pre-exchange scan filter (see
        # _bands_cte).  Shingle strings are never null (concat of array
        # elements), so ``s.col is null`` marks exactly the synthetic
        # rows outer emits for empty shingle arrays — dropping them
        # reproduces the inner explode's rows bit-for-bit.
        explode = (
            f"select doc_id, {h32_spark('s.col')} as hv from "
            f"(select doc_id, {shingles_spark()} as shs "
            f"from ({words_cte('spark')})) lateral view outer explode(shs) "
            f"s as col where s.col is not null"
        )
        bit_sums = ", ".join(
            f"sum(case when shiftright(hv, {k}) % 2 = 1 then 1 else -1 end) as b{k}"
            for k in range(16)
        )
    else:
        explode = (
            f"select doc_id, {h32_duck('sh_h')} as hv from "
            f"(select doc_id, unnest({shingles_duck()}) as sh_h "
            f"from ({words_cte('duck')}))"
        )
        bit_sums = ", ".join(
            f"sum(case when (hv >> {k}) % 2 = 1 then 1 else -1 end) as b{k}"
            for k in range(16)
        )
    fp = " + ".join(f"(case when b{k} > 0 then {1 << k} else 0 end)" for k in range(16))
    return f"""
        with sh as ({explode}),
        bits as (select doc_id, {bit_sums} from sh group by doc_id)
        select doc_id, {fp} as simhash16
        from bits
        order by doc_id
    """


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_simhash_sql("spark"))


_SIMHASH_HAMMING_MAX = 3


def _simhash_pairs_sql(dialect: str, hmax: int = _SIMHASH_HAMMING_MAX) -> str:
    """Near-duplicate pairs by SimHash hamming distance <= 3 (bit_count of
    the XOR — both engines provide bit_count natively).

    Scale path: the 16-bit fingerprint is split into 4 bands of 4 bits.
    By pigeonhole, hamming <= 3 implies at least one band is bit-equal, so
    an equi-join on (band_id, band_val) generates a guaranteed superset of
    the qualifying pairs — shuffle is bounded by band-bucket collisions,
    never the O(n^2) cross product.  The exact hamming filter then makes
    the output identical to the all-pairs formulation."""
    if hmax > N_BANDS - 1:
        raise ValueError(
            f"hmax={hmax}: the {N_BANDS}-band pigeonhole candidate join is "
            f"a guaranteed superset only for hamming <= {N_BANDS - 1}"
        )
    inner = _simhash_sql(dialect).replace("order by doc_id", "")
    if dialect == "spark":
        ham = "bit_count(sha ^ shb)"
        band_src = "sh16 lateral view explode(array(0, 1, 2, 3)) t as band_id"
        band_val = "cast(shiftright(simhash16, band_id * 4) & 15 as int)"
    else:
        ham = "bit_count(cast(xor(sha, shb) as bigint))"
        band_src = "sh16, unnest([0, 1, 2, 3]) as t(band_id)"
        band_val = "(simhash16 >> (band_id * 4)) & 15"
    return f"""
        with sh16 as ({inner}),
        banded as (
            select doc_id, simhash16, band_id, {band_val} as band_val
            from {band_src}
        ),
        cand as (
            select distinct a.doc_id as doc_a, b.doc_id as doc_b,
                   a.simhash16 as sha, b.simhash16 as shb
            from banded a join banded b
              on a.band_id = b.band_id and a.band_val = b.band_val
                 and a.doc_id < b.doc_id
        )
        select doc_a, doc_b, {ham} as hamming
        from cand
        where {ham} <= {hmax}
        order by doc_a, doc_b
    """


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_simhash_pairs_sql("spark"))


def _jaccard_sql(dialect: str) -> str:
    """Per-doc shingle counts ride the posting-list rows (window count)
    instead of a separate counts CTE — joining counts back re-ran the
    whole explode pipeline twice more under Spark's per-reference CTE
    inlining (4 scans -> 2).  Integer fixed-point throughout: no float
    rounding-mode divergence."""
    div = ("c * 10000 div (na + nb - c)" if dialect == "spark"
           else "c * 10000 // (na + nb - c)")
    if dialect == "spark":
        # outer explode + null guard: same InferFiltersFromGenerate dodge
        # as _bands_cte / _simhash_sql, identical rows (shingles are
        # never null, so the guard removes only the outer-emitted rows
        # of empty shingle arrays)
        explode = (
            f"select doc_id, s.col as sh from (select doc_id, "
            f"{shingles_spark()} as shs from ({words_cte('spark')})) "
            f"lateral view outer explode(shs) s as col "
            f"where s.col is not null"
        )
    else:
        explode = (
            f"select doc_id, unnest({shingles_duck()}) as sh "
            f"from ({words_cte('duck')})"
        )
    return f"""
        with shingled as ({explode}),
        sh_n as (
            select doc_id, sh,
                   count(*) over (partition by doc_id) as n
            from shingled
        ),
        common as (
            select a.doc_id as da, b.doc_id as db, count(*) as c,
                   first(a.n) as na, first(b.n) as nb
            from sh_n a join sh_n b
              on a.sh = b.sh and a.doc_id < b.doc_id
            group by a.doc_id, b.doc_id
        )
        select da as doc_a, db as doc_b,
               c as n_common,
               (na + nb - c) as n_union,
               {div} as jaccard_e4
        from common
        where 5 * c >= (na + nb - c)   -- jaccard >= 0.2, exact integers
        order by doc_a, doc_b
    """


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_jaccard_sql("spark"))


def _cross_check_sql(dialect: str) -> str:
    """Cross-modal dedup verification: MinHash LSH candidate pairs
    re-scored by embedding cosine (documents.doc_id == embeddings.vec_id in
    the driver tables) — the standard 'cheap recall, exact verify' dedup
    pipeline shape for training data."""
    pairs = _minhash_pairs_sql(dialect)
    if dialect == "spark":
        dot = ("aggregate(zip_with(ea.embedding, eb.embedding, "
               "(x, y) -> cast(x as double) * cast(y as double)), "
               "cast(0.0 as double), (acc, v) -> acc + v)")
        na = ("sqrt(aggregate(zip_with(ea.embedding, ea.embedding, "
              "(x, y) -> cast(x as double) * cast(y as double)), "
              "cast(0.0 as double), (acc, v) -> acc + v))")
        nb = ("sqrt(aggregate(zip_with(eb.embedding, eb.embedding, "
              "(x, y) -> cast(x as double) * cast(y as double)), "
              "cast(0.0 as double), (acc, v) -> acc + v))")
    else:
        def d(u, v):
            return (f"list_reduce(list_prepend(0.0, list_transform("
                    f"generate_series(1, 64), i -> {u}.embedding[i]::double"
                    f" * {v}.embedding[i]::double)), (acc, v) -> acc + v)")
        dot = d("ea", "eb")
        na = f"sqrt({d('ea', 'ea')})"
        nb = f"sqrt({d('eb', 'eb')})"
    return f"""
        with cand_pairs as ({pairs})
        select p.doc_a, p.doc_b, p.est_jaccard_e4,
               cast(floor(({dot} / ({na} * {nb})) * 10000 + 0.5) as bigint)
                   as emb_cosine_e4
        from cand_pairs p
        join embeddings ea on ea.vec_id = p.doc_a
        join embeddings eb on eb.vec_id = p.doc_b
        order by doc_a, doc_b
    """


def q_dedup_cross_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents", "embeddings"))
    return spark.sql(_cross_check_sql("spark"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTER formation: connected components over the
    SimHash pair graph — the step a real dedup pipeline needs after pair
    generation (keep min doc_id per component as the representative).

    Cluster labels come from the alternating large-star/small-star
    algorithm (operators/components.py, Kiveris et al. SoCC 2014):
    O(log n) rounds on any graph — including the long-chain components
    where plain min-label propagation needs O(diameter) full-edge
    shuffles — with convergence checked every k rounds by a single
    signature aggregation, never a per-round join + count."""
    from pyspark.sql import functions as F

    from .components import connected_components

    from ..plans.partitioning import ordered_result

    register_views(spark, sf_dir, ("documents",))
    pairs = spark.sql(_simhash_pairs_sql("spark", hmax=1)) \
        .select("doc_a", "doc_b")
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    return ordered_result(
        labels.select(F.col("node").alias("doc_id"),
                      F.col("label").alias("cluster_rep")), "doc_id")


# min reachable doc_id per node == min-label fixpoint (recursive CTE)
def _clusters_oracle() -> str:
    pairs = _simhash_pairs_sql("duck", hmax=1)
    return f"""
        with recursive pairs as ({pairs}),
        edges as (
            select doc_a as a, doc_b as b from pairs
            union
            select doc_b as a, doc_a as b from pairs
        ),
        reach(node, root) as (
            select a, a from (select distinct a from edges)
            union
            select e.b, r.root from reach r join edges e on e.a = r.node
        )
        select node as doc_id, min(root) as cluster_rep
        from reach
        group by node
        order by doc_id
    """


QUERIES = {
    "docs_exact_dedup": q_exact_dedup,
    "docs_dedup_clusters": q_dedup_clusters,
    "dedup_cross_check": q_dedup_cross_check,
    "docs_minhash_lsh": q_minhash_lsh,
    "docs_minhash_lsh_stored": q_minhash_lsh_stored,
    "docs_minhash_lsh_bucketed": q_minhash_lsh_bucketed,
    "docs_simhash": q_simhash,
    "docs_simhash_pairs": q_simhash_pairs,
    "docs_ngram_jaccard": q_ngram_jaccard,
}

ORACLES = {
    "docs_exact_dedup": ORACLE_EXACT_DEDUP,
    "docs_dedup_clusters": _clusters_oracle(),
    "dedup_cross_check": _cross_check_sql("duck"),
    "docs_minhash_lsh": _minhash_pairs_sql("duck"),
    "docs_minhash_lsh_stored": _minhash_pairs_sql("duck"),
    "docs_minhash_lsh_bucketed": _minhash_pairs_sql("duck"),
    "docs_simhash": _simhash_sql("duck"),
    "docs_simhash_pairs": _simhash_pairs_sql("duck"),
    "docs_ngram_jaccard": _jaccard_sql("duck"),
}
