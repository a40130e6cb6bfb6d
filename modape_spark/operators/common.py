"""Shared helpers for the operator suite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# 31-bit Mersenne prime: products of two residues stay < 2^62, safe under
# ANSI int64 arithmetic in BOTH engines.
P31 = 2147483647

# MinHash permutation constants (k=16), deterministic, < P31.
MINHASH_A = [1203077317, 551231021, 1874941193, 994933573, 1726493473,
             333190733, 1387158599, 760291381, 1599564571, 206151983,
             1057963519, 1771570841, 483571613, 917923457, 1306881281, 65537]
MINHASH_B = [926204573, 1442969111, 87741649, 1860539113, 508570397,
             1141923029, 339900839, 1968666427, 74509847, 1349262403,
             693910861, 26174893, 1553171149, 420516131, 1816687969, 257]

N_MINHASH = 16
N_BANDS = 4
BAND_ROWS = 4


# Every operator query calls register_views, and re-reading parquet
# footers + re-registering views per query is driver-side work that
# repeats identically within a session (guide §5: the driver should do
# almost no data work).  The testdata tables are immutable, so views
# registered once per session stay valid; a different sf_dir (or a new
# session) re-registers.  Registration is LAZY per table: each query
# passes the tables its SQL references, so the first query of a session
# reads one footer (~0.13 s each measured), not ten.  The marker is an
# attribute on the session object itself — see below.


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple = TABLES) -> None:
    """Register driver tables as temp views with the same names the
    driver's DuckDB oracle uses, so query text is portable.  Idempotent
    per (session, sf_dir, table): repeat calls are a set lookup, not
    parquet footer reads.  ``tables`` defaults to everything; operator
    queries pass the subset their SQL references.

    Pins the session timezone to UTC: the oracle (DuckDB) treats parquet
    timestamps as naive, so Spark must too regardless of the caller's
    session defaults.
    """
    # marker lives ON the session object: temp views are
    # SparkSession-scoped (a second session over the same context must
    # not skip registration), and an object attribute dies with the
    # session — no id()-reuse or applicationId aliasing hazards
    state = getattr(spark, "_modape_views", None)
    if state is None or state["sf"] != sf_dir:
        state = {"sf": sf_dir, "done": set()}
        spark._modape_views = state
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    missing = [t for t in tables if t not in state["done"]]
    for t in missing:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t in _SPREAD_TABLES:
            df = _spread(spark, df)
        df.createOrReplaceTempView(t)
        state["done"].add(t)


# Tables whose per-row compute dwarfs their bytes (shingle explodes,
# 64-dim folds) AND whose queries aggregate order-independently (integer /
# min-max / count) — safe and valuable to widen.  Float-sum tables
# (lineitem) are NOT spread: their oracle equality relies on a stable
# accumulation order, the same reason their aggregates use fixed-point
# wherever we control the query text.
_SPREAD_TABLES = ("documents", "embeddings")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Widen single-row-group fixture files across the cluster.

    The driver's testdata tables are one parquet row group each, so the
    scan is ONE task no matter the query cost (measured: the whole sf0.1
    minhash pipeline on one core).  A round-robin repartition of these
    tiny tables (<= 1 MB) is a negligible exchange and unlocks full-width
    compute; deterministic filters and column pruning still push through
    the Repartition node to the scan.  On a real many-file table the scan
    already yields >= cores splits and this is a no-op."""
    cores = spark.sparkContext.defaultParallelism
    # FILE count is the metadata-only proxy — no job, and crucially no
    # RDD conversion per view registration (df.rdd forced a full plan
    # translation on every register_views call).  Byte-range split
    # estimates (size / maxPartitionBytes) deliberately do NOT count:
    # row assignment follows row-group starts, so a single-row-group
    # file is ONE task of real work no matter how many byte ranges the
    # scheduler cuts — exactly the fixture pathology this function
    # exists to widen.  The trade-off: a big single-FILE multi-row-group
    # table pays one avoidable round-robin exchange here; acceptable,
    # because _spread only wraps the two compute-heavy tables
    # (documents/embeddings), where single-core compute is strictly
    # worse than an extra shuffle.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= min(cores, 8):
        return df
    return df.repartition(cores)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _spread(spark, df) if name in _SPREAD_TABLES else df


# Cross-engine 32-bit string hash: first 8 hex chars of md5 as int64.
def h32_spark(col: str) -> str:
    return f"cast(conv(substr(md5({col}), 1, 8), 16, 10) as bigint)"


def h32_duck(col: str) -> str:
    return f"('0x' || substring(md5({col}), 1, 8))::bigint"


# 3-word shingles of lowercase whitespace-tokenized text (dedup papers'
# standard w-shingling, Broder 1997), distinct per doc.
#
# The shingle expressions operate on a PRE-MATERIALIZED words array column
# (WORDS_CTE below): inlining split(lower(text)) inside the lambda made
# Spark's interpreted HOF re-evaluate the full split per element access —
# O(words^2) per document, measured 6.4x slower on the sf0.1 corpus.


def words_cte(dialect: str) -> str:
    """doc_id, w (lowercased whitespace tokens) — materialize ONCE."""
    if dialect == "spark":
        return "select doc_id, split(lower(text), ' ') as w from documents"
    return "select doc_id, string_split(lower(text), ' ') as w from documents"


def shingles_spark(w: str = "w") -> str:
    return (
        f"array_distinct(case when size({w}) >= 3 then "
        f"transform(sequence(0, size({w}) - 3), "
        f"i -> concat({w}[i], ' ', {w}[i+1], ' ', {w}[i+2])) "
        f"else array() end)"
    )


def shingles_duck(w: str = "w") -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({w}) - 2, 0)), "
        f"i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2]))"
    )
