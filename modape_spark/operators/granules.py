"""Granule-filename regex operators (P6 regex source filters, F6
filename/regex parsers, W6 regex group/sort).

The reference drives its whole collect stage off filename regexes
(/root/reference/modape/constants.py:8-20 REGEX_PATTERNS;
collect.py:93-105 extracts the date/product per granule, asserts a single
product, and sorts by extracted date).  The driver tables carry no
filenames, so the query synthesizes the reference's canonical granule
name deterministically from (doc_id, source) IN SQL, then parses it back
with the same regex family — rlike product filter, regexp_extract of
date/tile/version, group-by the extracted tile and sort by extracted
date.  Everything is a Catalyst expression (pushdown-friendly, codegen'd,
no UDF); the DuckDB oracle runs the identical construction.

Character classes are spelled [0-9] (not ``\\d``) so the pattern text is
escape-identical in both SQL dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import register_views

# reference REGEX_PATTERNS analogues (constants.py:8-20), [0-9] spelling
RE_PRODUCT = "^(VNP|M[OYX]D)[0-9]{2}[A-Z][0-9]"
RE_DATE = "A([0-9]{7})"
RE_TILE = "h[0-9]+v[0-9]+"
RE_VERSION = "[.]([0-9]{3})[.]"  # [.] not \\. — backslash escaping differs per dialect
RE_VIM = "^M[OYX]D13"  # the 'VIM' product filter (constants.py:18)


def _granule_sql(dialect: str) -> str:
    cast_s = (lambda e: f"cast({e} as string)") if dialect == "spark" \
        else (lambda e: f"cast({e} as varchar)")
    rlike = (lambda c, p: f"{c} rlike '{p}'") if dialect == "spark" \
        else (lambda c, p: f"regexp_matches({c}, '{p}')")
    # MXD13A2.A<juldate>.h<xx>v<yy>.006.<ts13>.hdf — collect.py's input shape
    fname = (
        "concat('MXD13A2.A', "
        + cast_s("2002185 + (doc_id % 460) * 8")
        + ", '.h', lpad(" + cast_s("doc_id % 4") + ", 2, '0'), "
        + "'v', lpad(" + cast_s("length(source)") + ", 2, '0'), "
        + "'.006.', " + cast_s("2459000000000 + doc_id") + ", '.hdf')"
    )
    return f"""
        with granules as (
            select doc_id, source, {fname} as filename from documents
        ),
        parsed as (
            select filename,
                   regexp_extract(filename, '{RE_PRODUCT}', 0) as product,
                   regexp_extract(filename, '{RE_DATE}', 1) as rawdate,
                   regexp_extract(filename, '{RE_TILE}', 0) as tile,
                   regexp_extract(filename, '{RE_VERSION}', 1) as version
            from granules
            where {rlike('filename', RE_VIM)}
        )
        select tile, product, version,
               count(*) as n_granules,
               min(rawdate) as first_date,
               max(rawdate) as last_date
        from parsed
        group by tile, product, version
        order by tile, product, version
    """


def q_source_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(_granule_sql("spark"))


QUERIES = {"granule_regex_parse": q_source_regex}
ORACLES = {"granule_regex_parse": _granule_sql("duck")}
