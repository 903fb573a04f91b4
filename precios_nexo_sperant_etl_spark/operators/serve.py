"""Serving-layer operators (reference P8, P9, O2-O4 — SURVEY §2.2, §2.7):
the dashboard's filter / search / sort / paginate loop re-expressed as
Spark plans over the published table.

Pagination note for scale: ``offset().limit()`` requires a total order;
Spark pushes the sort + limit down (TakeOrderedAndProject) so small pages
stay cheap even on huge inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equality_filters(df: DataFrame, filters: dict[str, str | None]) -> DataFrame:
    """Dropdown filters (P8, index.html:209-219): empty selection = no-op."""
    for col, val in filters.items():
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df


def global_search(df: DataFrame, query: str,
                  columns: Sequence[str] | None = None) -> DataFrame:
    """Case-insensitive substring search across columns (P9,
    index.html:210,217). The haystack is a single concat_ws over the
    stringified columns — one pass, codegen-friendly, no UDF."""
    cols = list(columns) if columns is not None else df.columns
    haystack = F.lower(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    return df.filter(haystack.contains(query.lower()))


def sort_page(df: DataFrame, order: Sequence[Column], page: int,
              page_size: int) -> DataFrame:
    """Click-header sort + pagination (O2/O4). ``order`` must be a total
    order (include a unique tiebreak) for deterministic pages."""
    return df.orderBy(*order).offset(page * page_size).limit(page_size)


def distinct_sorted(df: DataFrame, col: str) -> DataFrame:
    """Sorted label list for filter combos (O3, index.html:194-201)."""
    return df.select(col).distinct().orderBy(col)


def natural_sort_keys(c: Column) -> list[Column]:
    """Numeric-aware sort keys for unit-number-like strings (O2's
    ``localeCompare(..., {numeric:true})``, index.html:222-234):
    ``A2 < A10`` because the comparison is (lowercased alpha prefix,
    numeric value), not codepoints. Returns the key columns to pass to
    ``orderBy`` — a sort-key *expression*, so the sort itself stays a
    regular Spark range-partitioned sort at any scale."""
    alpha = F.lower(F.regexp_extract(c.cast("string"), r"^([^0-9]*)", 1))
    num = F.regexp_extract(c.cast("string"), r"(\d+)", 1).try_cast("long")
    return [alpha, F.coalesce(num, F.lit(-1)), c.cast("string")]


#: Accent folding for the es primary collation level (ñ handled apart —
#: it is its own letter, not an accented n).
_ES_ACCENTED = "áàâäéèêëíìîïóòôöúùûüç"
_ES_FOLDED = "aaaaeeeeiiiioooouuuuc"


def es_natural_sort_keys(c: Column) -> list[Column]:
    """Spanish-collation numeric-aware sort keys — the full O2 comparator
    (``localeCompare(..., "es", {numeric: true})``, index.html:233), not
    just its numeric half (:func:`natural_sort_keys` covers that part).

    Multi-level keys, mirroring how es collation actually tiebreaks:

    1. PRIMARY: lowercased, accent-folded alpha prefix — with ``ñ``
       expanded to ``n{`` first (``{`` = 0x7B sorts after ``z``), which
       places the ñ section after every ``n…`` word and before ``o``:
       ``anzuelo < añejo < aorta``. ñ is a distinct letter in Spanish,
       NOT an accented n, so it must survive the accent fold.
    2. the numeric value (``A2 < A10``),
    3. SECONDARY: the lowercased unfolded prefix — binary codepoint
       order puts unaccented before accented (``cafe < café``), which is
       exactly es collation's accent tiebreak for Latin-1 vowels,
    4. TERTIARY: the raw string (case + post-number suffix).

    Pure expressions (replace/translate/regexp), so the sort stays a
    regular range-partitioned Spark sort at any scale — no UDF, no
    collator object per row.
    """
    s = c.cast("string")
    prefix = F.regexp_extract(s, r"^([^0-9]*)", 1)
    low = F.lower(prefix)
    primary = F.translate(F.replace(low, F.lit("ñ"), F.lit("n{")),
                          _ES_ACCENTED, _ES_FOLDED)
    num = F.regexp_extract(s, r"(\d+)", 1).try_cast("long")
    return [primary, F.coalesce(num, F.lit(-1)), low, s]


def top_k_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_cols: Sequence[Column], k: int) -> DataFrame:
    """First ``k`` rows per group under a total order, scale-safely.

    A plain ``Window.partitionBy(group).orderBy(...)`` funnels each
    ENTIRE group through one task — a 10 TB stratum becomes a 10 TB
    task. Two phases fix that without changing the answer:

    1. local: rank within (group, physical partition) and keep k — each
       task sorts only its own slice; survivors ≤ k × n_partitions.
    2. global: rank the tiny survivor set within the group and keep k.

    Phase 1's per-partition top-k is a SUPERSET of every group's global
    top-k (any global winner is also a winner of its own partition), so
    the result is deterministic and partitioning-independent even
    though ``spark_partition_id`` itself is not.
    """
    from pyspark.sql import Window

    local = Window.partitionBy(*group_cols, F.spark_partition_id()) \
                  .orderBy(*order_cols)
    survivors = (df.withColumn("_lrn", F.row_number().over(local))
                   .filter(F.col("_lrn") <= k).drop("_lrn"))
    final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (survivors.withColumn("_rn", F.row_number().over(final))
                     .filter(F.col("_rn") <= k).drop("_rn"))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               splits: Sequence[tuple[str, float]] = (
                   ("train", 0.90), ("val", 0.05), ("test", 0.05)),
               n_buckets: int = 10_000, salt: str = "") -> DataFrame:
    """Deterministic train/val/test assignment — the split a training
    run must be able to reproduce years later from nothing but the raw
    ids.

    The bucket is the portable 48-bit md5 id hash (``text.md5_hash`` —
    identical in any engine) mod ``n_buckets``; splits own contiguous
    cumulative ranges, so fractions are honored to 1/n_buckets
    resolution *per id*, independent of partitioning, row order, data
    volume, and engine. ``salt`` re-deals the split without touching
    the data. One narrow projection — no shuffle, no sampling
    nondeterminism (``df.randomSplit`` is seed + partition-layout
    dependent, which is exactly what a reproducible pipeline cannot
    use).
    """
    from .text import md5_hash
    fracs = [f for _, f in splits]
    assert abs(sum(fracs) - 1.0) < 1e-9, "split fractions must sum to 1"
    bucket = md5_hash(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))) % n_buckets
    out = df.withColumn("bucket", bucket)
    cum = 0.0
    expr = None
    for name, frac in splits[:-1]:
        cum += frac
        cond = F.col("bucket") < int(round(cum * n_buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(splits[-1][0]) if expr is not None
            else F.lit(splits[-1][0]))
    return out.withColumn("split", expr)


def stratified_hash_sample(df: DataFrame, rates: dict[str, float],
                           stratum_col: str = "source",
                           id_col: str = "doc_id",
                           n_buckets: int = 10_000, salt: str = "",
                           default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-stratum Bernoulli thinning — the mechanism that
    APPLIES a source-mix decision (down-sample the crawl, keep the books)
    as a pure function of the row's identity, like :func:`hash_split`:
    keep a row iff ``md5_hash(salt || stratum || ':' || id) % n_buckets``
    falls under the stratum's integer threshold ``round(rate·n_buckets)``.

    Partitioning/order/engine-independent and re-dealable via ``salt``;
    thresholds are integers so no float comparison sits on the keep
    boundary. The rate table joins in as a broadcast (strata counts are
    dimension-sized); unknown strata fall back to ``default_rate``. One
    narrow projection + broadcast probe — no shuffle of the fact side.
    """
    from pyspark.sql import functions as F

    from .text import md5_hash
    spark = df.sparkSession
    rtab = spark.createDataFrame(
        [(s, float(r), int(round(r * n_buckets)))
         for s, r in sorted(rates.items())],
        f"{stratum_col} string, target_rate double, _thr long")
    # coalesce: a NULL stratum would null the concat and the comparison,
    # silently dropping the row regardless of default_rate — null strata
    # must flow through the default-rate path like any unknown stratum.
    bucket = md5_hash(F.concat(
        F.lit(salt), F.coalesce(F.col(stratum_col), F.lit("")),
        F.lit(":"), F.col(id_col).cast("string"))) % n_buckets
    dflt = int(round(default_rate * n_buckets))
    return (df.join(F.broadcast(rtab), stratum_col, "left")
              .filter(bucket < F.coalesce(F.col("_thr"), F.lit(dflt)))
              .drop("_thr"))
