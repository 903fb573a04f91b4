"""Join operators (reference J1-J4 — SURVEY §2.3).

The reference's core is one LEFT equi-join of a big fact against a small,
pre-deduplicated dimension. In Spark that is a *broadcast hash join*: the
deduped dimension ships to every executor and the 100 TB probe side never
shuffles. ``left_enrich`` broadcasts explicitly; AQE will still demote to
sort-merge if the build side outgrows the threshold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def left_enrich(left: DataFrame, right: DataFrame, on: Sequence[str],
                broadcast_right: bool = True) -> DataFrame:
    """LEFT equi-join preserving left cardinality (J1, APN:368-370).

    Caller guarantees ``right`` is unique on ``on`` (see
    :func:`..dedup.dedup_keep_latest`) so every left row matches
    exactly-one-or-zero build rows.
    """
    r = broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on), how="left")


def match_flags(enriched: DataFrame, marker: str,
                match_col: str = "tiene_match",
                no_match_col: str = "Sin_Match") -> DataFrame:
    """Left-semi membership flag + complement (J2, APN:422-425).

    ``marker`` is any right-side column that is non-null for every build
    row (e.g. the join key echoed from the right) — cheaper than a second
    semi-join pass over the fact table.
    """
    return (enriched
            .withColumn(match_col, F.col(marker).isNotNull())
            .withColumn(no_match_col, ~F.col(match_col)))


def key_set_difference(a: DataFrame, b: DataFrame, a_key: str, b_key: str) -> DataFrame:
    """Distinct keys present in ``a`` but not ``b`` (J4, APN:467-470).

    A left-anti join on distinct keys — both sides reduce before the join,
    so this stays cheap at any scale.
    """
    left = a.select(F.col(a_key).alias("key")).distinct()
    right = b.select(F.col(b_key).alias("key")).distinct()
    return left.join(right, on="key", how="left_anti").orderBy("key")


def salted_left_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                     n_salts: int = 8,
                     salt_source: str | None = None) -> DataFrame:
    """Skew-resistant LEFT equi-join: hot join keys are spread across
    ``n_salts`` reducers.

    The left side gets a deterministic salt (hash of ``salt_source``, a
    high-cardinality left column — any unique-ish id works); the right
    side is replicated once per salt value, so every (key, salt) pair
    still finds its match. Semantically identical to a plain left join
    (verified by test), physically it splits a mega-key's rows across
    ``n_salts`` tasks instead of one straggler. Use when the build side
    is too big to broadcast AND keys are skewed beyond what AQE's
    skew-join splitting handles.
    """
    keys = list(on)
    if salt_source is not None:
        src = F.col(salt_source)
    else:
        # The salt must VARY WITHIN a join key — salting by the key
        # itself would map a hot key's rows to one salt and change
        # nothing. Default: hash every left column, so only fully
        # identical rows share a salt.
        src = F.concat_ws("\x1f", *[F.col(c).cast("string")
                                    for c in left.columns])
    l_salted = left.withColumn("_salt", F.pmod(F.hash(src), F.lit(n_salts)))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return (l_salted.join(r_salted, on=keys + ["_salt"], how="left")
                    .drop("_salt"))


def before_after(before: DataFrame, after: DataFrame, on: Sequence[str],
                 suffixes: tuple[str, str] = ("_Antes", "_Despues")) -> DataFrame:
    """Inner self-join aligning pre/post snapshots (J3, APN:473-476).

    Non-key columns get pandas-merge-style suffixes.
    """
    b_sfx, a_sfx = suffixes
    keys = list(on)
    b = before.select(*keys, *[F.col(c).alias(c + b_sfx)
                               for c in before.columns if c not in keys])
    a = after.select(*keys, *[F.col(c).alias(c + a_sfx)
                              for c in after.columns if c not in keys])
    return b.join(a, on=keys, how="inner")


def blocked_fuzzy_pairs(names: DataFrame, name_col: str,
                        block_expr: str, max_dist: int = 4) -> DataFrame:
    """Record-linkage candidate matching: blocked edit-distance self-join
    (Fellegi-Sunter blocking, the classic entity-resolution shape).
    ``names`` should already be DISTINCT on ``name_col`` — fuzzy-match the
    dictionary, not the fact rows (the fact table re-attaches by equi-join
    afterwards). ``block_expr`` is a SQL expression over ``name_col``
    producing the blocking key; only within-block pairs are compared, so
    candidate cost is Σ block² — the same bounded-bucket shape as the LSH
    banding in ``dedup_fuzzy`` — and never the n² cross join.

    Output: ``(name_a, name_b, dist)`` for pairs with Levenshtein
    distance ≤ ``max_dist``, ``name_a < name_b``. ``levenshtein`` is
    unit-cost edit distance in both Spark and DuckDB, so the operator is
    oracle-exact. At 100 TB dictionary scale, swap the single blocking
    key for multi-pass blocking (several cheap keys, union of candidate
    sets) — same plan shape per pass.
    """
    s = names.select(F.col(name_col).alias("nm"),
                     F.expr(block_expr.replace(name_col, "nm"))
                      .alias("blk"))
    a, b = s.alias("a"), s.alias("b")
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.nm") < F.col("b.nm")))
             .select(F.col("a.nm").alias("name_a"),
                     F.col("b.nm").alias("name_b"),
                     F.levenshtein("a.nm", "b.nm").alias("dist"))
             .filter(F.col("dist") <= max_dist)
             .orderBy("name_a", "name_b"))
