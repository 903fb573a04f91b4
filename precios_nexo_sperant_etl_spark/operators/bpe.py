"""Distributed BPE (byte-pair-encoding) vocabulary learning — the
tokenizer-prep step of a training-data pipeline (Sennrich et al. 2016).

Scale shape — the part that matters at 100 TB: the corpus is touched
ONCE, by the word-frequency aggregation (one combinable shuffle). Every
merge round after that runs on the DISTINCT-WORD table (vocab-sized,
millions of rows, not corpus-sized): adjacent-pair counts weighted by
word frequency, a global argmax (tiny), and a narrow string rewrite.
That is exactly how production BPE trainers stay tractable; Spark gets
it by construction because the rounds never re-read the corpus.

Determinism: the argmax tie-break is (count DESC, pair lexicographic
ASC) over binary collation; the merge application is defined as a
TWO-PASS non-overlapping left-to-right ``replace`` on the
space-joined symbol string (pass 2 rescues occurrences whose shared
boundary space pass 1 consumed). For non-degenerate pairs this equals
classic greedy BPE pairing; for self-adjacent chains (``a a a a a``
with pair ``(a, a)``) it is a fixed, documented variant — what matters
for the oracle is that ``replace`` has identical semantics in Spark SQL
and DuckDB, so the whole merge table is value-hash-checkable round by
round (same unrolled-CTE pattern as the k-means Lloyd oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _apply_merge(s: str, p1: str, p2: str) -> str:
    """SQL expression applying merge (p1, p2) to symbol string col ``s``
    via the two-pass padded replace. Literals are embedded; callers must
    ensure the symbols contain no single quotes (token alphabets here
    are whitespace-free words, enforced below)."""
    pat = f"' ' || '{p1}' || ' ' || '{p2}' || ' '"
    rep = f"' ' || '{p1}' || '{p2}' || ' '"
    one = f"replace(' ' || {s} || ' ', {pat}, {rep})"
    two = f"replace({one}, {pat}, {rep})"
    return f"trim({two})"


def bpe_learn(docs: DataFrame, n_merges: int = 6,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(round, p1, p2, merged, pair_count)``.

    Driver involvement per round is one 1-row collect (the argmax pair)
    — the same k×1 pattern as ``assign_kmeans_cells``'s centroids; all
    counting and rewriting is distributed.

    Regime note: each round appends two ``replace`` calls to the symbol
    expression and pays one pair-count aggregation, so this shape is
    right for merge counts up to the low hundreds (analysis, ablations,
    small vocabs). A full 32k-merge production vocab needs the
    incremental pair-cache algorithm (only counts touching the merged
    pair change per round) — a different driver loop over the same
    distributed primitives, out of scope here and documented so nobody
    scales this one silently.
    """
    spark = docs.sparkSession
    words = (docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
                 .filter(F.col("w") != "")
                 .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    cur = words.select(
        "cnt",
        F.array_join(F.expr("regexp_extract_all(w, '.', 0)"), " ").alias("s"))
    cur = cur.localCheckpoint(eager=True)  # corpus touched once, here

    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(n_merges):
        sp = F.split(F.col("s"), " ")
        pairs = (cur.filter(F.size(sp) >= 2)
                    .select("cnt",
                            F.explode(F.arrays_zip(
                                F.slice(sp, 1, F.size(sp) - 1).alias("p1"),
                                F.slice(sp, 2, F.size(sp) - 1).alias("p2")))
                             .alias("pr"))
                    .select("cnt", F.col("pr.p1").alias("p1"),
                            F.col("pr.p2").alias("p2")))
        best = (pairs.groupBy("p1", "p2")
                     .agg(F.sum("cnt").alias("c"))
                     .orderBy(F.desc("c"), F.asc("p1"), F.asc("p2"))
                     .limit(1).collect())
        if not best:
            break  # vocabulary fully merged (tiny corpora only)
        b = best[0]
        # Quotes would break the embedded SQL literal outright; a
        # backslash is worse — Spark's F.expr parses C-style escapes in
        # string literals while DuckDB takes them literally, so the two
        # engines would silently apply DIFFERENT merges. Fail loud on
        # both rather than mis-merge.
        if any(ch in b["p1"] + b["p2"] for ch in ("'", "\\")):
            raise ValueError(
                "symbol contains a quote or backslash; corpus not supported")
        merges.append((r, b["p1"], b["p2"], b["p1"] + b["p2"], b["c"]))
        cur = cur.select(
            "cnt", F.expr(_apply_merge("s", b["p1"], b["p2"])).alias("s"))
        # Lineage stays R string-rewrites deep at most (R = n_merges,
        # single digits) — no checkpoint needed inside the loop.
    return spark.createDataFrame(
        merges, "round int, p1 string, p2 string, merged string, "
                "pair_count bigint")


def duck_bpe_ctes(n_merges: int = 6,
                  duck_tokens: str =
                  "string_split_regex(trim(text), '\\s+')"
                  ) -> tuple[list[str], str]:
    """Shared unrolled-round CTE prefix for the BPE oracles: the
    word-frequency base and each round's pair-count → argmax → two-pass
    replace (pairs zipped via parallel unnest of shifted list slices).
    Returns ``(ctes, final_symbol_cte)``; each ``s{r}`` CTE carries
    ``(w, cnt, s)`` so both the training and the encode oracle can
    consume it."""
    ctes = [f"""w0 AS (
  SELECT w, COUNT(*) AS cnt
  FROM (SELECT unnest({duck_tokens}) AS w FROM documents)
  WHERE w <> '' GROUP BY w)""",
            """s0 AS (
  SELECT w, cnt, array_to_string(regexp_extract_all(w, '.'), ' ') AS s
  FROM w0)"""]
    for r in range(n_merges):
        ctes.append(f"""p{r} AS (
  SELECT p1, p2, SUM(cnt) AS c FROM (
    SELECT cnt,
           unnest(sp[1 : len(sp) - 1]) AS p1,
           unnest(sp[2 : len(sp)]) AS p2
    FROM (SELECT cnt, string_split(s, ' ') AS sp FROM s{r})
    WHERE len(sp) >= 2)
  GROUP BY p1, p2)""")
        ctes.append(f"""b{r} AS (
  SELECT p1, p2, c FROM p{r} ORDER BY c DESC, p1 ASC, p2 ASC LIMIT 1)""")
        pat = "' ' || b.p1 || ' ' || b.p2 || ' '"
        rep = "' ' || b.p1 || b.p2 || ' '"
        ctes.append(f"""s{r + 1} AS (
  SELECT w, cnt,
         trim(replace(replace(' ' || s || ' ', {pat}, {rep}),
                      {pat}, {rep})) AS s
  FROM s{r} CROSS JOIN b{r} b)""")
    return ctes, f"s{n_merges}"


def duck_bpe_sql(n_merges: int = 6,
                 duck_tokens: str =
                 "string_split_regex(trim(text), '\\s+')") -> str:
    """DuckDB twin of :func:`bpe_learn` (the merge table)."""
    ctes, _ = duck_bpe_ctes(n_merges, duck_tokens)
    # CAST: DuckDB's SUM over integers widens to HUGEINT; the Spark side
    # emits BIGINT (`pair_count bigint` in bpe_learn's schema). The
    # driver's value-hash is type-sensitive, so pin the oracle type.
    rows = "\nUNION ALL ".join(
        f"SELECT {r} AS round, p1, p2, p1 || p2 AS merged, "
        f"CAST(c AS BIGINT) AS pair_count "
        f"FROM b{r}" for r in range(n_merges))
    return "WITH " + ",\n".join(ctes) + f"\n{rows}\nORDER BY round"


def bpe_encode_counts(docs: DataFrame, n_merges: int = 6,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Apply the corpus's own learned merges back to it — the encode
    side of the tokenizer: per-document whitespace-token and BPE-token
    budgets ``(doc_id, n_ws_tokens, n_bpe_tokens)``.

    Scale shape: training touches the corpus once (see
    :func:`bpe_learn`); encoding rebuilds the DISTINCT-WORD symbol
    table (vocab-sized, the merge chain applied as ``n_merges`` static
    string rewrites), then one explode + broadcast join + combinable
    agg over the corpus. Per-token work is a hash probe — no per-row
    Python, no shuffle beyond the final agg.
    """
    merges = bpe_learn(docs, n_merges=n_merges,
                       text_col=text_col).collect()
    words = (docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
                 .filter(F.col("w") != "").distinct())
    sym = "array_join(regexp_extract_all(w, '.', 0), ' ')"
    for m in merges:
        sym = _apply_merge(sym, m["p1"], m["p2"])
    wtab = words.select("w", F.size(F.split(F.expr(sym), " "))
                        .alias("n_sym"))
    toks = (docs.select(F.col(id_col),
                        F.explode(tokens(F.col(text_col))).alias("w"))
                .filter(F.col("w") != ""))
    return (toks.join(F.broadcast(wtab), "w")
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_ws_tokens"),
                     F.sum("n_sym").alias("n_bpe_tokens"))
                .orderBy(id_col))


def duck_bpe_encode_sql(n_merges: int = 6,
                        duck_tokens: str =
                        "string_split_regex(trim(text), '\\s+')") -> str:
    """DuckDB twin of :func:`bpe_encode_counts`."""
    ctes, final = duck_bpe_ctes(n_merges, duck_tokens)
    return ("WITH " + ",\n".join(ctes) + f""",
wtab AS (SELECT w, len(string_split(s, ' ')) AS n_sym FROM {final}),
tok AS (SELECT doc_id, unnest({duck_tokens}) AS w FROM documents)
SELECT t.doc_id,
       COUNT(*) AS n_ws_tokens,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tok t JOIN wtab ON wtab.w = t.w
WHERE t.w <> ''
GROUP BY t.doc_id ORDER BY t.doc_id
""")


def bpe_compression_curve(docs: DataFrame, n_merges: int = 6,
                          text_col: str = "text") -> DataFrame:
    """Tokenizer ablation curve: total corpus symbol count after each
    merge round, ``(round, total_symbols)`` for rounds 0..n_merges
    (round 0 = raw characters). The standard artifact for choosing a
    vocab size — the knee of this curve is where merges stop paying.

    Scale shape: same as :func:`bpe_learn` — the corpus is touched once
    for word frequencies; every round's total is a weighted sum over
    the DISTINCT-WORD table with the merge chain applied as static
    string rewrites, all rounds evaluated in ONE pass over that table.
    """
    spark = docs.sparkSession
    merges = bpe_learn(docs, n_merges=n_merges, text_col=text_col).collect()
    words = (docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
                 .filter(F.col("w") != "")
                 .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    sym = "array_join(regexp_extract_all(w, '.', 0), ' ')"
    totals = [F.sum(F.col("cnt")
                    * F.size(F.split(F.expr(sym), " "))).alias("t0")]
    for r, m in enumerate(merges):
        sym = _apply_merge(sym, m["p1"], m["p2"])
        totals.append(F.sum(F.col("cnt")
                            * F.size(F.split(F.expr(sym), " ")))
                      .alias(f"t{r + 1}"))
    one = words.agg(*totals)
    stack = ", ".join(f"{r}, t{r}" for r in range(len(totals)))
    return (one.select(F.expr(
                f"stack({len(totals)}, {stack}) "
                f"as (round, total_symbols)"))
            .select(F.col("round").cast("int").alias("round"),
                    F.col("total_symbols").cast("long")
                     .alias("total_symbols"))
            .orderBy("round"))


def duck_bpe_curve_sql(n_merges: int = 6,
                       duck_tokens: str =
                       "string_split_regex(trim(text), '\\s+')") -> str:
    """DuckDB twin of :func:`bpe_compression_curve`."""
    ctes, _ = duck_bpe_ctes(n_merges, duck_tokens)
    rows = "\nUNION ALL ".join(
        f"SELECT {r} AS round, "
        f"CAST(SUM(cnt * len(string_split(s, ' '))) AS BIGINT) "
        f"AS total_symbols FROM s{r}"
        for r in range(n_merges + 1))
    return "WITH " + ",\n".join(ctes) + f"\n{rows}\nORDER BY round"
