"""Driver-checkable STREAMING query: run the curated document stream
end-to-end (readStream → gates → exactly-once parquet landing,
availableNow) inside the query function, then return a deterministic
projection of the landed lake.

The first registry entry that hash-checks the streaming subsystem
against a SQL oracle. The trick: ``dropDuplicates`` keeps an arbitrary
first arrival per canonical hash, so per-doc columns of the landed set
are not stable — but the SET of landed canonical hashes is exactly
"distinct md5(canonical) over gate-passing documents", which DuckDB can
reproduce. The query projects that invariant; everything order- or
winner-dependent stays in the pytest surface (test_prep_to_lake).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_scale import _DUCK_TOKENS, _HIT_SQL, _PRED_SQL, _STOP_SQL
from .registry import register


def _streaming_curation_hashes(spark: SparkSession, sf: str) -> DataFrame:
    from .streaming.stream_curation import stream_curated_to_lake
    out = tempfile.mkdtemp(prefix="stream_curation_q_")
    stream_curated_to_lake(spark, sf, out)
    landed = spark.read.parquet(os.path.join(out, "docs"))
    return (landed.select("text_hash").distinct()
                  .orderBy("text_hash"))


register(
    "streaming_curation_hashes",
    _streaming_curation_hashes,
    f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS tk FROM documents),
q AS (SELECT doc_id,
  (0.4 * least(len(tk) / 50.0, 1.0)
             + 0.4 * (len(list_distinct(tk)) / len(tk))
             + 0.2 * (len(list_filter(tk, x -> x IN ({_STOP_SQL}))) / len(tk)))
    AS quality
  FROM t),
h AS (SELECT doc_id, {_HIT_SQL} FROM t),
l AS (SELECT doc_id, {_PRED_SQL} AS lang_pred FROM h)
SELECT DISTINCT
  md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS text_hash
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
WHERE q.quality >= 0.5 AND l.lang_pred != 'und'
ORDER BY text_hash
""",
    doc="End-to-end Structured Streaming curation (gates → exactly-once "
        "parquet landing) hash-checked via its winner-independent "
        "invariant: the set of landed canonical text hashes.",
)
