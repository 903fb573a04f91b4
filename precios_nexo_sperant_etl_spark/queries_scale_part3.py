"""Scale-family queries, part file: web ingest (WARC/robots/sitemaps/PSL), WebDataset/TFRecord/Avro/Arrow containers, image-audio codecs, quotas and stats (registrations ~140-210).

Split from queries_scale.py at registration boundaries — see
queries_scale_common.py for why the split is positional. Import order
(queries_scale.py) IS the registration order; do not reorder.
"""

from .queries_scale_common import *  # noqa: F401,F403
from .queries_scale_part1 import (  # noqa: F401 — earlier-part helpers
    _ANN_QUERY_IDS, _SIG_SQL, _bands_sql,
)
from .queries_scale_part2 import (  # noqa: F401 — earlier-part helpers
    _DUCK_HOST, _SYNTH_URL_SQL, _duck_domain,
    _synth_url_spark,
)

# ---------------------------------------------------------------------------
# WebDataset shard roundtrip — the tar-of-samples container that
# large-scale multimodal training corpora actually ship in. Documents
# are sharded (doc_id div 32), each shard task writes ONE deterministic
# ustar archive holding two members per sample (<key>.txt payload +
# <key>.cls label — the WebDataset naming convention), and the
# from-scratch walker (operators/webdataset.py: octal fields, header
# checksums, 512-block alignment, terminator check) reads every sample
# back out through a second Arrow crossing. The oracle recomputes the
# expected (shard, length, label) triple per document, so a bug in
# octal encoding, checksum math, member framing, or sample keying
# breaks the value hash.
#
# Scale shape: ONE shuffle keyed by shard id (applyInPandas — exactly
# how a real shard writer lays out output files), then narrow maps.
# Rows-per-shard is the partition-sizing knob; payload bytes dominate.
# ---------------------------------------------------------------------------

_WDS_SHARD_DIV = 32


def _webdataset_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from .operators.webdataset import (build_shard, group_samples,
                                       parse_tar_members)

    d = (_t(spark, sf, "documents")
         .select("doc_id", "text",
                 F.coalesce(F.col("lang"), F.lit("")).alias("cls"),
                 (F.col("doc_id") / _WDS_SHARD_DIV).cast("long")
                  .alias("shard_id")))

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        parts = []
        for did, text, cls in zip(pdf["doc_id"].astype("int64"),
                                  pdf["text"], pdf["cls"]):
            key = f"{int(did):012d}"
            parts.append((f"{key}.txt", str(text).encode("utf-8")))
            parts.append((f"{key}.cls", str(cls).encode("utf-8")))
        return pd.DataFrame({
            "shard_id": [int(pdf["shard_id"].iloc[0])],
            "payload": [build_shard(parts)],
        })

    shards = (_spread(d, "shard_id", 32).groupBy("shard_id")
               .applyInPandas(write_shard, "shard_id long, payload binary"))

    def read_shard(it):
        for pdf in it:
            rows = []
            for sid, p in zip(pdf["shard_id"].astype("int64"),
                              pdf["payload"]):
                samples = group_samples(parse_tar_members(bytes(p)))
                for key, parts in samples.items():
                    rows.append({
                        "doc_id": int(key),
                        "shard_id": int(sid),
                        "txt_len": len(parts["txt"]),
                        "cls": parts["cls"].decode("utf-8"),
                    })
            yield pd.DataFrame(
                rows, columns=["doc_id", "shard_id", "txt_len", "cls"])

    return (shards.mapInPandas(read_shard,
                               "doc_id long, shard_id long,"
                               " txt_len long, cls string")
            .transform(_sorted1, "doc_id"))


register(
    "webdataset_roundtrip",
    _webdataset_roundtrip,
    f"""
SELECT doc_id,
       doc_id // {_WDS_SHARD_DIV} AS shard_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS txt_len,
       COALESCE(lang, '') AS cls
FROM documents ORDER BY doc_id
""",
    doc="WebDataset tar-shard roundtrip: one applyInPandas shuffle "
        "writes deterministic ustar shards (two members per sample, "
        "WebDataset key.ext naming), the from-scratch walker verifies "
        "checksums/framing and regroups samples, and every "
        "(shard, length, label) is hash-verified against arithmetic.",
)


# ---------------------------------------------------------------------------
# EXIF orientation/dimension probe — the metadata pass that keeps
# training images from being silently rotated or mis-sized. Each
# document becomes a genuine little-endian TIFF (header + IFD0 with
# LONG width/height and SHORT orientation entries, assembled JVM-side
# byte-for-byte from the public TIFF 6.0 layout); ODD doc_ids ship the
# same TIFF inside a real JPEG APP1 "Exif\0\0" segment, so both
# carriages the wild serves (bare TIFF, EXIF-in-JPEG) are inside the
# hashed data. The real IFD walker (operators/multimodal.
# probe_tiff_exif: byte-order marks, 12-byte entries, inline-vs-offset
# value rule) extracts the fields and the oracle recomputes them
# arithmetically. Narrow map end-to-end, one Arrow crossing.
# ---------------------------------------------------------------------------

def _exif_orientation_probe(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from .operators.multimodal import probe_tiff_exif

    def le32(c):
        def pair(x):
            return F.lpad(F.hex(x % 256), 2, "0")
        return F.unhex(F.concat(pair(c), pair((c / 256).cast("long")),
                                pair((c / 65536).cast("long")),
                                pair((c / 16777216).cast("long"))))

    def le16(c):
        def pair(x):
            return F.lpad(F.hex(x % 256), 2, "0")
        return F.unhex(F.concat(pair(c), pair((c / 256).cast("long"))))

    d = _t(spark, sf, "documents")
    ln = F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long")
    w = 1 + ln % 640
    h = 1 + ln % 480
    orient = (1 + F.col("doc_id") % 8).cast("long")
    tiff = F.concat(
        F.lit(b"II*\x00\x08\x00\x00\x00\x03\x00"),      # hdr + count=3
        F.lit(b"\x00\x01\x04\x00\x01\x00\x00\x00"), le32(w),
        F.lit(b"\x01\x01\x04\x00\x01\x00\x00\x00"), le32(h),
        F.lit(b"\x12\x01\x03\x00\x01\x00\x00\x00"), le16(orient),
        F.lit(b"\x00\x00" + b"\x00\x00\x00\x00"))       # pad + next=0
    # fixed TIFF length (50) → fixed APP1 segment length (58)
    jpeg = F.concat(F.lit(b"\xff\xd8\xff\xe1\x00\x3aExif\x00\x00"),
                    tiff, F.lit(b"\xff\xd9"))
    payload = F.when(F.col("doc_id") % 2 == 1, jpeg).otherwise(tiff)
    carriage = F.when(F.col("doc_id") % 2 == 1,
                      F.lit("jpeg")).otherwise(F.lit("tiff"))
    src = (d.select("doc_id", carriage.alias("carriage"),
                    payload.alias("payload"))
            .repartition(spark.sparkContext.defaultParallelism))

    def probe(it):
        for pdf in it:
            rows = []
            for did, car, p in zip(pdf["doc_id"].astype("int64"),
                                   pdf["carriage"], pdf["payload"]):
                r = probe_tiff_exif(bytes(p))
                rows.append({"doc_id": int(did), "carriage": car,
                             "byte_order": r["byte_order"],
                             "width": r["width"], "height": r["height"],
                             "orientation": r["orientation"]})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(probe, "doc_id long, carriage string,"
                                   " byte_order string, width long,"
                                   " height long, orientation long")
               .transform(_sorted1, "doc_id"))


register(
    "exif_orientation_probe",
    _exif_orientation_probe,
    """
WITH b AS (SELECT doc_id,
                  CAST(octet_length(encode(text)) AS BIGINT) AS ln
           FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 1 THEN 'jpeg' ELSE 'tiff' END AS carriage,
       'little' AS byte_order,
       CAST(1 + ln % 640 AS BIGINT) AS width,
       CAST(1 + ln % 480 AS BIGINT) AS height,
       CAST(1 + doc_id % 8 AS BIGINT) AS orientation
FROM b ORDER BY doc_id
""",
    doc="Real EXIF/TIFF IFD probe: byte-exact TIFF streams (and, for "
        "odd ids, the JPEG APP1 Exif carriage) built JVM-side, walked "
        "by the real IFD parser through the Arrow seam, orientation "
        "and dimensions hash-verified against arithmetic.",
)


# ---------------------------------------------------------------------------
# MP3 frame-header probe — the compressed-audio half of the media-
# metadata seam. Each document synthesizes a genuine MPEG-1 Layer III
# CBR stream (1 + doc_id%4 frames; bitrate index 1 + doc_id%14 and
# sample-rate index doc_id%3 cycle the public ISO 11172-3 tables;
# per-frame padding bits alternate so the 144·bitrate/rate + padding
# length formula is exercised on both values), prefixed with an ID3v2
# tag whose syncsafe length the walker must skip. The real frame walk
# (operators/multimodal.parse_mp3_frames) recovers frame count /
# bitrate / sample rate / exact-integer duration, and DuckDB recomputes
# them from the same index arithmetic via CASE tables. Synthesis-filter
# decode stays honestly stubbed; this is the duration/bitrate gate an
# audio pipeline runs on every clip.
# ---------------------------------------------------------------------------

def _mp3_frame_probe(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from .operators.multimodal import (_MP3_BITRATES, _MP3_RATES,
                                       parse_mp3_frames)

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                bidx = 1 + did % 14
                ridx = did % 3
                nf = 1 + did % 4
                chunks = [b"ID3\x04\x00\x00" + bytes([0, 0, 0, 11])
                          + b"tag-payload"]
                for k in range(nf):
                    pad = (did + k) % 2
                    hdr = bytes([0xFF, 0xFB,
                                 (bidx << 4) | (ridx << 2) | (pad << 1),
                                 0x00])
                    flen = (144 * _MP3_BITRATES[bidx] * 1000
                            // _MP3_RATES[ridx] + pad)
                    chunks.append(hdr + b"\x00" * (flen - 4))
                payloads.append(b"".join(chunks))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def probe(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = parse_mp3_frames(bytes(p))
                rows.append({"doc_id": int(did),
                             "n_frames": r["n_frames"],
                             "bitrate_kbps": r["bitrate_kbps"],
                             "sample_rate": r["sample_rate"],
                             "duration_ms": r["duration_ms"],
                             "byte_len": r["byte_len"]})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(synth, "doc_id long, payload binary")
               .mapInPandas(probe, "n_frames long, bitrate_kbps long,"
                                   " sample_rate long, duration_ms long,"
                                   " byte_len long, doc_id long")
               .select("doc_id", "n_frames", "bitrate_kbps",
                       "sample_rate", "duration_ms", "byte_len")
               .transform(_sorted1, "doc_id"))


_MP3_BR_SQL = ("CASE 1 + doc_id % 14 "
               + " ".join(f"WHEN {i} THEN {b}" for i, b in
                          [(1, 32), (2, 40), (3, 48), (4, 56), (5, 64),
                           (6, 80), (7, 96), (8, 112), (9, 128),
                           (10, 160), (11, 192), (12, 224), (13, 256),
                           (14, 320)])
               + " END")
_MP3_SR_SQL = ("CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000"
               " ELSE 32000 END")

register(
    "mp3_frame_probe",
    _mp3_frame_probe,
    f"""
WITH b AS (
  SELECT doc_id,
         1 + doc_id % 4 AS nf,
         {_MP3_BR_SQL} AS br,
         {_MP3_SR_SQL} AS sr
  FROM documents)
SELECT doc_id,
       CAST(nf AS BIGINT) AS n_frames,
       CAST(br AS BIGINT) AS bitrate_kbps,
       CAST(sr AS BIGINT) AS sample_rate,
       CAST(nf * 1152 * 1000 // sr AS BIGINT) AS duration_ms,
       CAST(21 + nf * (144 * br * 1000 // sr)
            + (nf + doc_id % 2) // 2 AS BIGINT) AS byte_len
FROM b ORDER BY doc_id
""",
    doc="Real MPEG-1 Layer III frame walk: genuine CBR streams (table-"
        "cycled bitrate/rate indices, alternating padding, ID3v2 "
        "prefix) synthesized per document, walked by the real header "
        "parser, frame count / bitrate / duration hash-verified "
        "against the public-table arithmetic.",
)


# ---------------------------------------------------------------------------
# Poisson bootstrap — the bootstrap that actually works at 100 TB.
# Classic bootstrap resampling needs n index draws per replicate (a
# corpus-sized shuffle per replicate); the Poisson approximation gives
# every row an independent Poisson(1) multiplicity per replicate, so
# ALL B replicates come out of ONE corpus scan (explode over replicate
# ids, map-side-combinable agg). Determinism: the multiplicity is the
# inverse-CDF of Poisson(1) applied to a 48-bit-hash uniform — the
# hash is the engine-portable md5 fold, 48 bits < 53 so h/2^48 is an
# EXACT double, the CDF thresholds are shared literals, and each
# replicate mean is one BIGINT/BIGINT double division: every value is
# bit-identical across engines and partitionings.
# ---------------------------------------------------------------------------

_BOOT_B = 64
#: Cumulative Poisson(1) pmf: P(X<=k) for k = 0..6; u past the last
#: entry draws multiplicity 7 (P ≈ 8e-5; exact tail truncation shared
#: by both engines).
_POIS_CDF = ("0.36787944117144233", "0.7357588823428847",
             "0.9196986029286058", "0.9810118431238463",
             "0.9963401531726563", "0.9994058151824183",
             "0.999916758850712")


def _boot_weight(u):
    w = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(float(_POIS_CDF[k])), F.lit(k)).otherwise(w)
    return w


def _boot_means_df(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import md5_hash, tokens
    d = _t(spark, sf, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("x"))
    r = (d.select("doc_id", "x",
                  F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("_r"))
          .select("doc_id", "x", F.col("_r").cast("long").alias("r")))
    h = md5_hash(F.concat(F.col("r").cast("string"), F.lit(":"),
                          F.col("doc_id").cast("string")))
    u = h.cast("double") / F.lit(float(2 ** 48))
    w = _boot_weight(u).cast("long")
    return (r.select("r", "x", w.alias("w"))
             .groupBy("r")
             .agg(F.sum("w").alias("sw"),
                  F.sum(F.col("w") * F.col("x")).alias("swx"))
             .select("r", "sw", "swx",
                     (F.col("swx").cast("double")
                      / F.col("sw").cast("double")).alias("mean_tokens")))


_BOOT_W_SQL = " ".join(
    f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF))

_BOOT_MEANS_SQL = f"""
WITH d AS (SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\\s+'))
                       AS BIGINT) AS x
           FROM documents),
e AS (SELECT doc_id, x, CAST(unnest(range(1, {_BOOT_B + 1})) AS BIGINT)
               AS r
      FROM d),
u AS (SELECT r, x,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                                      CAST(doc_id AS VARCHAR)), 1, 12))
                  ::BIGINT AS DOUBLE) / 281474976710656.0 AS u
      FROM e),
w AS (SELECT r, x, CASE {_BOOT_W_SQL} ELSE 7 END AS w FROM u)
SELECT r, CAST(SUM(w) AS BIGINT) AS sw,
       CAST(SUM(w * x) AS BIGINT) AS swx,
       CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_tokens
FROM w GROUP BY r
"""

register(
    "poisson_bootstrap_means",
    lambda spark, sf: _sorted1(_boot_means_df(spark, sf), "r"),
    _BOOT_MEANS_SQL + "ORDER BY r",
    doc="Poisson-bootstrap replicate table: 64 replicates of the mean "
        "token count from ONE corpus scan (Poisson(1) multiplicities "
        "from exact 48-bit-hash uniforms), every weight and mean "
        "bit-identical across engines.",
)


def _poisson_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import tokens
    means = _boot_means_df(spark, sf)
    d = _t(spark, sf, "documents").select(
        F.size(tokens(F.col("text"))).cast("long").alias("x"))
    point = d.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("point_mean"))
    # 64 replicate means -> one sorted array; ranks 2 and 63 (1-based)
    # are the shared 2.5% / 97.5% convention. The collect_list feeds a
    # 64-element array — driver-free, single tiny agg.
    ci = means.agg(
        F.count(F.lit(1)).alias("b"),
        F.sort_array(F.collect_list("mean_tokens")).alias("ms"))
    return (ci.crossJoin(point)
              .select("b", "point_mean",
                      F.col("ms").getItem(1).alias("ci_lo"),
                      F.col("ms").getItem(62).alias("ci_hi")))


register(
    "poisson_bootstrap_ci",
    _poisson_bootstrap_ci,
    f"""
WITH means AS ({_BOOT_MEANS_SQL}),
s AS (SELECT list_sort(list(mean_tokens)) AS ms,
             CAST(COUNT(*) AS BIGINT) AS b
      FROM means),
p AS (SELECT CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
                  AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS point_mean
      FROM documents)
SELECT b, point_mean, ms[2] AS ci_lo, ms[63] AS ci_hi
FROM s, p
""",
    doc="95% Poisson-bootstrap CI for the mean token count: sorted "
        "replicate means, ranks 2/63 of 64 — the one-scan uncertainty "
        "quantification a corpus-stat dashboard needs at scale.",
)


# ---------------------------------------------------------------------------
# Unicode NFC normalization — the canonicalization pass every text
# curation pipeline runs before hashing/dedup (decomposed sequences
# like e + COMBINING ACUTE hash differently from their composed forms,
# silently splitting duplicate groups). Spark has no built-in NFC, so
# the normalize runs in the Arrow crossing via unicodedata; DuckDB's
# nfc_normalize (verified char-identical to Python's) recomputes every
# output. Even doc_ids get a DECOMPOSED suffix (changes under NFC),
# odd ones the precomposed equivalent (already normal) — both the
# changed and unchanged paths sit inside the hashed data, pinned by
# character counts and the md5 of the normalized UTF-8.
# ---------------------------------------------------------------------------

def _unicode_nfc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib
    import unicodedata

    import pandas as pd

    d = _t(spark, sf, "documents")
    dec = " e\u0301A\u030a"   # e+COMBINING ACUTE, A+COMBINING RING
    comp = " \u00e9\u00c5"     # the precomposed forms
    t2 = F.concat(F.col("text"),
                  F.when(F.col("doc_id") % 2 == 0, F.lit(dec))
                   .otherwise(F.lit(comp)))
    src = (d.select("doc_id", t2.alias("t"))
            .repartition(spark.sparkContext.defaultParallelism))

    def norm(it):
        for pdf in it:
            rows = []
            for did, s in zip(pdf["doc_id"].astype("int64"), pdf["t"]):
                n = unicodedata.normalize("NFC", s)
                rows.append({"doc_id": int(did),
                             "orig_chars": len(s),
                             "nfc_chars": len(n),
                             "changed": n != s,
                             "nfc_md5": hashlib.md5(
                                 n.encode("utf-8")).hexdigest()})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(norm, "doc_id long, orig_chars long,"
                                  " nfc_chars long, changed boolean,"
                                  " nfc_md5 string")
               .orderBy("doc_id"))


register(
    "unicode_nfc_roundtrip",
    _unicode_nfc_roundtrip,
    """
WITH t AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 2 = 0
                      THEN ' ' || chr(101) || chr(769)
                           || chr(65) || chr(778)
                      ELSE ' ' || chr(233) || chr(197) END AS s
  FROM documents)
SELECT doc_id,
       CAST(length(s) AS BIGINT) AS orig_chars,
       CAST(length(nfc_normalize(s)) AS BIGINT) AS nfc_chars,
       nfc_normalize(s) != s AS changed,
       md5(nfc_normalize(s)) AS nfc_md5
FROM t ORDER BY doc_id
""",
    doc="Unicode NFC canonicalization through the Arrow seam "
        "(unicodedata), hash-verified against DuckDB's nfc_normalize: "
        "decomposed suffixes compose (changed=true, shorter), "
        "precomposed ones pass through — the pre-dedup text "
        "canonicalization pass.",
)


# ---------------------------------------------------------------------------
# Matryoshka truncation audit — the retrieval-quality check behind
# MRL-style embedding truncation (serve the first d dims of a 64-dim
# vector to cut index cost d/64x; Kusupati et al. 2022, public). For
# each probe, exact top-k under the FULL vectors is compared with
# top-k under prefixes (d = 8, 16): top-1 agreement and overlap@k per
# (probe, d). Both rankings use the deterministic sequential-fold dot
# (functions/exact.ddot), so ranks — and therefore the audit verdict —
# are bit-stable and oracle-checkable. Scale shape: the probe set
# broadcasts, the corpus streams once per dim tier (each tier reads a
# PREFIX of the same column — no second embedding table), ranks come
# from a per-probe window over ≤|corpus| scored rows.
# ---------------------------------------------------------------------------

_MATRY_DIMS = (8, 16)
_MATRY_K = 5


def _matryoshka_topk_agreement(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    full = (cosine_topk(emb, _ANN_QUERY_IDS, k=_MATRY_K)
            .select("query_id", "neighbor_id", "rank"))
    out = None
    for d in _MATRY_DIMS:
        sliced = emb.select(
            "vec_id", F.slice(F.col("embedding"), 1, d).alias("embedding"))
        trunc = (cosine_topk(sliced, _ANN_QUERY_IDS, k=_MATRY_K)
                 .select("query_id", "neighbor_id", "rank"))
        top1 = (full.where(F.col("rank") == 1)
                .select("query_id",
                        F.col("neighbor_id").alias("top1_full"))
                .join(trunc.where(F.col("rank") == 1)
                      .select("query_id",
                              F.col("neighbor_id").alias("top1_trunc")),
                      "query_id"))
        overlap = (trunc.join(full, ["query_id", "neighbor_id"], "semi")
                   .groupBy("query_id")
                   .agg(F.count(F.lit(1)).alias("overlap_at_k")))
        tier = (top1.join(overlap, "query_id", "left")
                .select("query_id", F.lit(d).cast("long").alias("dim"),
                        "top1_full", "top1_trunc",
                        (F.col("top1_full") == F.col("top1_trunc"))
                         .alias("top1_agree"),
                        F.coalesce("overlap_at_k", F.lit(0))
                         .cast("long").alias("overlap_at_k")))
        out = tier if out is None else out.unionByName(tier)
    return out.orderBy("query_id", "dim")


def _matry_rank_sql(vec: str) -> str:
    return f"""
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY {_duck_dot(f'q.qv{vec}', f'e.embedding{vec}')}
             / (sqrt({_duck_dot(f'q.qv{vec}', f'q.qv{vec}')})
                * sqrt({_duck_dot(f'e.embedding{vec}',
                                  f'e.embedding{vec}')})) DESC,
             e.vec_id) AS rn
  FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id IN ({", ".join(map(str, _ANN_QUERY_IDS))})) q,
       embeddings e
  WHERE e.vec_id != q.query_id
"""


register(
    "matryoshka_topk_agreement",
    _matryoshka_topk_agreement,
    f"""
WITH fullr AS ({_matry_rank_sql("")}),
fk AS (SELECT query_id, neighbor_id, rn FROM fullr WHERE rn <= {_MATRY_K}),
{", ".join(f'''
r{d} AS ({_matry_rank_sql(f"[1:{d}]")}),
k{d} AS (SELECT query_id, neighbor_id, rn FROM r{d} WHERE rn <= {_MATRY_K}),
t{d} AS (
  SELECT f1.query_id, CAST({d} AS BIGINT) AS dim,
         f1.neighbor_id AS top1_full, t1.neighbor_id AS top1_trunc,
         f1.neighbor_id = t1.neighbor_id AS top1_agree,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM k{d} t
          JOIN fk f ON f.query_id = t.query_id
                   AND f.neighbor_id = t.neighbor_id
          WHERE t.query_id = f1.query_id) AS overlap_at_k
  FROM (SELECT * FROM fk WHERE rn = 1) f1
  JOIN (SELECT * FROM k{d} WHERE rn = 1) t1 USING (query_id))'''
           for d in _MATRY_DIMS)}
SELECT * FROM t8 UNION ALL SELECT * FROM t16
ORDER BY query_id, dim
""",
    doc="Matryoshka (MRL) truncation audit: exact top-k under full "
        "64-dim vectors vs 8/16-dim prefixes — top-1 agreement and "
        "overlap@k per probe, bit-stable via the deterministic "
        "sequential-fold dot product.",
)


# ---------------------------------------------------------------------------
# FIM (fill-in-the-middle) transformation manifest — the data-side half
# of infilling training (Bavarian et al. 2022, public): each document
# splits at deterministic thirds into prefix/middle/suffix and is
# re-serialized [prefix][SUF][suffix][MID][middle] so the model learns
# to fill the gap. The manifest pins the split arithmetic and the md5
# of the transformed text, so the oracle catches off-by-one split
# points, wrong segment order, or separator drift — the bugs that
# silently corrupt an infilling corpus. Pure narrow map.
# ---------------------------------------------------------------------------

def _fim_split_manifest(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    n = F.length("text")
    prefix = F.substring(F.col("text"), 1, F.floor(n / 3).cast("int"))
    middle = F.expr("substring(text, CAST(length(text) DIV 3 AS INT) + 1,"
                    " CAST(length(text) * 2 DIV 3 AS INT)"
                    " - CAST(length(text) DIV 3 AS INT))")
    suffix = F.expr("substring(text,"
                    " CAST(length(text) * 2 DIV 3 AS INT) + 1)")
    fim = F.concat(prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle)
    return (d.select(
                "doc_id",
                F.length(prefix).cast("long").alias("prefix_len"),
                F.length(middle).cast("long").alias("middle_len"),
                F.length(suffix).cast("long").alias("suffix_len"),
                F.md5(fim).alias("fim_md5"))
             .orderBy("doc_id"))


register(
    "fim_split_manifest",
    _fim_split_manifest,
    """
WITH s AS (
  SELECT doc_id,
         substr(text, 1, length(text) // 3) AS prefix,
         substr(text, length(text) // 3 + 1,
                length(text) * 2 // 3 - length(text) // 3) AS middle,
         substr(text, length(text) * 2 // 3 + 1) AS suffix
  FROM documents)
SELECT doc_id,
       CAST(length(prefix) AS BIGINT) AS prefix_len,
       CAST(length(middle) AS BIGINT) AS middle_len,
       CAST(length(suffix) AS BIGINT) AS suffix_len,
       md5(prefix || '<SUF>' || suffix || '<MID>' || middle) AS fim_md5
FROM s ORDER BY doc_id
""",
    doc="Fill-in-the-middle transform manifest: deterministic third "
        "splits, [prefix][SUF][suffix][MID][middle] re-serialization "
        "pinned by segment lengths and the transformed-text md5 — the "
        "infilling-corpus construction pass.",
)


# ---------------------------------------------------------------------------
# Stratified Poisson bootstrap: the same one-scan replicate machinery,
# grouped by source — per-stratum CIs are what a mixture datasheet
# actually reports (is source A's mean length significantly above
# source B's?). Replicate means group by (source, r); the per-source
# CI folds the 64 replicate means through one sorted list per stratum.
# Still one corpus scan, still bit-exact.
# ---------------------------------------------------------------------------

def _bootstrap_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import md5_hash, tokens
    d = _t(spark, sf, "documents").select(
        "source", "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("x"))
    r = (d.select("source", "doc_id", "x",
                  F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("_r"))
          .select("source", "doc_id", "x",
                  F.col("_r").cast("long").alias("r")))
    h = md5_hash(F.concat(F.col("r").cast("string"), F.lit(":"),
                          F.col("doc_id").cast("string")))
    u = h.cast("double") / F.lit(float(2 ** 48))
    w = _boot_weight(u).cast("long")
    means = (r.select("source", "r", "x", w.alias("w"))
              .groupBy("source", "r")
              .agg(F.sum("w").alias("sw"),
                   F.sum(F.col("w") * F.col("x")).alias("swx"))
              .select("source", "r",
                      (F.col("swx").cast("double")
                       / F.col("sw").cast("double")).alias("m")))
    point = (d.groupBy("source")
              .agg((F.sum("x").cast("double")
                    / F.count(F.lit(1)).cast("double"))
                   .alias("point_mean")))
    ci = (means.groupBy("source")
           .agg(F.sort_array(F.collect_list("m")).alias("ms"),
                F.count(F.lit(1)).alias("b")))
    return (ci.join(point, "source")
              .select("source", "b", "point_mean",
                      F.col("ms").getItem(1).alias("ci_lo"),
                      F.col("ms").getItem(_BOOT_B - 2).alias("ci_hi"))
              .orderBy("source"))


register(
    "poisson_bootstrap_by_source",
    _bootstrap_by_source,
    f"""
WITH d AS (SELECT source, doc_id,
                  CAST(len(string_split_regex(trim(text), '\\s+'))
                       AS BIGINT) AS x
           FROM documents),
e AS (SELECT source, doc_id, x,
             CAST(unnest(range(1, {_BOOT_B + 1})) AS BIGINT) AS r
      FROM d),
u AS (SELECT source, r, x,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                                      CAST(doc_id AS VARCHAR)), 1, 12))
                  ::BIGINT AS DOUBLE) / 281474976710656.0 AS u
      FROM e),
w AS (SELECT source, r, x, CASE {_BOOT_W_SQL} ELSE 7 END AS w FROM u),
means AS (
  SELECT source, r,
         CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS m
  FROM w GROUP BY source, r),
ci AS (
  SELECT source, list_sort(list(m)) AS ms,
         CAST(COUNT(*) AS BIGINT) AS b
  FROM means GROUP BY source),
p AS (SELECT source,
             CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS point_mean
      FROM d GROUP BY source)
SELECT source, b, point_mean, ms[2] AS ci_lo, ms[{_BOOT_B - 1}] AS ci_hi
FROM ci JOIN p USING (source)
ORDER BY source
""",
    doc="Per-source stratified Poisson-bootstrap CIs for mean token "
        "count: one corpus scan, 64 replicates per stratum, sorted-"
        "rank 2/63 bounds — the significance column of a mixture "
        "datasheet, bit-exact.",
)


# ---------------------------------------------------------------------------
# ORC format seam — Spark ships an ORC reader/writer in core, and a
# lake migration pipeline needs the columnar-format roundtrip to be a
# verified path, not an assumption. The query writes the documents
# table to ORC (snappy), reads it back, and republishes a projection
# the oracle computes from the parquet original — so a type-mapping or
# encoding bug anywhere in the ORC path breaks the value hash.
# ---------------------------------------------------------------------------

def _orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile
    out = tempfile.mkdtemp(prefix="orc_roundtrip_")
    d = _t(spark, sf, "documents")
    d.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (back.select("doc_id", "lang", "source",
                        F.length("text").cast("long").alias("n_chars_rt"),
                        F.md5(F.col("text")).alias("text_md5"))
                .orderBy("doc_id"))


register(
    "orc_roundtrip",
    _orc_roundtrip,
    """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars_rt,
       md5(text) AS text_md5
FROM documents ORDER BY doc_id
""",
    doc="ORC columnar-format roundtrip: write documents to ORC, read "
        "back, hash-verify ids/strings/lengths/md5 against the parquet "
        "original — the lake-migration format seam, verified not "
        "assumed.",
)


# ---------------------------------------------------------------------------
# Skip-gram training pairs — the data-generation pass of word2vec-
# style embedding training: (center, context) pairs within a ±2 token
# window, aggregated to counts. Spark shape: posexplode to (doc, pos,
# token), self-join on doc with |Δpos| ∈ {1,2} (an equi-join on doc_id
# with a tiny bounded range predicate — at corpus scale the join key
# is doc_id so co-location is the document itself; fan-out is ≤4 per
# token, corpus-linear). Top-50 pairs published with count/tie-break
# ordering.
# ---------------------------------------------------------------------------

def _skipgram_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import tokens
    d = _t(spark, sf, "documents")
    tok = d.select("doc_id",
                   F.posexplode(tokens(F.col("text")))
                    .alias("pos", "tok")).where(F.col("tok") != "")
    a = tok.select("doc_id", F.col("pos").alias("pa"),
                   F.col("tok").alias("center"))
    b = tok.select("doc_id", F.col("pos").alias("pb"),
                   F.col("tok").alias("context"))
    pairs = (a.join(b, "doc_id")
              .where((F.abs(F.col("pa") - F.col("pb")) <= 2)
                     & (F.col("pa") != F.col("pb"))))
    return (pairs.groupBy("center", "context")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .transform(_sorted1, F.desc("n_pairs"), F.asc("center"),
                     F.asc("context"))
            .limit(50))


register(
    "skipgram_pairs",
    _skipgram_pairs,
    f"""
WITH tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, tk[CAST(i AS INT)] AS t
  FROM (SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents),
       LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i)
  WHERE tk[CAST(i AS INT)] != ''),
pairs AS (
  SELECT a.t AS center, b.t AS context
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id
   AND abs(a.pos - b.pos) <= 2 AND a.pos != b.pos)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY center, context
ORDER BY n_pairs DESC, center, context
LIMIT 50
""",
    doc="Skip-gram (center, context) pair generation within a ±2 "
        "window — word2vec training-data construction as a doc-local "
        "self-join with bounded fan-out, top-50 pairs by count.",
)


# ---------------------------------------------------------------------------
# Negative-sampling table — word2vec's noise distribution: unigram
# counts raised to the 3/4 power. The 0.75 exponent is normally a
# libm pow() call, whose last ulp differs across engines; here it is
# computed as sqrt(sqrt(c³)) — the cube is exact integer arithmetic
# and IEEE sqrt is CORRECTLY ROUNDED in both engines, so the weights
# are bit-identical without giving up the real exponent. The
# normalizing sum folds over the count-desc/term-asc-sorted weight
# list SEQUENTIALLY (F.aggregate / list_reduce) so float association
# is pinned, and each probability is one division of bit-identical
# doubles. Top-40 terms published.
# ---------------------------------------------------------------------------

_NEG_K = 40


def _negative_sampling_table(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import tokens
    d = _t(spark, sf, "documents")
    counts = (d.select(F.explode(tokens(F.col("text"))).alias("t"))
               .where(F.col("t") != "")
               .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
               .orderBy(F.desc("c"), F.asc("t"))
               .limit(_NEG_K))
    w = F.sqrt(F.sqrt((F.col("c") * F.col("c") * F.col("c"))
                      .cast("double")))
    weighted = counts.select("t", "c", w.alias("w"))
    # deterministic normalizer: fold the (count desc, term asc)-sorted
    # weight list sequentially — one tiny collect_list over ≤K rows
    total = weighted.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(
                (-F.col("c")).alias("nc"), F.col("t").alias("t"),
                F.col("w").alias("w")))),
            F.lit(0.0), lambda acc, s: acc + s["w"]).alias("z"))
    return (weighted.crossJoin(F.broadcast(total))
            .select("t", "c", "w", (F.col("w") / F.col("z"))
                    .alias("p_neg"))
            .orderBy(F.desc("c"), F.asc("t")))


register(
    "negative_sampling_table",
    _negative_sampling_table,
    f"""
WITH counts AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest({_DUCK_TOKENS}) AS t FROM documents)
  WHERE t != ''
  GROUP BY t ORDER BY c DESC, t LIMIT {_NEG_K}),
wt AS (SELECT t, c, sqrt(sqrt(CAST(c * c * c AS DOUBLE))) AS w
       FROM counts),
z AS (SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(
                   list_sort(list([-c, w] ORDER BY c DESC, t)),
                   s -> s[2])),
               (x, y) -> x + y) AS z
      FROM wt)
SELECT t, c, w, w / z AS p_neg
FROM wt, z ORDER BY c DESC, t
""",
    doc="word2vec negative-sampling table: unigram^0.75 computed as "
        "sqrt(sqrt(c^3)) — exact integer cube + correctly-rounded IEEE "
        "sqrt, so the noise distribution is bit-identical across "
        "engines, with a sequentially-folded normalizer.",
)


# ---------------------------------------------------------------------------
# BPE-ish pretokenization counts — the GPT-2-style split pass that
# precedes BPE merging (letters / digits / punctuation runs with an
# optional leading space). The canonical GPT-2 pattern needs lookahead
# (unsupported in RE2), so both engines share the same RE2-safe
# approximation — Java regex and RE2 agree on this subset, which is
# exactly why the pattern is pinned here by a value oracle. Counts per
# class drive tokenizer-cost estimates (pretokens/word ratios) before
# any merge table exists.
# ---------------------------------------------------------------------------

_PRETOK_RX = r"( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+|[ ]+)"


def _pretoken_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{_PRETOK_RX}', 1)")
    is_word = "x -> x rlike '^ ?[A-Za-z]+$'"
    is_num = "x -> x rlike '^ ?[0-9]+$'"
    return (d.select(
                "doc_id", toks.alias("pt"))
             .select(
                "doc_id",
                F.size("pt").cast("long").alias("n_pretokens"),
                F.expr(f"size(filter(pt, {is_word}))").cast("long")
                 .alias("n_word"),
                F.expr(f"size(filter(pt, {is_num}))").cast("long")
                 .alias("n_num"))
             .select("*",
                     (F.col("n_pretokens") - F.col("n_word")
                      - F.col("n_num")).alias("n_other"))
             .orderBy("doc_id"))


register(
    "pretoken_stats",
    _pretoken_stats,
    f"""
WITH p AS (
  SELECT doc_id,
         regexp_extract_all(text, '{_PRETOK_RX}') AS pt
  FROM documents)
SELECT doc_id,
       CAST(len(pt) AS BIGINT) AS n_pretokens,
       CAST(len(list_filter(pt, x -> regexp_matches(x, '^ ?[A-Za-z]+$')))
            AS BIGINT) AS n_word,
       CAST(len(list_filter(pt, x -> regexp_matches(x, '^ ?[0-9]+$')))
            AS BIGINT) AS n_num,
       CAST(len(pt)
            - len(list_filter(pt, x -> regexp_matches(x, '^ ?[A-Za-z]+$')))
            - len(list_filter(pt, x -> regexp_matches(x, '^ ?[0-9]+$')))
            AS BIGINT) AS n_other
FROM p ORDER BY doc_id
""",
    doc="GPT-2-style BPE pretokenization counts (RE2-safe shared "
        "pattern): letter/digit/punct-run pretokens per document — "
        "the tokenizer-cost pass that runs before any merge table "
        "exists.",
)


# ---------------------------------------------------------------------------
# HTML → text extraction — the first transform of every web-corpus
# pipeline. Each document is wrapped JVM-side into a genuine page
# (title, style and script blocks — the script body contains a fake
# tag string so stripping ORDER is inside the hashed data: if tags
# were stripped before script bodies, the leftover fragment would
# change the hash — nav/footer boilerplate, an entity-bearing
# paragraph), then the shared pattern chain (operators/text.
# html_to_text) extracts the text. DuckDB replays the identical
# patterns; title, extracted length and md5 are value-pinned.
# Pure narrow map — the extraction runs in codegen on the scan.
# ---------------------------------------------------------------------------

def _html_extract_text(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import html_to_text
    d = _t(spark, sf, "documents")
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><style>body{color:red}</style>'
              '<script>var x="<b>not text</b>";</script></head>'
              "<body><nav>Home | About</nav><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"), F.col("text"),
        F.lit("</p><!-- hidden comment --><p>Tom &amp; Jerry &lt;3 "
              "&quot;quotes&quot;&nbsp;&#39;end&#39;</p>"
              "<footer>(c) 2024</footer></body></html>"))
    page = d.select("doc_id", html.alias("html"))
    extracted = html_to_text(F.col("html"))
    title = F.regexp_extract(F.col("html"),
                             r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return (page.select(
                "doc_id", title.alias("title"),
                F.length(extracted).cast("long").alias("extracted_len"),
                F.md5(extracted).alias("extracted_md5"))
            .transform(_sorted1, "doc_id"))


def _html_oracle_sql() -> str:
    from .operators.text import HTML_ENTITIES, HTML_STRIP_PATTERNS
    expr = "html"
    for pat, repl in HTML_STRIP_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    for ent, ch in HTML_ENTITIES:
        c = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{c}')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    return f"""
WITH p AS (
  SELECT doc_id,
         '<!DOCTYPE html><html><head><title>Doc '
         || CAST(doc_id AS VARCHAR)
         || '</title><style>body{{color:red}}</style>'
         || '<script>var x="<b>not text</b>";</script></head>'
         || '<body><nav>Home | About</nav><h1>Doc '
         || CAST(doc_id AS VARCHAR)
         || '</h1><p>' || text
         || '</p><!-- hidden comment --><p>Tom &amp; Jerry &lt;3 '
         || '&quot;quotes&quot;&nbsp;&#39;end&#39;</p>'
         || '<footer>(c) 2024</footer></body></html>' AS html
  FROM documents)
SELECT doc_id,
       regexp_extract(html, '(?is)<title[^>]*>(.*?)</title\\s*>', 1)
         AS title,
       CAST(length({expr}) AS BIGINT) AS extracted_len,
       md5({expr}) AS extracted_md5
FROM p ORDER BY doc_id
"""


register(
    "html_extract_text",
    _html_extract_text,
    _html_oracle_sql(),
    doc="HTML-to-text extraction with the shared RE2-safe pattern "
        "chain (script/style bodies, comments, tags, entities, "
        "whitespace — in pinned order), title/length/md5 hash-verified "
        "— the first transform of a web-corpus pipeline, in codegen.",
)


# ---------------------------------------------------------------------------
# WARC record extraction — the crawl-archive seam (ISO 28500, the
# format Common Crawl ships). Each document becomes a genuine
# two-record WARC stream (warcinfo + response whose body is the text
# bytes); EVEN doc_ids gzip the stream — the Common Crawl carriage —
# so both the plain and inflated paths sit inside the hashed data.
# The real record walker (operators/webdataset.parse_warc_records:
# version line, header block, Content-Length framing, mandatory
# separators) reads the records back; counts, lengths and the
# response-body md5 are value-pinned against the original text.
# ---------------------------------------------------------------------------

def _warc_record_extract(spark: SparkSession, sf: str) -> DataFrame:
    import gzip as _gzip
    import hashlib

    import pandas as pd

    from .operators.webdataset import build_warc, parse_warc_records

    d = _t(spark, sf, "documents").select("doc_id", "text")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def roundtrip(it):
        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"].astype("int64"),
                                 pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                w = build_warc([
                    ("warcinfo", f"<urn:uuid:{did}-info>",
                     b"software: engine-test"),
                    ("response", f"<urn:uuid:{did}-resp>", body)])
                if did % 2 == 0:
                    w = _gzip.compress(w)
                recs = parse_warc_records(w)
                resp = [r for r in recs if r["type"] == "response"][0]
                rows.append({
                    "doc_id": did,
                    "carriage": "gzip" if did % 2 == 0 else "plain",
                    "n_records": len(recs),
                    "response_len": resp["content_length"],
                    "response_md5": hashlib.md5(
                        resp["payload"]).hexdigest(),
                })
            yield pd.DataFrame(rows)

    return (src.mapInPandas(roundtrip,
                            "doc_id long, carriage string,"
                            " n_records long, response_len long,"
                            " response_md5 string")
               .orderBy("doc_id"))


register(
    "warc_record_extract",
    _warc_record_extract,
    """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'gzip' ELSE 'plain' END AS carriage,
       CAST(2 AS BIGINT) AS n_records,
       CAST(octet_length(encode(text)) AS BIGINT) AS response_len,
       md5(text) AS response_md5
FROM documents ORDER BY doc_id
""",
    doc="WARC (ISO 28500) record roundtrip: genuine two-record streams "
        "per document, gzip carriage on even ids (the Common Crawl "
        "convention), walked by the real Content-Length-framed parser, "
        "response bodies hash-verified against the original text.",
)


# ---------------------------------------------------------------------------
# Composed WEB-curation pipeline — the round's seams chained end to
# end: WARC records (gzip carriage on even ids) carry HTML pages;
# the real record walker unwraps them (one Arrow crossing); the
# codegen pattern chain extracts text; a token-count gate drops thin
# pages; exact dedup (md5 of the extracted text, keep-min-id) removes
# the pages whose BODY text collides after boilerplate stripping; the
# published artifact is the per-source datasheet. The oracle rebuilds
# the same HTML from the raw text and replays extraction → gate →
# dedup → rollup in SQL, so every seam's composition — not just each
# seam alone — is value-pinned.
#
# Scale shape: narrow map through unwrap+extract, ONE shuffle for the
# dedup groupBy, one combinable rollup. The WARC unwrap is the only
# Python crossing.
# ---------------------------------------------------------------------------

_WEB_MIN_TOKENS = 30


def _web_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    import gzip as _gzip

    import pandas as pd

    from .operators.text import html_to_text, tokens
    from .operators.webdataset import build_warc, parse_warc_records

    d = _t(spark, sf, "documents").select("doc_id", "source", "text")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def wrap_unwrap(it):
        # WARC-wrap the HTML page, then immediately unwrap through the
        # REAL parser — the ingest seam exercised inside the pipeline.
        for pdf in it:
            rows = []
            for did, source, text in zip(pdf["doc_id"].astype("int64"),
                                         pdf["source"], pdf["text"]):
                did = int(did)
                page = (f"<html><head><title>Doc {did}</title>"
                        f'<script>var x="<b>boiler</b>";</script></head>'
                        f"<body><nav>Home | About</nav><p>{text}</p>"
                        f"<!-- c --><footer>(c) 2024</footer>"
                        f"</body></html>").encode("utf-8")
                w = build_warc([("response", f"<urn:uuid:{did}>", page)])
                if did % 2 == 0:
                    w = _gzip.compress(w)
                resp = [r for r in parse_warc_records(w)
                        if r["type"] == "response"][0]
                rows.append({"doc_id": did, "source": source,
                             "html": resp["payload"].decode("utf-8")})
            yield pd.DataFrame(rows)

    pages = src.mapInPandas(wrap_unwrap,
                            "doc_id long, source string, html string")
    extracted = pages.select(
        "doc_id", "source", html_to_text(F.col("html")).alias("body"))
    gated = extracted.where(
        F.size(tokens(F.col("body"))) >= _WEB_MIN_TOKENS)
    from pyspark.sql import Window
    deduped = (gated
               .select("doc_id", "source", "body",
                       F.md5(F.col("body")).alias("h"))
               .withColumn("_keep",
                           F.min("doc_id").over(Window.partitionBy("h")))
               .where(F.col("doc_id") == F.col("_keep")))
    return (deduped.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_unique_pages"),
                 F.sum(F.size(tokens(F.col("body"))).cast("long"))
                  .alias("total_tokens"),
                 F.min("doc_id").alias("min_doc_id"))
            .transform(_sorted1, "source"))


register(
    "web_curation_pipeline",
    _web_curation_pipeline,
    f"""
WITH page AS (
  SELECT doc_id, source,
         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><script>var x="<b>boiler</b>";</script></head>'
         || '<body><nav>Home | About</nav><p>' || text || '</p>'
         || '<!-- c --><footer>(c) 2024</footer></body></html>' AS html
  FROM documents),
ext AS (
  SELECT doc_id, source,
         trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(html,
                   '(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>',
                   ' ', 'g'),
                 '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
             '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
             '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
           '\\s+', ' ', 'g')) AS body
  FROM page),
gated AS (
  SELECT doc_id, source, body
  FROM ext
  WHERE len(string_split_regex(trim(body), '\\s+')) >= {_WEB_MIN_TOKENS}),
keep AS (
  SELECT doc_id, source, body
  FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(body)) AS k
        FROM gated)
  WHERE doc_id = k)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_unique_pages,
       CAST(SUM(len(string_split_regex(trim(body), '\\s+'))) AS BIGINT)
         AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM keep GROUP BY source ORDER BY source
""",
    doc="Composed web-curation pipeline: WARC unwrap (gzip carriage) → "
        "codegen HTML text extraction → token gate → exact dedup of "
        "extracted bodies → per-source datasheet, the whole chain "
        "value-pinned as one oracle.",
)


# ---------------------------------------------------------------------------
# Chat-template manifest — SFT data construction: turns are rendered
# into one training string with role markers, and the ASSISTANT span's
# (offset, length) is published as the loss-mask interval (the bug
# class this pins: off-by-one mask boundaries silently train on the
# prompt or skip the target). Turns derive from the document's thirds
# (system/user/assistant) so the whole manifest is string arithmetic —
# rendered md5 + exact span offsets, bit-checkable in SQL. Narrow map.
# ---------------------------------------------------------------------------

_CHAT_SYS = "<|im_start|>system\n"
_CHAT_USR = "<|im_end|>\n<|im_start|>user\n"
_CHAT_AST = "<|im_end|>\n<|im_start|>assistant\n"
_CHAT_END = "<|im_end|>"


def _chat_template_manifest(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    n = F.length("text")
    sys_t = F.substring(F.col("text"), 1, F.floor(n / 3).cast("int"))
    usr_t = F.expr("substring(text, CAST(length(text) DIV 3 AS INT) + 1,"
                   " CAST(length(text) * 2 DIV 3 AS INT)"
                   " - CAST(length(text) DIV 3 AS INT))")
    ast_t = F.expr("substring(text,"
                   " CAST(length(text) * 2 DIV 3 AS INT) + 1)")
    rendered = F.concat(F.lit(_CHAT_SYS), sys_t, F.lit(_CHAT_USR), usr_t,
                        F.lit(_CHAT_AST), ast_t, F.lit(_CHAT_END))
    # loss-mask span: the assistant text itself (markers excluded)
    mask_start = (F.length(F.lit(_CHAT_SYS)) + F.length(sys_t)
                  + F.length(F.lit(_CHAT_USR)) + F.length(usr_t)
                  + F.length(F.lit(_CHAT_AST)) + 1).cast("long")
    return (d.select(
                "doc_id",
                F.length(rendered).cast("long").alias("rendered_len"),
                mask_start.alias("mask_start"),
                F.length(ast_t).cast("long").alias("mask_len"),
                F.md5(rendered).alias("rendered_md5"),
                F.expr("substring("
                       f"concat('{_CHAT_SYS}', substring(text, 1,"
                       " CAST(length(text) DIV 3 AS INT)),"
                       f" '{_CHAT_USR}',"
                       " substring(text, CAST(length(text) DIV 3 AS INT)"
                       " + 1, CAST(length(text) * 2 DIV 3 AS INT)"
                       " - CAST(length(text) DIV 3 AS INT)),"
                       f" '{_CHAT_AST}',"
                       " substring(text,"
                       " CAST(length(text) * 2 DIV 3 AS INT) + 1),"
                       f" '{_CHAT_END}'),"
                       " CAST(length(text) DIV 3 AS INT)"
                       f" + {len(_CHAT_SYS) + len(_CHAT_USR)}"
                       " + (CAST(length(text) * 2 DIV 3 AS INT)"
                       " - CAST(length(text) DIV 3 AS INT))"
                       f" + {len(_CHAT_AST)} + 1,"
                       " length(text)"
                       " - CAST(length(text) * 2 DIV 3 AS INT))")
                 .alias("mask_slice"))
             .orderBy("doc_id"))


register(
    "chat_template_manifest",
    _chat_template_manifest,
    f"""
WITH s AS (
  SELECT doc_id, text,
         substr(text, 1, length(text) // 3) AS sys_t,
         substr(text, length(text) // 3 + 1,
                length(text) * 2 // 3 - length(text) // 3) AS usr_t,
         substr(text, length(text) * 2 // 3 + 1) AS ast_t
  FROM documents),
r AS (
  SELECT doc_id, sys_t, usr_t, ast_t,
         '{_CHAT_SYS}' || sys_t || '{_CHAT_USR}' || usr_t
         || '{_CHAT_AST}' || ast_t || '{_CHAT_END}' AS rendered
  FROM s)
SELECT doc_id,
       CAST(length(rendered) AS BIGINT) AS rendered_len,
       CAST({len(_CHAT_SYS)} + length(sys_t) + {len(_CHAT_USR)}
            + length(usr_t) + {len(_CHAT_AST)} + 1 AS BIGINT)
         AS mask_start,
       CAST(length(ast_t) AS BIGINT) AS mask_len,
       md5(rendered) AS rendered_md5,
       substr(rendered,
              {len(_CHAT_SYS)} + length(sys_t) + {len(_CHAT_USR)}
              + length(usr_t) + {len(_CHAT_AST)} + 1,
              length(ast_t)) AS mask_slice
FROM r ORDER BY doc_id
""",
    doc="Chat-template manifest for SFT data: role-marker rendering "
        "with the assistant loss-mask span published as exact "
        "(offset, length) — and the slice AT that span republished, so "
        "an off-by-one mask boundary breaks the hash two ways.",
)


# ---------------------------------------------------------------------------
# Welch's t-test between sources — the significance test behind "is
# source A's mean document length actually different from B's?", the
# inferential companion of poisson_bootstrap_by_source. All sufficient
# statistics (n, Σx, Σx²) fold exactly as BIGINTs in one combinable
# pass; means, variances and the t statistic are a FIXED tree of
# double operations over those exact integers (divisions, one
# correctly-rounded sqrt) — bit-identical across engines, like the
# Pearson/PSI/Cramér queries. Published per source pair (all C(k,2)
# pairs of the ≤handful of sources), with Welch–Satterthwaite df.
# ---------------------------------------------------------------------------

def _welch_t_sources(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import tokens
    d = _t(spark, sf, "documents").select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("x"))
    stats = (d.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("x").alias("s"),
                   F.sum(F.col("x") * F.col("x")).alias("ss")))
    a = stats.select(F.col("source").alias("src_a"),
                     F.col("n").alias("na"), F.col("s").alias("sa"),
                     F.col("ss").alias("ssa"))
    b = stats.select(F.col("source").alias("src_b"),
                     F.col("n").alias("nb"), F.col("s").alias("sb"),
                     F.col("ss").alias("ssb"))
    p = a.crossJoin(b).where(F.col("src_a") < F.col("src_b"))

    def mean(s, n):
        return s.cast("double") / n.cast("double")

    def var(ss, s, n):
        # unbiased: (Σx² - (Σx)²/n) / (n-1), numerator from exact ints
        return ((ss.cast("double")
                 - (s * s).cast("double") / n.cast("double"))
                / (n - 1).cast("double"))

    ma, mb = mean(F.col("sa"), F.col("na")), mean(F.col("sb"), F.col("nb"))
    va = var(F.col("ssa"), F.col("sa"), F.col("na"))
    vb = var(F.col("ssb"), F.col("sb"), F.col("nb"))
    sea = va / F.col("na").cast("double")
    seb = vb / F.col("nb").cast("double")
    t = (ma - mb) / F.sqrt(sea + seb)
    df = ((sea + seb) * (sea + seb)
          / (sea * sea / (F.col("na") - 1).cast("double")
             + seb * seb / (F.col("nb") - 1).cast("double")))
    return (p.select("src_a", "src_b",
                     F.col("na").cast("long").alias("na"),
                     F.col("nb").cast("long").alias("nb"),
                     ma.alias("mean_a"), mb.alias("mean_b"),
                     t.alias("t_stat"), df.alias("welch_df"))
            .orderBy("src_a", "src_b"))


register(
    "welch_t_sources",
    _welch_t_sources,
    f"""
WITH d AS (SELECT source,
                  CAST(len(string_split_regex(trim(text), '\\s+'))
                       AS BIGINT) AS x
           FROM documents),
st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x) AS BIGINT) AS s,
              CAST(SUM(x * x) AS BIGINT) AS ss
       FROM d GROUP BY source),
p AS (SELECT a.source AS src_a, b.source AS src_b,
             a.n AS na, a.s AS sa, a.ss AS ssa,
             b.n AS nb, b.s AS sb, b.ss AS ssb
      FROM st a JOIN st b ON a.source < b.source),
c AS (SELECT *,
             CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
             ((CAST(ssa AS DOUBLE)
               - CAST(sa * sa AS DOUBLE) / CAST(na AS DOUBLE))
              / CAST(na - 1 AS DOUBLE)) / CAST(na AS DOUBLE) AS sea,
             ((CAST(ssb AS DOUBLE)
               - CAST(sb * sb AS DOUBLE) / CAST(nb AS DOUBLE))
              / CAST(nb - 1 AS DOUBLE)) / CAST(nb AS DOUBLE) AS seb
      FROM p)
SELECT src_a, src_b, na, nb,
       ma AS mean_a, mb AS mean_b,
       (ma - mb) / sqrt(sea + seb) AS t_stat,
       (sea + seb) * (sea + seb)
         / (sea * sea / CAST(na - 1 AS DOUBLE)
            + seb * seb / CAST(nb - 1 AS DOUBLE)) AS welch_df
FROM c ORDER BY src_a, src_b
""",
    doc="Welch's t-test between every source pair on mean token count: "
        "exact BIGINT sufficient statistics in one combinable pass, a "
        "fixed double tree (divisions + one correctly-rounded sqrt) "
        "for t and the Welch-Satterthwaite df — bit-exact inference.",
)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — the storage/dedup primitive behind
# LBFS (Muthitacharoen et al. 2001, public) and every dedup filesystem:
# chunk boundaries come from the CONTENT (cut after any position whose
# 8-char window hash ≡ 0 mod 64), so an insertion shifts only the
# chunks it touches — unlike fixed-size chunking, where one inserted
# byte re-keys every later chunk and destroys cross-version dedup.
# The stateless cut rule (no min/max clamps) keeps the whole pass
# relational: cut detection is a linear explode with the codegen md5
# window hash (the interpreted higher-order-function form would be
# ~10x slower — same finding as text.word_set_hits), per-doc cut
# lists are one bounded collect (avg n/64 cuts), and chunk
# re-expansion is an array transform. Published artifact: the
# per-source chunk-dedup datasheet (total vs distinct chunk mass —
# the ratio CDC exists to improve).
# ---------------------------------------------------------------------------

_CDC_W = 8
_CDC_MOD = 64


def _cdc_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import md5_hash
    d = _t(spark, sf, "documents").select(
        "doc_id", "source", "text",
        F.length("text").cast("int").alias("n"))
    wins = (d.where(F.col("n") >= _CDC_W)
             .select("doc_id",
                     F.explode(F.sequence(F.lit(_CDC_W), F.col("n")))
                      .alias("i"))
             .join(d.select("doc_id", "text"), "doc_id")
             .select("doc_id", "i",
                     md5_hash(F.expr(f"substring(text, i - {_CDC_W - 1},"
                                     f" {_CDC_W})")).alias("h")))
    cuts = (wins.where(F.col("h") % _CDC_MOD == 0)
                .groupBy("doc_id")
                .agg(F.sort_array(F.collect_list("i")).alias("cuts")))
    bounded = (d.join(cuts, "doc_id", "left")
                .select("doc_id", "source", "text",
                        F.concat(F.array(F.lit(0)),
                                 F.coalesce("cuts",
                                            F.array().cast("array<int>")),
                                 F.array(F.col("n"))).alias("b")))
    chunks = (bounded
              .select("doc_id", "source", "text",
                      F.explode(F.expr(
                          "transform(sequence(0, size(b) - 2),"
                          " j -> struct(b[j] AS start,"
                          " b[j + 1] - b[j] AS len))")).alias("c"))
              .where(F.col("c.len") > 0)
              .select("source",
                      F.col("c.len").cast("long").alias("len"),
                      F.md5(F.expr("substring(text, c.start + 1, c.len)"))
                       .alias("ch")))
    return (chunks.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.countDistinct("ch").alias("n_distinct_chunks"),
                 F.sum("len").alias("total_chars"),
                 F.expr("CAST(sum(len) * 1000 DIV count(*) AS BIGINT)")
                  .alias("mean_chunk_len_milli"))
            .orderBy("source"))


register(
    "cdc_chunk_dedup",
    _cdc_chunk_dedup,
    f"""
WITH d AS (SELECT doc_id, source, text,
                  CAST(length(text) AS INT) AS n
           FROM documents),
cuts AS (
  SELECT doc_id,
         list_sort(list_filter(
           list_transform(range({_CDC_W}, n + 1), i ->
             CASE WHEN ('0x' || substr(md5(
                          substr(text, CAST(i AS INT) - {_CDC_W - 1},
                                 {_CDC_W})), 1, 12))::BIGINT
                       % {_CDC_MOD} = 0
                  THEN CAST(i AS INT) END),
           x -> x IS NOT NULL)) AS cs
  FROM d WHERE n >= {_CDC_W}),
b AS (
  SELECT d.doc_id, d.source, d.text,
         list_concat(list_concat([0], COALESCE(cs, [])), [d.n]) AS bd
  FROM d LEFT JOIN cuts ON d.doc_id = cuts.doc_id),
ch AS (
  SELECT source,
         CAST(bd[CAST(j + 2 AS INT)] - bd[CAST(j + 1 AS INT)] AS BIGINT)
           AS len,
         md5(substr(text, CAST(bd[CAST(j + 1 AS INT)] + 1 AS INT),
                    CAST(bd[CAST(j + 2 AS INT)]
                         - bd[CAST(j + 1 AS INT)] AS INT))) AS h
  FROM b, LATERAL (SELECT unnest(range(0, len(bd) - 1)) AS j)
  WHERE bd[CAST(j + 2 AS INT)] - bd[CAST(j + 1 AS INT)] > 0)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_chunks,
       CAST(SUM(len) AS BIGINT) AS total_chars,
       CAST(SUM(len) * 1000 // COUNT(*) AS BIGINT)
         AS mean_chunk_len_milli
FROM ch GROUP BY source ORDER BY source
""",
    doc="Content-defined chunking (LBFS Rabin cut points via the "
        "codegen md5 window hash): insertion-stable chunk boundaries, "
        "per-source chunk-dedup datasheet (total vs distinct chunk "
        "mass) — the cross-version dedup primitive.",
)


# ---------------------------------------------------------------------------
# Charset sniffing — the encoding-detection pass at the very front of
# text ingest (crawl payloads lie about their encodings). Per doc_id
# class, a payload is synthesized as (0) UTF-8 with real multibyte
# sequences, (1) Latin-1 high bytes that are INVALID UTF-8, or (2)
# UTF-16LE with BOM; the detector is real: BOM check, then a strict
# UTF-8 decode (Python's validator — the reference decoder), falling
# back to Latin-1 (never fails, the curation convention). Detected
# charset, decoded char count and the decoded-text md5 are value-
# pinned — a detector that mislabels class 1 as UTF-8 or drops the
# BOM from class 2 breaks the hash.
# ---------------------------------------------------------------------------

def _charset_sniff(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    import pandas as pd

    d = _t(spark, sf, "documents").select("doc_id", "text")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def sniff(it):
        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"].astype("int64"),
                                 pdf["text"]):
                did = int(did)
                s = str(text)
                if did % 3 == 0:
                    payload = (s + " café—fin").encode("utf-8")
                elif did % 3 == 1:
                    payload = s.encode("latin-1") + bytes([0xE9, 0x20,
                                                           0xFC])
                else:
                    payload = "\ufeff".encode("utf-16-le") \
                        + s.encode("utf-16-le")
                # --- the real detector ---
                if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
                    enc = ("utf-16-le" if payload[:2] == b"\xff\xfe"
                           else "utf-16-be")
                    decoded = payload[2:].decode(enc)
                    detected = enc
                else:
                    try:
                        decoded = payload.decode("utf-8", "strict")
                        detected = "utf-8"
                    except UnicodeDecodeError:
                        decoded = payload.decode("latin-1")
                        detected = "latin-1"
                rows.append({"doc_id": did, "detected": detected,
                             "byte_len": len(payload),
                             "n_chars": len(decoded),
                             "text_md5": hashlib.md5(
                                 decoded.encode("utf-8")).hexdigest()})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(sniff, "doc_id long, detected string,"
                                   " byte_len long, n_chars long,"
                                   " text_md5 string")
               .orderBy("doc_id"))


register(
    "charset_sniff",
    _charset_sniff,
    """
WITH b AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS bl,
         CAST(length(text) AS BIGINT) AS cl
  FROM documents)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'utf-8'
                       WHEN 1 THEN 'latin-1'
                       ELSE 'utf-16-le' END AS detected,
       CASE doc_id % 3
            -- ' café—fin': ' caf'(4B) + e-acute(2B) + em-dash(3B)
            -- + 'fin'(3B) = 12 bytes appended to the UTF-8 text
            WHEN 0 THEN bl + 12
            -- latin-1 text bytes (ASCII corpus: = char count) + 3 raw
            WHEN 1 THEN cl + 3
            -- BOM + UTF-16LE code units (ASCII corpus: 2B per char)
            ELSE 2 * cl + 2 END AS byte_len,
       CASE doc_id % 3
            WHEN 0 THEN cl + 9         -- 9 appended characters
            WHEN 1 THEN cl + 3         -- 3 latin-1 chars
            ELSE cl END AS n_chars,
       CASE doc_id % 3
            WHEN 0 THEN md5(text || ' caf' || chr(233) || chr(8212)
                            || 'fin')
            WHEN 1 THEN md5(text || chr(233) || chr(32) || chr(252))
            ELSE md5(text) END AS text_md5
FROM b ORDER BY doc_id
""",
    doc="Real charset detection at the ingest boundary: BOM check, "
        "strict UTF-8 validation, Latin-1 fallback over synthesized "
        "UTF-8/Latin-1/UTF-16LE payloads — detected encoding, char "
        "count and decoded-text md5 all value-pinned.",
)


# ---------------------------------------------------------------------------
# Snapshot diff — dataset versioning's core op: given two corpus
# versions, classify every doc as kept / changed / removed / added and
# publish the per-source churn datasheet (the audit a lake format
# derives from its manifests, computed here content-level: md5 of the
# text, not file identity). v2 is synthesized deterministically from
# v1 — every 10th doc edited, every 17th dropped, 100 fresh ids added
# — so the oracle knows the truth arithmetically. One full-outer join
# on doc_id (the natural key); at 100 TB both sides bucket/co-locate
# on that key.
# ---------------------------------------------------------------------------

def _snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").select("doc_id", "source", "text")
    v2 = (d.where(F.col("doc_id") % 17 != 0)
           .select("doc_id", "source",
                   F.when(F.col("doc_id") % 10 == 0,
                          F.concat(F.col("text"), F.lit(" [edited]")))
                    .otherwise(F.col("text")).alias("text")))
    added = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                     "source", F.col("text").alias("text")) \
             .orderBy("doc_id").limit(100)
    v2 = v2.unionByName(added)
    j = (d.select("doc_id", "source", F.md5("text").alias("h1"))
          .join(v2.select("doc_id",
                          F.col("source").alias("source2"),
                          F.md5("text").alias("h2")),
                "doc_id", "full_outer"))
    status = (F.when(F.col("h1").isNull(), F.lit("added"))
               .when(F.col("h2").isNull(), F.lit("removed"))
               .when(F.col("h1") == F.col("h2"), F.lit("kept"))
               .otherwise(F.lit("changed")))
    return (j.select(F.coalesce("source", "source2").alias("source"),
                     status.alias("status"))
             .groupBy("source", "status")
             .agg(F.count(F.lit(1)).alias("n_docs"))
             .orderBy("source", "status"))


register(
    "snapshot_diff",
    _snapshot_diff,
    """
WITH v2 AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 THEN text || ' [edited]'
              ELSE text END AS text
  FROM documents WHERE doc_id % 17 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, source, text
  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 100)),
j AS (
  SELECT COALESCE(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN md5(a.text) = md5(b.text) THEN 'kept'
              ELSE 'changed' END AS status
  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM j GROUP BY source, status ORDER BY source, status
""",
    doc="Dataset snapshot diff: content-level kept/changed/removed/"
        "added classification via one full-outer join on the natural "
        "key, per-source churn datasheet — lake versioning's audit "
        "artifact.",
)


# ---------------------------------------------------------------------------
# MinHash band-configuration ablation — the tuning datasheet BEHIND the
# (bands, rows) choice: the same 8-perm signature table banded three
# ways (8x1, 4x2, 2x4), reporting per config the colliding-bucket
# count, the largest bucket, the collision SLOTS (sum of C(size,2) —
# the actual LSH join cost, which is what explodes on boilerplate
# corpora) and the distinct candidate pairs. Moving along this table
# trades recall (more bands -> catches lower Jaccard) against join
# cost; dedup_threshold_curve picks the verify threshold AFTER a
# config is chosen, this picks the config. One signature aggregation
# shared by all three configs; each banding is a projection + one
# grouped count over (band, bh).
# ---------------------------------------------------------------------------

_ABL_CONFIGS = (8, 4, 2)


def _minhash_band_ablation(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.dedup_fuzzy import _band_buckets, minhash_signatures
    sigs = minhash_signatures(_t(spark, sf, "documents")).cache()
    out = None
    for n_bands in _ABL_CONFIGS:
        bb = _band_buckets(sigs, "doc_id", n_bands)
        buckets = (bb.groupBy("band", "bh")
                     .agg(F.count(F.lit(1)).alias("sz")))
        stats = buckets.agg(
            F.sum(F.when(F.col("sz") >= 2, 1).otherwise(0))
             .cast("long").alias("colliding_buckets"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
             .cast("long").alias("collision_slots"))
        pairs = (bb.alias("a")
                 .join(bb.alias("b"),
                       (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bh") == F.col("b.bh"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                 .select("a.doc_id", "b.doc_id").distinct()
                 .agg(F.count(F.lit(1)).cast("long")
                       .alias("candidate_pairs")))
        row = (stats.crossJoin(pairs)
               .select(F.lit(n_bands).cast("long").alias("n_bands"),
                       F.lit(8 // n_bands).cast("long")
                        .alias("rows_per_band"),
                       "colliding_buckets", "max_bucket",
                       "collision_slots", "candidate_pairs"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_bands")


def _ablation_config_sql(n_bands: int) -> str:
    bands = _bands_sql(8, n_bands)
    return f"""
  SELECT CAST({n_bands} AS BIGINT) AS n_bands,
         CAST({8 // n_bands} AS BIGINT) AS rows_per_band,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT band, bh FROM ({bands}) GROUP BY band, bh
                HAVING COUNT(*) >= 2)) AS colliding_buckets,
         (SELECT CAST(MAX(sz) AS BIGINT)
          FROM (SELECT COUNT(*) AS sz FROM ({bands})
                GROUP BY band, bh)) AS max_bucket,
         (SELECT CAST(SUM(sz * (sz - 1) // 2) AS BIGINT)
          FROM (SELECT COUNT(*) AS sz FROM ({bands})
                GROUP BY band, bh)) AS collision_slots,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT DISTINCT a.doc_id, b.doc_id AS d2
                FROM ({bands}) a JOIN ({bands}) b
                  ON a.band = b.band AND a.bh = b.bh
                 AND a.doc_id < b.doc_id)) AS candidate_pairs
"""


register(
    "minhash_band_ablation",
    lambda spark, sf: _minhash_band_ablation(spark, sf),
    f"""
WITH {_DUCK_HS},
sig AS (SELECT doc_id, {_SIG_SQL} FROM hs GROUP BY doc_id)
{" UNION ALL ".join(_ablation_config_sql(b) for b in _ABL_CONFIGS)}
ORDER BY n_bands
""",
    doc="MinHash (bands, rows) tuning ablation: the same 8-perm "
        "signatures banded 8x1 / 4x2 / 2x4, with colliding buckets, "
        "max bucket, collision slots (the LSH join cost) and distinct "
        "candidate pairs per config — the recall-vs-cost table that "
        "picks the production shape.",
)


# ---------------------------------------------------------------------------
# Shuffle-quality audit — how well does a training order break up
# same-source runs? Real loaders can't always afford the seeded FULL
# shuffle (training_order_manifest); they shuffle shard blocks and
# keep within-block order. This audit quantifies the difference: for
# each candidate order, documents get dense positions (two-pass row
# ids — no global window), adjacent pairs come from an equi-join on
# position+1, and the published metric is the same-source adjacency
# rate vs the EXACT independence expectation Σ c_s(c_s-1) / (n(n-1))
# (integer arithmetic to one milli division). ratio≈1000 = well mixed;
# >>1000 = source-clumped batches (correlated gradients). Orders
# audited: raw doc_id, seeded full shuffle, 64-doc block shuffle
# (blocks reordered by hash, within-block order kept).
# ---------------------------------------------------------------------------

_SHUF_BLOCK = 64


def _shuffle_quality_audit(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.dedup import add_row_id
    from .operators.text import md5_hash
    d = _t(spark, sf, "documents").select("doc_id", "source")
    full_key = md5_hash(F.concat(F.lit("epoch0:"),
                                 F.col("doc_id").cast("string")))
    block = (F.col("doc_id") / _SHUF_BLOCK).cast("long")
    block_key = md5_hash(F.concat(F.lit("blk0:"), block.cast("string")))
    orders = {
        "raw_docid": [F.asc("doc_id")],
        "full_shuffle": [F.asc(full_key.alias("_k")), F.asc("doc_id")],
        "block_shuffle": [F.asc(block_key.alias("_k")), F.asc("doc_id")],
    }
    # exact independence expectation from per-source counts (shared)
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    expected = counts.agg(
        F.sum(F.col("c") * (F.col("c") - 1)).alias("same_mass"),
        F.sum("c").alias("n"))
    out = None
    for name, keys in orders.items():
        pos = add_row_id(d, keys, name="pos")
        adj = (pos.select(F.col("pos").alias("p"),
                          F.col("source").alias("s1"))
                  .join(pos.select((F.col("pos") - 1).alias("p"),
                                   F.col("source").alias("s2")), "p"))
        row = (adj.agg(
                   F.count(F.lit(1)).alias("n_adjacent"),
                   F.sum((F.col("s1") == F.col("s2")).cast("long"))
                    .alias("same_source_adjacent"))
               .crossJoin(F.broadcast(expected))
               .select(
                   F.lit(name).alias("order_name"),
                   "n_adjacent", "same_source_adjacent",
                   # observed and expected rates in milli, exact ints
                   F.expr("CAST(same_source_adjacent * 1000"
                          " DIV n_adjacent AS BIGINT)")
                    .alias("observed_milli"),
                   F.expr("CAST(same_mass * 1000 DIV (n * (n - 1))"
                          " AS BIGINT)").alias("expected_milli")))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("order_name")


register(
    "shuffle_quality_audit",
    _shuffle_quality_audit,
    f"""
WITH d AS (SELECT doc_id, source FROM documents),
e AS (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS same_mass,
             CAST(SUM(c) AS BIGINT) AS n
      FROM (SELECT COUNT(*) AS c FROM d GROUP BY source)),
keyed AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)),
                         1, 12))::BIGINT AS fk,
         ('0x' || substr(md5('blk0:' ||
                             CAST(doc_id // {_SHUF_BLOCK} AS VARCHAR)),
                         1, 12))::BIGINT AS bk
  FROM d),
p AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS p_raw,
         ROW_NUMBER() OVER (ORDER BY fk, doc_id) AS p_full,
         ROW_NUMBER() OVER (ORDER BY bk, doc_id) AS p_block
  FROM keyed),
m AS (
  SELECT 'raw_docid' AS order_name,
         CAST(COUNT(*) AS BIGINT) AS n_adjacent,
         CAST(SUM(CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
              AS BIGINT) AS same_source_adjacent
  FROM p a JOIN p b ON b.p_raw = a.p_raw + 1
  UNION ALL
  SELECT 'full_shuffle', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM p a JOIN p b ON b.p_full = a.p_full + 1
  UNION ALL
  SELECT 'block_shuffle', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM p a JOIN p b ON b.p_block = a.p_block + 1)
SELECT order_name, n_adjacent, same_source_adjacent,
       CAST(same_source_adjacent * 1000 // n_adjacent AS BIGINT)
         AS observed_milli,
       (SELECT CAST(same_mass * 1000 // (n * (n - 1)) AS BIGINT) FROM e)
         AS expected_milli
FROM m ORDER BY order_name
""",
    doc="Shuffle-quality audit for training orders: same-source "
        "adjacency rate of raw / seeded-full-shuffle / 64-block-"
        "shuffle orders vs the exact independence expectation — dense "
        "two-pass positions plus successor equi-joins, no global "
        "window, all-integer metrics.",
)


# ---------------------------------------------------------------------------
# FK-consistent pseudonymization audit — the privacy transform that has
# to hold BEFORE a dataset ships: raw user ids are replaced by salted
# hash pseudonyms (a pure Column expression, applied independently per
# table — no lookup table to leak), and the audit proves the two
# invariants that make pseudonymized data still usable: (1) no
# collisions (distinct pseudonyms == distinct raw ids), and (2)
# referential behavior is preserved (the events⋈customers match mass
# on pseudonyms equals the match mass on raw keys). Both sides compute
# the same salted md5, so the invariants are value-pinned, not assumed.
# ---------------------------------------------------------------------------

_PSEUDO_SALT = "release-2024"


def _pseudonymize_fk_audit(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.text import md5_hash

    def pseud(c):
        return md5_hash(F.concat(F.lit(_PSEUDO_SALT + ":"),
                                 c.cast("string")))

    ev = _t(spark, sf, "events").select(
        F.col("user_id").alias("uid"),
        pseud(F.col("user_id")).alias("puid"))
    cu = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("cid"),
        pseud(F.col("c_custkey")).alias("pcid"))
    raw_matches = ev.join(cu, ev.uid == cu.cid).count()
    pseudo_matches = ev.join(cu, ev.puid == cu.pcid).count()
    stats = ev.agg(
        F.countDistinct("uid").alias("distinct_users"),
        F.countDistinct("puid").alias("distinct_pseudonyms"),
        F.count(F.lit(1)).alias("n_events"))
    return stats.select(
        "n_events", "distinct_users", "distinct_pseudonyms",
        (F.col("distinct_users") == F.col("distinct_pseudonyms"))
         .alias("collision_free"),
        F.lit(raw_matches).cast("long").alias("raw_join_matches"),
        F.lit(pseudo_matches).cast("long").alias("pseudo_join_matches"),
        F.lit(raw_matches == pseudo_matches).alias("fk_preserved"))


register(
    "pseudonymize_fk_audit",
    _pseudonymize_fk_audit,
    f"""
WITH ev AS (
  SELECT user_id AS uid,
         ('0x' || substr(md5('{_PSEUDO_SALT}:'
                             || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
           AS puid
  FROM events),
cu AS (
  SELECT c_custkey AS cid,
         ('0x' || substr(md5('{_PSEUDO_SALT}:'
                             || CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
           AS pcid
  FROM customer),
m AS (SELECT
        (SELECT COUNT(*) FROM ev JOIN cu ON ev.uid = cu.cid)
          AS raw_join_matches,
        (SELECT COUNT(*) FROM ev JOIN cu ON ev.puid = cu.pcid)
          AS pseudo_join_matches)
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT uid) AS BIGINT) AS distinct_users,
       CAST(COUNT(DISTINCT puid) AS BIGINT) AS distinct_pseudonyms,
       COUNT(DISTINCT uid) = COUNT(DISTINCT puid) AS collision_free,
       (SELECT CAST(raw_join_matches AS BIGINT) FROM m)
         AS raw_join_matches,
       (SELECT CAST(pseudo_join_matches AS BIGINT) FROM m)
         AS pseudo_join_matches,
       (SELECT raw_join_matches = pseudo_join_matches FROM m)
         AS fk_preserved
FROM ev
""",
    doc="FK-consistent pseudonymization audit: salted-hash pseudonyms "
        "applied independently per table, with collision-freeness and "
        "preserved events-customers join mass value-pinned — the "
        "privacy transform proven usable, not assumed.",
)


# ---------------------------------------------------------------------------
# Greedy longest-match (WordPiece-style) tokenization — the
# inference-side tokenizer family next to BPE's merge-table encode: at
# each cursor position take the LONGEST vocab entry matching the text
# prefix, falling back to a single character (the unk path). Vocab is
# the corpus's top-50 frequent words (vocab-sized collect, the same
# posture as the BPE symbol table); segmentation runs over each doc's
# first 64 chars (bounds the oracle's recursion depth). The oracle
# replays the EXACT greedy walk as a recursive CTE over a PRECOMPUTED
# (doc, pos) → longest-match table (r8: one hash join per step
# instead of three correlated vocab scans — 13s → 2.6s), so token
# counts, fallback counts and the md5 of the full segmentation are
# all value-pinned. Only one vocab term of a given length can match
# a given prefix, so the greedy choice is unambiguous on both
# engines.
# ---------------------------------------------------------------------------

_MM_PREFIX = 64
_MM_VOCAB = 50


def _maxmatch_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib

    import pandas as pd

    from .operators.text import tokens
    d = _t(spark, sf, "documents")
    vocab_rows = (d.select(F.explode(tokens(F.col("text"))).alias("t"))
                   .where(F.length("t") >= 2)
                   .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
                   .orderBy(F.desc("c"), F.asc("t"))
                   .limit(_MM_VOCAB).collect())
    vocab = [r["t"] for r in vocab_rows]
    by_len: dict[int, set] = {}
    for t in vocab:
        by_len.setdefault(len(t), set()).add(t)
    lengths = sorted(by_len, reverse=True)

    src = (d.select("doc_id",
                    F.substring("text", 1, _MM_PREFIX).alias("stub"))
            .repartition(spark.sparkContext.defaultParallelism))

    def seg(it):
        for pdf in it:
            rows = []
            for did, s in zip(pdf["doc_id"].astype("int64"),
                              pdf["stub"]):
                s = str(s)
                pos, toks, nf = 0, [], 0
                while pos < len(s):
                    for ln in lengths:
                        cand = s[pos:pos + ln]
                        if len(cand) == ln and cand in by_len[ln]:
                            toks.append(cand)
                            pos += ln
                            break
                    else:
                        toks.append(s[pos])
                        nf += 1
                        pos += 1
                joined = "".join("|" + t for t in toks)
                rows.append({"doc_id": int(did),
                             "n_tok": len(toks), "n_fallback": nf,
                             "toks_md5": hashlib.md5(
                                 joined.encode("utf-8")).hexdigest()})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(seg, "doc_id long, n_tok long,"
                                 " n_fallback long, toks_md5 string")
               .transform(_sorted1, "doc_id"))


register(
    "maxmatch_tokenize",
    _maxmatch_tokenize,
    f"""
WITH RECURSIVE vocab AS (
  SELECT t AS term FROM (
    SELECT t, COUNT(*) AS c
    FROM (SELECT unnest({_DUCK_TOKENS}) AS t FROM documents)
    WHERE length(t) >= 2
    GROUP BY t ORDER BY c DESC, t LIMIT {_MM_VOCAB})),
d AS (SELECT doc_id, substr(text, 1, {_MM_PREFIX}) AS stub
      FROM documents),
-- Precompute the longest vocab match at EVERY (doc, pos) once, so the
-- recursion below is a plain hash join per step instead of three
-- correlated vocab scans per row per step (the r7 16s outlier).
best AS (
  SELECT d.doc_id, p.pos,
         max_by(v.term, length(v.term)) AS term,
         CAST(MAX(length(v.term)) AS INTEGER) AS len
  FROM d
  CROSS JOIN (SELECT CAST(g AS INTEGER) AS pos
              FROM generate_series(1, {_MM_PREFIX}) s(g)) p
  JOIN vocab v ON substr(d.stub, p.pos, length(v.term)) = v.term
  GROUP BY d.doc_id, p.pos),
seg AS (
  SELECT doc_id, stub, 1 AS pos, '' AS toks,
         0 AS n_tok, 0 AS n_fallback
  FROM d
  UNION ALL
  SELECT s.doc_id, s.stub,
         s.pos + COALESCE(b.len, 1),
         s.toks || '|' || COALESCE(b.term, substr(s.stub, s.pos, 1)),
         s.n_tok + 1,
         s.n_fallback + CASE WHEN b.term IS NULL THEN 1 ELSE 0 END
  FROM seg s
  LEFT JOIN best b ON b.doc_id = s.doc_id AND b.pos = s.pos
  WHERE s.pos <= length(s.stub))
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(n_fallback AS BIGINT) AS n_fallback,
       md5(toks) AS toks_md5
FROM seg WHERE pos > length(stub)
ORDER BY doc_id
""",
    doc="Greedy longest-match (WordPiece-style) tokenization against "
        "the corpus's top-50 word vocab with single-char fallback, "
        "over 64-char prefixes — token/fallback counts and the full "
        "segmentation md5 replayed by a recursive-CTE oracle.",
)


# ---------------------------------------------------------------------------
# Chroma-subsampled baseline JPEG decode roundtrip — closes the
# dominant real-world JPEG shape (4:2:0) left out of subset in r7
# (VERDICT r7 item 3). Each document becomes a genuine 32x32
# interleaved-MCU stream: even doc_ids 4:2:0 (Y 2x2 + restart markers,
# so RSTn + all-three-DC-predictor resets run inside the hashed data),
# odd doc_ids 4:2:2 (Y 2x1). Luma is 16 flat 8x8 blocks derived from
# doc_id; chroma planes are flat at doc_id-derived values, so the box
# subsample (flat -> flat), the FDCT/IDCT pair (DC basis constant), and
# the replication upsample are all bit-exact and DuckDB recomputes
# every published stat arithmetically. The decoded SOF sampling factors
# are published too, pinning the A.2.3 MCU-interleave parse itself.
#
# Scale shape: identical to jpeg_decode_roundtrip — two Arrow
# crossings, zero shuffles before the final sort, per-row work only.
# ---------------------------------------------------------------------------

def _jpeg420_decode_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.jpegcodec import decode_baseline, encode_baseline_ycbcr

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                y = np.zeros((32, 32), dtype=np.uint8)
                for k in range(16):
                    by, bx = divmod(k, 4)
                    y[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                        (did * 31 + 97 * k) % 256
                cbv = (did * 53 + 11) % 256
                crv = (did * 71 + 29) % 256
                if did % 2 == 0:
                    cb = np.full((16, 16), cbv, dtype=np.uint8)
                    cr = np.full((16, 16), crv, dtype=np.uint8)
                    p = encode_baseline_ycbcr(
                        y, cb, cr, sampling=((2, 2), (1, 1), (1, 1)),
                        restart_interval=2)
                else:
                    cb = np.full((32, 16), cbv, dtype=np.uint8)
                    cr = np.full((32, 16), crv, dtype=np.uint8)
                    p = encode_baseline_ycbcr(
                        y, cb, cr, sampling=((2, 1), (1, 1), (1, 1)))
                payloads.append(p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_baseline(bytes(p))
                sam = r["sampling"]
                samp = ("420" if sam == [(2, 2), (1, 1), (1, 1)] else
                        "422" if sam == [(2, 1), (1, 1), (1, 1)] else
                        "other")
                yp = r["planes"][0].astype("int64")
                cbp = r["planes"][1].astype("int64")
                crp = r["planes"][2].astype("int64")
                rows.append({
                    "doc_id": int(did), "samp": samp,
                    "out_w": r["width"], "out_h": r["height"],
                    "y_sum": int(yp.sum()),
                    "y_min": int(yp.min()), "y_max": int(yp.max()),
                    "cb_const": int(cbp.min()),
                    "cr_const": int(crp.min()),
                    "chroma_flat": bool(cbp.min() == cbp.max()
                                        and crp.min() == crp.max()
                                        and cbp.shape == (32, 32)),
                })
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, samp string, out_w long,"
                                 " out_h long, y_sum long, y_min long,"
                                 " y_max long, cb_const long,"
                                 " cr_const long, chroma_flat boolean")
               .transform(_sorted1, "doc_id"))


register(
    "jpeg420_decode_roundtrip",
    _jpeg420_decode_roundtrip,
    """
WITH ks AS (SELECT CAST(g AS BIGINT) AS k FROM generate_series(0, 15) s(g)),
v AS (SELECT d.doc_id,
             SUM((d.doc_id * 31 + 97 * ks.k) % 256) AS sv,
             MIN((d.doc_id * 31 + 97 * ks.k) % 256) AS mn,
             MAX((d.doc_id * 31 + 97 * ks.k) % 256) AS mx
      FROM documents d CROSS JOIN ks GROUP BY d.doc_id)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN '420' ELSE '422' END AS samp,
       CAST(32 AS BIGINT) AS out_w,
       CAST(32 AS BIGINT) AS out_h,
       CAST(64 * sv AS BIGINT) AS y_sum,
       CAST(mn AS BIGINT) AS y_min,
       CAST(mx AS BIGINT) AS y_max,
       CAST((doc_id * 53 + 11) % 256 AS BIGINT) AS cb_const,
       CAST((doc_id * 71 + 29) % 256 AS BIGINT) AS cr_const,
       TRUE AS chroma_flat
FROM v ORDER BY doc_id
""",
    doc="4:2:0 / 4:2:2 chroma-subsampled baseline JPEG roundtrip: "
        "genuine interleaved-MCU streams (restart markers on the 4:2:0 "
        "half) encoded and entropy-decoded by the real T.81 codec, "
        "with per-plane stats and the parsed SOF sampling factors "
        "hash-verified against doc_id arithmetic.",
)


# ---------------------------------------------------------------------------
# Public-Suffix-List edge-case suite (VERDICT r7 item 6): registrable-
# domain extraction over the hosts that distinguish a real PSL
# implementation from the two-label heuristic — uk/jp/au multi-label
# suffixes, the *.kawasaki.jp city wildcards, the !city.kawasaki.jp /
# !www.ck exception rules, wildcard-only TLDs (*.ck, *.np), IP
# literals and suffix-only hosts. The Spark side runs the generic
# expression chain (operators/urls.registrable_domain); the oracle
# hardcodes the HUMAN-derived expected answer per template (not the
# generated SQL mirror), so a shared bug in the rule tables cannot
# self-confirm. Fully narrow, codegen, zero Python crossings.
# ---------------------------------------------------------------------------

_PSL_CASES = [
    # (host, expected registrable domain per publicsuffix.org rules)
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("blog.x.co.uk", "x.co.uk"),
    ("co.uk", "co.uk"),                      # host IS a public suffix
    ("www.gov.uk", "www.gov.uk"),
    ("example.tokyo.jp", "example.tokyo.jp"),
    ("sub.example.tokyo.jp", "example.tokyo.jp"),
    ("example.kawasaki.jp", "example.kawasaki.jp"),   # *.kawasaki.jp
    ("foo.example.kawasaki.jp", "foo.example.kawasaki.jp"),
    ("a.b.example.kawasaki.jp", "b.example.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),         # !city.kawasaki.jp
    ("www.city.kawasaki.jp", "city.kawasaki.jp"),
    ("www.ck", "www.ck"),                             # !www.ck
    ("shop.www.ck", "www.ck"),
    ("foo.bar.ck", "foo.bar.ck"),                     # *.ck
    ("bar.ck", "bar.ck"),                    # host IS a wildcard suffix
    ("example.com.au", "example.com.au"),
    ("deep.sub.example.com.au", "example.com.au"),
    ("example.gob.pe", "example.gob.pe"),
    ("10.1.2.3", "10.1.2.3"),                         # IPv4 literal
    ("localhost", "localhost"),                       # single label
    ("example.co", "example.co"),            # flat ccTLD, default rule
    ("b.example.np", "b.example.np"),                 # *.np
    ("x.k12.tr", "x.k12.tr"),
]


def _psl_registrable_domain(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.urls import registrable_domain
    d = _t(spark, sf, "documents").select("doc_id")
    hosts = F.array(*[F.lit(h) for h, _ in _PSL_CASES])
    host = F.element_at(hosts, (F.col("doc_id") % len(_PSL_CASES) + 1)
                        .cast("int"))
    return (d.select("doc_id", host.alias("host"))
             .withColumn("domain", registrable_domain(F.col("host")))
             .transform(_sorted1, "doc_id"))


register(
    "psl_registrable_domain",
    _psl_registrable_domain,
    f"""
SELECT doc_id,
       CASE doc_id % {len(_PSL_CASES)}
         {" ".join(f"WHEN {i} THEN '{h}'"
                   for i, (h, _) in enumerate(_PSL_CASES))}
       END AS host,
       CASE doc_id % {len(_PSL_CASES)}
         {" ".join(f"WHEN {i} THEN '{e}'"
                   for i, (_, e) in enumerate(_PSL_CASES))}
       END AS domain
FROM documents ORDER BY doc_id
""",
    doc="PSL registrable-domain edge cases: multi-label suffixes, "
        "*.kawasaki.jp/*.ck wildcards, !city/!www exception rules, "
        "suffix-only hosts, IP literals — generic expression chain vs "
        "hand-derived expected answers (not the generated mirror).",
)


# ---------------------------------------------------------------------------
# MP3 Layer-III side-info / bit-reservoir audit (VERDICT r7 item 8):
# the corruption-taxonomy layer between the frame walk and a real
# synthesis-filter decode. Each document synthesizes a mono CBR stream
# whose 17-byte side-info blocks carry REAL packed bits — a
# main_data_begin that grows with the modeled reservoir (LEAST of the
# 511-byte cap, the accumulated main-data bytes, and a doc-derived
# ramp), plus per-granule part2_3_length / big_values within their
# spec bounds — and the parser re-walks the bitstream, enforcing the
# reservoir invariants (main_data_begin ≤ accumulated ∧ ≤ 511,
# big_values ≤ 288, part2_3 bits addressable) and returning exact
# integer aggregates DuckDB recomputes arithmetically. Because
# main_data_begin's three LEAST terms are all increasing in the frame
# index, the max is the last frame's value — the oracle needs no
# per-frame scan for it.
# ---------------------------------------------------------------------------

def _mp3_sideinfo_audit(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from .operators.multimodal import (_MP3_BITRATES, _MP3_RATES,
                                       parse_mp3_sideinfo)

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                bidx = 2 + did % 12
                ridx = did % 3
                nf = 2 + did % 3
                br, sr = _MP3_BITRATES[bidx], _MP3_RATES[ridx]
                flen = 144 * br * 1000 // sr
                main_len = flen - 21
                chunks = [b"ID3\x04\x00\x00" + bytes([0, 0, 0, 11])
                          + b"tag-payload"]
                for k in range(nf):
                    hdr = bytes([0xFF, 0xFB,
                                 (bidx << 4) | (ridx << 2), 0xC0])
                    bits: list[tuple[int, int]] = []  # (value, width)
                    mdb = min(511, k * main_len, 37 * k + did % 101)
                    bits.append((mdb, 9))
                    bits.append((0, 5))          # private
                    bits.append((0, 4))          # scfsi (mono)
                    for g in range(2):
                        bits.append(((did * 7 + k * 13 + g * 5) % 396,
                                     12))        # part2_3_length
                        bits.append(((did * 3 + k + g) % 289, 9))
                        bits.append((0, 38))     # rest of gr block
                    acc, nb = 0, 0
                    for v, w in bits:
                        acc = (acc << w) | v
                        nb += w
                    side = acc.to_bytes(nb // 8, "big")
                    chunks.append(hdr + side
                                  + b"\x00" * (flen - 4 - len(side)))
                payloads.append(b"".join(chunks))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def probe(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = parse_mp3_sideinfo(bytes(p))
                rows.append({"doc_id": int(did),
                             "n_frames": r["n_frames"],
                             "max_mdb": r["max_main_data_begin"],
                             "sum_part23": r["sum_part23_bits"],
                             "max_bigv": r["max_big_values"]})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(synth, "doc_id long, payload binary")
               .mapInPandas(probe, "doc_id long, n_frames long,"
                                   " max_mdb long, sum_part23 long,"
                                   " max_bigv long")
               .transform(_sorted1, "doc_id"))


_MP3_BR2_SQL = ("CASE 2 + doc_id % 12 "
                + " ".join(f"WHEN {i} THEN {b}" for i, b in
                           [(2, 40), (3, 48), (4, 56), (5, 64), (6, 80),
                            (7, 96), (8, 112), (9, 128), (10, 160),
                            (11, 192), (12, 224), (13, 256)])
                + " END")

register(
    "mp3_sideinfo_audit",
    _mp3_sideinfo_audit,
    f"""
WITH b AS (
  SELECT doc_id,
         2 + doc_id % 3 AS nf,
         144 * ({_MP3_BR2_SQL}) * 1000 // ({_MP3_SR_SQL}) - 21
           AS main_len
  FROM documents),
kg AS (SELECT CAST(g AS BIGINT) // 2 AS k, CAST(g AS BIGINT) % 2 AS gr
       FROM generate_series(0, 7) s(g)),
agg AS (
  SELECT b.doc_id,
         SUM((b.doc_id * 7 + kg.k * 13 + kg.gr * 5) % 396)
           AS sum_part23,
         MAX((b.doc_id * 3 + kg.k + kg.gr) % 289) AS max_bigv
  FROM b JOIN kg ON kg.k < b.nf GROUP BY b.doc_id)
SELECT b.doc_id,
       CAST(b.nf AS BIGINT) AS n_frames,
       CAST(LEAST(511, (b.nf - 1) * b.main_len,
                  37 * (b.nf - 1) + b.doc_id % 101) AS BIGINT)
         AS max_mdb,
       CAST(agg.sum_part23 AS BIGINT) AS sum_part23,
       CAST(agg.max_bigv AS BIGINT) AS max_bigv
FROM b JOIN agg USING (doc_id) ORDER BY doc_id
""",
    doc="MP3 Layer-III side-info audit: genuine packed side-info bits "
        "(reservoir-consistent main_data_begin ramp, in-bound "
        "part2_3_length/big_values) re-walked by the real parser with "
        "reservoir-invariant enforcement; integer aggregates pinned "
        "by arithmetic SQL.",
)


# ---------------------------------------------------------------------------
# Priority sampling (Duffield–Lund–Thorup) — ONE-PASS weighted sampling
# without replacement, the scheme a curation pipeline uses to draw a
# weight-proportional document panel (w = doc length here) with an
# unbiased total estimator attached. Each row gets an integer priority
# w·2⁴⁸ DIV h (h = the portable 48-bit md5 fold ≈ u·2⁴⁸, so the
# priority is the classic w/u in weight units — integer arithmetic
# end-to-end, no pow/ln cross-engine hazard). Keep the top k by
# priority; the (k+1)-th priority τ yields the estimator
# max(w, τ) per kept row (Σ over the sample unbiasedly estimates total
# corpus weight).
#
# Scale shape: Catalyst compiles orderBy+limit to TakeOrderedAndProject
# — per-partition top-(k+1) heaps merged at the driver, a reduction,
# NOT a global sort shuffle; the only window runs over the (k+1)-row
# candidate frame and τ rides back in as a broadcast 1-row aggregate.
# ---------------------------------------------------------------------------

_PS_K = 64
_PS_SEED = "psamp0"
_PS_WCAP = 30000          # keeps w·2^48 far inside BIGINT headroom


def _priority_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    from .operators.text import md5_hash
    d = _t(spark, sf, "documents")
    h = F.greatest(md5_hash(F.concat(F.lit(_PS_SEED + ":"),
                                     F.col("doc_id").cast("string"))),
                   F.lit(1))
    w = F.least(F.col("n_chars"), F.lit(_PS_WCAP)).cast("long")
    cand = (d.select("doc_id", w.alias("weight"),
                     (w * F.lit(281474976710656)).cast("long")
                     .alias("_num"), h.alias("_h"))
             .withColumn("priority",
                         F.expr("CAST(_num DIV _h AS BIGINT)"))
             .select("doc_id", "weight", "priority")
             .orderBy(F.desc("priority"), F.asc("doc_id"))
             .limit(_PS_K + 1))
    rw = Window.orderBy(F.desc("priority"), F.asc("doc_id"))
    ranked = cand.withColumn("_rn", F.row_number().over(rw))
    tau = ranked.agg(F.coalesce(
        F.min(F.when(F.col("_rn") == _PS_K + 1, F.col("priority"))),
        F.lit(0)).alias("_tau"))
    return (ranked.where(F.col("_rn") <= _PS_K)
                  .crossJoin(F.broadcast(tau))
                  .select("doc_id", "weight", "priority",
                          F.greatest(F.col("weight"), F.col("_tau"))
                           .cast("long").alias("est_w"))
                  .orderBy(F.desc("priority"), F.asc("doc_id")))


register(
    "priority_sample_docs",
    _priority_sample_docs,
    f"""
WITH p AS (
  SELECT doc_id,
         LEAST(n_chars, {_PS_WCAP}) AS weight,
         LEAST(n_chars, {_PS_WCAP}) * 281474976710656
           // GREATEST(('0x' || substr(md5('{_PS_SEED}:'
                || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT, 1)
           AS priority
  FROM documents),
r AS (SELECT doc_id, weight, priority,
             ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id)
               AS rn
      FROM p),
t AS (SELECT COALESCE(MIN(CASE WHEN rn = {_PS_K + 1} THEN priority END),
                      0) AS tau
      FROM r)
SELECT doc_id, CAST(weight AS BIGINT) AS weight,
       CAST(priority AS BIGINT) AS priority,
       CAST(GREATEST(weight, tau) AS BIGINT) AS est_w
FROM r, t WHERE rn <= {_PS_K}
ORDER BY priority DESC, doc_id
""",
    doc="Priority sampling (DLT): integer priorities w*2^48 DIV h48, "
        "per-partition top-k heaps (TakeOrderedAndProject — no global "
        "sort), (k+1)-th priority threshold estimator max(w, tau) — "
        "one-pass weighted sampling without replacement with an "
        "unbiased total estimator, exact integers end-to-end.",
)


# ---------------------------------------------------------------------------
# Per-domain cap enforcement — the crawl-curation quota pass: no
# registrable domain may contribute more than CAP documents, and which
# documents survive must be a deterministic, seed-keyed choice (so the
# cap is reproducible and auditable, not "first k by arrival"). Uses
# the real PSL registrable-domain key from operators/urls. The rank
# runs in a PARTITIONED window (per domain), so the frame is the
# domain's own doc count — the quantity the cap is bounding in the
# first place; no global window anywhere.
# ---------------------------------------------------------------------------

_DCAP = 8
_DCAP_SEED = "domcap0"


def _domain_cap_manifest(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    from .operators.text import md5_hash
    from .operators.urls import registrable_domain, url_host

    d = _t(spark, sf, "documents")
    base = d.select(
        "doc_id",
        registrable_domain(url_host(_synth_url_spark())).alias("domain"),
        md5_hash(F.concat(F.lit(_DCAP_SEED + ":"),
                          F.col("doc_id").cast("string"))).alias("_ok"))
    w = Window.partitionBy("domain").orderBy(F.asc("_ok"), F.asc("doc_id"))
    return (base.withColumn("rk", F.row_number().over(w).cast("long"))
                .where(F.col("rk") <= _DCAP)
                .select("doc_id", "domain", "rk")
                .transform(_sorted1, "domain", "rk"))


register(
    "domain_cap_manifest",
    _domain_cap_manifest,
    rf"""
WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents),
b AS (SELECT doc_id,
             {{dom}} AS domain,
             ('0x' || substr(md5('{_DCAP_SEED}:'
                 || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS ok
      FROM u),
r AS (SELECT doc_id, domain,
             ROW_NUMBER() OVER (PARTITION BY domain
                                ORDER BY ok, doc_id) AS rk
      FROM b)
SELECT doc_id, domain, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_DCAP}
ORDER BY domain, rk
""".replace("{dom}", _duck_domain(_DUCK_HOST)),
    doc="Per-registrable-domain cap: seed-keyed deterministic survivor "
        "choice, rank in a per-domain window (frame = the quantity "
        "being capped), PSL domain keying — the crawl-mixing quota "
        "pass, fully reproducible.",
)


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment of an evaluation panel —
# allocate exactly K eval slots across (lang, source) strata
# proportionally to their sizes, with the remainder seats going to the
# largest fractional remainders. Everything is integer arithmetic:
# base quota = floor(n_s*K/N); remainder = n_s*K - base*N (the
# fraction scaled by N, exact); seats left = K - Σbase, handed to the
# top strata by (remainder DESC, lang, source). The only windows run
# over the |strata|-row aggregate. Then each stratum contributes its
# quota of documents by seeded-hash rank — the deterministic panel a
# model-eval team can re-derive from the seed alone.
# ---------------------------------------------------------------------------

_PANEL_K = 100
_PANEL_SEED = "evalpanel0"


def _eval_panel_quota(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    from .operators.text import md5_hash

    d = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    strata = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"))
    tot = strata.agg(F.sum("n_docs").alias("_n"))
    sized = strata.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "n_docs",
        F.expr(f"CAST(n_docs * {_PANEL_K} DIV _n AS BIGINT)")
         .alias("base"),
        F.expr(f"CAST(n_docs * {_PANEL_K} - (n_docs * {_PANEL_K}"
               f" DIV _n) * _n AS BIGINT)").alias("rem"))
    spare = sized.agg(
        (F.lit(_PANEL_K) - F.sum("base")).cast("long").alias("_spare"))
    wr = Window.orderBy(F.desc("rem"), F.asc("lang"), F.asc("source"))
    quota = (sized.crossJoin(F.broadcast(spare))
             .withColumn("_rrk", F.row_number().over(wr))
             .select("lang", "source", "n_docs",
                     (F.col("base")
                      + F.when(F.col("_rrk") <= F.col("_spare"), 1)
                         .otherwise(0)).cast("long").alias("quota")))
    wd = Window.partitionBy("lang", "source").orderBy(
        F.asc("_ok"), F.asc("doc_id"))
    picked = (d.withColumn(
                  "_ok", md5_hash(F.concat(F.lit(_PANEL_SEED + ":"),
                                           F.col("doc_id").cast("string"))))
               .withColumn("rk", F.row_number().over(wd).cast("long"))
               .join(F.broadcast(quota), ["lang", "source"])
               .where(F.col("rk") <= F.col("quota")))
    return (picked.select("doc_id", "lang", "source", "n_docs",
                          "quota", "rk")
                  .transform(_sorted1, "lang", "source", "rk"))


register(
    "eval_panel_quota",
    _eval_panel_quota,
    f"""
WITH s AS (SELECT lang, source, COUNT(*) AS n_docs
           FROM documents GROUP BY lang, source),
t AS (SELECT SUM(n_docs) AS n FROM s),
sized AS (
  SELECT lang, source, n_docs,
         n_docs * {_PANEL_K} // n AS base,
         n_docs * {_PANEL_K} - (n_docs * {_PANEL_K} // n) * n AS rem
  FROM s, t),
sp AS (SELECT {_PANEL_K} - SUM(base) AS spare FROM sized),
q AS (
  SELECT lang, source, n_docs,
         base + CASE WHEN ROW_NUMBER() OVER
                  (ORDER BY rem DESC, lang, source) <= spare
                THEN 1 ELSE 0 END AS quota
  FROM sized, sp),
r AS (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source
            ORDER BY ('0x' || substr(md5('{_PANEL_SEED}:'
                || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT, doc_id)
           AS rk
  FROM documents)
SELECT r.doc_id, r.lang, r.source,
       CAST(q.n_docs AS BIGINT) AS n_docs,
       CAST(q.quota AS BIGINT) AS quota,
       CAST(r.rk AS BIGINT) AS rk
FROM r JOIN q ON q.lang = r.lang AND q.source = r.source
WHERE r.rk <= q.quota
ORDER BY r.lang, r.source, r.rk
""",
    doc="Largest-remainder (Hamilton) apportionment of a K-slot eval "
        "panel across (lang, source) strata — exact integer quotas "
        "and remainders, |strata|-row windows only, seeded-hash "
        "member choice fully re-derivable from the seed.",
)


# ---------------------------------------------------------------------------
# Progressive JPEG decode roundtrip — closes "What's missing" item 2
# of the r7 verdict: SOF2 was an honest header-probe fallback; now the
# real multi-scan decoder (coefficient accumulation, DC successive
# approximation, G.2 AC band coding with cross-block EOB runs and the
# refinement correction-bit procedure) runs behind the same Arrow
# seam. Each document becomes a genuine 3-or-4-scan progressive
# stream of four flat doc_id-derived blocks — odd doc_ids use the
# two-scan AC successive-approximation script, so BOTH AC coding
# models sit inside the hashed data — and flat blocks survive the
# whole shift/refine/EOB pipeline bit-exactly, so DuckDB recomputes
# every stat arithmetically (the same numbers as the baseline
# roundtrip: the two codecs must agree).
# ---------------------------------------------------------------------------

def _jpeg_progressive_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.jpegcodec import decode_baseline, encode_progressive_gray

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                px = np.zeros((16, 16), dtype=np.uint8)
                for k in range(4):
                    by, bx = divmod(k, 2)
                    px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                        (did * 31 + 97 * k) % 256
                payloads.append(encode_progressive_gray(
                    px, ac_successive=(did % 2 == 1)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_baseline(bytes(p))
                px = r["pixels"].astype("int64")
                rows.append({"doc_id": int(did),
                             "out_w": r["width"], "out_h": r["height"],
                             "pix_sum": int(px.sum()),
                             "pix_min": int(px.min()),
                             "pix_max": int(px.max())})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, out_w long, out_h long,"
                                 " pix_sum long, pix_min long,"
                                 " pix_max long")
               .transform(_sorted1, "doc_id"))


register(
    "jpeg_progressive_roundtrip",
    _jpeg_progressive_roundtrip,
    """
WITH v AS (
  SELECT doc_id,
         (doc_id * 31 +   0) % 256 AS v0,
         (doc_id * 31 +  97) % 256 AS v1,
         (doc_id * 31 + 194) % 256 AS v2,
         (doc_id * 31 + 291) % 256 AS v3
  FROM documents)
SELECT doc_id,
       CAST(16 AS BIGINT) AS out_w,
       CAST(16 AS BIGINT) AS out_h,
       CAST(64 * (v0 + v1 + v2 + v3) AS BIGINT) AS pix_sum,
       CAST(LEAST(v0, v1, v2, v3) AS BIGINT) AS pix_min,
       CAST(GREATEST(v0, v1, v2, v3) AS BIGINT) AS pix_max
FROM v ORDER BY doc_id
""",
    doc="Progressive JPEG (SOF2) decode roundtrip: genuine multi-scan "
        "streams (DC successive approximation + EOB-run AC scans; odd "
        "ids add the AC refinement script) decoded by the real G.2 "
        "machinery, pixel stats hash-verified against doc_id "
        "arithmetic — the progressive and baseline codecs must agree.",
)


# ---------------------------------------------------------------------------
# Adam7 interlaced PNG roundtrip — the "web-optimized" PNG layout:
# seven independently-filtered sub-images on the (x0,y0,dx,dy) pass
# lattices, de-filtered per pass and scattered back. Each document
# becomes a 16x16 RGB image whose channels are position-dependent
# doc_id arithmetic; even ids ship interlaced, odd ids sequential, so
# both layouts sit inside one hashed result and MUST agree. Channel
# means alone would not catch a scatter-placement bug (they are
# permutation-invariant), so the oracle also pins a position-weighted
# first moment per channel: sum((1 + x + 16y) * V(x,y)).
# ---------------------------------------------------------------------------

def _png_adam7_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.multimodal import decode_png, encode_png

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                y, x = np.mgrid[0:16, 0:16]
                rgb = np.stack([
                    (did + 3 * x + 5 * y) % 256,
                    (2 * did + 7 * x + y) % 256,
                    (3 * did + x + 11 * y) % 256,
                ], axis=-1).astype(np.uint8)
                payloads.append(encode_png(rgb.tobytes(), 16,
                                           interlace=(did % 2 == 0)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_png(bytes(p))
                rgb = r["rgb"].astype("int64")
                y, x = np.mgrid[0:16, 0:16]
                wgt = 1 + x + 16 * y
                rows.append({
                    "doc_id": int(did),
                    "interlaced": bool(r["interlaced"]),
                    "mean_r_milli": r["mean_r_milli"],
                    "mean_g_milli": r["mean_g_milli"],
                    "mean_b_milli": r["mean_b_milli"],
                    "moment_r": int((wgt * rgb[:, :, 0]).sum()),
                    "moment_g": int((wgt * rgb[:, :, 1]).sum()),
                    "moment_b": int((wgt * rgb[:, :, 2]).sum()),
                })
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, interlaced boolean,"
                                 " mean_r_milli long, mean_g_milli long,"
                                 " mean_b_milli long, moment_r long,"
                                 " moment_g long, moment_b long")
               .transform(_sorted1, "doc_id"))


register(
    "png_adam7_roundtrip",
    _png_adam7_roundtrip,
    """
WITH g AS (SELECT CAST(a.g AS BIGINT) AS x, CAST(b.g AS BIGINT) AS y
           FROM generate_series(0, 15) a(g), generate_series(0, 15) b(g)),
v AS (
  SELECT d.doc_id,
         SUM((d.doc_id + 3 * g.x + 5 * g.y) % 256) AS sr,
         SUM((2 * d.doc_id + 7 * g.x + g.y) % 256) AS sg,
         SUM((3 * d.doc_id + g.x + 11 * g.y) % 256) AS sb,
         SUM((1 + g.x + 16 * g.y)
             * ((d.doc_id + 3 * g.x + 5 * g.y) % 256)) AS mr,
         SUM((1 + g.x + 16 * g.y)
             * ((2 * d.doc_id + 7 * g.x + g.y) % 256)) AS mg,
         SUM((1 + g.x + 16 * g.y)
             * ((3 * d.doc_id + g.x + 11 * g.y) % 256)) AS mb
  FROM documents d CROSS JOIN g GROUP BY d.doc_id)
SELECT doc_id,
       doc_id % 2 = 0 AS interlaced,
       CAST(sr * 1000 // 256 AS BIGINT) AS mean_r_milli,
       CAST(sg * 1000 // 256 AS BIGINT) AS mean_g_milli,
       CAST(sb * 1000 // 256 AS BIGINT) AS mean_b_milli,
       CAST(mr AS BIGINT) AS moment_r,
       CAST(mg AS BIGINT) AS moment_g,
       CAST(mb AS BIGINT) AS moment_b
FROM v ORDER BY doc_id
""",
    doc="Adam7 interlaced PNG roundtrip: per-pass filtered sub-images "
        "de-filtered and scattered back by the real decoder (even ids "
        "interlaced, odd sequential), channel means AND position-"
        "weighted first moments hash-verified — placement bugs cannot "
        "hide behind permutation-invariant stats.",
)


# ---------------------------------------------------------------------------
# GIF decode roundtrip — the palette-image format, with REAL LZW
# underneath (variable-width LSB-first codes, CLEAR/EOI, KwKwK,
# dictionary growth): each document becomes a genuine GIF89a (global
# color table + GCE extension the walker must skip; even ids ship the
# 4-pass row interlace) whose 16x16 index pattern and 16-color
# palette are doc_id arithmetic, so DuckDB recomputes channel means
# AND position-weighted moments (placement-sensitive: interlace
# reordering bugs cannot hide) without ever touching bytes.
# ---------------------------------------------------------------------------

def _gif_decode_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.multimodal import decode_gif, encode_gif

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                y, x = np.mgrid[0:16, 0:16]
                idx = ((did + 2 * x + 3 * y) % 16).astype(np.uint8)
                i = np.arange(16)
                pal = np.stack([(did * 5 + 17 * i) % 256,
                                (did * 7 + 29 * i) % 256,
                                (did * 11 + 41 * i) % 256],
                               axis=-1).astype(np.uint8)
                payloads.append(encode_gif(idx, pal,
                                           interlace=(did % 2 == 0)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_gif(bytes(p))
                rgb = r["rgb"].astype("int64")
                y, x = np.mgrid[0:16, 0:16]
                wgt = 1 + x + 16 * y
                rows.append({
                    "doc_id": int(did),
                    "interlaced": bool(r["interlaced"]),
                    "palette_size": r["palette_size"],
                    "mean_r_milli": r["mean_r_milli"],
                    "mean_g_milli": r["mean_g_milli"],
                    "mean_b_milli": r["mean_b_milli"],
                    "moment_r": int((wgt * rgb[:, :, 0]).sum()),
                    "moment_g": int((wgt * rgb[:, :, 1]).sum()),
                    "moment_b": int((wgt * rgb[:, :, 2]).sum()),
                })
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, interlaced boolean,"
                                 " palette_size long,"
                                 " mean_r_milli long, mean_g_milli long,"
                                 " mean_b_milli long, moment_r long,"
                                 " moment_g long, moment_b long")
               .transform(_sorted1, "doc_id"))


register(
    "gif_decode_roundtrip",
    _gif_decode_roundtrip,
    """
WITH g AS (SELECT CAST(a.g AS BIGINT) AS x, CAST(b.g AS BIGINT) AS y
           FROM generate_series(0, 15) a(g), generate_series(0, 15) b(g)),
px AS (
  SELECT d.doc_id, g.x, g.y,
         (d.doc_id + 2 * g.x + 3 * g.y) % 16 AS i
  FROM documents d CROSS JOIN g),
v AS (
  SELECT doc_id,
         SUM((doc_id * 5 + 17 * i) % 256) AS sr,
         SUM((doc_id * 7 + 29 * i) % 256) AS sg,
         SUM((doc_id * 11 + 41 * i) % 256) AS sb,
         SUM((1 + x + 16 * y) * ((doc_id * 5 + 17 * i) % 256)) AS mr,
         SUM((1 + x + 16 * y) * ((doc_id * 7 + 29 * i) % 256)) AS mg,
         SUM((1 + x + 16 * y) * ((doc_id * 11 + 41 * i) % 256)) AS mb
  FROM px GROUP BY doc_id)
SELECT doc_id,
       doc_id % 2 = 0 AS interlaced,
       CAST(16 AS BIGINT) AS palette_size,
       CAST(sr * 1000 // 256 AS BIGINT) AS mean_r_milli,
       CAST(sg * 1000 // 256 AS BIGINT) AS mean_g_milli,
       CAST(sb * 1000 // 256 AS BIGINT) AS mean_b_milli,
       CAST(mr AS BIGINT) AS moment_r,
       CAST(mg AS BIGINT) AS moment_g,
       CAST(mb AS BIGINT) AS moment_b
FROM v ORDER BY doc_id
""",
    doc="GIF89a decode roundtrip: genuine LZW streams (variable-width "
        "LSB codes, CLEAR/EOI, KwKwK, GCE skip; even ids 4-pass "
        "interlaced) decoded for real, channel means + position-"
        "weighted moments hash-verified against palette/index "
        "arithmetic.",
)


# ---------------------------------------------------------------------------
# G.711 companded-audio roundtrip — telephony-grade mu-law/A-law WAV
# (format tags 7/6), the companded byte streams a speech-data pipeline
# meets before any neural codec. Each document synthesizes a genuine
# RIFF container whose 8-bit payload derives from doc_id; the decoder
# runs the real ITU-T G.711 segment/mantissa expansion to linear
# 16-bit samples, and DuckDB replays the SAME integer expansion
# ((m*8+132)<<e - 132 for mu, the xor-0x55 segment form for A) per
# byte — sample sums and mean-square amplitude are value-pinned, so
# any bit of the expansion (complement, segment shift, re-sign) is
# inside the hash.
# ---------------------------------------------------------------------------

def _g711_wav_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import struct

    import pandas as pd

    from .operators.multimodal import decode_wav

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def synth(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                n = 64 + did % 64
                data = bytes((did * 13 + 7 * i) % 256 for i in range(n))
                fmt = 7 if did % 2 == 0 else 6
                fmtc = struct.pack("<HHIIHH", fmt, 1, 8000, 8000, 1, 8)
                body = (b"WAVE" + b"fmt "
                        + struct.pack("<I", len(fmtc)) + fmtc
                        + b"data" + struct.pack("<I", len(data)) + data
                        + (b"\0" if len(data) & 1 else b""))
                payloads.append(b"RIFF" + struct.pack("<I", len(body))
                                + body)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_wav(bytes(p))
                rows.append({"doc_id": int(did),
                             "audio_format": r["audio_format"],
                             "n_frames": r["n_frames"],
                             "duration_ms": r["duration_ms"],
                             "sample_sum": r["sample_sum"],
                             "ms_amplitude": r["ms_amplitude"]})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(synth, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, audio_format long,"
                                 " n_frames long, duration_ms long,"
                                 " sample_sum long, ms_amplitude long")
               .transform(_sorted1, "doc_id"))


register(
    "g711_wav_roundtrip",
    _g711_wav_roundtrip,
    """
WITH f AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents),
b AS (
  SELECT f.doc_id, f.n,
         (f.doc_id * 13 + 7 * s.i) % 256 AS byte
  FROM f JOIN (SELECT CAST(g AS BIGINT) AS i
               FROM generate_series(0, 127) t(g)) s ON s.i < f.n),
x AS (
  SELECT doc_id, n,
         CASE WHEN doc_id % 2 = 0 THEN           -- mu-law
           CASE WHEN (255 - byte) >= 128 THEN -1 ELSE 1 END
           * ((((255 - byte) % 16) * 8 + 132)
              * (1 << (((255 - byte) // 16) % 8)) - 132)
         ELSE                  -- A-law: sign bit 1 means POSITIVE
           CASE WHEN xor(byte, 85) >= 128 THEN 1 ELSE -1 END
           * (CASE WHEN ((xor(byte, 85) // 16) % 8) = 0
                   THEN (xor(byte, 85) % 16) * 16 + 8
                   ELSE ((xor(byte, 85) % 16) * 16 + 264)
                        * (1 << (((xor(byte, 85) // 16) % 8) - 1))
              END)
         END AS s
  FROM b)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 6 END AS BIGINT)
         AS audio_format,
       CAST(n AS BIGINT) AS n_frames,
       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(SUM(s) AS BIGINT) AS sample_sum,
       CAST(SUM(s * s) // n AS BIGINT) AS ms_amplitude
FROM x GROUP BY doc_id, n ORDER BY doc_id
""",
    doc="G.711 mu-law/A-law WAV roundtrip: genuine RIFF containers "
        "with companded 8-bit payloads expanded by the real ITU-T "
        "segment/mantissa arithmetic, sample sums and mean-square "
        "amplitude replayed byte-for-byte by integer SQL.",
)


# ---------------------------------------------------------------------------
# AVI/MJPEG video frame sampling — the video-ingest path a multimodal
# training pipeline runs on every clip: walk the RIFF container, read
# the frame clock from the REAL stream header (not from filename
# conventions), sample every k-th frame by wall-clock interval, and
# entropy-decode only the sampled frames (each MJPEG frame is a
# standalone baseline JPEG through operators/jpegcodec). Each document
# synthesizes a genuine AVI (variable frame count AND variable frame
# rate from doc_id; WORD-padded 00dc chunks; legacy idx1 cross-checked
# against the movi walk), so the sampling stride is derived from parsed
# container metadata and the luma sums replay the decoded pixels.
#
# Scale shape: two Arrow crossings (encode, parse+sample+decode), zero
# shuffles before the final sort; decode cost is per-SAMPLED-frame, so
# the interval knob bounds work per clip no matter how long the video —
# exactly the property frame-sampling exists to provide at 100 TB.
# ---------------------------------------------------------------------------

def _avi_mjpeg_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.jpegcodec import decode_baseline, encode_baseline_gray
    from .operators.multimodal import encode_avi_mjpeg, parse_avi

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)
    interval_ms = 100

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                n = 4 + did % 5
                uspf = 20000 * (1 + did % 3)
                frames = []
                for f in range(n):
                    px = np.zeros((16, 16), dtype=np.uint8)
                    for k in range(4):
                        v = (did * 31 + 97 * k + 13 * f) % 256
                        by, bx = divmod(k, 2)
                        px[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = v
                    frames.append(encode_baseline_gray(px))
                payloads.append(
                    encode_avi_mjpeg(frames, 16, 16, us_per_frame=uspf))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = parse_avi(bytes(p))
                # stride from PARSED container metadata, not doc_id
                stride = max(1, (interval_ms * 1000) // r["us_per_frame"])
                sums, mins, maxs = [], [], []
                for f in range(0, len(r["frames"]), stride):
                    px = decode_baseline(
                        r["frames"][f])["pixels"].astype("int64")
                    sums.append(int(px.sum()))
                    mins.append(int(px.min()))
                    maxs.append(int(px.max()))
                rows.append({"doc_id": int(did),
                             "n_frames": len(r["frames"]),
                             "fps_milli": r["fps_milli"],
                             "idx_consistent": bool(r["idx_consistent"]),
                             "sampled_frames": len(sums),
                             "luma_sum": sum(sums),
                             "luma_min": min(mins),
                             "luma_max": max(maxs)})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, n_frames long,"
                                 " fps_milli long, idx_consistent boolean,"
                                 " sampled_frames long, luma_sum long,"
                                 " luma_min long, luma_max long")
               .transform(_sorted1, "doc_id"))


register(
    "avi_mjpeg_frame_sample",
    _avi_mjpeg_frame_sample,
    """
WITH p AS (
  SELECT doc_id,
         4 + doc_id % 5 AS n,
         20000 * (1 + doc_id % 3) AS uspf,
         GREATEST(1, 100000 // (20000 * (1 + doc_id % 3))) AS stride
  FROM documents),
v AS (
  SELECT p.doc_id, p.n, p.uspf, p.stride,
         CAST(f.g AS BIGINT) AS f,
         (p.doc_id * 31 + 97 * k.g + 13 * f.g) % 256 AS val
  FROM p
  JOIN generate_series(0, 8) f(g) ON f.g < p.n AND f.g % p.stride = 0
  CROSS JOIN generate_series(0, 3) k(g)),
a AS (
  SELECT doc_id, n, uspf, f,
         64 * SUM(val) AS fsum, MIN(val) AS fmin, MAX(val) AS fmax
  FROM v GROUP BY doc_id, n, uspf, f)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_frames,
       CAST(1000000000 // uspf AS BIGINT) AS fps_milli,
       TRUE AS idx_consistent,
       CAST(COUNT(*) AS BIGINT) AS sampled_frames,
       CAST(SUM(fsum) AS BIGINT) AS luma_sum,
       CAST(MIN(fmin) AS BIGINT) AS luma_min,
       CAST(MAX(fmax) AS BIGINT) AS luma_max
FROM a GROUP BY doc_id, n, uspf ORDER BY doc_id
""",
    doc="AVI/MJPEG frame sampling: genuine RIFF containers (variable "
        "frame count and frame clock per document, WORD padding, idx1 "
        "cross-check), wall-clock sampling stride derived from the "
        "PARSED stream header, sampled frames entropy-decoded by the "
        "real baseline-JPEG layer; frame counts, fps, and sampled "
        "luma sums/extremes replayed arithmetically by the oracle.",
)


# ---------------------------------------------------------------------------
# IMA ADPCM WAV roundtrip — the 4-bit compressed telephony-audio shape
# (WAVE format tag 0x0011) between G.711 bytes and modern codecs. Each
# document synthesizes a genuine two-block container (per-block int16
# seed predictor + index header, low-nibble-first packing, fact chunk);
# the decoder walks fmt/fact/data for real and runs the true IMA
# step-size automaton. The oracle is a recursive CTE that carries the
# (predictor, step-index) state per (doc, block) through all 64 nibbles
# against the embedded 89-entry step table — every clamp, shift, and
# table adjust is inside the value hash, which no closed form could pin.
#
# Scale shape: two Arrow crossings, zero shuffles before the final
# sort; state is per-block so blocks decode independently — the same
# property that makes ADPCM splittable across executors at 100 TB.
# ---------------------------------------------------------------------------

def _adpcm_wav_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    from .operators.multimodal import decode_wav_ima, encode_wav_ima

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                blocks = []
                for b in range(2):
                    pred0 = ((did + b) * 997) % 4001 - 2000
                    idx0 = (did + 3 * b) % 89
                    nibs = [(did * 7 + (b * 64 + i) * 13) % 16
                            for i in range(64)]
                    blocks.append((pred0, idx0, nibs))
                payloads.append(encode_wav_ima(blocks))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_wav_ima(bytes(p))
                s = r["samples"]
                spb = r["samples_per_block"]
                rows.append({"doc_id": int(did),
                             "n_blocks": r["n_blocks"],
                             "samples_per_block": spb,
                             "n_samples": len(s),
                             "duration_ms": len(s) * 1000
                             // r["sample_rate"],
                             "sample_sum": sum(s),
                             "max_abs": max(abs(v) for v in s),
                             "last_b0": s[spb - 1],
                             "last_b1": s[2 * spb - 1]})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, n_blocks long,"
                                 " samples_per_block long,"
                                 " n_samples long, duration_ms long,"
                                 " sample_sum long, max_abs long,"
                                 " last_b0 long, last_b1 long")
               .transform(_sorted1, "doc_id"))


def _ima_steps_sql() -> str:
    from .operators.multimodal import _IMA_STEPS
    return ", ".join(f"({i}, {s})" for i, s in enumerate(_IMA_STEPS))


register(
    "adpcm_wav_roundtrip",
    _adpcm_wav_roundtrip,
    f"""
WITH RECURSIVE
steps(si, st) AS (VALUES {_ima_steps_sql()}),
itab(tn, di) AS (VALUES (0,-1),(1,-1),(2,-1),(3,-1),(4,2),(5,4),(6,6),(7,8)),
init AS (
  SELECT d.doc_id, CAST(b.g AS BIGINT) AS b,
         ((d.doc_id + b.g) * 997) % 4001 - 2000 AS pred0,
         (d.doc_id + 3 * b.g) % 89 AS idx0
  FROM documents d CROSS JOIN generate_series(0, 1) b(g)),
r AS (
  SELECT doc_id, b, CAST(0 AS BIGINT) AS i,
         CAST(pred0 AS BIGINT) AS pred, idx0 AS idx,
         CAST(pred0 AS BIGINT) AS ssum, abs(pred0) AS smax
  FROM init
  UNION ALL
  SELECT r.doc_id, r.b, r.i + 1,
         GREATEST(-32768, LEAST(32767,
           r.pred
           + CASE WHEN (r.doc_id*7 + (r.b*64 + r.i)*13) % 16 >= 8
                  THEN -1 ELSE 1 END
             * (s.st // 8
                + CASE WHEN t.tn >= 4 THEN s.st ELSE 0 END
                + CASE WHEN (t.tn // 2) % 2 = 1 THEN s.st // 2 ELSE 0 END
                + CASE WHEN t.tn % 2 = 1 THEN s.st // 4 ELSE 0 END))),
         GREATEST(0, LEAST(88, r.idx + t.di)),
         r.ssum + GREATEST(-32768, LEAST(32767,
           r.pred
           + CASE WHEN (r.doc_id*7 + (r.b*64 + r.i)*13) % 16 >= 8
                  THEN -1 ELSE 1 END
             * (s.st // 8
                + CASE WHEN t.tn >= 4 THEN s.st ELSE 0 END
                + CASE WHEN (t.tn // 2) % 2 = 1 THEN s.st // 2 ELSE 0 END
                + CASE WHEN t.tn % 2 = 1 THEN s.st // 4 ELSE 0 END))),
         GREATEST(r.smax, abs(GREATEST(-32768, LEAST(32767,
           r.pred
           + CASE WHEN (r.doc_id*7 + (r.b*64 + r.i)*13) % 16 >= 8
                  THEN -1 ELSE 1 END
             * (s.st // 8
                + CASE WHEN t.tn >= 4 THEN s.st ELSE 0 END
                + CASE WHEN (t.tn // 2) % 2 = 1 THEN s.st // 2 ELSE 0 END
                + CASE WHEN t.tn % 2 = 1 THEN s.st // 4 ELSE 0 END)))))
  FROM r
  JOIN steps s ON s.si = r.idx
  JOIN itab t ON t.tn = ((r.doc_id*7 + (r.b*64 + r.i)*13) % 16) % 8
  WHERE r.i < 64)
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_blocks,
       CAST(65 AS BIGINT) AS samples_per_block,
       CAST(130 AS BIGINT) AS n_samples,
       CAST(130 * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(SUM(ssum) AS BIGINT) AS sample_sum,
       CAST(MAX(smax) AS BIGINT) AS max_abs,
       CAST(MAX(CASE WHEN b = 0 THEN pred END) AS BIGINT) AS last_b0,
       CAST(MAX(CASE WHEN b = 1 THEN pred END) AS BIGINT) AS last_b1
FROM r WHERE i = 64
GROUP BY doc_id ORDER BY doc_id
""",
    doc="IMA ADPCM (WAVE tag 0x11) roundtrip: genuine two-block "
        "containers decoded by the real step-size automaton; a "
        "recursive-CTE oracle replays all 64 state transitions per "
        "block against the embedded 89-entry step table, pinning "
        "sample sums, the max amplitude, and each block's final "
        "predictor.",
)


# ---------------------------------------------------------------------------
# TIFF decode roundtrip — completes the image-codec family (PNG, JPEG,
# GIF, BMP) with the scanned-document/archival format. Each document
# synthesizes a genuine striped TIFF 6.0 file: even ids use Compression
# 5 (the TIFF LZW variant: MSB-first codes, the spec's early-change
# width rule) + Predictor 2 (horizontal differencing), odd ids are
# uncompressed; ids % 3 == 0 are written big-endian (MM) so both byte
# orders are inside the value hash. Four strips each, so strip
# reassembly (StripOffsets/ByteCounts arrays stored out-of-line) is
# exercised, and position-weighted moments pin pixel PLACEMENT, not
# just sums — a predictor or strip-order bug cannot hide in a mean.
#
# Scale shape: two Arrow crossings, zero shuffles before the final
# sort; strips decode independently (the same property that lets a
# real deployment split huge TIFFs across executors).
# ---------------------------------------------------------------------------

def _tiff_decode_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from .operators.multimodal import decode_tiff_gray, encode_tiff_gray

    d = _t(spark, sf, "documents").select("doc_id")
    src = d.repartition(spark.sparkContext.defaultParallelism)

    def enc(it):
        for pdf in it:
            payloads = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                y, x = np.mgrid[0:16, 0:16]
                px = ((did + 2 * x + 3 * y) % 256).astype(np.uint8)
                payloads.append(encode_tiff_gray(
                    px, compression=5 if did % 2 == 0 else 1,
                    big_endian=(did % 3 == 0)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})

    def dec(it):
        for pdf in it:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"),
                              pdf["payload"]):
                r = decode_tiff_gray(bytes(p))
                px = r["pixels"].astype("int64")
                y, x = np.mgrid[0:16, 0:16]
                rows.append({"doc_id": int(did),
                             "compression": r["compression"],
                             "predictor": r["predictor"],
                             "big_endian": r["byte_order"] == "big",
                             "n_strips": r["n_strips"],
                             "pix_sum": int(px.sum()),
                             "moment": int(((1 + x + 16 * y) * px).sum()),
                             "pix_min": int(px.min()),
                             "pix_max": int(px.max())})
            yield pd.DataFrame(rows)

    return (src.mapInPandas(enc, "doc_id long, payload binary")
               .mapInPandas(dec, "doc_id long, compression long,"
                                 " predictor long, big_endian boolean,"
                                 " n_strips long, pix_sum long,"
                                 " moment long, pix_min long,"
                                 " pix_max long")
               .transform(_sorted1, "doc_id"))


register(
    "tiff_decode_roundtrip",
    _tiff_decode_roundtrip,
    """
WITH g AS (SELECT CAST(a.g AS BIGINT) AS x, CAST(b.g AS BIGINT) AS y
           FROM generate_series(0, 15) a(g), generate_series(0, 15) b(g)),
px AS (
  SELECT d.doc_id, g.x, g.y,
         (d.doc_id + 2 * g.x + 3 * g.y) % 256 AS v
  FROM documents d CROSS JOIN g)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 1 END AS BIGINT)
         AS compression,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
         AS predictor,
       doc_id % 3 = 0 AS big_endian,
       CAST(4 AS BIGINT) AS n_strips,
       CAST(SUM(v) AS BIGINT) AS pix_sum,
       CAST(SUM((1 + x + 16 * y) * v) AS BIGINT) AS moment,
       CAST(MIN(v) AS BIGINT) AS pix_min,
       CAST(MAX(v) AS BIGINT) AS pix_max
FROM px GROUP BY doc_id ORDER BY doc_id
""",
    doc="TIFF 6.0 decode roundtrip: genuine striped files (LZW with "
        "early-change widths + horizontal-differencing predictor on "
        "even ids, uncompressed odd, big-endian every third) decoded "
        "by the real IFD/strip/LZW layers; sums, position-weighted "
        "moments, and extremes replayed from index arithmetic.",
)


# ---------------------------------------------------------------------------
# robots.txt crawl gate (RFC 9309) — before a crawl-derived document
# enters a training corpus, the curator must honor the site's robots
# rules: exclusive user-agent group selection, most-specific-match
# (longest pattern in octets), Allow on ties, allow by default, with
# '*' wildcards and '$' end anchors. The engine side is the GENERIC
# matcher (operators/urls.robots_gate: pattern -> anchored regex as
# Column expressions, broadcast rules, one max_by aggregate); the
# fixture derives domains, rule sets, and request paths from doc_id so
# DuckDB can replay group selection + specificity argmax exactly.
#
# Scale shape: rules are a per-site dimension and broadcast; the fact
# side shuffles once for the argmax aggregate. No window, no Python.
# ---------------------------------------------------------------------------

def _robots_txt_gate(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.urls import robots_gate

    d = _t(spark, sf, "documents").select("doc_id")
    urls = (d.withColumn("k", (F.col("doc_id") % 20).cast("long"))
            .withColumn("domain",
                        F.concat(F.lit("d"), F.col("k"),
                                 F.lit(".example.com")))
            .withColumn("path",
                        F.element_at(
                            F.array(F.lit("/admin/secret"),
                                    F.lit("/admin/public/page"),
                                    F.lit("/files/report.bak"),
                                    F.lit("/blog/post"),
                                    F.lit("/")),
                            (F.col("doc_id") % 5 + 1).cast("int")))
            .select("doc_id", "domain", "path"))

    ks = spark.range(20).select(F.col("id").cast("long").alias("k"))
    dom = F.concat(F.lit("d"), F.col("k"), F.lit(".example.com"))

    def grp(agent, allow, pattern, cond=None):
        r = ks.select(dom.alias("domain"), F.lit(agent).alias("agent"),
                      F.lit(allow).alias("allow"),
                      F.lit(pattern).alias("pattern"), F.col("k"))
        if cond is not None:
            r = r.filter(cond)
        return r.drop("k")

    rules = (grp("*", False, "/admin")
             .unionByName(grp("*", True, "/admin/public"))
             .unionByName(grp("*", False, "/*.bak$",
                              F.col("k") % 2 == 0))
             .unionByName(grp("*", False, "/blog",
                              F.col("k") % 5 == 0))
             .unionByName(grp("*", True, "", F.col("k") % 7 == 0))
             .unionByName(grp("trainingbot", False, "/blog",
                              F.col("k") % 3 == 0))
             .unionByName(grp("trainingbot", True, "/admin",
                              F.col("k") % 3 == 0)))

    return (robots_gate(urls, rules, agent="trainingbot")
            .select("doc_id", "domain", "path", "matched_agent",
                    "matched_rule", "spec_len", "allowed")
            .transform(_sorted1, "doc_id"))


register(
    "robots_txt_gate",
    _robots_txt_gate,
    """
WITH u AS (
  SELECT doc_id, doc_id % 20 AS k,
         'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS domain,
         CASE doc_id % 5
           WHEN 0 THEN '/admin/secret'
           WHEN 1 THEN '/admin/public/page'
           WHEN 2 THEN '/files/report.bak'
           WHEN 3 THEN '/blog/post'
           ELSE '/' END AS path
  FROM documents),
r AS (
  SELECT k.g AS k, '*' AS agent, FALSE AS allow, '/admin' AS pattern
  FROM generate_series(0, 19) k(g)
  UNION ALL
  SELECT k.g, '*', TRUE, '/admin/public' FROM generate_series(0, 19) k(g)
  UNION ALL
  SELECT k.g, '*', FALSE, '/*.bak$' FROM generate_series(0, 19) k(g)
  WHERE k.g % 2 = 0
  UNION ALL
  SELECT k.g, '*', FALSE, '/blog' FROM generate_series(0, 19) k(g)
  WHERE k.g % 5 = 0
  UNION ALL
  SELECT k.g, '*', TRUE, '' FROM generate_series(0, 19) k(g)
  WHERE k.g % 7 = 0
  UNION ALL
  SELECT k.g, 'trainingbot', FALSE, '/blog'
  FROM generate_series(0, 19) k(g) WHERE k.g % 3 = 0
  UNION ALL
  SELECT k.g, 'trainingbot', TRUE, '/admin'
  FROM generate_series(0, 19) k(g) WHERE k.g % 3 = 0),
chosen AS (                       -- RFC group selection is exclusive
  SELECT * FROM r
  WHERE (agent = 'trainingbot')
     OR (agent = '*' AND NOT EXISTS (
           SELECT 1 FROM r s
           WHERE s.k = r.k AND s.agent = 'trainingbot'))),
m AS (
  SELECT u.doc_id, u.domain, u.path, c.agent, c.allow, c.pattern,
         LENGTH(c.pattern) AS spec_len
  FROM u JOIN chosen c ON c.k = u.k
  WHERE CASE WHEN c.pattern = '' THEN TRUE
             WHEN c.pattern = '/*.bak$' THEN u.path LIKE '/%.bak'
             ELSE starts_with(u.path, c.pattern) END),
best AS (
  SELECT doc_id, domain, path, agent, allow, pattern, spec_len,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY spec_len DESC, allow DESC, pattern DESC) AS rn
  FROM m)
SELECT u.doc_id, u.domain, u.path,
       COALESCE(b.agent,
                CASE WHEN u.k % 3 = 0 THEN 'trainingbot' ELSE '*' END)
         AS matched_agent,
       b.pattern AS matched_rule,
       CAST(COALESCE(b.spec_len, -1) AS BIGINT) AS spec_len,
       COALESCE(b.allow, TRUE) AS allowed
FROM u LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON b.doc_id = u.doc_id
ORDER BY u.doc_id
""",
    doc="RFC 9309 robots.txt gate: exclusive user-agent group "
        "selection, longest-octet most-specific match with Allow "
        "tie-break, wildcard and end-anchor patterns translated to "
        "regexes declaratively, default-allow for unmatched paths — "
        "group choice, winning rule, and verdict all value-pinned.",
)


