"""Synthesize an sf1-scale fixture by replicating sf0.1 ×k with
FK-consistent key remapping — for SCALING measurements only (never for
correctness oracles; the driver's testdata is the correctness fixture).

Every key becomes ``key*k + rep`` so foreign keys stay consistent
(orders→customer, lineitem→orders/part/supplier, events→user). The
dimension tables region/nation stay fixed (they are genuinely constant
at any scale). Document text gets the scale_stress isomorphism: every
'e' is rewritten to a replica-specific digit, so replicas are neither
exact nor near duplicates of each other and duplicate structure scales
×k, not ×k² — without this, every dedup/LSH query would see bucket
sizes grow ×k and pay a ×k² join fan-out that says nothing about how
the plan behaves on k× more REAL data.

Usage: python tools/gen_sf_synth.py [src_dir] [out_dir] [k]
       (defaults: /root/testdata/sf0.1 /tmp/sf1_synth 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

REMAPS = {
    # table -> (key columns to remap, extra SELECT rewrites)
    "region": ([], {}),
    "nation": ([], {}),
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey", "o_custkey"], {}),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], {}),
    "events": (["event_id", "user_id"], {}),
    "documents": (["doc_id"], {
        "text": "CASE WHEN r = 0 THEN text"
                " ELSE replace(text, 'e', CAST(r AS VARCHAR)) END",
    }),
    # Embedding isomorphism (same reason as the document 'e'-rewrite):
    # each replica multiplies coordinates by a deterministic ±1 pattern.
    # Signs square away inside any same-replica dot product, so every
    # replica's INTERNAL cosine geometry — and thus its near-dup
    # structure — is bit-preserved, while cross-replica cosines are
    # sign-decorrelated to ~0 instead of exactly 1.0 (identical copies
    # would grow pair output ×k² and say nothing about real scale).
    # The //7 breaks the mod-2 parity algebra so patterns vary per
    # (replica, coordinate), not just per parity class.
    "embeddings": (["vec_id"], {
        "embedding": "CASE WHEN r = 0 THEN embedding ELSE "
                     "list_transform(embedding, (x, i) -> "
                     "CASE WHEN ((i * 2654435761 + r * 40503) // 7) % 2"
                     " = 0 THEN x ELSE -x END) END",
    }),
}


def generate(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, (keys, rewrites) in REMAPS.items():
        src_path = os.path.join(src, f"{table}.parquet")
        out_path = os.path.join(out, f"{table}.parquet")
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src_path}')").fetchall()]
        if not keys:                       # constant dimension: copy
            con.execute(f"COPY (SELECT * FROM read_parquet('{src_path}'))"
                        f" TO '{out_path}' (FORMAT PARQUET)")
            continue
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} * {k} + r AS {c}")
            elif c in rewrites:
                sel.append(f"{rewrites[c]} AS {c}")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)}"
            f" FROM read_parquet('{src_path}')"
            f" CROSS JOIN (SELECT CAST(g AS BIGINT) AS r"
            f"             FROM generate_series(0, {k - 1}) s(g)))"
            f" TO '{out_path}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out_path}')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, k)
