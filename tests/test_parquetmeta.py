"""Parquet footer parser (from-scratch Thrift compact protocol) pinned
against the INDEPENDENT pyarrow parquet reader: every column-chunk
field on every testdata table, multi-row-group layouts, nulls, string
stats, codec variants, key-value metadata, and malformed-input errors."""

import os
import struct

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from precios_nexo_sperant_etl_spark.operators.parquetmeta import (
    ParquetMetaError, parse_footer, read_footer)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def _pin_file(path):
    ours = read_footer(path)
    ref = pq.ParquetFile(path).metadata
    assert ours["num_rows"] == ref.num_rows
    assert ours["created_by"] == ref.created_by
    assert len(ours["row_groups"]) == ref.num_row_groups
    for g in range(ref.num_row_groups):
        rg, rrg = ours["row_groups"][g], ref.row_group(g)
        assert rg["num_rows"] == rrg.num_rows
        assert len(rg["columns"]) == rrg.num_columns
        for i, c in enumerate(rg["columns"]):
            rc = rrg.column(i)
            assert c["path"] == rc.path_in_schema
            assert c["physical_type"] == rc.physical_type
            # pyarrow collapses the LZ4_RAW enum (7) to "LZ4" in its
            # public API; our parser keeps the spec enum name
            assert c["codec"] == {"LZ4": "LZ4_RAW"}.get(rc.compression,
                                                        rc.compression)
            assert c["num_values"] == rc.num_values
            assert c["total_compressed_size"] == rc.total_compressed_size
            assert (c["total_uncompressed_size"]
                    == rc.total_uncompressed_size)
            st = rc.statistics
            if st is None:
                continue
            if st.null_count is not None:
                assert c["statistics"]["null_count"] == st.null_count
            # raw physical min/max: compare only where pyarrow performs
            # no logical-type conversion (ints/floats stay raw)
            if st.has_min_max and isinstance(st.min, (int, float)) \
                    and c["physical_type"] in ("INT32", "INT64",
                                               "DOUBLE", "FLOAT"):
                assert c["statistics"]["min"] == st.min
                assert c["statistics"]["max"] == st.max
            if st.has_min_max and isinstance(st.min, str) \
                    and c["physical_type"] == "BYTE_ARRAY":
                assert c["statistics"]["min"] == st.min.encode("utf-8")
                assert c["statistics"]["max"] == st.max.encode("utf-8")


def test_pin_every_testdata_table_against_pyarrow():
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        _pin_file(os.path.join(SF_DIR, f"{t}.parquet"))


def test_multi_row_group_and_nulls(tmp_path):
    n = 10000
    df = pd.DataFrame({
        "k": range(n),
        "v": [None if i % 7 == 0 else float(i) * 0.5 for i in range(n)],
        "s": [f"name_{i % 100:03d}" for i in range(n)],
    })
    path = str(tmp_path / "multi.parquet")
    pq.write_table(pa.Table.from_pandas(df), path, row_group_size=1500)
    _pin_file(path)
    ours = read_footer(path)
    assert len(ours["row_groups"]) == 7
    # aggregated footer stats equal data-derived truth
    null_total = sum(rg["columns"][1]["statistics"]["null_count"]
                     for rg in ours["row_groups"])
    assert null_total == df["v"].isna().sum()
    mins = [rg["columns"][0]["statistics"]["min"]
            for rg in ours["row_groups"]]
    assert min(mins) == 0
    assert mins == sorted(mins)         # k is written in order


@pytest.mark.parametrize("codec", ["NONE", "SNAPPY", "GZIP", "ZSTD",
                                   "LZ4"])
def test_codec_field_parses(tmp_path, codec):
    df = pd.DataFrame({"a": range(100), "b": ["x"] * 100})
    path = str(tmp_path / f"c_{codec}.parquet")
    pq.write_table(pa.Table.from_pandas(df), path, compression=codec)
    ours = read_footer(path)
    want = {"NONE": "UNCOMPRESSED", "LZ4": "LZ4_RAW"}.get(codec, codec)
    assert ours["row_groups"][0]["columns"][0]["codec"] == want
    _pin_file(path)


def test_key_value_metadata(tmp_path):
    tbl = pa.Table.from_pandas(pd.DataFrame({"a": [1, 2]}))
    tbl = tbl.replace_schema_metadata({"engine": "spark-first",
                                       "round": "11"})
    path = str(tmp_path / "kv.parquet")
    pq.write_table(tbl, path)
    kv = read_footer(path)["key_value_metadata"]
    assert kv.get("engine") == "spark-first"
    assert kv.get("round") == "11"


def test_schema_elements(tmp_path):
    df = pd.DataFrame({"i32": pd.array([1, None], dtype="Int32"),
                       "f": [1.5, 2.5], "s": ["a", None]})
    path = str(tmp_path / "sch.parquet")
    pq.write_table(pa.Table.from_pandas(df), path)
    sch = read_footer(path)["schema"]
    assert sch[0]["num_children"] == 3          # root group
    by_name = {e["name"]: e for e in sch[1:]}
    assert by_name["i32"]["physical_type"] == "INT32"
    assert by_name["i32"]["repetition"] == "OPTIONAL"
    assert by_name["f"]["physical_type"] == "DOUBLE"
    assert by_name["s"]["physical_type"] == "BYTE_ARRAY"


def test_footer_only_read_is_bounded(tmp_path):
    # a file whose body dwarfs its footer: read_footer must parse from
    # the bounded tail (the PAR1 trailer names the footer length)
    df = pd.DataFrame({"payload": [os.urandom(1000).hex()
                                   for _ in range(2000)]})
    path = str(tmp_path / "big.parquet")
    pq.write_table(pa.Table.from_pandas(df), path)
    (flen,) = struct.unpack("<I", open(path, "rb").read()[-8:-4])
    assert flen + 8 < os.path.getsize(path) // 4
    assert read_footer(path)["num_rows"] == 2000


def test_errors():
    with pytest.raises(ParquetMetaError):
        parse_footer(b"not parquet at all")
    with pytest.raises(ParquetMetaError):
        parse_footer(b"\xff" * 4 + b"PAR1")     # footer longer than tail
    with pytest.raises(ParquetMetaError, match="not a parquet file"):
        read_footer("/dev/null")
