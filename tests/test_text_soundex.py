"""American Soundex Column expression: NARA classic vectors + edge
cases, evaluated through real Spark codegen."""

import pyspark.sql.functions as F

from precios_nexo_sperant_etl_spark.operators.text import soundex_col


def test_classic_vectors(spark):
    cases = {
        "ROBERT": "R163", "RUPERT": "R163", "ASHCRAFT": "A261",
        "ASHCROFT": "A261", "TYMCZAK": "T522", "PFISTER": "P236",
        "HONEYMAN": "H555", "SMALL": "S540", "WASHINGTON": "W252",
        "LEE": "L000", "GUTIERREZ": "G362", "JACKSON": "J250",
        "NEW": "N000", "": "", "123": "", "A": "A000", "H": "H000",
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {r["w"]: r["s"] for r in
           df.select("w", soundex_col(F.col("w")).alias("s")).collect()}
    assert got == cases


def test_case_and_noise_insensitive(spark):
    df = spark.createDataFrame([("robert",), ("Robert x9",),
                                ("ROBERT",)], "w string")
    vals = {r["s"] for r in
            df.select(soundex_col(F.col("w")).alias("s")).collect()}
    assert vals == {"R163"}
