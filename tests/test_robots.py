"""RFC 9309 robots.txt gate: group selection, specificity, wildcards,
anchors, metacharacter escaping, default-allow."""

from __future__ import annotations

from pyspark.sql import functions as F

from precios_nexo_sperant_etl_spark.operators.urls import robots_gate


def _run(spark, urls, rules, agent="trainingbot"):
    u = spark.createDataFrame(urls, "doc_id long, domain string, path string")
    r = spark.createDataFrame(
        rules, "domain string, agent string, allow boolean, pattern string")
    rows = robots_gate(u, r, agent=agent).collect()
    return {row["doc_id"]: row for row in rows}


def test_specificity_and_tie_break(spark):
    out = _run(spark,
               [(1, "a.com", "/admin/public/x"),
                (2, "a.com", "/admin/private"),
                (3, "a.com", "/free")],
               [("a.com", "*", False, "/admin"),
                ("a.com", "*", True, "/admin/public"),
                # same length as the disallow -> Allow wins the tie
                ("a.com", "*", True, "/admin")])
    assert out[1]["allowed"] is True and out[1]["matched_rule"] == "/admin/public"
    assert out[2]["allowed"] is True          # tie at spec 6 -> Allow
    assert out[3]["allowed"] is True and out[3]["matched_rule"] is None
    assert out[3]["spec_len"] == -1


def test_group_selection_is_exclusive(spark):
    rules = [("a.com", "*", False, "/x"),
             ("a.com", "trainingbot", False, "/y"),
             ("b.com", "*", False, "/x")]
    out = _run(spark, [(1, "a.com", "/x"), (2, "a.com", "/y"),
                       (3, "b.com", "/x")], rules)
    # a.com has a trainingbot group -> the '*' /x rule must NOT apply
    assert out[1]["allowed"] is True and out[1]["matched_agent"] == "trainingbot"
    assert out[2]["allowed"] is False
    assert out[3]["allowed"] is False and out[3]["matched_agent"] == "*"


def test_wildcard_anchor_and_escaping(spark):
    rules = [("a.com", "*", False, "/*.php$"),
             ("a.com", "*", False, "/a+b"),        # literal plus sign
             ("a.com", "*", False, "/dot.dir")]    # literal dot
    out = _run(spark,
               [(1, "a.com", "/x/y.php"), (2, "a.com", "/x/y.php3"),
                (3, "a.com", "/a+b/c"), (4, "a.com", "/aab/c"),
                (5, "a.com", "/dot.dir/z"), (6, "a.com", "/dotXdir/z")],
               rules)
    assert out[1]["allowed"] is False          # anchored wildcard hits
    assert out[2]["allowed"] is True           # $ means end-of-path
    assert out[3]["allowed"] is False
    assert out[4]["allowed"] is True           # '+' not a regex escape
    assert out[5]["allowed"] is False
    assert out[6]["allowed"] is True           # '.' not a regex any


def test_empty_pattern_and_no_rules_domain(spark):
    out = _run(spark,
               [(1, "a.com", "/anything"), (2, "c.com", "/anything")],
               [("a.com", "*", True, "")])
    assert out[1]["allowed"] is True and out[1]["matched_rule"] == ""
    assert out[1]["spec_len"] == 0
    assert out[2]["allowed"] is True and out[2]["matched_agent"] == "none"


# --- punycode (RFC 3492) -----------------------------------------------------

def test_punycode_matches_stdlib_samples():
    from precios_nexo_sperant_etl_spark.operators.urls import (
        punycode_decode, punycode_encode)
    for label in ["münchen", "bücher", "mañana", "北京", "ドメイン",
                  "пример", "ελλάδα", "עברית", "한국", "abc", "a-b-c"]:
        enc = punycode_encode(label)
        assert enc == label.encode("punycode").decode("ascii")
        assert punycode_decode(enc) == label


def test_punycode_property_vs_stdlib():
    import random
    from precios_nexo_sperant_etl_spark.operators.urls import (
        punycode_decode, punycode_encode)
    rng = random.Random(7)
    pools = [range(97, 123), range(0x410, 0x450), range(0x4E00, 0x4E60),
             range(0x3B1, 0x3C9)]
    for _ in range(300):
        n = rng.randint(1, 12)
        label = "".join(chr(rng.choice(list(rng.choice(pools))))
                        for _ in range(n))
        enc = punycode_encode(label)
        assert enc == label.encode("punycode").decode("ascii"), label
        assert punycode_decode(enc) == label


def test_punycode_bad_inputs():
    import pytest
    from precios_nexo_sperant_etl_spark.operators.urls import (
        punycode_decode)
    with pytest.raises(ValueError):
        punycode_decode("abc-ü")       # non-basic before delimiter
    with pytest.raises(ValueError):
        punycode_decode("abc-!!")      # bad digit
