"""Aho-Corasick blocklist matcher vs a brute-force position scan:
every occurrence (overlapping, nested) must match exactly."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.text import (
    ac_count_all, build_aho_corasick)


def brute(patterns, text):
    return [sum(1 for i in range(len(text) - len(p) + 1)
                if text[i:i + len(p)] == p) for p in patterns]


def test_overlap_and_nesting():
    pats = ["a a", "aa", "a", "ab", "b", "fast table", "table"]
    text = "a a a aa ab fast table b"
    ac = build_aho_corasick(pats)
    assert ac_count_all(ac, text) == brute(pats, text)


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        build_aho_corasick(["ok", ""])
    with pytest.raises(ValueError):
        build_aho_corasick([])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=5),
                min_size=1, max_size=8, unique=True),
       st.text(alphabet="ab ", max_size=200))
def test_property_vs_bruteforce(patterns, text):
    ac = build_aho_corasick(patterns)
    assert ac_count_all(ac, text) == brute(patterns, text)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=6), min_size=1,
                max_size=6, unique=True),
       st.text(max_size=120))
def test_property_unicode(patterns, text):
    ac = build_aho_corasick(patterns)
    assert ac_count_all(ac, text) == brute(patterns, text)
