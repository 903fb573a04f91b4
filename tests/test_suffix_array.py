"""Suffix array / Kasai LCP / longest repeated substring vs brute
force, including the degenerate shapes (empty, single char, all-equal,
no repeats)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from precios_nexo_sperant_etl_spark.operators.text import (
    lcp_kasai, longest_repeated_substring, suffix_array)


def _brute_sa(s):
    return sorted(range(len(s)), key=lambda i: s[i:])


def _brute_lcp(s, sa):
    out = [0] * len(sa)
    for j in range(1, len(sa)):
        a, b = s[sa[j - 1]:], s[sa[j]:]
        h = 0
        while h < len(a) and h < len(b) and a[h] == b[h]:
            h += 1
        out[j] = h
    return out


def _brute_lrs(s):
    for L in range(len(s) - 1, 0, -1):
        seen: dict = {}
        for i in range(len(s) - L + 1):
            seen[s[i:i + L]] = seen.get(s[i:i + L], 0) + 1
        dups = sorted(w for w, c in seen.items() if c >= 2)
        if dups:
            return L, dups[0]
    return 0, ""


def test_degenerate_shapes():
    assert suffix_array("") == []
    assert longest_repeated_substring("") == (0, "")
    assert longest_repeated_substring("x") == (0, "")
    assert longest_repeated_substring("abcd") == (0, "")
    assert longest_repeated_substring("aaaa") == (3, "aaa")
    assert longest_repeated_substring("banana") == (3, "ana")


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="ab c", max_size=80))
def test_property_vs_brute(s):
    sa = suffix_array(s)
    assert sa == _brute_sa(s)
    assert lcp_kasai(s, sa) == _brute_lcp(s, sa)
    assert longest_repeated_substring(s) == _brute_lrs(s)


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=50))
def test_property_unicode(s):
    assert suffix_array(s) == _brute_sa(s)
    assert longest_repeated_substring(s) == _brute_lrs(s)
