"""Regenerate the embedded Public Suffix List snapshot in
``operators/urls.py`` from a downloaded ``public_suffix_list.dat``
(https://publicsuffix.org/list/ — public data, MPL-2.0).

The engine only embeds MULTI-label rules: the PSL default rule ``*``
already yields a one-label public suffix for any unknown TLD, so
single-label rules never change the registrable domain. This script
classifies every ICANN-section rule into the four constants the
expression logic consumes and prints them as Python tuples to paste
into ``operators/urls.py`` (or diff against the current snapshot).

Usage: python tools/gen_psl.py public_suffix_list.dat [--icann-only]
"""

from __future__ import annotations

import sys


def parse(path: str, icann_only: bool = True):
    exact2, wild1, wild2, exc = [], [], [], []
    in_icann = not icann_only
    skipped = 0
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if "===BEGIN ICANN DOMAINS===" in line:
                in_icann = True
                continue
            if "===END ICANN DOMAINS===" in line and icann_only:
                break
            if not in_icann or not line or line.startswith("//"):
                continue
            rule = line.split()[0]
            if not rule.isascii():
                # IDN rules need punycode handling on the host side
                # before they can match; out of scope for the snapshot.
                skipped += 1
                continue
            if rule.startswith("!"):
                exc.append(rule[1:])
            elif rule.startswith("*."):
                base = rule[2:]
                n = base.count(".")
                if n == 0:
                    wild1.append(base)
                elif n == 1:
                    wild2.append(base)
                else:
                    skipped += 1      # deeper wildcards: extend the
                                      # expression chain before adding
            elif rule.count(".") == 1:
                exact2.append(rule)
            elif rule.count(".") >= 2:
                skipped += 1          # 3-label exact rules: extend
                                      # PSL_EXACT3 + the when-chain
            # single-label rules: covered by the default rule
    return exact2, wild1, wild2, exc, skipped


def emit(name: str, vals: list[str]) -> None:
    print(f"{name} = (")
    for v in sorted(vals):
        print(f"    {v!r},")
    print(")")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    exact2, wild1, wild2, exc, skipped = parse(
        sys.argv[1], icann_only="--all" not in sys.argv)
    emit("PSL_EXACT2", exact2)
    emit("PSL_WILDCARD1", wild1)
    emit("PSL_WILDCARD2", wild2)
    emit("PSL_EXCEPTIONS2", [e for e in exc if e.count(".") == 1])
    emit("PSL_EXCEPTIONS3", [e for e in exc if e.count(".") == 2])
    print(f"# skipped (IDN / deep rules): {skipped}", file=sys.stderr)
