"""URL / domain keying for web-corpus curation.

Beyond-reference surface. The most common curation key for web-scale
training data is the URL — per-domain mixing quotas, domain-keyed
dedup, and domain blocklists all need a *registrable domain* (the
"site", e.g. ``example.co.uk``) extracted from raw URLs. This module
keeps that extraction declarative: every part is a Column expression
(Spark-native ``parse_url`` plus regexes), so it runs inside
whole-stage codegen with no Python crossing and pushes through scans
like any other projection.

The registrable-domain logic implements the real Public Suffix List
algorithm (publicsuffix.org/list: longest matching rule wins; ``*.``
wildcard rules; ``!`` exception rules; default rule ``*``) over an
embedded SNAPSHOT of the list's ICANN section — several hundred
multi-label rules covering the common ccTLD second-level structures
(uk/jp/au/br/... plus the jp city wildcards and their ``!city.*``
exceptions and the wildcard-only TLDs). Single-label TLD rules are
deliberately NOT embedded: the default rule already yields a one-label
suffix for any TLD, so only multi-label rules change the answer.
``tools/gen_psl.py`` regenerates the snapshot from a downloaded
``public_suffix_list.dat`` when a deployment wants the complete list —
same expression shape, longer IN-lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Two-label exact public-suffix rules (snapshot of the PSL ICANN
#: section; regenerate with tools/gen_psl.py). Hosts ending in one of
#: these keep three labels as the registrable domain.
PSL_EXACT2 = (
    # uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # au (generic + state/territory)
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    # jp (generic + the 47 prefectures; city wildcards are below)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "aichi.jp", "akita.jp", "aomori.jp", "chiba.jp", "ehime.jp",
    "fukui.jp", "fukuoka.jp", "fukushima.jp", "gifu.jp", "gunma.jp",
    "hiroshima.jp", "hokkaido.jp", "hyogo.jp", "ibaraki.jp",
    "ishikawa.jp", "iwate.jp", "kagawa.jp", "kagoshima.jp",
    "kanagawa.jp", "kochi.jp", "kumamoto.jp", "kyoto.jp", "mie.jp",
    "miyagi.jp", "miyazaki.jp", "nagano.jp", "nagasaki.jp", "nara.jp",
    "niigata.jp", "oita.jp", "okayama.jp", "okinawa.jp", "osaka.jp",
    "saga.jp", "saitama.jp", "shiga.jp", "shimane.jp", "shizuoka.jp",
    "tochigi.jp", "tokushima.jp", "tokyo.jp", "tottori.jp", "toyama.jp",
    "wakayama.jp", "yamagata.jp", "yamaguchi.jp", "yamanashi.jp",
    # nz
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # za / ke / ng / eg / sa / ae
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "info.eg", "mil.eg",
    "name.eg", "net.eg", "org.eg", "sci.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "pub.sa", "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    # americas
    "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar", "tur.ar",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
    "org.pe",
    "co.cl", "gob.cl", "gov.cl", "mil.cl",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
    "org.co",
    # asia
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn",
    "org.cn",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw",
    "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.id", "biz.id", "co.id", "go.id", "mil.id", "my.id", "net.id",
    "or.id", "sch.id", "web.id",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # europe / mideast
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "mil.tr", "name.tr",
    "net.tr", "org.tr", "pol.tr", "tel.tr", "tsk.tr", "tv.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "mil.pl",
    "net.pl", "org.pl", "waw.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
)

#: TLDs whose ENTIRE second level is a public suffix (``*.ck`` style
#: wildcard rules with a single-label base).
PSL_WILDCARD1 = ("bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg")

#: Two-label wildcard bases (``*.kawasaki.jp`` style: any third-level
#: label under these is a public suffix).
PSL_WILDCARD2 = (
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
)

#: Exception rules (``!www.ck`` style): the rule itself IS the
#: registrable domain, overriding any wildcard. Split by label count.
PSL_EXCEPTIONS2 = ("www.ck",)
PSL_EXCEPTIONS3 = (
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)

#: Back-compat alias: the old 9-entry subset's role (two-label suffixes
#: that extend the registrable domain to three labels) is now PSL_EXACT2.
MULTI_LABEL_SUFFIXES = PSL_EXACT2

#: Same set as one SQL IN-list literal (used by oracles).
MULTI_LABEL_SUFFIX_SQL = ", ".join(f"'{s}'" for s in PSL_EXACT2)


def _sql_in(vals) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def url_host(url: Column) -> Column:
    """Lowercased hostname (no port, no userinfo) via Spark-native
    ``parse_url`` — JVM-side, codegen-friendly."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_port(url: Column) -> Column:
    """Explicit port as INT, NULL when the URL carries none. The host
    alternative consumes a bracketed IPv6 literal whole so its colons
    can never be mistaken for a port separator."""
    return F.nullif(
        F.regexp_extract(
            url, r"://(?:[^/@?#]*@)?(?:\[[^\]]*\]|[^/:?#]*):(\d+)", 1),
        F.lit("")).cast("int")


def url_path(url: Column) -> Column:
    """Path component (leading slash, query/fragment excluded); NULL
    for an empty path."""
    return F.nullif(F.parse_url(url, F.lit("PATH")), F.lit(""))


def url_query(url: Column) -> Column:
    """Query string without the ``?``; NULL when absent."""
    return F.parse_url(url, F.lit("QUERY"))


def registrable_domain(host: Column) -> Column:
    """Registrable domain of a lowercased host per the Public Suffix
    List algorithm over the embedded snapshot: exception rules first
    (``city.kawasaki.jp`` wins over ``*.kawasaki.jp``), then the
    longest matching rule (two-label wildcards → 3-label suffix,
    exact two-label rules and TLD wildcards → 2-label suffix), then
    the default rule ``*`` (suffix = last label). The registrable
    domain is the suffix plus one label (``blog.x.co.uk`` → ``x.co.uk``,
    ``a.b.kawasaki.jp`` → ``a.b.kawasaki.jp``). Hosts that ARE a public
    suffix, single labels, IPv4 literals (no label structure —
    truncating ``10.1.2.3`` to ``2.3`` would merge unrelated machines
    into one "site"), and bracketed IPv6 literals pass through
    unchanged. Everything is a Column expression — codegen, no Python."""
    is_ip = (host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
             | host.startswith("["))
    last1 = F.regexp_extract(host, r"([^.]+)$", 1)
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    last4 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$", 1)
    return (F.when(is_ip, host)
             # exception rules: the rule itself is the registrable domain
             .when(last3.isin(*PSL_EXCEPTIONS3), last3)
             .when(last2.isin(*PSL_EXCEPTIONS2), last2)
             # *.base wildcards with 2-label base → 3-label suffix
             .when(last2.isin(*PSL_WILDCARD2),
                   F.when(last4 != "", last4).otherwise(host))
             # exact 2-label rules → 3-label registrable domain
             .when(last2.isin(*PSL_EXACT2),
                   F.when(last3 != "", last3).otherwise(host))
             # *.tld wildcards → any 2nd-level label is a suffix
             .when(last1.isin(*PSL_WILDCARD1) & (last2 != ""),
                   F.when(last3 != "", last3).otherwise(host))
             # default rule: suffix = last label
             .when(last2 != "", last2)
             .otherwise(host))


def duck_domain_sql(host: str) -> str:
    """DuckDB mirror of :func:`registrable_domain`, generated from the
    SAME rule tables so oracle and engine can never drift. ``host`` is
    a SQL expression producing the lowercased hostname."""
    ip = (rf"(regexp_matches({host}, '^\d{{1,3}}(\.\d{{1,3}}){{3}}$')"
          rf" OR {host} LIKE '[%')")
    last1 = rf"regexp_extract({host}, '([^.]+)$', 1)"
    last2 = rf"regexp_extract({host}, '([^.]+\.[^.]+)$', 1)"
    last3 = rf"regexp_extract({host}, '([^.]+\.[^.]+\.[^.]+)$', 1)"
    last4 = rf"regexp_extract({host}, '([^.]+\.[^.]+\.[^.]+\.[^.]+)$', 1)"
    return (
        f"CASE WHEN {ip} THEN {host}"
        f" WHEN {last3} IN ({_sql_in(PSL_EXCEPTIONS3)}) THEN {last3}"
        f" WHEN {last2} IN ({_sql_in(PSL_EXCEPTIONS2)}) THEN {last2}"
        f" WHEN {last2} IN ({_sql_in(PSL_WILDCARD2)})"
        f" THEN CASE WHEN {last4} <> '' THEN {last4} ELSE {host} END"
        f" WHEN {last2} IN ({_sql_in(PSL_EXACT2)})"
        f" THEN CASE WHEN {last3} <> '' THEN {last3} ELSE {host} END"
        f" WHEN {last1} IN ({_sql_in(PSL_WILDCARD1)}) AND {last2} <> ''"
        f" THEN CASE WHEN {last3} <> '' THEN {last3} ELSE {host} END"
        f" WHEN {last2} <> '' THEN {last2}"
        f" ELSE {host} END")


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Project host / port / path / query_string / domain columns out
    of ``url_col`` — a narrow, fully-pushable enrichment."""
    u = F.col(url_col)
    host = url_host(u)
    return df.withColumns({
        "host": host,
        "port": url_port(u),
        "path": url_path(u),
        "query_string": url_query(u),
        "domain": registrable_domain(host),
    })


# ---------------------------------------------------------------------------
# robots.txt gate (RFC 9309) — the crawl-permission pass a web-curation
# pipeline runs before fetching or before admitting a fetched page.
# Fully declarative: rule patterns are translated to anchored regexes
# with Column expressions, the small rules table broadcasts to the URL
# side, and the most-specific-match argmax is one map-side-combinable
# aggregate — no Python crossing anywhere.
# ---------------------------------------------------------------------------

def robots_pattern_regex(pattern: Column) -> Column:
    """Translate an RFC 9309 path pattern to an anchored Java regex:
    ``*`` is a wildcard, a trailing ``$`` anchors the end, everything
    else is literal (regex metacharacters escaped). The result matches
    iff the pattern matches a PREFIX of the path (or the whole path
    when anchored), per the RFC's matching rules."""
    anchored = pattern.endswith("$")
    body = (F.when(anchored,
                   pattern.substr(F.lit(1), F.length(pattern) - 1))
            .otherwise(pattern))
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild,
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def robots_gate(urls: DataFrame, rules: DataFrame,
                agent: str = "trainingbot") -> DataFrame:
    """RFC 9309 allow/deny for every (domain, path) URL row.

    ``rules`` columns: domain, agent, allow (boolean), pattern.
    Group selection is exclusive per the RFC: when a domain has any
    rules for ``agent``, ONLY that group applies; otherwise the ``*``
    group. Within the group the most specific match wins — longest
    pattern in octets, ties broken toward Allow — and a URL matched by
    no rule is allowed. Returns one row per input URL with the chosen
    group, the winning pattern (null if none), its length, and the
    verdict.

    Scale shape: rules are a per-site dimension (tiny next to the URL
    fact side) and broadcast; the argmax is ``max_by`` over one hash
    aggregate keyed by the URL row — one shuffle of the fact side, no
    window, no Python.
    """
    specific = (rules.filter(F.col("agent") == agent)
                .select("domain").distinct())
    chosen = (rules.join(F.broadcast(specific), "domain", "left_semi")
              .filter(F.col("agent") == agent)
              .unionByName(
                  rules.join(F.broadcast(specific), "domain", "left_anti")
                  .filter(F.col("agent") == F.lit("*"))))
    rx = (chosen.withColumn("rule_regex",
                            robots_pattern_regex(F.col("pattern")))
          .withColumn("spec_len", F.length("pattern").cast("long")))
    j = (urls.join(F.broadcast(rx), "domain", "left")
         .withColumn("hit", F.regexp_like(F.col("path"),
                                          F.col("rule_regex"))))
    key_cols = [c for c in urls.columns]
    best = (j.groupBy(*key_cols)
            .agg(F.any_value(F.col("agent"), True).alias("matched_agent"),
                 F.max_by(
                     F.when(F.col("hit"),
                            F.struct(F.col("pattern").alias("p"),
                                     F.col("spec_len").alias("s"),
                                     F.col("allow").alias("a"))),
                     F.when(F.col("hit"),
                            F.struct(F.col("spec_len"),
                                     F.col("allow").cast("int"),
                                     F.col("pattern")))).alias("w")))
    return (best
            .withColumn("matched_agent",
                        F.coalesce(F.col("matched_agent"), F.lit("none")))
            .withColumn("matched_rule", F.col("w.p"))
            .withColumn("spec_len", F.coalesce(F.col("w.s"), F.lit(-1)))
            .withColumn("allowed", F.coalesce(F.col("w.a"), F.lit(True)))
            .drop("w"))


# ---------------------------------------------------------------------------
# Punycode (RFC 3492) — internationalized domain labels (xn--) are the
# form IDN hostnames take on the wire; registrable-domain keying and
# domain blocklists over a real crawl must decode them before any
# unicode-aware comparison (confusable skeletons, script mixing). Both
# directions implemented from the RFC's adaptive-bias algorithm;
# tests cross-validate against Python's stdlib punycode codec.
# ---------------------------------------------------------------------------

_PUNY_BASE, _PUNY_TMIN, _PUNY_TMAX = 36, 1, 26
_PUNY_SKEW, _PUNY_DAMP, _PUNY_BIAS0, _PUNY_N0 = 38, 700, 72, 128


def _puny_adapt(delta: int, numpoints: int, first: bool) -> int:
    delta = delta // _PUNY_DAMP if first else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_PUNY_BASE - _PUNY_TMIN) * _PUNY_TMAX) // 2:
        delta //= _PUNY_BASE - _PUNY_TMIN
        k += _PUNY_BASE
    return k + (((_PUNY_BASE - _PUNY_TMIN + 1) * delta)
                // (delta + _PUNY_SKEW))


def punycode_encode(label: str) -> str:
    """RFC 3492 encode of one label (no xn-- prefix handling here)."""
    basic = [c for c in label if ord(c) < 128]
    out = basic[:]
    if basic:
        out.append("-")
    n, delta, bias = _PUNY_N0, 0, _PUNY_BIAS0
    h = b = len(basic)
    codepoints = sorted({ord(c) for c in label if ord(c) >= 128})
    total = len(label)
    first = True
    for m in codepoints:
        delta += (m - n) * (h + 1)
        n = m
        for c in label:
            cp = ord(c)
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = _PUNY_BASE
                while True:
                    t = (_PUNY_TMIN if k <= bias
                         else _PUNY_TMAX if k >= bias + _PUNY_TMAX
                         else k - bias)
                    if q < t:
                        break
                    d = t + (q - t) % (_PUNY_BASE - t)
                    out.append("abcdefghijklmnopqrstuvwxyz0123456789"[d])
                    q = (q - t) // (_PUNY_BASE - t)
                    k += _PUNY_BASE
                out.append("abcdefghijklmnopqrstuvwxyz0123456789"[q])
                bias = _puny_adapt(delta, h + 1, first)
                first = False
                delta = 0
                h += 1
        delta += 1
        n += 1
    if h != total:
        raise ValueError("unencodable label")
    return "".join(out)


def punycode_decode(encoded: str) -> str:
    """RFC 3492 decode of one label (inverse of punycode_encode)."""
    digits = "abcdefghijklmnopqrstuvwxyz0123456789"
    pos = encoded.rfind("-")
    output = list(encoded[:pos]) if pos > 0 else []
    if any(ord(c) >= 128 for c in output):
        raise ValueError("non-basic code point before delimiter")
    rest = encoded[pos + 1:] if pos >= 0 else encoded
    i, n, bias = 0, _PUNY_N0, _PUNY_BIAS0
    p = 0
    first = True
    while p < len(rest):
        oldi, w, k = i, 1, _PUNY_BASE
        while True:
            if p >= len(rest):
                raise ValueError("truncated punycode integer")
            d = digits.find(rest[p].lower())
            if d < 0:
                raise ValueError(f"bad punycode digit {rest[p]!r}")
            p += 1
            i += d * w
            t = (_PUNY_TMIN if k <= bias
                 else _PUNY_TMAX if k >= bias + _PUNY_TMAX
                 else k - bias)
            if d < t:
                break
            w *= _PUNY_BASE - t
            k += _PUNY_BASE
        bias = _puny_adapt(i - oldi, len(output) + 1, first)
        first = False
        n += i // (len(output) + 1)
        i %= len(output) + 1
        if n > 0x10FFFF:
            raise ValueError("code point overflow")
        output.insert(i, chr(n))
        i += 1
    return "".join(output)
