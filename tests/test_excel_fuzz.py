"""Fuzzed corruption stress for the stdlib BIFF/.xls reader (S2/S5).

The tolerant-ingest contract (reference APN:186-230, mirrored by
``ingest_project_files``) is: a corrupt per-project file may raise — the
fan-in warns and skips — but it must never HANG or exhaust memory,
because a wedged reader stalls the whole ingest rather than degrading
it. Until round 6 the CFB walker trusted its chain links (a cyclic
DIFAT or miniFAT chain looped forever, accumulating sectors); these
tests pin the hardened behavior with deterministic fuzzing:

- truncation at arbitrary byte lengths,
- random byte flips (seeded RNG — reproducible corpus),
- surgically crafted cyclic DIFAT / miniFAT chains,
- the end-to-end warn-and-skip path with a corrupt file in the map.

Every call is wrapped in a SIGALRM failsafe so a reintroduced infinite
loop fails the suite in seconds instead of wedging it.
"""

import random
import signal
import struct

import pytest

from precios_nexo_sperant_etl_spark.sources.excel import read_xls_rows

from test_ingest import _make_xls

ROWS = [
    ["Torre", "Precio Lista", "Área Total"],
    ["A-101", 350000.5, 55],
    ["B-202", 410000.0, 61],
    [None, True, -3],
]


class _Alarm(Exception):
    pass


def _read_bounded(path: str, seconds: int = 20):
    """read_xls_rows under a SIGALRM failsafe: returns (kind, value)
    where kind is 'ok' or 'err'. A hang raises _Alarm and fails the
    test — that is the one outcome the tolerant contract forbids."""
    def _handler(signum, frame):
        raise _Alarm("reader hung on corrupt input")
    old = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(seconds)
    try:
        return "ok", read_xls_rows(path)
    except _Alarm:
        raise
    except Exception as ex:  # noqa: BLE001 — raising IS the contract
        return "err", ex
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="module")
def valid_xls(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fuzz") / "valid.xls")
    _make_xls(path, ROWS)
    with open(path, "rb") as f:
        return path, f.read()


def test_valid_baseline(valid_xls):
    path, _ = valid_xls
    got = read_xls_rows(path)
    assert got[0][:3] == ROWS[0]
    assert got[1][1] == 350000.5 and got[2][2] == 61


def test_truncation_sweep(valid_xls, tmp_path):
    """Every truncation length returns-or-raises; none hangs. Prefix
    lengths step through the header, FAT, directory, and data regions."""
    _, data = valid_xls
    p = str(tmp_path / "trunc.xls")
    for cut in list(range(0, 600, 37)) + list(range(600, len(data), 211)):
        with open(p, "wb") as f:
            f.write(data[:cut])
        kind, val = _read_bounded(p)
        if kind == "ok":
            assert isinstance(val, list)


def test_byteflip_fuzz(valid_xls, tmp_path):
    """300 seeded mutants, 1-8 byte flips each, anywhere in the file
    (header fields, FAT links, directory entries, BIFF records).
    Contract: terminate with a row matrix or an exception."""
    _, data = valid_xls
    p = str(tmp_path / "flip.xls")
    outcomes = {"ok": 0, "err": 0}
    for seed in range(300):
        rng = random.Random(seed)
        buf = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        with open(p, "wb") as f:
            f.write(bytes(buf))
        kind, val = _read_bounded(p)
        outcomes[kind] += 1
        if kind == "ok":
            assert isinstance(val, list)
    # Both outcomes must actually occur across the corpus — all-"err"
    # would mean the reader lost its tolerance, all-"ok" that the fuzz
    # never hit a structural field.
    assert outcomes["ok"] > 0 and outcomes["err"] > 0, outcomes


def test_cyclic_difat_chain_terminates(valid_xls, tmp_path):
    """difat_start → FAT sector whose chain link points back at itself:
    pre-hardening this looped forever extending the DIFAT list."""
    _, data = valid_xls
    buf = bytearray(data)
    struct.pack_into("<I", buf, 68, 0)          # difat_start = sector 0
    struct.pack_into("<I", buf, 512 + 127 * 4, 0)  # its last link → itself
    p = str(tmp_path / "cyc_difat.xls")
    with open(p, "wb") as f:
        f.write(bytes(buf))
    _read_bounded(p)  # any non-hang outcome passes


def test_cyclic_minifat_chain_terminates(valid_xls, tmp_path):
    """Force the mini-stream path (entry size < cutoff) with a miniFAT
    chain that cycles through sector 0: pre-hardening this accumulated
    sectors forever."""
    _, data = valid_xls
    buf = bytearray(data)
    # Workbook dirent: directory sector is file offset 1024, entry #1.
    struct.pack_into("<Q", buf, 1024 + 128 + 120, 64)  # size → mini path
    struct.pack_into("<I", buf, 60, 0)   # minifat_start = sector 0
    struct.pack_into("<I", buf, 512, 0)  # fat[0] → 0: 0 → 0 cycle
    p = str(tmp_path / "cyc_minifat.xls")
    with open(p, "wb") as f:
        f.write(bytes(buf))
    _read_bounded(p)


def test_implausible_sector_shift_rejected(valid_xls, tmp_path):
    """A flipped sector-shift field (2^40-byte 'sectors') raises
    ValueError instead of attempting gigantic slices."""
    _, data = valid_xls
    buf = bytearray(data)
    struct.pack_into("<H", buf, 30, 40)
    p = str(tmp_path / "shift.xls")
    with open(p, "wb") as f:
        f.write(bytes(buf))
    kind, val = _read_bounded(p)
    assert kind == "err" and isinstance(val, ValueError)


def test_fanin_skips_corrupt_keeps_good(spark, valid_xls, tmp_path):
    """End-to-end S5: one good workbook + one cyclic-DIFAT mutant in the
    project map → the good rows land, the mutant is warned-and-skipped,
    and nothing hangs."""
    from precios_nexo_sperant_etl_spark.sources.ingest import (
        ingest_project_files)
    good_path, data = valid_xls
    buf = bytearray(data)
    struct.pack_into("<I", buf, 68, 0)
    struct.pack_into("<I", buf, 512 + 127 * 4, 0)
    bad_path = str(tmp_path / "bad.xls")
    with open(bad_path, "wb") as f:
        f.write(bytes(buf))

    skips = []
    df = ingest_project_files(
        spark, {"good": good_path, "bad": bad_path},
        on_skip=lambda proj, reason: skips.append((proj, reason)))
    # The cyclic chain is tolerated (prefix-read), so the mutant may
    # parse and contribute rows (6 total) or be warned-and-skipped (3);
    # either way the call returns and the good project's data is there.
    assert df.count() in (3, 6)
    assert all(p == "bad" for p, _ in skips)
    assert df.filter((df["Torre"] == "A-101")
                     & (df["Proyecto"] == "good")).count() == 1


# --- xlsx (zip + XML) twin of the BIFF fuzz above: the container is
# stdlib zipfile/ElementTree, so corruption surfaces as BadZipFile /
# ParseError / KeyError — all absorbed by the fan-in's per-file skip.
# The invariant under fuzzing is the same: return-or-raise, never hang.

@pytest.fixture(scope="module")
def valid_xlsx(tmp_path_factory):
    from precios_nexo_sperant_etl_spark.sources.excel import write_xlsx
    path = str(tmp_path_factory.mktemp("fuzzx") / "valid.xlsx")
    write_xlsx(path, {"Hoja1": ROWS})
    with open(path, "rb") as f:
        return path, f.read()


def test_xlsx_valid_baseline(valid_xlsx):
    from precios_nexo_sperant_etl_spark.sources.excel import read_xlsx_rows
    path, _ = valid_xlsx
    got = read_xlsx_rows(path)
    assert got[0][:3] == ROWS[0] and got[1][1] == 350000.5


def test_xlsx_truncation_sweep(valid_xlsx, tmp_path):
    from precios_nexo_sperant_etl_spark.sources.excel import read_xlsx_rows
    _, data = valid_xlsx
    p = str(tmp_path / "trunc.xlsx")
    for cut in range(0, len(data), 131):
        with open(p, "wb") as f:
            f.write(data[:cut])
        def _handler(signum, frame):
            raise _Alarm("xlsx reader hung")
        old = signal.signal(signal.SIGALRM, _handler)
        signal.alarm(20)
        try:
            out = read_xlsx_rows(p)
            assert isinstance(out, list)
        except _Alarm:
            raise
        except Exception:  # noqa: BLE001 — raising IS the contract
            pass
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)


def test_xlsx_byteflip_fuzz(valid_xlsx, tmp_path):
    from precios_nexo_sperant_etl_spark.sources.excel import read_xlsx_rows
    _, data = valid_xlsx
    p = str(tmp_path / "flip.xlsx")
    outcomes = {"ok": 0, "err": 0}
    for seed in range(200):
        rng = random.Random(10_000 + seed)
        buf = bytearray(data)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        with open(p, "wb") as f:
            f.write(bytes(buf))
        def _handler(signum, frame):
            raise _Alarm("xlsx reader hung")
        old = signal.signal(signal.SIGALRM, _handler)
        signal.alarm(20)
        try:
            out = read_xlsx_rows(p)
            assert isinstance(out, list)
            outcomes["ok"] += 1
        except _Alarm:
            raise
        except Exception:  # noqa: BLE001
            outcomes["err"] += 1
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    assert outcomes["ok"] > 0 and outcomes["err"] > 0, outcomes
