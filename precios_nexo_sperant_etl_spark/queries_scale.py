"""Beyond-reference scale-operator queries (BASELINE.json north star):
dedup, similarity search, text analysis, multimodal plumbing, event-time
windows — each with a DuckDB oracle built on the same portable hash folds.

The DuckDB snippets mirror the Spark expressions *structurally* (same
fold order, same modulus, same slicing) so double/hash results are
bit-identical — see functions/exact.py for why order matters.

This module is the ORDER-PRESERVING LOADER for the family: the
implementation lives in queries_scale_part1..4 (split in r9 when the
single file passed 14k lines — VERDICT r8 item 6), and importing the
parts in this exact sequence reproduces the original registration
order byte-for-byte (pinned by the golden-order test). Shared helpers
are in queries_scale_common.py.
"""

from . import queries_scale_part1  # noqa: F401,E402
from . import queries_scale_part2  # noqa: F401,E402
from . import queries_scale_part3  # noqa: F401,E402
from . import queries_scale_part4  # noqa: F401,E402

# Back-compat namespace: the pre-split module exposed every top-level
# helper/constant; tests and sibling modules import them from here.
# Later parts override earlier ones, mirroring single-file semantics.
from . import queries_scale_common as _qs_common  # noqa: E402

for _m in (_qs_common, queries_scale_part1, queries_scale_part2,
           queries_scale_part3, queries_scale_part4):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            globals()[_k] = _v
del _m, _k, _v
