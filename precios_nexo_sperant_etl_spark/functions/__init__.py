from .normalize import norm_key, intlike_canon, clean_col_name, fold_accent_headers
from .numparse import to_number, safe_num, NULL_SENTINELS
from .compare import isclose, nullsafe_neq
from .exact import dsum, davg, ddot

__all__ = [
    "norm_key", "intlike_canon", "clean_col_name", "fold_accent_headers",
    "to_number", "safe_num", "NULL_SENTINELS",
    "isclose", "nullsafe_neq",
    "dsum", "davg", "ddot",
]
