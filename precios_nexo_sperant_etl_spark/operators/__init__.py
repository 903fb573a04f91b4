from .dedup import dedup_keep_latest, dedup_keep_last, add_row_id
from .join import (left_enrich, match_flags, key_set_difference, before_after,
                   salted_left_join)
from .update import coalesce_update, tower_prefix
from .audit import change_flags, audit_summary
from .temporal import asof_join, range_join_within

__all__ = [
    "dedup_keep_latest", "dedup_keep_last", "add_row_id",
    "left_enrich", "match_flags", "key_set_difference", "before_after",
    "salted_left_join",
    "coalesce_update", "tower_prefix",
    "change_flags", "audit_summary",
    "asof_join", "range_join_within",
]
