from .dedup import dedup_keep_latest, dedup_keep_last, add_row_id
from .join import left_enrich, match_flags, key_set_difference, before_after
from .update import coalesce_update, tower_prefix
from .audit import change_flags, audit_summary

__all__ = [
    "dedup_keep_latest", "dedup_keep_last", "add_row_id",
    "left_enrich", "match_flags", "key_set_difference", "before_after",
    "coalesce_update", "tower_prefix",
    "change_flags", "audit_summary",
]
