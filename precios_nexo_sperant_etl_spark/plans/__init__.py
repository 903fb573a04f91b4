from .price_pipeline import core_enriched, core_update_audit

__all__ = ["core_enriched", "core_update_audit"]
