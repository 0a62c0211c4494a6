"""Sources & sinks (SURVEY.md §2.1, S1-S15)."""

from .tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
