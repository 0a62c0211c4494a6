"""Sources & sinks (SURVEY.md §2.1, S1-S15)."""

from .cache import materialize_summary
from .tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "materialize_summary",
    "register_views",
]
