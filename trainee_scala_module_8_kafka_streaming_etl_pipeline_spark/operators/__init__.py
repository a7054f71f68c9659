from . import cdc, compaction, dedup, joins, similarity  # noqa: F401
