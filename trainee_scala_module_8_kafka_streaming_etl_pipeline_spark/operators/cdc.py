"""CDC envelope transforms — the Debezium SMT surface of the reference.

The reference configures two single-message transforms (SURVEY.md §2.1):

  S3 ``ExtractNewRecordState`` with ``delete.handling.mode='rewrite'``
     (/root/reference/README.md:361-364): flatten the before/after
     envelope to the new row state, keep tombstones, and *rewrite*
     deletes as normal rows carrying ``__deleted=true``.
  S4 ``ExtractNewDocumentState`` with ``delete.handling.mode='drop'``
     and ``operation.header='true'``
     (/root/reference/README.md:379-383): flatten, *drop* deletes, and
     carry the operation type as a metadata column.

Envelope convention here: a struct column (default ``after``) holding the
row state, plus a string ``op`` column ('c'reate / 'u'pdate / 'd'elete /
'r'ead-snapshot), matching Debezium's field names. Both transforms are
pure narrow projections — no shuffle, fully codegen'd, and filters on the
flattened columns still push down past them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE_OP = "d"


def unwrap_rewrite(
    df: DataFrame,
    state_col: str = "after",
    op_col: str = "op",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """S3: flatten envelope; deletes become flagged rows (``__deleted``).
    ``keep`` passes metadata columns (e.g. the topic offset) through."""
    return df.select(
        F.col(f"{state_col}.*"),
        (F.col(op_col) == DELETE_OP).alias("__deleted"),
        *[F.col(c) for c in keep],
    )


def unwrap_drop(
    df: DataFrame, state_col: str = "after", op_col: str = "op"
) -> DataFrame:
    """S4: flatten envelope; drop deletes; carry ``op`` as metadata."""
    return (
        df.filter(F.col(op_col) != DELETE_OP)
        .select(F.col(f"{state_col}.*"), F.col(op_col))
    )


def wrap_envelope(df: DataFrame, op_expr, offset_col: str | None = None) -> DataFrame:
    """Inverse helper (test/fixture use): pack flat rows into a
    Debezium-shaped envelope with the given op expression."""
    cols = [c for c in df.columns if c != offset_col]
    env = df.select(
        F.struct(*[F.col(c) for c in cols]).alias("after"),
        op_expr.alias("op"),
        *([F.col(offset_col).alias("_offset")] if offset_col else []),
    )
    return env
