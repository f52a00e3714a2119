"""CDC APPLY CHANGES: materialize the current state of a keyed table from
an out-of-order changelog of upserts and deletes (the DLT
``apply_changes`` / Debezium-consumer semantic; reference parity: the
upsert/merge sink S13 consumes pre-collapsed batches — this operator is
the collapsing step that turns a raw changelog INTO such a batch).

Semantics: for each key, the change with the highest sequence wins
(sequence columns compared lexicographically, with a final deterministic
tiebreak you supply — never arrival order); if that winning change is a
delete, the key is absent from the output.

Scale shape: ONE hash shuffle on the key with map-side partial
aggregation — the winner is selected by ``max(struct(seq..., payload))``,
which combines associatively, so a 100 TB changelog reduces partially in
every map task. This beats the textbook row_number-window formulation
(same shuffle but a full per-key sort buffer instead of a running max).
Out-of-order arrival needs no special casing: max() is order-free.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def apply_changes(
    changelog: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Collapse a changelog to current state.

    Returns one row per live key with the winning change's payload columns
    (everything that is not a key column), including ``op_col`` and the
    sequence columns of the winning change.

    ``keep_tombstones=True`` returns deleted keys too (their winning row
    carries the delete op) — required when the collapsed state is itself
    persisted and incrementally re-merged with later batches: dropping a
    tombstone early would let a LATE, lower-sequence upsert resurrect the
    key in a later merge round. Readers filter deletes at query time.
    """
    payload = [c for c in changelog.columns if c not in key_cols and c not in seq_cols]
    # seq columns lead the struct so max() orders by sequence first; payload
    # columns break exact-sequence ties deterministically (they must be
    # orderable types — serialize maps before calling)
    ordered = F.struct(*[F.col(c) for c in seq_cols], *[F.col(c) for c in payload])
    latest = (
        changelog.groupBy(*key_cols)
        .agg(F.max(ordered).alias("_w"))
        .select(
            *key_cols,
            *[F.col(f"_w.{c}").alias(c) for c in seq_cols],
            *[F.col(f"_w.{c}").alias(c) for c in payload],
        )
    )
    if keep_tombstones:
        return latest
    # eqNullSafe: a winning change with op NULL is an upsert, not a silent
    # delete (`NULL != 'delete'` is NULL and a plain where() would drop the
    # key entirely — sources that only stamp op on deletes would lose rows)
    return latest.where(~F.col(op_col).eqNullSafe(delete_op))
