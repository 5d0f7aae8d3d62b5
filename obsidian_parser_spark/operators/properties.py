"""Typed properties projection.

The reference lets the user fix a serde struct for note properties
(src/lib.rs:41-48 — ``Vault<Note<MyProps>>``; note/mod.rs:54-59), with
deserialization failing per note.  The Spark-idiomatic equivalent: project
the stringified ``props`` map onto a user-supplied schema with ``try_cast``
per field and a per-row error channel — no exceptions mid-plan, bad rows
stay addressable (the engine-wide quarantine pattern, like ``parse_error``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def project_properties(
    notes: DataFrame,
    schema: str | StructType,
    id_col: str = "doc_id",
    props_col: str = "props",
) -> DataFrame:
    """notes(…, props: map<string,string>) → (id_col, <typed field per
    schema entry>, prop_errors: array<string>).

    Per field: absent key ⇒ NULL (no error — serde's Option semantics);
    present but uncastable ⇒ NULL + ``"<field>:CastError"`` in
    ``prop_errors`` (the per-note deserialization failure, made row-level).
    Whole plan is JVM-side (map getItem + try_cast)."""
    struct = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    cols = [F.col(id_col)]
    errs = []
    for field in struct.fields:
        raw = F.col(props_col).getItem(field.name)
        typed = raw.try_cast(field.dataType)
        cols.append(typed.alias(field.name))
        errs.append(
            F.when(
                raw.isNotNull() & typed.isNull(),
                F.lit(f"{field.name}:CastError"),
            )
        )
    cols.append(F.array_compact(F.array(*errs)).alias("prop_errors"))
    return notes.select(*cols)
