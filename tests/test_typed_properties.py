"""Typed properties projection (reference src/lib.rs:41-48 serde struct)."""

from obsidian_parser_spark.operators.properties import project_properties
from obsidian_parser_spark.operators.tokenize import tokenize_documents
from obsidian_parser_spark.sources.corpus import spans_from_raw
from tests.util import spans_df


def _notes(spark, raws):
    return tokenize_documents(
        spans_df(spark, [spans_from_raw(f"n{i}", r) for i, r in enumerate(raws)])
    )


def test_typed_projection_and_error_channel(spark):
    notes = _notes(
        spark,
        [
            "---\nid: 7\nweight: 2.5\ndraft: true\n---\nbody",  # all castable
            "---\nid: not-a-number\nweight: x\n---\nbody",  # two cast errors
            "no frontmatter at all",  # absent keys → NULL, no error
            "---\nid: 3\n---\nbody",  # weight/draft absent → NULL, no error
        ],
    )
    out = {
        r.doc_id: r
        for r in project_properties(
            notes, "id bigint, weight double, draft boolean"
        ).collect()
    }
    assert (out["n0"].id, out["n0"].weight, out["n0"].draft) == (7, 2.5, True)
    assert out["n0"].prop_errors == []
    assert out["n1"].id is None and out["n1"].weight is None
    assert sorted(out["n1"].prop_errors) == ["id:CastError", "weight:CastError"]
    assert out["n2"].id is None and out["n2"].prop_errors == []
    assert out["n3"].id == 3 and out["n3"].prop_errors == []


def test_typed_projection_struct_schema(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    notes = _notes(spark, ["---\nid: 11\n---\nx"])
    schema = StructType([StructField("id", LongType())])
    [r] = project_properties(notes, schema).collect()
    assert r.id == 11 and r.prop_errors == []
