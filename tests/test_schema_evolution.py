"""Schema evolution (SURVEY.md §7.4.6): the reference's intended
widening rules (`SchemaUpdate.java:17-127`, promotion table
`SchemaUtils.java:80-84`) wired into the table engine's append path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tiered_storage_for_apache_kafka_spark.sources.schema_evolution import (
    SchemaEvolutionError,
    conform,
    evolve_and_append,
    merge_schemas,
    read_evolved,
)


def _st(*fields):
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


class TestMergeSchemas:
    def test_identical_schema_is_unchanged(self):
        s = _st(("a", LongType(), False), ("b", StringType(), True))
        assert merge_schemas(s, s) == s

    def test_new_field_arrives_optional(self):
        old = _st(("a", LongType(), False))
        new = _st(("a", LongType(), False), ("b", StringType(), False))
        merged = merge_schemas(old, new)
        assert merged["b"].nullable  # add-as-optional even if writer says required

    def test_removed_field_kept_nullable(self):
        old = _st(("a", LongType(), False), ("gone", StringType(), False))
        merged = merge_schemas(old, _st(("a", LongType(), False)))
        assert merged["gone"].nullable and merged["gone"].dataType == StringType()

    @pytest.mark.parametrize(
        "old_t,new_t,want",
        [
            (IntegerType(), LongType(), LongType()),
            (LongType(), IntegerType(), LongType()),  # symmetric: keep wider
            (FloatType(), DoubleType(), DoubleType()),
            (DoubleType(), FloatType(), DoubleType()),
        ],
    )
    def test_promotion_table(self, old_t, new_t, want):
        merged = merge_schemas(_st(("x", old_t, True)), _st(("x", new_t, True)))
        assert merged["x"].dataType == want

    def test_nested_struct_and_array_recurse(self):
        old = StructType(
            [
                StructField(
                    "kafka", _st(("offset", IntegerType(), False)), False
                ),
                StructField("tags", ArrayType(IntegerType(), False), True),
            ]
        )
        new = StructType(
            [
                StructField("kafka", _st(("offset", LongType(), False)), False),
                StructField("tags", ArrayType(LongType(), False), True),
            ]
        )
        merged = merge_schemas(old, new)
        assert merged["kafka"].dataType["offset"].dataType == LongType()
        assert merged["tags"].dataType.elementType == LongType()

    def test_incompatible_change_rejected(self):
        with pytest.raises(SchemaEvolutionError, match="incompatible"):
            merge_schemas(_st(("x", StringType(), True)), _st(("x", LongType(), True)))

    def test_narrowing_never_happens(self):
        # long -> int looks like narrowing from the writer's view; the
        # merged schema must stay long so old data re-reads losslessly
        merged = merge_schemas(_st(("x", LongType(), True)), _st(("x", IntegerType(), True)))
        assert merged["x"].dataType == LongType()


class TestEvolveAndAppend:
    def test_widen_and_add_column_round_trip(self, spark, tmp_path):
        d = str(tmp_path / "tbl")
        v1 = spark.range(3).select(F.col("id").cast("int").alias("a"))
        evolve_and_append(v1, d)
        v2 = spark.range(3, 6).select(
            F.col("id").cast("long").alias("a"),
            F.concat(F.lit("u"), F.col("id")).alias("b"),
        )
        merged = evolve_and_append(v2, d)
        assert merged["a"].dataType == LongType() and merged["b"].nullable
        got = read_evolved(spark, d)
        assert got.schema["a"].dataType == LongType()
        rows = {r.a: r.b for r in got.collect()}
        assert rows == {0: None, 1: None, 2: None, 3: "u3", 4: "u4", 5: "u5"}

    def test_incompatible_append_rejected(self, spark, tmp_path):
        d = str(tmp_path / "tbl")
        evolve_and_append(spark.range(2).select(F.col("id").alias("a")), d)
        bad = spark.range(2).select(F.col("id").cast("string").alias("a"))
        with pytest.raises(SchemaEvolutionError):
            evolve_and_append(bad, d)

    def test_conform_fills_missing_with_typed_nulls(self, spark):
        target = _st(("a", LongType(), True), ("b", StringType(), True))
        out = conform(spark.range(2).select(F.col("id").alias("a")), target)
        # nullability is derived by Spark's analyzer; names/types must match
        assert [(f.name, f.dataType) for f in out.schema.fields] == [
            (f.name, f.dataType) for f in target.fields
        ]
        assert [r.b for r in out.collect()] == [None, None]
