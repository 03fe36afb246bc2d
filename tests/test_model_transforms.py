"""ModelTransforms source — the fourth Source union arm (reference:
thrift/api.thrift:192, 599-610; planner semantics
ModelTransformsPlanner.scala:28-100): source rows -> inputMapping ->
batched inference -> outputMapping, passthrough fields carried through,
output usable as a GroupBy source.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Model,
    ModelTransformSource,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.model_transforms import (
    hashed_embedding,
    linear_scorer,
    run_models,
)
from chronon_spark.sources.scan import scan_source

SF = "/root/testdata/sf0.001"
TS = "unix_millis(cast(ts as timestamp))"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def scorer_model(out="score"):
    return Model(
        name="scorer",
        value_schema={out: "double"},
        inference_fn=linear_scorer({"v": 0.5, "v2": 2.0}, bias=1.0, out_col=out),
        input_mapping={"v": "value", "v2": "value * value"},
    )


class TestRunModels:
    def test_linear_scorer_matches_sql(self, spark, events):
        got = run_models(events, [scorer_model()], ["event_id", "value"])
        exp = events.selectExpr(
            "event_id", "value", "0.5 * value + 2.0 * value * value + 1.0 AS score"
        )
        joined = got.alias("g").join(exp.alias("e"), "event_id").select(
            (F.abs(F.col("g.score") - F.col("e.score")) < 1e-9).alias("ok")
        )
        assert joined.count() == events.count()
        assert joined.where("NOT ok").count() == 0

    def test_multiple_models_one_pass(self, spark, events):
        emb = Model(
            name="enc",
            value_schema={"embedding": "array<float>"},
            inference_fn=hashed_embedding("txt", dim=8),
            input_mapping={"txt": "CAST(event_id AS STRING)"},
        )
        out = run_models(events.limit(50), [scorer_model(), emb], ["event_id"])
        pdf = out.toPandas()
        assert set(pdf.columns) == {"event_id", "score", "embedding"}
        assert pdf["embedding"].map(len).eq(8).all()

    def test_embedding_deterministic(self, spark, events):
        emb = Model(
            name="enc",
            value_schema={"embedding": "array<float>"},
            inference_fn=hashed_embedding("txt", dim=8),
            input_mapping={"txt": "CAST(event_id AS STRING)"},
        )
        a = run_models(events.limit(20), [emb], ["event_id"]).toPandas()
        b = run_models(events.limit(20), [emb], ["event_id"]).toPandas()
        merged = a.merge(b, on="event_id")
        assert all(
            list(x) == list(y)
            for x, y in zip(merged.embedding_x, merged.embedding_y)
        )

    def test_output_mapping(self, spark, events):
        m = scorer_model()
        m.output_mapping = {"score_pct": "least(score / 100.0, 1.0)"}
        out = run_models(events.limit(10), [m], ["event_id"])
        assert set(out.columns) == {"event_id", "score_pct"}
        assert out.where("score_pct > 1.0").count() == 0

    def test_remote_backend_stubbed(self, spark, events):
        m = scorer_model()
        m.backend = "vertex_ai"
        with pytest.raises(NotImplementedError):
            run_models(events, [m], ["event_id"])

    def test_duplicate_outputs_rejected(self, spark, events):
        with pytest.raises(ValueError):
            run_models(events, [scorer_model(), scorer_model()], ["event_id"])


class TestAsGroupBySource:
    def test_groupby_over_model_transforms(self, spark, events):
        """A GroupBy consuming the enriched source end-to-end: daily sum
        of the model score per user — matches computing the same score
        with plain SQL and aggregating."""
        src = ModelTransformSource(
            sources=[EventSource(
                f"{SF}/events.parquet",
                Query(selects={"user_id": "user_id", "value": "value",
                               "event_id": "event_id"}, time_column=TS),
            )],
            models=[scorer_model()],
            passthrough_fields=["user_id", "event_id"],
            query=Query(selects={"user_id": "user_id", "score": "score"}),
        )
        df = scan_source(spark, src)
        assert {"user_id", "score", "ts", "ds"} <= set(df.columns)

        from chronon_spark.operators.groupby import compute_snapshot_groupby

        gb = GroupBy(
            sources=[src], key_columns=["user_id"],
            aggregations=[Aggregation("score", Operation.SUM, windows=[Window(7)])],
            name="mt_gb",
        )
        out = compute_snapshot_groupby(spark, gb)
        # oracle: same score in SQL, same windowed sum on one sampled row
        sample = out.where("score_sum_7d IS NOT NULL").orderBy("user_id", "ds").first()
        ev = events.selectExpr(
            "user_id", TS + " AS ts",
            "0.5 * value + 2.0 * value * value + 1.0 AS score",
        )
        lo = f"unix_date(to_date('{sample.ds}')) - 6"
        hi = f"unix_date(to_date('{sample.ds}')) + 1"
        exp = ev.where(
            f"user_id = {sample.user_id} AND ts >= CAST({lo} AS BIGINT) * 86400000 "
            f"AND ts < CAST({hi} AS BIGINT) * 86400000"
        ).agg(F.sum("score")).collect()[0][0]
        assert abs(sample.score_sum_7d - exp) < 1e-6
