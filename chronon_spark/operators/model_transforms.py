"""Batch ModelTransforms: enrich source rows with model outputs.

Reference: thrift/api.thrift:599-610 (ModelTransforms — the fourth
Source union arm, api.thrift:192) and api/planner/
ModelTransformsPlanner.scala:28-100 (backfill node: depends on the
sources' tables, materializes source -> inputMapping -> inference ->
outputMapping -> passthrough + model outputs).

Spark-first execution:

* input/output mappings are Spark SQL expressions evaluated JVM-side
  (Catalyst), exactly as the thrift doc specifies ("Spark SQL queries to
  transform input data / model output");
* ALL models run inside ONE Arrow `mapInPandas` pass — each model's
  `inference_fn` receives a pandas DataFrame of its mapped inputs and
  returns vectorized output columns. One python fan-out per batch no
  matter how many models, no per-row python, bytes/embeddings stay in
  Arrow;
* passthrough fields ride the same batch untouched (pandas column
  slice), so no re-join against the source is needed downstream.

The enriched frame then flows through the ordinary Query DSL
(selects/wheres/time_column) via scan_source, making a
ModelTransformSource usable anywhere an EventSource is.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from chronon_spark.api import Model, ModelTransformSource


def _check_backend(model: Model) -> None:
    if model.backend != "local":
        # reference ModelBackend enum (api.thrift:568-571): VertexAI /
        # SageMaker batch-prediction jobs. No network in this container —
        # a real deployment wraps the endpoint client in the same
        # batched (pdf) -> pdf contract `inference_fn` has.
        raise NotImplementedError(
            f"model backend '{model.backend}' requires a remote inference "
            f"endpoint — only 'local' (in-process vectorized fn) is "
            f"available in this environment"
        )


def run_models(df: DataFrame, models: list[Model],
               passthrough: list[str]) -> DataFrame:
    """One Arrow pass: evaluate every model's mapped inputs, emit
    passthrough + raw model outputs, then apply output mappings."""
    for m in models:
        _check_backend(m)
    out_names: list[str] = []
    for m in models:
        dup = [c for c in m.value_schema if c in out_names]
        if dup:
            raise ValueError(f"duplicate model output columns: {dup}")
        out_names.extend(m.value_schema)

    # JVM-side input mapping; mapped columns namespaced per model
    in_exprs: list[str] = [f"`{c}`" for c in passthrough]
    in_cols: dict[str, list[str]] = {}
    for m in models:
        mapping = m.input_mapping or {}
        in_cols[m.name] = []
        for name, expr in mapping.items():
            col = f"__{m.name}__{name}"
            in_exprs.append(f"({expr}) AS `{col}`")
            in_cols[m.name].append(col)
    staged = df.selectExpr(*in_exprs)

    pt_types = {c: t for c, t in staged.dtypes}
    out_schema = ", ".join(
        [f"`{c}` {pt_types[c]}" for c in passthrough]
        + [f"`{c}` {t}" for m in models for c, t in m.value_schema.items()]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = pdf[passthrough].reset_index(drop=True)
            for m in models:
                inputs = pdf[in_cols[m.name]].reset_index(drop=True)
                inputs.columns = [c[len(f"__{m.name}__"):] for c in in_cols[m.name]]
                out = m.inference_fn(inputs)
                for c in m.value_schema:
                    res[c] = out[c].reset_index(drop=True)
            yield res

    enriched = staged.mapInPandas(batches, schema=out_schema)

    # JVM-side output mapping (raw model columns -> desired shape)
    post: list[str] = [f"`{c}`" for c in passthrough]
    for m in models:
        if m.output_mapping:
            post.extend(
                f"({expr}) AS `{name}`" for name, expr in m.output_mapping.items()
            )
        else:
            post.extend(f"`{c}`" for c in m.value_schema)
    return enriched.selectExpr(*post)


def scan_model_transforms(
    spark: SparkSession, source: ModelTransformSource, rng, spec
) -> DataFrame:
    """Materialize the union of inner sources, enrich with model outputs.
    The outer Query DSL is applied by the caller (scan_source)."""
    from chronon_spark.sources.scan import scan_source

    scans = [scan_source(spark, s, rng, spec) for s in source.sources]
    df = scans[0]
    for other in scans[1:]:
        df = df.unionByName(other, allowMissingColumns=True)
    passthrough = list(source.passthrough_fields or df.columns)
    # keep engine time/partition columns if the sources produced them
    for extra in ("ts", spec.column):
        if extra in df.columns and extra not in passthrough:
            passthrough.append(extra)
    return run_models(df, source.models, passthrough)


# -- reference local models (deterministic, vectorized) --------------------

def linear_scorer(weights: dict[str, float], bias: float = 0.0,
                  out_col: str = "score"):
    """A deterministic linear model: score = w . x + b. Vectorized over
    the batch; numerically replicable in plain SQL (the driver oracle
    uses exactly that)."""

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = float(bias)
        s = None
        for col, w in weights.items():
            term = pdf[col].astype("float64") * float(w)
            s = term if s is None else s + term
        return pd.DataFrame({out_col: (s if s is not None else 0.0) + acc})

    return infer


def hashed_embedding(in_col: str, dim: int = 16, out_col: str = "embedding"):
    """Deterministic hashed bag-of-ngrams embedding (L2-normalized) —
    the classic feature-hashing trick; stands in for a real encoder with
    the identical Arrow-batched signature and array<float> output.
    crc32-hashed (process-independent, unlike builtin hash())."""
    import zlib

    import numpy as np

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in pdf[in_col].astype(str):
            v = np.zeros(dim, dtype=np.float64)
            for i in range(len(text) - 2):
                v[zlib.crc32(text[i:i + 3].encode()) % dim] += 1.0
            n = np.linalg.norm(v)
            out.append((v / n if n else v).astype("float32").tolist())
        return pd.DataFrame({out_col: out})

    return infer
