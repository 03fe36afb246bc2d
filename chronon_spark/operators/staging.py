"""StagingQuery: free-form Spark SQL with date macros + fill-what's-missing.

reference: thrift/api.thrift:66-107 (macro list), engine
spark/.../batch/StagingQuery.scala:30-93. Supported macros:
  {{ start_date }}  {{ end_date }}  {{ latest_date }}
  {{ max_date(table=foo) }}
Whitespace inside the braces is tolerated, like the reference.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from chronon_spark.partitions import DEFAULT_SPEC, PartitionRange, PartitionSpec

_MACRO = re.compile(r"\{\{\s*(start_date|end_date|latest_date)\s*\}\}")
_MAX_DATE = re.compile(r"\{\{\s*max_date\(table=([^)]+)\)\s*\}\}")


def render_staging_query(
    query: str,
    start_date: str,
    end_date: str,
    latest_date: Optional[str] = None,
    max_date_fn=None,
) -> str:
    """Substitute date macros into the SQL text.

    ``max_date_fn(table_name) -> str`` resolves {{ max_date(table=x) }};
    ``latest_date`` defaults to ``end_date``.
    """
    values = {
        "start_date": start_date,
        "end_date": end_date,
        "latest_date": latest_date or end_date,
    }
    out = _MACRO.sub(lambda m: values[m.group(1)], query)
    if _MAX_DATE.search(out):
        if max_date_fn is None:
            raise ValueError("query uses max_date(table=...) but no max_date_fn given")
        out = _MAX_DATE.sub(lambda m: max_date_fn(m.group(1).strip()), out)
    return out


def run_staging_query(
    spark: SparkSession,
    query: str,
    rng: PartitionRange,
    spec: PartitionSpec = DEFAULT_SPEC,
    setups: Optional[list[str]] = None,
    max_date_fn=None,
) -> DataFrame:
    """Render macros from a partition range and execute via spark.sql."""
    for s in setups or []:
        spark.sql(s)
    sql = render_staging_query(
        query, start_date=rng.start, end_date=rng.end, max_date_fn=max_date_fn
    )
    return spark.sql(sql)
