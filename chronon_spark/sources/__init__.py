from chronon_spark.sources.catalog import Catalog, ParquetWarehouse  # noqa: F401
from chronon_spark.sources.scan import scan_df, scan_source  # noqa: F401
