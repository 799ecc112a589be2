from parquet_spark.stats.analyze import block_stats  # noqa: F401
from parquet_spark.stats.chooser import choose_int_codec, choose_string_codec  # noqa: F401
