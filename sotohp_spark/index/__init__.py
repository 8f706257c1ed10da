from sotohp_spark.index.build import IndexBuilder  # noqa: F401
from sotohp_spark.index.query import QueryEngine  # noqa: F401
