from sotohp_spark.index.build import IndexBuilder  # noqa: F401
from sotohp_spark.index.migrate import migrate_index, verify_parity  # noqa: F401
from sotohp_spark.index.query import Bool, QueryEngine, msearch  # noqa: F401
from sotohp_spark.index.qs import (  # noqa: F401
    QSItem,
    QueryStringError,
    parse_query_string,
)
from sotohp_spark.index.snapshot import (  # noqa: F401
    restore_index,
    snapshot_index,
    verify_snapshot,
)
from sotohp_spark.index.alias import (  # noqa: F401
    open_alias,
    resolve_alias,
    swap_alias,
    write_alias,
)
