"""Sources: deterministic synthetic pages/binlog generators and typed readers."""

from hyped_spark.sources.synthetic import (  # noqa: F401
    gen_html,
    pages_table,
    binlog,
    binlog_segments,
    write_binlog_segments,
)
