from .readers import read_source, write_csv_compat  # noqa: F401
from .jdbc import jdbc_read_options, jdbc_reader, jdbc_writer  # noqa: F401
