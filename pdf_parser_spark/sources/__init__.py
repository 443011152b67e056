from .catalog import (  # noqa: F401
    append_table, is_path_ref, read_table, table_exists,
)
