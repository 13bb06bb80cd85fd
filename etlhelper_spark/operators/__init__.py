from .etl import (
    CHUNKSIZE,
    copy_rows,
    copy_table_rows,
    dataframe_transform,
    execute,
    executemany,
    fetchall,
    fetchone,
    generate_insert_sql,
    iter_chunks,
    iter_rows,
    load,
)

__all__ = [
    "CHUNKSIZE",
    "copy_rows",
    "copy_table_rows",
    "dataframe_transform",
    "execute",
    "executemany",
    "fetchall",
    "fetchone",
    "generate_insert_sql",
    "iter_chunks",
    "iter_rows",
    "load",
]
