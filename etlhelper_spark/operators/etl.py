"""Core ETL operators: extract / transform / load / copy.

Re-expresses the reference's operator inventory (SURVEY §2; reference:
etlhelper/etl.py) on Spark's execution model:

- extract: SQL string -> DataFrame (backend executes the whole query,
  exactly like reference etl.py:95 pushes it to the backing DB), then
  either a *driver-streamed* chunk iterator (`iter_chunks`, parity with
  the reference's bounded-memory generator pipeline) or the DataFrame
  itself for distributed continuation.
- transform: the reference's ``Callable[[Chunk], Chunk]`` surface
  (reference: types.py:23) runs distributed via ``mapInPandas`` (one
  Arrow batch ≙ one chunk) on the copy path, and driver-side per chunk
  on the iter_* path for exact semantics parity.
- load: batched writes through the backend's batch writer with
  row-level error isolation (reference on_error semantics,
  etl.py:305-320,342-365).
- copy: distributed read -> transform -> write; Spark turns the
  reference's sequential chunk alternation (etl.py:368-421) into
  partition-parallel pipelines.
"""

from __future__ import annotations

import copy as _copy
import logging
from collections import namedtuple
from itertools import chain, islice, zip_longest
from typing import Any, Callable, Iterable, Iterator, Mapping, Sequence

from pyspark.sql import DataFrame

from ..abort import clear_abort_event, raise_for_abort, _register_session
from ..connect import SparkConnection
from ..exceptions import (
    ETLHelperExtractError,
    ETLHelperInsertError,
    ETLHelperQueryError,
)
from ..row_factories import dict_row_factory
from ..types import Chunk, FailedRow, Transform
from ..validation import validate_identifier

logger = logging.getLogger("etlhelper_spark")

#: default chunk size — fetch, insert and commit granularity
#: (reference: etl.py:45)
CHUNKSIZE = 5000

# DML statements routed to the driver-side RETURNING shim on jdbc
# connections (Spark's JDBC query option cannot execute DML)
import re as _re

from ..validation import strip_sql_noise


def _is_dml(sql: str) -> bool:
    """True when *sql* is a data-modifying statement: leading keyword
    INSERT/UPDATE/DELETE/MERGE, or a WITH query containing a
    data-modifying CTE (PostgreSQL `WITH ins AS (INSERT ... RETURNING)
    SELECT`). Comments and string literals are stripped first so
    neither a leading `-- note` nor a VALUES literal containing the
    word 'insert' can misroute the statement."""
    bare = strip_sql_noise(sql)
    if _re.match(r"(INSERT|UPDATE|DELETE|MERGE)\b", bare, _re.IGNORECASE):
        return True
    return bool(
        _re.match(r"WITH\b", bare, _re.IGNORECASE)
        and _re.search(
            r"\b(INSERT|UPDATE|DELETE|MERGE)\b", bare, _re.IGNORECASE
        )
    )


class dataframe_transform:  # noqa: N801 - decorator-style name
    """Mark a callable as a DataFrame -> DataFrame transform (the fast
    path: stays JVM-side, participates in Catalyst optimization).

    Plain callables passed as ``transform=`` are treated as the
    reference's Chunk -> Chunk Python functions and run via
    ``mapInPandas`` when distributed.
    """

    def __init__(self, fn: Callable[[DataFrame], DataFrame]) -> None:
        self.fn = fn

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


# ----------------------------------------------------------------------
# transform plumbing
# ----------------------------------------------------------------------
def _infer_transformed_schema(df: DataFrame, transform: Transform, sample_rows: int):
    """Run *transform* on a small driver-side sample to learn the output
    schema — the Spark analogue of the reference's first-row sniffing
    (reference: etl.py:545-556)."""
    spark = df.sparkSession
    sample = [r.asDict() for r in df.limit(sample_rows).collect()]
    transformed = transform(_copy.deepcopy(sample))
    if not transformed:
        return df.schema, [f.name for f in df.schema.fields]
    sample_df = spark.createDataFrame(transformed)  # type: ignore[arg-type]
    return sample_df.schema, list(sample_df.columns)


def apply_transform(
    df: DataFrame,
    transform: Transform | dataframe_transform | None,
    sample_rows: int = 100,
) -> DataFrame:
    """Apply a transform to a DataFrame, distributed.

    - ``None``: no-op.
    - :class:`dataframe_transform`: called directly (JVM fast path).
    - plain callable: reference Chunk->Chunk semantics over dict-shaped
      rows, executed per Arrow batch with ``mapInPandas`` (batch-in /
      batch-out, row count may change — exact match for reference
      types.py:23 / etl.py:133-135).
    """
    if transform is None:
        return df
    if isinstance(transform, dataframe_transform):
        return transform(df)

    import pandas as pd  # local import: executors re-import cheaply

    schema, out_cols = _infer_transformed_schema(df, transform, sample_rows)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            chunk = pdf.to_dict("records")
            out = transform(chunk)
            if out:
                yield pd.DataFrame(out, columns=out_cols)

    return df.mapInPandas(run, schema)


# ----------------------------------------------------------------------
# extract operators (E1-E6)
# ----------------------------------------------------------------------
def iter_chunks(
    select_query: str,
    conn: SparkConnection,
    parameters: Sequence[Any] | Mapping[str, Any] = (),
    row_factory: Callable = dict_row_factory,
    transform: Transform | None = None,
    chunk_size: int = CHUNKSIZE,
    limit: int | None = None,
) -> Iterator[Chunk]:
    """Run *select_query* and yield driver-side chunks of rows.

    Parity with reference iter_chunks (etl.py:53-139): lazy, one chunk
    resident at a time (``toLocalIterator`` streams partitions to the
    driver), row_factory applied per row, transform per chunk, abort
    checked per chunk. The backend executes the query itself —
    distributed — before rows stream back. ``limit`` (internal; used
    by fetchone) pushes a LIMIT into the plan so the backend stops
    early instead of computing the full result.
    """
    clear_abort_event()
    _register_session(conn.spark)
    logger.info("Fetching rows (chunk_size=%s)", chunk_size)
    logger.debug("Fetching:\n\n%s\n\nwith parameters:\n\n%s\n\nagainst\n\n%r",
                 select_query, parameters, conn)
    if conn.kind == "jdbc" and _is_dml(select_query):
        # INSERT ... RETURNING id / OUTPUT / generated-key round-trip
        # (reference: docs/code_demos/utilities/return_autogenerated.py)
        # — DML cannot run through Spark's JDBC query option, so the
        # rows come from the driver-side statement shim.
        from ..parameters import bind_parameters

        bound = bind_parameters(select_query, parameters)
        try:
            cols, rows = conn.execute_returning(bound)
        except Exception as exc:
            raise ETLHelperExtractError(
                f"SQL query raised an error.\n\n{bound}\n\n{exc}\n"
            ) from exc
        create_row = row_factory(cols)
        made = [create_row(r) for r in rows]
        for start in range(0, len(made), chunk_size):
            chunk = made[start : start + chunk_size]
            if transform:
                chunk = transform(chunk)
            if chunk:
                yield chunk
        logger.info("%s rows returned", len(made))
        return
    try:
        df = conn.dataframe(select_query, parameters)
    except Exception:
        # a set abort event means our own job-group cancellation broke
        # the plan/view setup — surface the abort, not an extract error
        raise_for_abort()
        raise
    if limit is not None:
        df = df.limit(limit)
    create_row = row_factory(df.columns)

    first_pass = True
    n_rows = 0
    it = df.toLocalIterator(prefetchPartitions=True)
    while True:
        raise_for_abort()
        try:
            spark_rows = list(islice(it, chunk_size))
        except Exception as exc:
            # a set abort event means the failure is our own job-group
            # cancellation — surface it as the abort, not an extract error
            raise_for_abort()
            raise ETLHelperExtractError(
                f"SQL query raised an error.\n\n{select_query}\n\n{exc}\n"
            ) from exc
        if not spark_rows:
            break
        chunk = [create_row(tuple(r)) for r in spark_rows]
        if transform:
            chunk = transform(chunk)
        if first_pass:
            logger.debug("First row: %s", chunk[0] if chunk else None)
            first_pass = False
        n_rows += len(spark_rows)
        yield chunk
    logger.info("%s rows returned", n_rows)


def iter_rows(
    select_query: str,
    conn: SparkConnection,
    parameters: Sequence[Any] | Mapping[str, Any] = (),
    row_factory: Callable = dict_row_factory,
    transform: Transform | None = None,
    chunk_size: int = CHUNKSIZE,
) -> Iterator[Any]:
    """Flatten iter_chunks to row-at-a-time (reference: etl.py:142-169)."""
    for chunk in iter_chunks(
        select_query,
        conn,
        parameters=parameters,
        row_factory=row_factory,
        transform=transform,
        chunk_size=chunk_size,
    ):
        yield from chunk


def fetchone(
    select_query: str,
    conn: SparkConnection,
    parameters: Sequence[Any] | Mapping[str, Any] = (),
    row_factory: Callable = dict_row_factory,
    transform: Transform | None = None,
    chunk_size: int = 1,
) -> Any | None:
    """First row or None (reference: etl.py:172-204). With no transform
    the LIMIT 1 is pushed into the plan (the backend stops early);
    with a transform the full stream is consulted because a transform
    may drop rows (reference semantics)."""
    gen = iter_chunks(
        select_query,
        conn,
        parameters=parameters,
        row_factory=row_factory,
        transform=transform,
        chunk_size=chunk_size,
        limit=1 if transform is None else None,
    )
    for chunk in gen:
        if chunk:
            gen.close()
            return chunk[0]
    return None


def fetchall(
    select_query: str,
    conn: SparkConnection,
    parameters: Sequence[Any] | Mapping[str, Any] = (),
    row_factory: Callable = dict_row_factory,
    transform: Transform | None = None,
    chunk_size: int = CHUNKSIZE,
) -> list[Any]:
    """All rows materialized (reference: etl.py:207-230)."""
    return list(
        iter_rows(
            select_query,
            conn,
            parameters=parameters,
            row_factory=row_factory,
            transform=transform,
            chunk_size=chunk_size,
        )
    )


def execute(
    query: str,
    conn: SparkConnection,
    parameters: Sequence[Any] | Mapping[str, Any] = (),
) -> None:
    """Single DDL/DML statement (reference: etl.py:424-453)."""
    logger.info("Executing query")
    logger.debug("Executing:\n\n%s\n\nwith parameters:\n\n%s\n\nagainst\n\n%r",
                 query, parameters, conn)
    conn.execute_statement(query, parameters)


# ----------------------------------------------------------------------
# load operators (L1-L5)
# ----------------------------------------------------------------------
def _chunker(
    iterable: Iterable[Any], n_chunks: int
) -> Iterator[tuple[Any, ...]]:
    """Group an iterable into tuples of length *n_chunks*, padding the
    final group with None (reference: etl.py:667-681)."""
    args = [iter(iterable)] * n_chunks
    return zip_longest(*args, fillvalue=None)


def _rows_to_dataframe(spark, chunk: list[Any], columns: list[str] | None):
    """Build a single-chunk DataFrame from reference-style InputRows
    (mappings, namedtuples or plain sequences)."""
    first = chunk[0]
    if isinstance(first, Mapping):
        data = [
            {c: row.get(c) for c in columns} if columns else dict(row)
            for row in chunk
        ]
        return spark.createDataFrame(data)
    if hasattr(first, "_fields"):  # namedtuple
        return spark.createDataFrame(chunk)
    if columns:
        return spark.createDataFrame([tuple(r) for r in chunk], columns)
    return spark.createDataFrame([tuple(r) for r in chunk])


def executemany(
    query: str,
    conn: SparkConnection,
    rows: Iterable[Any],
    transform: Transform | None = None,
    on_error: Callable[[list[FailedRow]], None] | None = None,
    commit_chunks: bool = True,
    chunk_size: int = CHUNKSIZE,
) -> tuple[int, int]:
    """Run an INSERT-shaped statement against chunks of *rows*
    (reference: etl.py:233-339).

    Semantics preserved: iterable consumed lazily in chunks of
    *chunk_size*; transform per chunk; per-chunk commit; on chunk
    failure with ``on_error`` the chunk is retried **row by row** and
    rejects are passed to ``on_error`` as FailedRow pairs; without
    ``on_error`` the first failure raises ETLHelperInsertError.
    Returns ``(processed, failed)`` where processed includes failed
    rows (reference: test_etl_load.py:63-65).
    """
    clear_abort_event()
    _register_session(conn.spark)
    logger.info("Executing many (chunk_size=%s)", chunk_size)
    logger.debug("Executing:\n\n%s\n\nagainst\n\n%r", query, conn)

    try:
        table, columns = _parse_insert(query)
        custom_sql = None
    except ETLHelperQueryError:
        if conn.kind != "jdbc":
            raise
        # non-INSERT statement (UPDATE/upsert/...): JDBC pass-through
        # via driver-side PreparedStatement batches
        from ..parameters import to_qmark

        custom_sql = to_qmark(query)
        table, columns = "", None
    processed = 0
    failed = 0
    first_pass = True

    for raw_chunk in _chunker(rows, chunk_size):
        raise_for_abort()
        chunk = [row for row in raw_chunk if row is not None]
        if transform:
            chunk = transform(chunk)
        if not chunk:
            continue
        if first_pass:
            logger.debug("First row: %s", chunk[0])
            first_pass = False

        if custom_sql is not None:
            failed_rows = _execute_custom_chunk(
                conn, custom_sql, chunk, on_error
            )
        else:
            failed_rows = _write_chunk(conn, table, columns, chunk, on_error)
        processed += len(chunk)
        failed += len(failed_rows)
        if failed_rows and on_error is not None:
            on_error(failed_rows)
        logger.info(
            "%s rows processed (%s failed)", processed, failed
        )

    logger.info("%s rows processed in total", processed)
    return processed, failed


def _row_values(row: Any, names: list[str] | None) -> list[Any]:
    if names is not None:
        return [row[n] for n in names]
    if isinstance(row, Mapping):
        return list(row.values())
    return list(row)


def _execute_custom_chunk(
    conn: SparkConnection,
    custom_sql: tuple[str, list[str] | None],
    chunk: list[Any],
    on_error,
) -> list[FailedRow]:
    """Custom-SQL chunk via JDBC PreparedStatement batch; on failure
    with on_error, retry row by row (reference _execute_by_row,
    etl.py:342-365)."""
    sql, names = custom_sql
    try:
        conn.jdbc_executemany(sql, [_row_values(r, names) for r in chunk])
        return []
    except Exception as exc:
        if on_error is None:
            raise ETLHelperInsertError(
                f"SQL statement raised an error.\n\n{sql}\n\n{exc}\n"
            ) from exc
    failed_rows: list[FailedRow] = []
    for row in chunk:
        try:
            conn.jdbc_executemany(sql, [_row_values(row, names)])
        except Exception as row_exc:
            failed_rows.append(FailedRow(row, row_exc))
    return failed_rows


def _write_chunk(
    conn: SparkConnection,
    table: str,
    columns: list[str] | None,
    chunk: list[Any],
    on_error,
) -> list[FailedRow]:
    """Write one chunk; on failure with on_error, retry row-by-row and
    collect rejects (reference _execute_by_row, etl.py:342-365).

    The chunk (a driver-side list, ≤ chunk_size rows) writes as ONE
    partition: Spark's JDBC writer commits per task, so a multi-task
    write that fails midway would leave some partitions committed —
    and the row-level retry below would then duplicate them. One
    partition = one transaction per chunk, the reference's
    commit_chunks semantics exactly; bulk throughput comes from the
    distributed `load(DataFrame)`/`copy_rows` paths, not from
    parallelizing a single driver chunk."""
    try:
        # repartition(1), NOT coalesce(1): one partition = one
        # transaction either way, but any action on an RDD-backed
        # local frame after coalesce(1) costs ~4s of Python-worker
        # round-trip on this stack (the r9 bisect's measured
        # pathology); the tiny shuffle is ~0.4s
        df = _rows_to_dataframe(conn.spark, chunk, columns).repartition(1)
        conn.write_dataframe(df, table, mode="append", batchsize=len(chunk))
        return []
    except Exception as exc:
        raise_for_abort()
        if on_error is None:
            raise ETLHelperInsertError(
                f"SQL insert raised an error.\n\nTable: {table}\n\n{exc}\n"
            ) from exc
    failed_rows: list[FailedRow] = []
    ok_rows: list[Any] = []
    for row in chunk:
        try:
            _rows_to_dataframe(conn.spark, [row], columns)
            ok_rows.append(row)
        except Exception as row_exc:
            failed_rows.append(FailedRow(row, row_exc))
    if ok_rows:
        try:
            df = _rows_to_dataframe(conn.spark, ok_rows, columns)
            conn.write_dataframe(df, table, mode="append", batchsize=len(ok_rows))
        except Exception:
            # a DB-side failure (constraint violation, overflow at the
            # DB) can be caused by ONE row — write individually so
            # on_error receives only the genuinely failing rows, like
            # the reference's _execute_by_row (etl.py:342-365)
            for row in ok_rows:
                try:
                    df = _rows_to_dataframe(conn.spark, [row], columns)
                    conn.write_dataframe(
                        df, table, mode="append", batchsize=1
                    )
                except Exception as row_exc:
                    failed_rows.append(FailedRow(row, row_exc))
    return failed_rows


def _parse_insert(query: str) -> tuple[str, list[str] | None]:
    """Extract table and column list from an INSERT statement produced
    by generate_insert_sql (or a user's equivalent)."""
    import re

    m = re.match(
        r"\s*INSERT\s+INTO\s+([\w\.\$\"]+)\s*(?:\(([^)]*)\))?",
        query,
        re.IGNORECASE,
    )
    if not m:
        raise ETLHelperQueryError(
            "executemany on the Spark engine supports INSERT statements; "
            f"got: {query[:80]!r}. Use execute() for other statements."
        )
    table = m.group(1).strip('"')
    cols = (
        [c.strip().strip('"') for c in m.group(2).split(",")]
        if m.group(2)
        else None
    )
    return table, cols


def load(
    table: str,
    conn: SparkConnection,
    rows: Iterable[Any] | DataFrame,
    transform: Transform | None = None,
    on_error: Callable[[list[FailedRow]], None] | None = None,
    commit_chunks: bool = True,
    chunk_size: int = CHUNKSIZE,
) -> tuple[int, int]:
    """Auto-generated insert of *rows* into *table*
    (reference: etl.py:509-574).

    Columns come from the first transformed row, peeked without
    consuming the iterator (reference chain re-attach, etl.py:545-548);
    extra columns in later rows are dropped, matching the documented
    reference behavior. Empty/None input returns (0, 0). A DataFrame
    input takes the fully-distributed path.
    """
    validate_identifier(table)

    if isinstance(rows, DataFrame):
        df = apply_transform(rows, transform)
        n = df.count()
        failed = 0
        if on_error is not None:
            df, failed = _quarantine_against_target(df, conn, table, on_error)
        conn.write_dataframe(df, table, batchsize=chunk_size)
        logger.info("%s rows processed in total", n)
        return n, failed

    if rows is None:
        return 0, 0
    iterator = iter(rows)
    try:
        first_row = next(iterator)
    except StopIteration:
        return 0, 0
    iterator = chain([first_row], iterator)

    # derive the column list from a deepcopy-transformed peek
    # (reference: etl.py:550-556)
    peek = _copy.deepcopy([first_row])
    if transform:
        peek = transform(peek)
    if not peek:
        columns = None
    else:
        sample = peek[0]
        if isinstance(sample, Mapping):
            columns = list(sample.keys())
        elif hasattr(sample, "_fields"):
            columns = list(sample._fields)
        else:
            columns = None

    query = generate_insert_sql(table, peek[0] if peek else first_row, conn)
    return executemany(
        query,
        conn,
        iterator,
        transform=transform,
        on_error=on_error,
        commit_chunks=commit_chunks,
        chunk_size=chunk_size,
    )


def generate_insert_sql(
    table: str, row: Any, conn: SparkConnection | Any
) -> str:
    """Build an INSERT statement with driver-correct placeholders
    (reference: etl.py:577-639).

    namedtuple rows -> positional paramstyle; mapping rows -> named
    paramstyle (error if the dialect has none, e.g. MSSQL/pyodbc,
    reference db_helpers/mssql.py:32). All identifiers validated.
    """
    dialect = getattr(getattr(conn, "db_params", None), "dialect", None)
    named = getattr(dialect, "named_paramstyle", "named")
    positional = getattr(dialect, "positional_paramstyle", "qmark")

    if hasattr(row, "_fields"):  # namedtuple
        columns = list(row._fields)
        if positional is None:
            raise ETLHelperInsertError(
                "Positional parameters not supported for this dialect"
            )
        placeholders = {
            "qmark": ["?"] * len(columns),
            "numeric": [f":{i + 1}" for i in range(len(columns))],
            "format": ["%s"] * len(columns),
        }[positional]
    elif isinstance(row, Mapping):
        columns = list(row.keys())
        if named is None:
            raise ETLHelperInsertError(
                f"Database needs named parameters, but dialect "
                f"{getattr(dialect, 'dbtype', 'generic')} does not support them"
            )
        placeholders = {
            "named": [f":{c}" for c in columns],
            "pyformat": [f"%({c})s" for c in columns],
        }[named]
    elif isinstance(row, Sequence) and not isinstance(row, (str, bytes)):
        columns = None
        if positional is None:
            raise ETLHelperInsertError(
                "Positional parameters not supported for this dialect"
            )
        placeholders = {
            "qmark": ["?"] * len(row),
            "numeric": [f":{i + 1}" for i in range(len(row))],
            "format": ["%s"] * len(row),
        }[positional]
    else:
        raise ETLHelperInsertError(
            f"Row is not a dict, namedtuple or sequence: {row!r}"
        )

    validate_identifier(table)
    if columns:
        for col in columns:
            validate_identifier(col)
        col_sql = f" ({', '.join(columns)})"
    else:
        col_sql = ""
    return f"INSERT INTO {table}{col_sql} VALUES ({', '.join(placeholders)})"


# ----------------------------------------------------------------------
# copy operators (C1-C3)
# ----------------------------------------------------------------------
def copy_rows(
    select_query: str,
    source_conn: SparkConnection,
    insert_query: str,
    dest_conn: SparkConnection,
    parameters: Sequence[Any] | Mapping[str, Any] = (),
    transform: Transform | dataframe_transform | None = None,
    on_error: Callable[[list[FailedRow]], None] | None = None,
    commit_chunks: bool = True,
    chunk_size: int = CHUNKSIZE,
) -> tuple[int, int]:
    """Copy query results between connections
    (reference: etl.py:368-421).

    Architecturally upgraded per SURVEY §3.3: instead of the
    reference's sequential driver-pumped chunk alternation, the
    DataFrame flows executor-side from source scan through transform to
    the destination batch writer — partition-parallel end to end. The
    (processed, failed) contract is preserved.
    """
    clear_abort_event()
    _register_session(source_conn.spark)
    df = source_conn.dataframe(select_query, parameters)
    df = apply_transform(df, transform)
    table, columns = _parse_insert(insert_query)
    if columns:
        df = df.select(*columns)
    n = df.count()
    failed = 0
    if on_error is not None:
        df, failed = _quarantine_against_target(
            df, dest_conn, table, on_error
        )
    dest_conn.write_dataframe(df, table, batchsize=chunk_size)
    logger.info("%s rows processed (%s failed)", n, failed)
    return n, failed


def _quarantine_against_target(
    df: DataFrame, dest_conn: SparkConnection, table: str, on_error
) -> tuple[DataFrame, int]:
    """If the destination table already exists, validate rows against
    its schema executor-side and dead-letter the rejects to on_error
    as FailedRow pairs (reference on_error contract, etl.py:305-320,
    distributed via jdbc_sink.validate_rows)."""
    from .jdbc_sink import validate_rows

    try:
        target_schema = dest_conn.table_dataframe(table).schema
    except Exception:
        return df, 0  # new table: nothing to validate against
    valid, quarantine = validate_rows(df, target_schema)
    failed_rows = [
        FailedRow(
            {k: v for k, v in row.asDict().items() if k != "__error"},
            ETLHelperInsertError(row["__error"]),
        )
        for row in quarantine.collect()
    ]
    if failed_rows:
        on_error(failed_rows)
    return valid, len(failed_rows)


def copy_table_rows(
    table: str,
    source_conn: SparkConnection,
    dest_conn: SparkConnection,
    target: str | None = None,
    transform: Transform | dataframe_transform | None = None,
    on_error: Callable[[list[FailedRow]], None] | None = None,
    commit_chunks: bool = True,
    chunk_size: int = CHUNKSIZE,
) -> tuple[int, int]:
    """Whole-table copy; target defaults to the source name
    (reference: etl.py:456-506)."""
    validate_identifier(table)
    target = target or table
    validate_identifier(target)
    clear_abort_event()
    _register_session(source_conn.spark)
    df = source_conn.table_dataframe(table)
    df = apply_transform(df, transform)
    n = df.count()
    failed = 0
    if on_error is not None:
        df, failed = _quarantine_against_target(df, dest_conn, target, on_error)
    dest_conn.write_dataframe(df, target, batchsize=chunk_size)
    logger.info("%s rows processed in total", n)
    return n, failed
