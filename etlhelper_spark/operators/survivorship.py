"""Field-level SURVIVORSHIP — golden records with per-field
provenance, the step after entity resolution: q252 picks one canonical
ROW per entity; production master-data management survives each
ATTRIBUTE independently (the freshest non-null phone may come from one
source system, the freshest balance from another), and every surviving
value must carry provenance (which record, which source supplied it)
for audit.

Policy (the standard MDM rule set, deterministic by construction):
per cluster and per field, among the records where the field is
NON-NULL, pick the value with the LATEST version/timestamp; ties break
by SOURCE PRIORITY (the caller's ranking of system trustworthiness),
then by record id ascending — a total order, so the golden record is
unique and hash-stable at any partitioning.

Spark-first shape: ONE groupBy(cluster) with one ``max_by`` aggregate
per field — max_by carries the (value, record id, source) payload
struct under a (version, -priority, -id) ordering struct whose rows
are NULL when the field is null (aggregates skip null orderings, which
implements 'non-null only' for free). No windows, no per-field
shuffles: at 100 TB this is a single partial-aggregatable pass, the
same cost as any wide groupBy, and the payload structs are a few
hundred bytes per record.

Reference parity note: the reference (a DB-API cursor wrapper,
/root/reference/etlhelper/etl.py) has no survivorship machinery; this
completes the linkage family (edit_distance_join -> linkage_state ->
duplicate_clusters/q252 -> golden records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_records"]


def _check_numeric_id(df: DataFrame, id_col: str, caller: str) -> None:
    """The ordering struct negates the record id (``-id`` implements
    'id ascending' inside a max_by); a string/UUID id would silently
    cast to a NULL ordering field and make tie-breaks nondeterministic
    — reject loudly instead (the shortest_paths weight-type
    discipline)."""
    from pyspark.sql.types import NumericType

    dt = df.schema[id_col].dataType
    if not isinstance(dt, NumericType):
        raise ValueError(
            f"{caller} requires a numeric id column for deterministic "
            f"tie-breaks; got {id_col}: {dt.simpleString()} (map string/"
            f"UUID ids to a numeric surrogate first — e.g. "
            f"xxhash64(id) — or the max_by total order degrades to "
            f"null-ordering nondeterminism)"
        )


def golden_records(
    records: DataFrame,
    cluster_col: str,
    id_col: str,
    field_cols: list[str],
    version_col: str,
    source_col: str | None = None,
    source_priority: dict[str, int] | None = None,
) -> DataFrame:
    """One golden record per *cluster_col* group: for each field in
    *field_cols*, the latest-non-null survivor under (version desc,
    source priority asc, record id asc), returned as ``<f>`` plus
    provenance columns ``<f>__src_id`` (the record id that supplied
    the value) and — when *source_col* is given — ``<f>__source``.
    ``n_records`` counts the cluster's member records.

    *source_priority* maps source names to ranks (smaller = more
    trusted); unnamed sources rank AFTER every named one, tie-broken
    by record id. Version ties across equally-ranked sources also
    fall to record id — the total order that makes the golden record
    unique. Clusters where a field is null on EVERY record get a null
    survivor with null provenance."""
    if source_priority and source_col is None:
        raise ValueError("source_priority requires source_col")
    _check_numeric_id(records, id_col, "golden_records")
    if source_col is not None:
        prio_map = source_priority or {}
        entries = []
        for name, rank in prio_map.items():
            entries.append(F.lit(name))
            entries.append(F.lit(int(rank)))
        if entries:
            prio = F.coalesce(
                F.element_at(F.create_map(*entries), F.col(source_col)),
                F.lit(2**31 - 1),
            )
        else:
            prio = F.lit(0)
    else:
        prio = F.lit(0)

    aggs = [F.count(F.lit(1)).alias("n_records")]
    for f in field_cols:
        payload = [F.col(f).alias("val"), F.col(id_col).alias("src_id")]
        if source_col is not None:
            payload.append(F.col(source_col).alias("source"))
        # ordering struct is NULL when the field is null, so max_by
        # skips those rows — 'latest NON-NULL' with zero extra passes
        ordering = F.when(
            F.col(f).isNotNull(),
            F.struct(
                F.col(version_col).alias("v"),
                (-prio).alias("np"),
                (-F.col(id_col)).alias("ni"),
            ),
        )
        aggs.append(
            F.max_by(F.struct(*payload), ordering).alias(f"__win_{f}")
        )
    out = records.groupBy(F.col(cluster_col).alias("cluster_id")).agg(*aggs)
    cols = [F.col("cluster_id"), F.col("n_records")]
    for f in field_cols:
        w = F.col(f"__win_{f}")
        cols.append(w["val"].alias(f))
        cols.append(w["src_id"].alias(f"{f}__src_id"))
        if source_col is not None:
            cols.append(w["source"].alias(f"{f}__source"))
    return out.select(*cols)
