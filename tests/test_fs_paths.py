"""Object-store readiness of the driver-side artifact readers
(VERDICT r12 #4): the pyarrow footer/sidecar fast paths must resolve
paths through pyarrow.fs so they keep working when the persisted
store lives on object storage. ``file://`` URIs stand in for the
remote filesystems here — pyarrow routes them through the same
FileSystem.from_uri machinery s3/gs/hdfs take, while bare local paths
keep the LocalFileSystem fallback.
"""

from __future__ import annotations

import os
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

from etlhelper_spark.functions.util import (
    count_parquet_rows,
    list_fileinfos,
    parquet_schema_names,
    read_sidecar_table,
)
from etlhelper_spark.operators.dedup_state import _scan_versions
from etlhelper_spark.operators.packing_state import (
    _assign_versions,
    _read_meta,
)


def _mk_index(tmp_path) -> str:
    d = str(tmp_path / "idx")
    os.makedirs(os.path.join(d, "_pivots"))
    pq.write_table(
        pa.table({"list_id": [1, 2], "pivot": [[1.0, 2.0], [3.0, 4.0]]}),
        os.path.join(d, "_pivots", "part-0.parquet"),
    )
    os.makedirs(os.path.join(d, "list_id=1"))
    pq.write_table(
        pa.table({"vec_id": [1, 2, 3], "codes": [[1], [2], [3]]}),
        os.path.join(d, "list_id=1", "part-0.parquet"),
    )
    return d


def test_sidecar_and_counts_over_file_uri(tmp_path):
    d = _mk_index(tmp_path)
    uri = "file://" + d
    for p in (d, uri):
        t = read_sidecar_table(p + "/_pivots")
        assert t is not None and t.num_rows == 2
        assert count_parquet_rows(p) == 3  # _pivots invisible
        assert parquet_schema_names(p) == ["vec_id", "codes"]
    # missing directories behave like empty globs, not errors
    assert read_sidecar_table(uri + "/nope") is None
    assert count_parquet_rows(uri + "/nope") == 0
    assert parquet_schema_names(uri + "/nope") is None
    _fs, infos = list_fileinfos(uri + "/nope")
    assert infos == []


def test_scan_versions_over_file_uri(tmp_path):
    base = str(tmp_path / "store" / "cursor")
    for v, complete in [("v1", True), ("v2", False), ("v2.e1", True)]:
        p = os.path.join(base, v)
        os.makedirs(p)
        pq.write_table(
            pa.table({"a": [1]}), os.path.join(p, "part-0.parquet")
        )
        if complete:
            pathlib.Path(p, "_SUCCESS").touch()
    local = _scan_versions(base)
    assert [ke for ke, _p in local] == [(1, 0), (2, 1)]
    via_uri = _scan_versions("file://" + base)
    assert [ke for ke, _p in via_uri] == [(1, 0), (2, 1)]
    # URI scans return spark.read-able URIs (scheme preserved)
    assert all(p.startswith("file:///") for _ke, p in via_uri)
    assert _scan_versions(base + "_missing") == []


def test_assign_versions_and_meta_over_file_uri(tmp_path):
    d = str(tmp_path / "packstate")
    for v, complete in [("v1", True), ("v1.e2", True), ("v3", False)]:
        p = os.path.join(d, "assign", v)
        os.makedirs(p)
        if complete:
            pathlib.Path(p, "_SUCCESS").touch()
    os.makedirs(os.path.join(d, "meta"))
    pq.write_table(
        pa.table(
            {
                "budget": [256],
                "n_shards": [8],
                "oversize": ["error"],
                "id_col": ["doc_id"],
            }
        ),
        os.path.join(d, "meta", "part-0.parquet"),
    )
    for p in (d, "file://" + d):
        vs = _assign_versions(p)
        assert set(vs) == {1} and vs[1][0] == 2  # newest epoch wins
        m = _read_meta(p)
        assert m == {
            "budget": 256,
            "n_shards": 8,
            "oversize": "error",
            "id_col": "doc_id",
        }
    assert _read_meta(str(tmp_path / "empty")) is None
