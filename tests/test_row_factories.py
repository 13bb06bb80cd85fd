"""Row factory shapes + rename warning
(reference: test/unit/test_row_factory.py:15-41)."""

import warnings

from etlhelper_spark.row_factories import (
    dict_row_factory,
    list_row_factory,
    namedtuple_row_factory,
    tuple_row_factory,
)

COLS = ["id", "value"]
ROW = (1, "x")


def test_dict():
    assert dict_row_factory(COLS)(ROW) == {"id": 1, "value": "x"}


def test_namedtuple():
    r = namedtuple_row_factory(COLS)(ROW)
    assert r.id == 1 and r.value == "x"
    assert tuple(r) == ROW


def test_tuple():
    assert tuple_row_factory(COLS)(ROW) == (1, "x")


def test_list():
    assert list_row_factory(COLS)(ROW) == [1, "x"]


def test_namedtuple_invalid_names_renamed_with_warning():
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        factory = namedtuple_row_factory(["count(*)", "my col"])
        r = factory((5, "y"))
    assert tuple(r) == (5, "y")
    assert r._fields == ("_0", "_1")
    assert any("renamed" in str(w.message) for w in caught)
