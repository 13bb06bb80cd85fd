"""Identifier validation corpus — ported from the reference's semantic
tests (reference: test/unit/test_etl.py:8-53)."""

import pytest

from etlhelper_spark import ETLHelperBadIdentifierError, validate_identifier

GOOD_IDENTIFIERS = [
    "my_table",
    "MY_TABLE",
    "my_table_2",
    "my$table",
    "schema.my_table",
    "_my_table",
    "ünïcödé_tàblé",
    "t",
]

BAD_IDENTIFIERS = [
    "my-table",
    "my table",
    "2my_table",
    "$my_table",
    "my_table;",
    "my_table; DROP TABLE foo",
    "my_table--",
    "my_table/*",
    "schema.my.table",
    "my_table'",
    'my_table"',
    "my_table()",
    "",
    "my_table\n",
]


@pytest.mark.parametrize("identifier", GOOD_IDENTIFIERS)
def test_good_identifiers(identifier):
    validate_identifier(identifier)  # no raise


@pytest.mark.parametrize("identifier", BAD_IDENTIFIERS)
def test_bad_identifiers(identifier):
    with pytest.raises(ETLHelperBadIdentifierError):
        validate_identifier(identifier)
