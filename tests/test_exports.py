"""Every name in each package __all__ resolves — a rename or a
forgotten re-export breaks the public surface loudly here instead of
in a user's import."""

import importlib

import pytest

MODULES = [
    "etlhelper_spark",
    "etlhelper_spark.operators",
    "etlhelper_spark.functions",
    "etlhelper_spark.sources",
    "etlhelper_spark.streaming",
]


@pytest.mark.parametrize("modname", MODULES)
def test_all_exports_resolve(modname):
    mod = importlib.import_module(modname)
    exported = getattr(mod, "__all__", None)
    assert exported, f"{modname} declares no __all__"
    missing = [n for n in exported if not hasattr(mod, n)]
    assert not missing, f"{modname}: __all__ names missing: {missing}"
