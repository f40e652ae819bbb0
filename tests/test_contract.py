"""Registry/driver-contract invariants: every oracle key has a query, all
names are well-formed, callables have the right arity, and entry() is
wired to a registered query."""

from __future__ import annotations

import importlib.util
import inspect
import sys


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, "/root/repo")
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_has_a_query():
    mod = load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs), set(osql) - set(qs)
    # every driver-registered query carries a SQL oracle (50/50 hash
    # checks — rows-only queries live in the pytest-only tier)
    rows_only = set(qs) - set(osql)
    assert rows_only == set()


def test_driver_registry_is_exactly_50():
    """The driver's correctness harness records at most 50 queries (r01:
    the 51st registered query got no row). Expose exactly 50 so nothing is
    silently dropped."""
    mod = load_entry()
    assert len(mod.queries()) == 50


def test_query_callables_take_spark_and_sfdir():
    mod = load_entry()
    for name, fn in mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_names_are_snake_case_and_unique():
    mod = load_entry()
    names = list(mod.queries())
    assert len(names) == len(set(names))
    for n in names:
        assert n.replace("_", "").isalnum() and n == n.lower(), n


def test_entry_uses_registered_flagship(spark):
    mod = load_entry()
    df = mod.entry(spark)
    assert df.schema.simpleString() == "struct<triangles:bigint>"
