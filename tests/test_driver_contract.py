"""Driver-contract invariants (no Spark session needed): every gated
query has an oracle, names are unique and well-formed, and oracle SQL
never references tables the driver doesn't register."""

from __future__ import annotations

import re

import __spark_entry__ as E

DRIVER_TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}

# DuckDB built-in TABLE FUNCTIONS (not relations) an oracle may invoke
# in FROM position — e.g. `FROM range(4) t(j)` for a constant hash-seed
# spine (the bloom oracle)
TABLE_FUNCTIONS = {"range", "unnest", "generate_series"}


def test_every_query_has_an_oracle():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(qs) == set(os_), (
        f"missing oracles: {set(qs) - set(os_)}; "
        f"orphan oracles: {set(os_) - set(qs)}"
    )
    assert len(qs) >= 126


def test_query_names_are_slugs():
    for name in E.queries():
        assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name


def test_oracles_reference_only_registered_tables():
    # every FROM/JOIN target that is a bare identifier must be a
    # registered driver view or a CTE defined in the same statement
    for name, sql in E.oracle_sql().items():
        # CTE names, including the column-list form `name(a, b) AS (`
        ctes = set(re.findall(r"(\w+)\s*(?:\([^()]*\))?\s+AS\s*\(", sql))
        targets = set(
            t.lower()
            # negative lookbehind: `x IS [NOT] DISTINCT FROM y` is a
            # comparison operator, not a relation reference
            for t in re.findall(
                r"(?<!DISTINCT )\b(?:FROM|JOIN)\s+([A-Za-z_][\w]*)\b", sql
            )
        )
        unknown = (
            targets - DRIVER_TABLES - TABLE_FUNCTIONS
            - {c.lower() for c in ctes}
        )
        assert not unknown, f"{name}: unknown relations {unknown}"
