"""Per-module query/oracle registry factory.

Every query module holds a ``QUERIES: dict[name, (spark, sf_dir) -> DF]``
and an ``ORACLES: dict[name, duckdb_sql]`` populated by a ``@_q`` decorator
— one shared definition here instead of eight hand-synced copies (the
package-level merge and duplicate-name check stay in queries/__init__).

Contract reminder (tools/parity.py replicates the driver): a name present
in QUERIES but absent from ORACLES gets the weaker rows-only check. The
decorator must sit DIRECTLY above the query def — an intervening helper
would register under the query's name (see the verify-skill gotcha).
"""

from __future__ import annotations

from collections.abc import Callable


def make_registry() -> tuple[dict, dict, Callable]:
    """Return (QUERIES, ORACLES, _q) for one query module."""
    queries: dict = {}
    oracles: dict = {}

    def _q(name: str, oracle: str | None = None):
        def deco(fn):
            queries[name] = fn
            if oracle is not None:
                oracles[name] = oracle
            return fn

        return deco

    return queries, oracles, _q
