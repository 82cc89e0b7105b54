"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the ``el`` package functions these call) calls ray.init /
ray.shutdown.

- ``entry()``: flagship entity-linking pipeline at the sf0.001-derived
  fixture scale -> answers Dataset (mention -> KB link / NIL cluster).
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  the training-data ops); each takes sf_dir.
- ``oracle_sql()``: DuckDB-runnable equivalents (same column names) for
  the SQL-expressible subset — including bit-exact replays of the
  minhash/simhash/LSH/IVF ops and gold-replay oracles for the
  end-to-end answer surfaces (el_answers, el_human_readable,
  el_sports_links, el_cluster_links, el_city_links,
  el_benchmark_report) — every queries() entry now has an oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the sf0.001-scale transcript fixture."""
    from el.fixtures import ensure_fixture
    from el.pipeline import run_linkage

    return run_linkage(ensure_fixture("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[str], Any]]:
    from el import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from el import queries as q

    return q.oracle_sql()
