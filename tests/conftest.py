import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import el  # noqa: E402, F401 — sets the hash-shuffle strategy before any Dataset exists


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (tests must never call
    ray.init themselves)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_fixture():
    from el.fixtures import ensure_fixture

    return ensure_fixture("t1")


@pytest.fixture(scope="session")
def t1_answers(ray_session, t1_fixture):
    from el.pipeline import run_linkage

    return run_linkage(t1_fixture).to_pandas()
