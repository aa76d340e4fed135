import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages():
    """Tiny fixture corpus (FIXTURES.md F1): 60 entities, ~180 rows."""
    from merge_machine_ray.fixtures.pages import pages_table

    return pages_table(0, 60)


@pytest.fixture(scope="session")
def tiny_entities():
    from merge_machine_ray.fixtures.pages import entities_table

    return entities_table(60)
