import functools
import sys
import types

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


def load_whoosh_oracle():
    """Import the reference whoosh (read-only, test oracle only)."""
    if "cached_property" not in sys.modules:
        m = types.ModuleType("cached_property")
        m.cached_property = functools.cached_property
        sys.modules["cached_property"] = m
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import whoosh  # noqa: F401
    return whoosh


@pytest.fixture(scope="session")
def whoosh_oracle():
    return load_whoosh_oracle()
