"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

import nativeextractor_ray  # noqa: F401  (sets RAY_DATA_LOGGING_CONFIG pre-init)
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    # data-dependent oracles (ann_ivf_sql trains its centroid literals on
    # the same table the SQL runs against) must follow the test's SF
    os.environ["GRAFT_ORACLE_SF_DIR"] = "/root/testdata/sf0.001"
    return "/root/testdata/sf0.001"
