import logging
import warnings

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    warnings.filterwarnings("ignore")
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def pages_dir(sf_dir) -> str:
    from zerox_ray.testgen import pages_dir_for

    return pages_dir_for(sf_dir)
