import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running soak/scale tests")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()
