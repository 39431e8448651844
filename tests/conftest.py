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
    from dynaalign_ray.exec import configure_context

    configure_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic 400-page corpus + truth sidecar (FIXTURES.md F1)."""
    from dynaalign_ray.fixtures import generate_pages

    return generate_pages(400, seed=1234)
