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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """The 'small' fixture (FIXTURES.md §1) at test-friendly scale."""
    from flatnav_ray.sources.synth import pages_table, queries_table

    pages = pages_table(600, seed=42, vocab_size=2000, mean_len=60)
    queries = queries_table(40, seed=43, vocab_size=2000)
    return pages, queries
