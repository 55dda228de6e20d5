import sys

import pytest

sys.path.insert(0, "/root/repo")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "integration: needs a live Postgres (DBSINK_PG_DSN; "
        "docker compose -f docker-compose.integration.yml up -d)",
    )
    config.addinivalue_line(
        "markers",
        "kafka: needs a live Kafka broker (DBSINK_KAFKA_BROKERS) "
        "plus the spark-sql-kafka package on the classpath",
    )

FIXTURES = "/root/reference/tests"  # read-only golden inputs
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dbsink_spark.session import get_spark

    import tempfile

    spark = get_spark(
        "dbsink-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="dbsink-wh-")},
    )
    yield spark


def fixture_path(name: str) -> str:
    return f"{FIXTURES}/{name}"
