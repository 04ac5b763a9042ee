import pytest

from movex_cdc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="movex-cdc-tests", cpus=8, shuffle_partitions=8,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_lake(tmp_path):
    return str(tmp_path / "lake")
