import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from functime_spark.session import get_session

    s = get_session("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def events(spark):
    from functime_spark.sources.tables import events_panel

    return events_panel(spark, SF_DIR).persist()


@pytest.fixture(scope="session")
def events_pdf(events):
    return events.toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
