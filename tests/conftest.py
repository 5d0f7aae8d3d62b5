import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from obsidian_parser_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="ops-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def micro_vault(spark):
    """The reference's canonical 3-note vault as a span-schema DataFrame."""
    from obsidian_parser_spark.sources.corpus import micro_vault_rows
    from tests.util import spans_df

    return spans_df(spark, micro_vault_rows())
