import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from neurostore_text_extraction_spark.session import get_spark

    s = get_spark(app_name="nse-tests", cores=8)
    yield s
