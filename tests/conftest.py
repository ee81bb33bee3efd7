from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dask_awkward_sandbox_spark.session import get_spark

    s = get_spark("dwax-tests")
    yield s


@pytest.fixture(scope="session")
def sf(request):
    return "/root/testdata/sf0.001"
