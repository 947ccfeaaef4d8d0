from __future__ import annotations

import pytest

from kgspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgspark-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def mini_sources(tmp_path_factory):
    from kgspark.construct.reference_build import StructuredSources
    from kgspark.fixtures import write_structured_miniature

    root = tmp_path_factory.mktemp("mini_sources")
    write_structured_miniature(root)
    return StructuredSources.under(root)
