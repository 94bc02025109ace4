from __future__ import annotations

import numpy as np
import pytest

from gemmsql import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gemmsql-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def emb_matrix(spark):
    """Dense (ids, X, labels) of the sf0.001 embeddings, id-sorted."""
    from gemmsql.datamodel import embeddings_vectors

    pdf = embeddings_vectors(spark, SF_SMOKE).orderBy("i").toPandas()
    return (
        pdf["i"].to_numpy(),
        np.asarray(pdf["vec"].tolist(), dtype=np.float64),
        pdf["label"].to_numpy(),
    )
