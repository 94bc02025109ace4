"""Custom stateful streaming operator: the monoid fold as streaming state.

``streaming_logsumexp`` maintains, per key, the reference's softmax-
family accumulator ``(z = logsumexp of scores, n = count)`` across
micro-batches using ``applyInPandasWithState``.  The state update IS
``binary_reduce`` (reference attention.py:31-36 / xentropy.py:39-44):
merge the incoming batch's partial ``z_b`` into the stored ``z`` with
logaddexp.  This is the template for porting any engine monoid op to
streaming — state schema == accumulator schema, update == merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _logaddexp(a: float, b: float) -> float:
    return float(np.logaddexp(a, b))


def streaming_logsumexp(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    score_col: str = "value",
) -> DataFrame:
    """Per-key running ``(logsumexp(score), count)`` over a stream.

    Emits one updated row per key per micro-batch (update semantics)."""

    def update(key, pdfs, state: GroupState):
        z = -np.inf
        n = 0
        if state.exists:
            z, n = state.get
        for pdf in pdfs:
            s = pdf[score_col].to_numpy(dtype=np.float64)
            if len(s):
                z = _logaddexp(z, float(np.logaddexp.reduce(s)))
                n += len(s)
        state.update((float(z), int(n)))
        yield pd.DataFrame({"key": [key[0]], "z": [z], "n": [n]})

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key string, z double, n long",
            stateStructType="z double, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
