"""Session-local payload staging for the codec gates.

The multimodal correctness gates decode REAL in-repo-codec payloads
(PNG/JPEG/FLAC/ADPCM/AVI) that are synthesized deterministically from
the ``documents`` table.  Before round 9 every gate *encoded* those
fixtures inside the timed query, so the bench measured encoder +
decoder while only the decoder is the operator under test (VERDICT r8
"What's wrong" #2).  This module applies the streaming tier's
``stage_stream_dir`` pattern (`streaming/windows.py:45`): the payload
table is materialized ONCE per (query, sf_dir) per process into a
session-local parquet directory, and the gate reads parquet from then
on — the first (warm-up) build pays the synthesis, every timed run
measures pure decode.

Scale note: in production the payloads ARE the input (a corpus of
media files on object storage), so reading them from parquet is the
honest shape — synthesis is a test-fixture artifact, not part of the
operator.  Staging is a narrow map + parquet write, embarrassingly
parallel, zero shuffle, and the staged directory inherits the source
partitioning so the decode map stays narrow.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

# (name, sf_dir) pairs staged by THIS process; the directory name
# carries the pid so concurrent sessions never collide and a fresh
# process never trusts a stale directory.
_STAGED: set[tuple[str, str]] = set()


def staged_dir_tag(sf_dir: str) -> str:
    """Collision-free directory tag for ``sf_dir``: the leaf name for
    readability plus a short hash of the FULL normalized path, so two
    scale dirs sharing a leaf name (e.g. ``/a/sf0.01`` and ``/b/sf0.01``)
    can never share a staged directory (ADVICE r9 #1)."""
    norm = os.path.normpath(sf_dir)
    leaf = os.path.basename(norm) or "sf"
    digest = hashlib.sha256(norm.encode()).hexdigest()[:8]
    return f"{leaf}_{digest}"


def stage_payload_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[SparkSession, str], DataFrame],
) -> DataFrame:
    """Materialize ``builder(spark, sf_dir)`` (a ``doc_id, payload``
    synthesis map) to session-local parquet once; return a reader over
    it.  Idempotent per (name, sf_dir) per process."""
    target = os.path.join(
        tempfile.gettempdir(),
        f"gemmsql_payload_{name}_{staged_dir_tag(sf_dir)}_{os.getpid()}",
    )
    key = (name, sf_dir)
    if key not in _STAGED or not os.path.isdir(target):
        builder(spark, sf_dir).write.mode("overwrite").parquet(target)
        _STAGED.add(key)
    return spark.read.parquet(target)
