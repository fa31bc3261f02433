"""Session-config contract: the source layer must work on ANY session.

Round-1 regression: the correctness driver passes its OWN bare
SparkSession (no ``get_session``), so ``load_table`` died on
events.parquet with PARQUET_TYPE_ILLEGAL (TIMESTAMP(NANOS)) because
``spark.sql.legacy.parquet.nanosAsLong`` was only set by our factory.
These tests hand the sources a session with HOSTILE conf values —
nanosAsLong off, non-UTC timezone — and require the reads to still
work, end-to-end through an events query and a streaming plan.
"""

import pytest
from pyspark.sql import types as T

from wrangle_pypes_spark.sources.tables import load_table
from wrangle_pypes_spark.streaming.windows import (
    run_available_now_to_memory,
    stream_events,
    tumbling_window_agg,
)


@pytest.fixture()
def bare(spark):
    """A session that looks like the driver's: separate SQLConf, nanos
    conf off, non-UTC timezone."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    return s


def test_load_table_events_on_bare_session(bare, sf_dir):
    df = load_table(bare, sf_dir, "events")
    # ts normalized to a real timestamp, not left as nanos long
    assert isinstance(df.schema["ts"].dataType,
                      (T.TimestampNTZType, T.TimestampType))
    assert df.count() > 0
    # the loader must have repaired the session confs
    assert bare.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert bare.conf.get("spark.sql.session.timeZone") == "UTC"


def test_events_query_end_to_end_on_bare_session(bare, sf_dir):
    import __spark_entry__ as entry

    q = entry.queries()["json_extract_events"]
    out = q(bare, sf_dir)
    assert out.count() > 0


def test_stream_events_on_bare_session(spark, sf_dir):
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ev = stream_events(s, sf_dir)
    agg = tumbling_window_agg(ev)
    out = run_available_now_to_memory(agg, "bare_session_tumbling",
                                      output_mode="complete")
    assert out.count() > 0


def test_registry_window_marker_is_honest():
    """The '50-slot driver window' comment in the registry must sit
    after EXACTLY 50 entries — rotation decisions are made against it,
    so a drifted marker silently mislabels which queries the driver
    checks."""
    import os
    import re

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py")).read()
    head = src.split("# ---- below the 50-slot driver window")[0]
    head = head[head.index("_QUERIES: dict"):]
    n = len(re.findall(r'^\s{4}"[a-z0-9_]+": q_', head, re.M))
    assert n == 50, f"{n} registry entries precede the window marker"
