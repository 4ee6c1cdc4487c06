"""Driver-session independence: the contract hands entry()/queries() an
ARBITRARY SparkSession. A vanilla session (no nanosAsLong, machine-local
timezone) must still read every table and produce UTC-consistent
timestamps — load_table sets the required runtime confs defensively.

Runs in a subprocess because a second differently-configured session
cannot coexist with the shared fixture's JVM."""

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .appName("vanilla-driver")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "America/New_York")
         .getOrCreate())

import __spark_entry__ as e

assert e.entry(spark).count() > 0

qs = e.queries()
df = qs["callsign_sessions"](spark, "/root/testdata/sf0.001")
rows = df.orderBy("user_id", "event_type", "date_seen").limit(3).collect()
assert rows and spark.conf.get("spark.sql.session.timeZone") == "UTC"
# ts values must be UTC-interpreted (events start 2024-01-01 UTC)
assert all(str(r["first_seen"]).startswith("2024-") for r in rows)
print("VANILLA-OK")
"""


def test_entry_contract_survives_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=300,
    )
    assert "VANILLA-OK" in out.stdout, out.stderr[-2000:]
