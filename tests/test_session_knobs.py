"""The SPARK_GRAFT_PREFER_SMJ knob must always hand Spark a literal
"true"/"false": Spark 4.1 does not validate boolean confs at session
build — an invalid value (e.g. the natural truthy "1") brings the
session up and then silently HANGS the first ``conf.get``/query
(reproduced on this box r14). ``_env_bool`` is the guard; these tests
pin its normalization so the knob can never wedge the engine."""

import os
from unittest import mock

from dump1090_db_stream_spark.session import _env_bool


def _with(value):
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_PREFER_SMJ": value}):
        return _env_bool("SPARK_GRAFT_PREFER_SMJ", "false")


def test_truthy_spellings_normalize_to_literal_true():
    for v in ("1", "true", "TRUE", "True", "yes", "on", " true ", "ON"):
        assert _with(v) == "true", v


def test_everything_else_is_literal_false():
    # Invalid/garbage values must fail SAFE to the default rather than
    # reach Spark as a non-boolean string (the hang case).
    for v in ("0", "false", "no", "off", "", "bogus", "2", "truthy"):
        assert _with(v) == "false", v


def test_default_used_when_unset():
    env = {k: v for k, v in os.environ.items()
           if k != "SPARK_GRAFT_PREFER_SMJ"}
    with mock.patch.dict(os.environ, env, clear=True):
        assert _env_bool("SPARK_GRAFT_PREFER_SMJ", "false") == "false"
        assert _env_bool("SPARK_GRAFT_PREFER_SMJ", "true") == "true"


def test_result_is_always_a_valid_spark_boolean():
    for v in ("1", "nonsense", "", "yes", "FALSE"):
        assert _with(v) in ("true", "false")


def test_unrecognized_value_warns_before_falling_back():
    """r14 ADVICE: a typo ('ture') must not SILENTLY mean 'false' —
    the fallback stays (fail-safe), but a warning signals it."""
    import warnings

    for v in ("ture", "bogus", "2"):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert _with(v) == "false"
        assert any("not a recognized boolean" in str(x.message)
                   for x in w), v
    # recognized spellings (either polarity) stay silent
    for v in ("1", "on", "0", "off", "false", ""):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _with(v)
        assert not w, v
