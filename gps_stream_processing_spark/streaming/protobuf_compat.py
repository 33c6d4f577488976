"""Locate a pure-Python ``google.protobuf`` runtime when none is installed.

Spark 4's ``transformWithStateInPandas`` Python worker speaks protobuf
to the JVM state server (``pyspark/sql/streaming/proto/StateMessage_pb2``,
gencode pinned to protoc 6.33.0). This container ships no ``protobuf``
pip package and installs are off-limits, but a pure-Python protobuf
runtime is commonly present on hosts anyway because public SDKs vendor
one (the Google Cloud SDK ships protobuf — BSD-licensed public code —
under ``platform/google_appengine/google/protobuf``). This module
*discovers* such a runtime and wires it up; it copies nothing.

Two wiring points, both required:

- **Driver**: append the runtime dir to ``sys.path`` and set protobuf's
  own documented escape hatch ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``
  (runtime_version.py honors it) — needed because a discovered runtime
  may be an adjacent minor (6.32 vs the 6.33 gencode); the descriptor
  wire format is stable across minors, verified by the round-trip probe
  below.
- **Workers**: inject the same two settings into ``sc.environment``.
  PySpark reads that dict at every function-wrap
  (``pyspark/core/rdd.py::_prepare_for_python_RDD`` returns
  ``sc.environment`` into ``SimplePythonFunction``), and the JVM's
  ``PythonWorkerFactory`` merges an env-var ``PYTHONPATH`` into the
  worker's path — so the injection works even when the JVM predates
  this import (the driver harness owns session creation). It must run
  before the FIRST Python function is wrapped in the session, or the
  changed env key spawns a second worker-daemon pool and every warmed
  worker is lost — hence the call lives in ``registry.tune_session``
  (first thing every registered query does), not in the TWS query.

Capability is probed end-to-end (`tws_available`): import the actual
pyspark gencode and round-trip a message, so a too-old discovered
runtime (e.g. 4.x without ``runtime_version``) cleanly reports
unavailable instead of failing mid-query in a worker.
"""

from __future__ import annotations

import os
import sys

# Public, well-known install locations of a pure-Python google.protobuf
# runtime; extendable via the env var for unusual hosts. Each candidate
# must contain google/protobuf/__init__.py to qualify.
_CANDIDATE_DIRS = (
    os.environ.get("GPS_SPARK_PROTOBUF_DIR", ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_DISABLE_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

# The discovered runtime dir, or None when google.protobuf imports
# natively (no wiring needed) or no usable runtime exists.
_vendor_dir: str | None = None
_probed = False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in THIS process if possible.

    Returns True iff the import succeeds (natively or via a discovered
    runtime). Idempotent; records the discovered dir for
    :func:`configure_worker_env`."""
    global _vendor_dir, _probed
    if _probed:
        return _vendor_dir is not None or _native_ok()
    _probed = True
    if _native_ok():
        return True
    for d in _CANDIDATE_DIRS:
        if not d or not os.path.isfile(
            os.path.join(d, "google", "protobuf", "__init__.py")
        ):
            continue
        os.environ.setdefault(_DISABLE_FLAG, "true")
        if d not in sys.path:
            sys.path.append(d)
        if _native_ok():
            _vendor_dir = d
            return True
        # Path didn't yield a working import — undo and keep scanning.
        sys.path.remove(d)
    return False


def _native_ok() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def configure_worker_env(spark) -> None:
    """Propagate the discovered runtime to Spark Python workers.

    No-op unless a vendor dir is active. Mutates ``sc.environment``
    (consulted per function-wrap, merged additively with Spark's own
    worker PYTHONPATH by PythonWorkerFactory), so it reaches workers
    even on a JVM launched before this module imported."""
    ensure_protobuf()  # idempotent; resolves _vendor_dir on first call
    if _vendor_dir is None:
        return
    try:
        env = spark.sparkContext.environment
    except Exception:  # noqa: BLE001 — e.g. Spark Connect has no local sc
        return
    env[_DISABLE_FLAG] = "true"
    prev = env.get("PYTHONPATH", "")
    if _vendor_dir not in prev.split(os.pathsep):
        env["PYTHONPATH"] = (
            prev + os.pathsep + _vendor_dir if prev else _vendor_dir
        )


def tws_available() -> bool:
    """True iff ``transformWithStateInPandas`` can actually run here:
    the pyspark state-server gencode imports against the available
    protobuf runtime and round-trips a message."""
    if not ensure_protobuf():
        return False
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as m
    except Exception:  # noqa: BLE001 — version-gate or layout mismatch
        return False
    req = m.StateRequest(version=2)
    out = m.StateRequest()
    out.ParseFromString(req.SerializeToString())
    return out.version == 2
