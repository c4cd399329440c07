"""Test-only protobuf shim (CI for transformWithStateInPandas).

This container ships no installable ``protobuf`` wheel and has no network,
but the Google Cloud SDK bundled with the base image carries a pure-Python
protobuf runtime (6.32.0-dev). transformWithStateInPandas needs the runtime
in BOTH the driver and every Spark Python worker (the state-server protocol
imports ``pyspark.sql.streaming.proto.StateMessage_pb2``), so this file is
placed on PYTHONPATH by tests/conftest.py — Python imports ``sitecustomize``
at interpreter start, which makes the shim reach spawned workers too.

Two container quirks handled here:

- Spark's streaming Python runner puts ``spark-core_*.jar`` on the worker
  ``sys.path``; the jar carries ``google/protobuf/*.proto`` RESOURCES, which
  zipimport happily treats as a namespace-package portion — so a bare
  ``import google.protobuf`` "succeeds" as an EMPTY namespace and the real
  probe must be for ``google.protobuf.descriptor``. Any cached namespace
  modules are purged before the real package is imported.
- The bundled runtime is one minor version older than pyspark's gencode
  (6.32 vs 6.33), which the strict gencode/runtime validator rejects even
  though the generated code only uses the stable builder API; the validator
  is no-opped here (test scope only — production clusters install a real
  ``protobuf>=6.33``).

Activates ONLY when a usable ``google.protobuf.descriptor`` is not already
importable, and is inert outside this container (no effect if the SDK path
is absent).
"""

import importlib.util
import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _has_real_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf.descriptor") is not None
    except (ImportError, ValueError):
        return False


if not _has_real_protobuf() and os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
    # drop any empty-namespace 'google'/'google.protobuf' modules the probe
    # (or a jar on sys.path) may have cached, then let the SDK copy resolve
    for _mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[_mod]
    sys.path.append(_GAE)
    try:
        from google.protobuf import runtime_version

        runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:  # pragma: no cover - leave env untouched
        pass
