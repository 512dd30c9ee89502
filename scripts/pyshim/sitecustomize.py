"""Sandbox-only interpreter shim (prepended to PYTHONPATH for Spark
workers by yark_spark.session): transformWithStateInPandas needs
``google.protobuf`` in every Spark Python worker (state-server messages
are protobuf), but this container ships no standalone protobuf wheel.
The google-cloud-sdk bundles protobuf 6.32.0 in a plain
``google/protobuf`` layout; Spark's generated StateMessage_pb2 declares
gencode 6.33.0 — same major, one minor ahead — so the runtime validation
is relaxed to tolerate exactly that skew.

Probe ``google.protobuf.descriptor``, not ``google.protobuf``: Spark
worker PYTHONPATHs include spark-core.jar, whose embedded
``google/protobuf/*.proto`` RESOURCES make ``import google.protobuf``
succeed vacuously as an empty namespace package. A real protobuf install
satisfies the descriptor probe and wins; outside this container the shim
is inert."""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

try:
    from google.protobuf import descriptor  # noqa: F401 — real install wins
except ImportError:
    if os.path.isdir(_GAE):
        # drop any vacuous namespace portions picked up from jars so the
        # retry re-resolves against the extended path
        for _m in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            del sys.modules[_m]
        sys.path.append(_GAE)
        try:
            from google.protobuf import runtime_version as _rv

            _orig = _rv.ValidateProtobufRuntimeVersion

            def _lenient(*args, **kwargs):
                try:
                    _orig(*args, **kwargs)
                except _rv.VersionError:
                    pass  # one-minor gencode skew: API-compatible

            _rv.ValidateProtobufRuntimeVersion = _lenient
        except Exception:  # noqa: BLE001 — shim must never break startup
            pass
