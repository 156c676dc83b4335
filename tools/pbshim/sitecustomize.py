"""Test-environment shim: make ``google.protobuf`` importable where the
container has no installed protobuf distribution (installs are prohibited
in this sandbox; ``pip download protobuf`` returns nothing — no network).

The machine's Google Cloud SDK ships a VENDORED pure-python protobuf
runtime (6.32.0) under the App Engine bundle; pyspark 4.1's
``StateMessage_pb2`` gencode is stamped 6.33.0, one minor ahead, and the
runtime's ``ValidateProtobufRuntimeVersion`` hard-rejects runtime <
gencode even across a pure-wire-compatible minor. This shim

1. appends the vendored runtime to ``sys.path``, and
2. wraps the validator to tolerate ONLY the verified skew — same major,
   gencode at most one minor ahead of the runtime (VersionError only;
   real import errors still propagate; a wider gap re-raises loudly),

which is enough for ``transformWithStateInPandas``'s Python worker <->
JVM state-server protocol to run end-to-end (verified by
tests/test_streaming.py::test_running_user_totals_tws_matches_legacy_and_batch).

Activation: tests/conftest.py prepends this directory to PYTHONPATH
before the Spark JVM launches, so every Python worker imports this
``sitecustomize`` at startup; the pytest driver process applies the same
logic in-process. This is a TEST-ENVIRONMENT shim only — a production
cluster installs a protobuf >= the pyspark gencode version and never
loads this file.
"""

import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _activate() -> None:
    # Probe for a USABLE protobuf. A bare `import google.protobuf` is not
    # enough: Spark workers get spark-core's jar on PYTHONPATH, and its
    # google/protobuf/*.proto resource directory satisfies the import as
    # an EMPTY namespace package.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return  # a real protobuf distribution is installed — do nothing
    except ImportError:
        pass
    import os

    if not os.path.isdir(os.path.join(_VENDORED, "google", "protobuf")):
        return
    if _VENDORED not in sys.path:
        sys.path.append(_VENDORED)
    # drop any cached empty-namespace portions so the vendored REGULAR
    # google.protobuf package (has __init__.py — wins over namespace
    # portions) is found on re-import
    for _m in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[_m]
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:
        return
    _orig = _rv.ValidateProtobufRuntimeVersion
    _runtime_major = getattr(_rv, "MAJOR", None)
    _runtime_minor = getattr(_rv, "MINOR", None)

    def _lenient(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except _rv.VersionError:
            # Tolerate ONLY the verified known-good skew: same major AND
            # gencode at most ONE minor ahead of the vendored runtime
            # (6.32 runtime vs pyspark's 6.33 gencode — wire-compatible
            # for the StateMessage set, verified end-to-end by the TWS
            # pytests). protobuf does NOT guarantee forward wire/gencode
            # compatibility across arbitrary minors, so a future pyspark
            # bump that widens the gap re-raises and fails loudly here —
            # not as an opaque deserialization error mid-stream, and
            # never as a silent re-gate of the TWS tests (ADVICE r11;
            # tests/test_streaming.py::test_pbshim_version_gap_canary
            # pins the same bound from the outside).
            if (
                _runtime_major is None
                or _runtime_minor is None
                or gen_major != _runtime_major
                or gen_minor - _runtime_minor > 1
            ):
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient


_activate()
