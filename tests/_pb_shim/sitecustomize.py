"""Test-only protobuf runtime shim.

This container has no installed ``google.protobuf``, but a pure-Python
protobuf 6.32.0 ships inside the google-cloud-sdk appengine platform
directory. pyspark's transformWithState protos are generated with
gencode 6.33.0, and protobuf's runtime-version validation rejects any
older runtime outright — even though 6.32 ↔ 6.33 are wire- and
API-compatible (the gate guards against gencode calling runtime APIs
newer than the runtime, and StateMessage_pb2 uses none). So: expose
the bundled runtime and no-op the version gate, ONLY when no real
protobuf is installed.

This file is named ``sitecustomize`` so that Spark's Python *worker*
processes — which import the proto module themselves for the
transformWithState state-server protocol — pick the shim up
automatically via PYTHONPATH (conftest.py exports this directory
before the JVM starts). On any stock deployment with protobuf
installed, ``activate`` is a no-op and the real runtime wins.
"""

import importlib.util
import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_protobuf_on_path() -> bool:
    """True only for an actually-installed protobuf package.

    ``find_spec("google.protobuf")`` is NOT usable here: Spark worker
    processes have spark-core's jar on sys.path, and its bundled
    ``google/protobuf/*.proto`` RESOURCE files make the zipimporter
    report a namespace-package spec ("unknown location") for a package
    that contains no Python code. Require a real ``__init__.py``.
    """
    for entry in sys.path:
        try:
            if os.path.isfile(os.path.join(
                    entry, "google", "protobuf", "__init__.py")):
                return True
        except (TypeError, OSError):
            continue
    return False


def activate() -> bool:
    """Make ``google.protobuf`` importable; True if it now is."""
    if _real_protobuf_on_path():
        return True
    if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
        return False
    if _APPENGINE not in sys.path:
        sys.path.insert(0, _APPENGINE)
    try:
        from google.protobuf import runtime_version
    except ImportError:
        sys.path.remove(_APPENGINE)
        return False
    runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    return True


activate()

if os.environ.get("PB_SHIM_DEBUG"):
    with open("/tmp/pb_shim_log.txt", "a") as _f:
        _f.write(f"pid={os.getpid()} exe={sys.executable} "
                 f"argv={sys.argv[:2]} path0={sys.path[:4]}\n")
