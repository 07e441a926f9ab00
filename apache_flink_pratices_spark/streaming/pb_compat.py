"""google.protobuf availability bridge for ``transformWithStateInPandas``.

Spark 4's native stateful API talks to the JVM state server through
protobuf messages (``pyspark/sql/streaming/proto/StateMessage_pb2.py``),
which needs the ``google.protobuf`` runtime inside every Python WORKER.
This sandbox ships no protobuf wheel and has no network route to an
index — but the Google Cloud SDK installed on the box vendors a complete
pure-Python protobuf runtime (4.23.2, BSD-licensed) at a well-known
path. The only gap is that pyspark's generated code (gencode 6.33) also
imports ``google.protobuf.runtime_version``, a module added in protobuf
5.27 whose sole job is a version handshake — so we mount the vendored
runtime on ``sys.path`` and install a tiny ``runtime_version`` stand-in
that accepts the handshake (the wire format itself is stable across
these versions; tests/test_golden_wire_bytes.py pins our own codec
against the spec for the same reason).

Worker propagation: Python workers are separate interpreters launched by
the JVM, so driver-side ``sys.path`` edits don't reach them. The bridge
therefore PREPENDS two entries to ``$PYTHONPATH`` *before the JVM
starts*: the vendored runtime dir, and ``_pb_compat_path/`` whose
``sitecustomize.py`` (imported automatically at interpreter startup)
installs the same ``runtime_version`` shim inside each worker.

Ordering contract: the env var only reaches workers when it is set
before the SparkContext (hence JVM) launches. :func:`ensure_protobuf`
records whether it ran pre-JVM; :func:`native_state_available`
(streaming/native_state.py) treats the vendored runtime as usable ONLY
in that case, so a session created outside our factory (e.g. the driver
harness) keeps today's safe ``applyInPandasWithState`` fallback.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

#: vendored pure-Python protobuf runtime shipped with the Google Cloud SDK
VENDORED_DIR = "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pb_compat_path")

#: set to "1" in os.environ once the PYTHONPATH bridge was installed
#: before any SparkContext existed (workers will inherit it)
PREJVM_FLAG = "AFP_PB_VENDORED_PREJVM"


def install_cloudsdk_alias() -> None:
    """The vendored runtime's own modules import themselves under the
    ``cloudsdk.google.protobuf`` name (``descriptor.py`` does
    ``from cloudsdk.google.protobuf.internal import api_implementation``).
    Register a path-only ``cloudsdk`` package pointing at the vendored
    dir instead of putting the SDK's whole ``third_party`` tree on
    ``sys.path`` — that tree vendors dozens of (old) libraries that would
    shadow site-packages for every worker import."""
    if "cloudsdk" in sys.modules or not os.path.isdir(VENDORED_DIR):
        return
    pkg = types.ModuleType("cloudsdk")
    pkg.__path__ = [VENDORED_DIR]
    sys.modules["cloudsdk"] = pkg


def install_runtime_version_shim() -> None:
    """Provide ``google.protobuf.runtime_version`` when the runtime
    predates it (< 5.27). The real module only validates gencode/runtime
    version pairs; accepting the handshake is exactly what running new
    gencode on the stable wire format requires."""
    if importlib.util.find_spec("google.protobuf") is None:
        return
    try:
        import google.protobuf.runtime_version  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("google.protobuf.runtime_version")

    class Domain:
        PUBLIC = 1
        GOOGLE_INTERNAL = 2

    class VersionError(Exception):
        pass

    def ValidateProtobufRuntimeVersion(*args, **kwargs):  # noqa: N802
        return None

    mod.Domain = Domain
    mod.VersionError = VersionError
    mod.ValidateProtobufRuntimeVersion = ValidateProtobufRuntimeVersion
    mod._AFP_SHIM = True  # lets _real_runtime_version_present tell shim from real
    sys.modules["google.protobuf.runtime_version"] = mod
    import google.protobuf as _gp

    _gp.runtime_version = mod


def _wheel_present() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf.descriptor") is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def _real_runtime_version_present() -> bool:
    """True when the INSTALLED protobuf runtime itself ships
    ``runtime_version`` (>= 5.27) — i.e. fresh worker interpreters can
    import pyspark's gencode with no shim. Our driver-side stand-in
    (marked ``_AFP_SHIM``) deliberately does not count."""
    mod = sys.modules.get("google.protobuf.runtime_version")
    if mod is not None:
        return not getattr(mod, "_AFP_SHIM", False)
    try:
        return importlib.util.find_spec("google.protobuf.runtime_version") is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def _install_worker_pythonpath(parts: list[str]) -> None:
    """Prepend ``parts`` to ``$PYTHONPATH`` so future Python WORKERS
    inherit them — effective only while no JVM exists. Gate on the
    gateway as well as the active context: ``SparkContext.stop()`` clears
    ``_active_spark_context`` but the gateway JVM survives and is reused
    by the next context, and workers inherit the env captured at the
    ORIGINAL JVM launch (review pass r6)."""
    from pyspark import SparkContext

    if (
        SparkContext._active_spark_context is None
        and getattr(SparkContext, "_gateway", None) is None
        and not os.environ.get(PREJVM_FLAG)
    ):
        prev = os.environ.get("PYTHONPATH")
        entries = list(parts) + ([prev] if prev else [])
        os.environ["PYTHONPATH"] = os.pathsep.join(entries)
        os.environ[PREJVM_FLAG] = "1"


def ensure_protobuf() -> str | None:
    """Make ``google.protobuf`` importable here and (when possible) in
    future Python workers. Returns ``"wheel"`` (real install),
    ``"vendored"`` (cloud-sdk runtime bridged), or ``None``.

    Must be called BEFORE SparkSession creation for the worker-side
    bridge to reach workers; a later call still fixes the driver process
    but leaves :data:`PREJVM_FLAG` unset so the native path stays gated
    off (:func:`workers_can_import_gencode`).
    """
    if _wheel_present() and VENDORED_DIR not in sys.path:
        # a real wheel older than 5.27 still lacks runtime_version: the
        # driver gets the in-process shim, but fresh worker interpreters
        # need the sitecustomize shim on PYTHONPATH (wheel itself is in
        # site-packages, so SHIM_DIR alone suffices)
        if not _real_runtime_version_present():
            _install_worker_pythonpath([SHIM_DIR])
        install_runtime_version_shim()
        return "wheel"
    if not os.path.isdir(os.path.join(VENDORED_DIR, "google", "protobuf")):
        return None
    if VENDORED_DIR not in sys.path:
        sys.path.append(VENDORED_DIR)
    install_cloudsdk_alias()
    install_runtime_version_shim()
    if not _wheel_present():
        return None
    # worker side: only effective if the JVM has not launched yet
    _install_worker_pythonpath([SHIM_DIR, VENDORED_DIR])
    return "vendored"


def vendored_bridge_active_for_workers() -> bool:
    """True when workers of the CURRENT environment inherit the bridge."""
    return os.environ.get(PREJVM_FLAG) == "1"


def workers_can_import_gencode() -> bool:
    """True when FRESH worker interpreters can import pyspark's protobuf
    gencode (``StateMessage_pb2``): either the installed wheel already
    ships ``runtime_version`` (>= 5.27), or the PYTHONPATH shim (and,
    for the vendored runtime, the runtime itself) was installed before
    any JVM launched. This — not merely :func:`ensure_protobuf`
    succeeding in the driver — is the condition the native
    ``transformWithStateInPandas`` path must gate on."""
    return _real_runtime_version_present() or vendored_bridge_active_for_workers()
