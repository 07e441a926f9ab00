"""Worker-side half of the google.protobuf bridge (see
``apache_flink_pratices_spark/streaming/pb_compat.py``).

This directory is prepended to ``$PYTHONPATH`` by ``ensure_protobuf``,
so every Python interpreter the JVM launches (pyspark.daemon and its
forked workers) imports this module at startup — the standard
``sitecustomize`` hook. It installs the ``google.protobuf.
runtime_version`` stand-in that pyspark's generated protobuf code
imports but the vendored 4.23 runtime (also on ``$PYTHONPATH``)
predates. Strictly defensive: any failure leaves the interpreter
exactly as it was. The shim and the chain-load below sit in SEPARATE
try blocks: a bare interpreter with no ``google`` package at all makes
``find_spec("google.protobuf")`` raise ModuleNotFoundError, and that
must not also swallow the chain step.
"""

try:  # pragma: no cover - exercised inside Spark workers
    import importlib.util as _ilu
    import os as _os
    import sys as _sys
    import types as _types

    _VENDORED = "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk"
    # the vendored runtime imports itself as cloudsdk.google.protobuf.*;
    # register a path-only alias instead of exposing all of third_party
    if "cloudsdk" not in _sys.modules and _os.path.isdir(_VENDORED):
        _pkg = _types.ModuleType("cloudsdk")
        _pkg.__path__ = [_VENDORED]
        _sys.modules["cloudsdk"] = _pkg

    if (
        _ilu.find_spec("google.protobuf") is not None
        and "google.protobuf.runtime_version" not in _sys.modules
        and _ilu.find_spec("google.protobuf.runtime_version") is None
    ):
        _mod = _types.ModuleType("google.protobuf.runtime_version")

        class _Domain:
            PUBLIC = 1
            GOOGLE_INTERNAL = 2

        class _VersionError(Exception):
            pass

        def _validate(*args, **kwargs):
            return None

        _mod.Domain = _Domain
        _mod.VersionError = _VersionError
        _mod.ValidateProtobufRuntimeVersion = _validate
        _mod._AFP_SHIM = True
        _sys.modules["google.protobuf.runtime_version"] = _mod
except Exception:  # noqa: BLE001
    pass

try:  # pragma: no cover - exercised inside Spark workers
    import importlib.util as _ilu
    import os as _os
    import sys as _sys

    # Python imports only the FIRST sitecustomize on sys.path, so being
    # prepended means this shim shadows any other sitecustomize (a venv's,
    # coverage.py's process_startup hook, ...). Chain-load the first one
    # found further along sys.path under a private name so its side
    # effects still run.
    # realpath, not abspath: a symlinked PYTHONPATH entry pointing at this
    # directory must still be recognized as "self", or the loop would
    # exec this module recursively and never reach the shadowed one
    _here = _os.path.realpath(_os.path.dirname(_os.path.abspath(__file__)))
    for _p in _sys.path:
        _dir = _os.path.realpath(_p) if _p else _os.getcwd()
        if _dir == _here:
            continue
        _cand = _os.path.join(_dir, "sitecustomize.py")
        if _os.path.isfile(_cand):
            if _os.path.realpath(_cand) == _os.path.realpath(__file__):
                continue  # file-level symlink back to this very shim
            _spec = _ilu.spec_from_file_location("_afp_shadowed_sitecustomize", _cand)
            if _spec is not None and _spec.loader is not None:
                _shadowed = _ilu.module_from_spec(_spec)
                _sys.modules["_afp_shadowed_sitecustomize"] = _shadowed
                _spec.loader.exec_module(_shadowed)
            break
except Exception:  # noqa: BLE001
    pass
