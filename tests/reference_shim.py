"""
Import shim that makes the reference EVcouplings package (mounted
read-only at /root/reference) importable in this environment for
cross-validation tests, by stubbing its unavailable dependencies:

- numba.jit -> identity decorator (kernels run as plain Python loops —
  slow, but exactly the reference semantics, which is the point)
- ruamel.yaml -> thin adapter over PyYAML
- billiard -> stdlib multiprocessing
- pkg_resources.resource_filename -> module-relative path lookup
- Bio.PDB.binary_cif._decode -> this framework's native bcif codec
- bokeh -> inert stubs (only needed at import time)

Call load_reference() to get the reference package; tests should skip
gracefully if it cannot be loaded.
"""

import sys
import types


def _install_numba_stub():
    if "numba" in sys.modules:
        return

    import builtins
    import functools

    numba = types.ModuleType("numba")

    def _casting_range(*args):
        # numba casts float loop bounds to int (the reference's
        # num_cluster_members relies on this: `L = 1.0 * L; range(L)`)
        return builtins.range(*(int(a) for a in args))

    def _as_python(func):
        g = dict(func.__globals__)
        g["range"] = _casting_range
        clone = types.FunctionType(
            func.__code__, g, func.__name__,
            func.__defaults__, func.__closure__,
        )
        return functools.wraps(func)(clone)

    def jit(*args, **kwargs):
        # bare @jit
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return _as_python(args[0])

        # @jit(nopython=True, ...)
        def wrapper(func):
            return _as_python(func)

        return wrapper

    numba.jit = jit
    numba.njit = jit
    sys.modules["numba"] = numba


def _install_ruamel_stub():
    if "ruamel" in sys.modules:
        return

    import yaml as pyyaml

    ruamel = types.ModuleType("ruamel")
    ruamel_yaml = types.ModuleType("ruamel.yaml")

    class _RoundTripLoader(pyyaml.SafeLoader):
        pass

    class _RoundTripDumper(pyyaml.SafeDumper):
        pass

    def load(stream, Loader=None, **kwargs):
        return pyyaml.load(stream, Loader=_RoundTripLoader)

    def dump(data, stream=None, Dumper=None, **kwargs):
        return pyyaml.dump(data, stream, Dumper=_RoundTripDumper)

    class YAML:
        def __init__(self, typ="rt", **kwargs):
            pass

        def load(self, stream):
            return pyyaml.safe_load(stream)

        def dump(self, data, stream):
            pyyaml.safe_dump(data, stream)

    ruamel_yaml.load = load
    ruamel_yaml.dump = dump
    ruamel_yaml.RoundTripLoader = _RoundTripLoader
    ruamel_yaml.RoundTripDumper = _RoundTripDumper
    ruamel_yaml.YAML = YAML
    ruamel_yaml.YAMLError = pyyaml.YAMLError

    ruamel.yaml = ruamel_yaml
    sys.modules["ruamel"] = ruamel
    sys.modules["ruamel.yaml"] = ruamel_yaml


def _install_billiard_stub():
    if "billiard" in sys.modules:
        return

    import multiprocessing

    billiard = types.ModuleType("billiard")
    billiard.Pool = multiprocessing.Pool
    billiard.Process = multiprocessing.Process
    billiard.cpu_count = multiprocessing.cpu_count
    billiard.JoinableQueue = multiprocessing.JoinableQueue
    billiard.Queue = multiprocessing.Queue
    billiard.Manager = multiprocessing.Manager
    sys.modules["billiard"] = billiard


def _install_pkg_resources_stub():
    if "pkg_resources" in sys.modules:
        return

    import os

    pkg_resources = types.ModuleType("pkg_resources")

    def resource_filename(package, resource):
        # resolve data files relative to the module's location
        mod = sys.modules.get(package)
        if mod is None:
            __import__(package)
            mod = sys.modules[package]
        return os.path.join(os.path.dirname(mod.__file__), resource)

    pkg_resources.resource_filename = resource_filename
    sys.modules["pkg_resources"] = pkg_resources


def _install_bio_stub():
    if "Bio" in sys.modules:
        return

    bio = types.ModuleType("Bio")
    bio_pdb = types.ModuleType("Bio.PDB")
    bio_bcif = types.ModuleType("Bio.PDB.binary_cif")

    # back the biopython decoder with this framework's native codec
    from evcouplings_tpu.compare.bcif import decode_column

    def _normalize_column(obj):
        if isinstance(obj, dict):
            out = {}
            for k, v in obj.items():
                key = k.decode() if isinstance(k, bytes) else k
                if key == "stringData" and isinstance(v, bytes):
                    out[key] = v.decode()
                elif key in ("data", "offsets") and isinstance(
                    v, (bytes, bytearray)
                ):
                    out[key] = bytes(v)
                else:
                    out[key] = _normalize_column(v)
            return out
        if isinstance(obj, list):
            return [_normalize_column(x) for x in obj]
        return obj

    def _decode(column):
        return decode_column(_normalize_column(column))

    bio_bcif._decode = _decode
    bio_pdb.binary_cif = bio_bcif
    bio.PDB = bio_pdb
    sys.modules["Bio"] = bio
    sys.modules["Bio.PDB"] = bio_pdb
    sys.modules["Bio.PDB.binary_cif"] = bio_bcif


def _install_bokeh_stub():
    if "bokeh" in sys.modules:
        return

    bokeh = types.ModuleType("bokeh")
    for sub in ["plotting", "io", "models", "core", "core.properties"]:
        sys.modules["bokeh." + sub] = types.ModuleType("bokeh." + sub)

    sys.modules["bokeh.core"].properties = sys.modules[
        "bokeh.core.properties"
    ]
    bokeh.plotting = sys.modules["bokeh.plotting"]
    bokeh.io = sys.modules["bokeh.io"]
    bokeh.models = sys.modules["bokeh.models"]
    bokeh.core = sys.modules["bokeh.core"]

    sys.modules["bokeh.io"].save = lambda *a, **k: None
    sys.modules["bokeh.io"].output_file = lambda *a, **k: None
    sys.modules["bokeh.core.properties"].value = lambda x: x
    sys.modules["bokeh.models"].HoverTool = object
    sys.modules["bokeh"] = bokeh


_loaded = None
_load_attempted = False


def load_reference():
    """Import and return the reference evcouplings package (or None if
    it cannot be loaded in this environment)."""
    global _loaded, _load_attempted
    if _load_attempted:
        return _loaded
    _load_attempted = True

    _install_numba_stub()
    _install_ruamel_stub()
    _install_billiard_stub()
    _install_pkg_resources_stub()
    _install_bio_stub()
    _install_bokeh_stub()

    # if the evcouplings_tpu.compat import alias is active in this
    # process, remove it so the REAL reference package loads here
    try:
        from evcouplings_tpu import compat as _compat

        _compat.uninstall_alias()
    except ImportError:
        pass

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    try:
        import evcouplings  # noqa: F401
        import evcouplings.couplings.model  # noqa: F401
        import evcouplings.couplings.pairs  # noqa: F401
        _loaded = evcouplings
    except Exception:
        _loaded = None

    return _loaded
