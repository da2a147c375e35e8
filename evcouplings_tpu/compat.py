"""Drop-in import-path compatibility with the reference package.

Importing this module (or calling :func:`install_alias`) installs a
``sys.meta_path`` finder that resolves ``evcouplings`` and every
``evcouplings.*`` submodule to the matching ``evcouplings_tpu``
module, so code written against debbiemarkslab/EVcouplings runs
unmodified::

    import evcouplings_tpu.compat  # noqa: F401  (installs the alias)

    from evcouplings.couplings import CouplingsModel   # -> this framework
    from evcouplings.align import Alignment

The alias is an explicit opt-in (nothing is registered by merely
installing the package) so environments that carry the *real*
reference package — like this repo's own cross-validation tests,
tests/reference_shim.py — are never shadowed accidentally.

Module identity: ``evcouplings.x.y is evcouplings_tpu.x.y`` — the
finder registers the same module object under both names, it does not
re-execute module code.
"""

import importlib
import importlib.abc
import importlib.machinery
import importlib.util
import sys

_ALIAS = "evcouplings"
_REAL = "evcouplings_tpu"


class _AliasLoader(importlib.abc.Loader):
    """Loader that resolves an alias name to the real module object
    via the sys.modules self-replacement idiom (the import machinery
    re-reads sys.modules[spec.name] after exec_module, so the REAL
    module's __name__/__spec__ are never touched)."""

    def __init__(self, real_name):
        self.real_name = real_name

    def create_module(self, spec):
        return None     # default module object; replaced in exec

    def exec_module(self, module):
        real = importlib.import_module(self.real_name)
        sys.modules[module.__spec__.name] = real


class EvcouplingsAliasFinder(importlib.abc.MetaPathFinder):
    """Meta-path finder mapping evcouplings[.sub] -> evcouplings_tpu[.sub]."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname != _ALIAS and not fullname.startswith(_ALIAS + "."):
            return None
        real = _REAL + fullname[len(_ALIAS):]
        try:
            real_spec = importlib.util.find_spec(real)
        except (ImportError, ValueError):
            return None
        if real_spec is None:
            return None
        spec = importlib.machinery.ModuleSpec(
            fullname, _AliasLoader(real),
            is_package=real_spec.submodule_search_locations is not None,
        )
        if real_spec.submodule_search_locations is not None:
            spec.submodule_search_locations = list(
                real_spec.submodule_search_locations
            )
        return spec


def install_alias():
    """Install the evcouplings -> evcouplings_tpu import alias.

    Idempotent. Refuses (ImportError) if a REAL ``evcouplings``
    package distinct from this framework is already imported, rather
    than silently shadowing it.
    """
    existing = sys.modules.get(_ALIAS)
    if existing is not None and existing is not sys.modules.get(_REAL):
        raise ImportError(
            "a different 'evcouplings' package is already imported "
            "({!r}); refusing to shadow it".format(
                getattr(existing, "__file__", None))
        )
    if not any(
        isinstance(f, EvcouplingsAliasFinder) for f in sys.meta_path
    ):
        sys.meta_path.insert(0, EvcouplingsAliasFinder())


def uninstall_alias():
    """Remove the finder and purge alias entries from sys.modules
    (the real evcouplings_tpu modules stay imported)."""
    sys.meta_path[:] = [
        f for f in sys.meta_path
        if not isinstance(f, EvcouplingsAliasFinder)
    ]
    for name in list(sys.modules):
        if name == _ALIAS or name.startswith(_ALIAS + "."):
            mod = sys.modules[name]
            if mod is sys.modules.get(
                _REAL + name[len(_ALIAS):]
            ):
                del sys.modules[name]


install_alias()
