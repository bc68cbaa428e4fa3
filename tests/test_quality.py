"""Package-quality gates (reference test/aqua.jl analog):
every public module imports, __all__ names resolve, no stale exports."""

import importlib
import pkgutil

import cloudmicrophysics_tpu as cm

MODULES = [
    m.name
    for m in pkgutil.walk_packages(cm.__path__, prefix="cloudmicrophysics_tpu.")
]


class TestQuality:
    def test_all_modules_import(self):
        for name in MODULES:
            importlib.import_module(name)

    def test_dunder_all_resolves(self):
        for name in MODULES:
            mod = importlib.import_module(name)
            for sym in getattr(mod, "__all__", ()):
                assert hasattr(mod, sym), f"{name}.__all__ lists {sym!r}"

    def test_top_level_surface(self):
        # the documented top-level subpackages exist
        for sub in ("models", "ops", "parameters", "parallel", "utils",
                    "kernels"):
            assert hasattr(cm, sub), sub
