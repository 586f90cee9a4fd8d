"""Import-smoke guard for the diagnostic/bench scripts.

The `scripts/` tree rots silently (it has no other test coverage): a
sys.path shim pasted inside a docstring, a helper renamed out from under a
probe, an import left behind by a refactor (all real past findings). Each
script must at least import cleanly the way `python scripts/X.py` would
(its own directory on sys.path) and expose a `main` entry point.

The two `e2e_*` scripts are excluded: they run their (20-min, TPU) work at
module level by design.
"""

import importlib.util
import pathlib
import sys

import pytest

SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"
RUN_AT_IMPORT = {"e2e_synthetic.py", "e2e_voc_synthetic.py"}
# probe_mosaic is a minimal Pallas lowering repro, intentionally main-less
NO_MAIN = {"probe_mosaic.py"}


@pytest.mark.parametrize(
    "name", sorted(p.name for p in SCRIPTS.glob("*.py")
                   if p.name not in RUN_AT_IMPORT))
def test_script_imports_and_has_main(name, monkeypatch):
    # emulate `python scripts/X.py`: the script's dir is sys.path[0]
    monkeypatch.syspath_prepend(str(SCRIPTS))
    path = SCRIPTS / name
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    # sibling imports (trace_msflip imports trace_step) resolve via the
    # prepended path; register under the stem like script execution would
    monkeypatch.setitem(sys.modules, path.stem, mod)
    spec.loader.exec_module(mod)
    if name not in NO_MAIN:
        assert callable(getattr(mod, "main", None)), f"{name} has no main()"


def test_e2e_scripts_compile():
    """The module-level e2e scripts at least parse (no syntax rot)."""
    import py_compile

    for name in sorted(RUN_AT_IMPORT):
        py_compile.compile(str(SCRIPTS / name), doraise=True)
