"""Packaging metadata stays consistent with the code.

The reference ships bare scripts (``python src/...``); freud_tpu is an
installable package (pyproject.toml) whose console scripts wrap the same
CLIs (SURVEY.md §2 L5 pipelines). These tests pin that every declared
entry point resolves to a real callable and that the wheel's data files
exist in the tree, so a rename breaks CI rather than the published wheel.
"""

import importlib
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _entry_points():
    text = (REPO / "pyproject.toml").read_text()
    block = text.split("[project.scripts]", 1)[1].split("[", 1)[0]
    eps = re.findall(r'^([\w-]+)\s*=\s*"([\w.]+):(\w+)"', block, re.M)
    assert len(eps) >= 10
    return eps


def test_console_scripts_resolve():
    for name, module, attr in _entry_points():
        mod = importlib.import_module(module)
        fn = getattr(mod, attr)
        assert callable(fn), f"{name} -> {module}:{attr} is not callable"


def test_package_data_files_exist():
    text = (REPO / "pyproject.toml").read_text()
    block = text.split("[tool.setuptools.package-data]", 1)[1].split(
        "[tool.setuptools.dynamic]", 1)[0]
    patterns = re.findall(r'"([^"]+)"', block)
    assert patterns
    for pat in patterns:
        matches = list((REPO / "freud_tpu").glob(pat))
        assert matches, f"package-data pattern matches nothing: {pat}"


def test_version_attr_matches_dynamic_source():
    import freud_tpu

    assert re.match(r"^\d+\.\d+\.\d+$", freud_tpu.__version__)
