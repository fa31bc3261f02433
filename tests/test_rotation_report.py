"""Stale-green detection machinery (scripts/rotation_report.py):
import resolution + closure, no Spark session needed."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from rotation_report import (_closure_files, _dotted_to_files,  # noqa: E402
                             _pkg_imports)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_absolute_and_symbol_imports_resolve():
    text = ("from wrangle_pypes_spark.operators.dedup import bloom_bitmap\n"
            "from wrangle_pypes_spark.sources import manifest\n"
            "import wrangle_pypes_spark.fsutil\n")
    got = _pkg_imports(REPO, text, None)
    assert "wrangle_pypes_spark/operators/dedup.py" in got
    assert "wrangle_pypes_spark/sources/manifest.py" in got
    assert "wrangle_pypes_spark/fsutil.py" in got


def test_multiline_parenthesized_import_does_not_swallow_next():
    text = ("from .windows import (\n"
            "    foreach_batch_cdc_apply,\n"
            "    read_cdc_store,\n"
            ")\n"
            "from .stateful import stateful_zscore\n")
    got = _pkg_imports(REPO, text,
                       "wrangle_pypes_spark/streaming/__init__.py")
    assert "wrangle_pypes_spark/streaming/windows.py" in got
    assert "wrangle_pypes_spark/streaming/stateful.py" in got


def test_relative_parent_import_resolves_against_package():
    text = "from ..functions.text import tokenize\nfrom .. import fsutil\n"
    got = _pkg_imports(REPO, text,
                       "wrangle_pypes_spark/operators/quality.py")
    assert "wrangle_pypes_spark/functions/text.py" in got
    assert "wrangle_pypes_spark/fsutil.py" in got


def test_closure_traverses_init_reexports_free_of_depth():
    # seed: a symbol import through the streaming package __init__ —
    # the defining module (windows.py) must appear in the closure even
    # though the literal import names only the package
    seed = _pkg_imports(
        REPO,
        "from wrangle_pypes_spark.streaming import read_cdc_store\n",
        None)
    closure = _closure_files(REPO, seed)
    assert "wrangle_pypes_spark/streaming/windows.py" in closure


def test_stdlib_imports_ignored():
    assert _pkg_imports(REPO, "import json\nfrom typing import Any\n",
                        None) == set()


def test_dotted_to_files_package_and_module():
    assert _dotted_to_files(REPO, "operators") == \
        {"wrangle_pypes_spark/operators/__init__.py"}
    assert _dotted_to_files(REPO, "operators.dedup") == \
        {"wrangle_pypes_spark/operators/dedup.py"}
    assert _dotted_to_files(REPO, "no.such.module") == set()
