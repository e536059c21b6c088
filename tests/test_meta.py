"""Test-suite hygiene guard.

Python silently lets a later ``def test_x`` shadow an earlier one in the
same module, so the earlier test never runs — pytest reports green while
its assertions are dead code. This bit r11: the planted-ops module had
accumulated ELEVEN shadowed test bodies across rounds (9 duplicated
names), all invisible to every full-suite sweep until an edit happened
to collide with one. This guard fails the suite the moment any test
module defines the same top-level test name twice.
"""

from __future__ import annotations

import ast
import collections
import glob
import os


def test_no_duplicate_test_names_in_any_module():
    here = os.path.dirname(os.path.abspath(__file__))
    offenders = {}
    for path in sorted(glob.glob(os.path.join(here, "test_*.py"))):
        with open(path) as f:
            tree = ast.parse(f.read(), filename=path)
        names = [
            node.name
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name.startswith("test_")
        ]
        dups = {n: c for n, c in collections.Counter(names).items() if c > 1}
        if dups:
            offenders[os.path.basename(path)] = dups
    assert not offenders, (
        f"duplicate test names shadow earlier definitions: {offenders}"
    )
