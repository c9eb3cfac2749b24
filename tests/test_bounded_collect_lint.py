"""Driver-collect bound lint: every ``to_pandas()`` / ``take_all()`` /
``take(`` in library code is a driver-side materialization, which is
only legitimate when its input is BOUNDED (a lattice, a dimension, a
day grid, a top-k).  The invariant (VERDICT r3 §Next-round 8): each
such site must carry the bound either as an inline ``# bounded:``
annotation on the call line, or as the word ``bounded`` in the
enclosing function's docstring (the repo's documentation convention —
e.g. "day-bounded", "lattice-bounded", "key-bounded").

New unbounded collects cannot land silently: they fail this test until
their author states the bound.  golden.py is exempt (local-by-design
oracle recomputes over fixture-scale inputs, documented in its module
docstring); fixtures.py likewise (fixture construction).

Pure AST/filesystem test: no Ray.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "plasmap_ray")
EXEMPT = {"golden.py", "fixtures.py"}
COLLECT_ATTRS = {"to_pandas", "take_all"}


def _py_files():
    for root, dirs, names in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for n in names:
            if n.endswith(".py") and n not in EXEMPT:
                yield os.path.join(root, n)


def _enclosing_doc(tree, lineno):
    """Docstring of the innermost function/class containing lineno."""
    best = None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            end = getattr(node, "end_lineno", node.lineno)
            if node.lineno <= lineno <= end:
                if best is None or node.lineno > best.lineno:
                    best = node
    return (ast.get_docstring(best) or "") if best is not None else ""


def test_every_driver_collect_states_its_bound():
    bad = []
    n_sites = 0
    for path in _py_files():
        with open(path, encoding="utf-8") as f:
            src = f.read()
        lines = src.splitlines()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in COLLECT_ATTRS
            ):
                continue
            ln = node.lineno
            inline = any(
                "# bounded:" in lines[i]
                for i in range(max(0, ln - 2), min(len(lines), node.end_lineno + 1))
            )
            doc = _enclosing_doc(tree, ln)
            n_sites += 1
            if not inline and "bounded" not in doc.lower():
                rel = os.path.relpath(path, REPO)
                bad.append(f"{rel}:{ln}: {lines[ln - 1].strip()[:90]}")
    assert not bad, (
        f"{len(bad)} driver collects with no stated bound "
        "(add `# bounded: <why>` or state the bound in the docstring):\n"
        + "\n".join(bad)
    )
    assert n_sites > 100  # the lint is actually scanning the library
