"""Static undefined-name check over bench.py and tools/*.py.

Round-5 found `stage_edit` referencing `jax` without importing it — the bench
edit stage had silently failed since the stage-isolation refactor (stage
functions import lazily inside their bodies, and only the failing stage's
fields go missing). pyflakes isn't installed here, so this is a small
AST-scope checker covering exactly that bug class: a Name load that no
enclosing function scope, module global, or builtin binds.

Conservative by construction: any function using `global`/`nonlocal`, star
imports, or `exec` is skipped rather than half-analyzed.
"""

import ast
import builtins
import glob
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGETS = sorted(
    [os.path.join(ROOT, "bench.py"), os.path.join(ROOT, "__graft_entry__.py")]
    + glob.glob(os.path.join(ROOT, "tools", "*.py")))


def _bound_names(node):
    """Names bound directly in `node`'s scope (no descent into nested defs)."""
    bound = set()

    class V(ast.NodeVisitor):
        def visit_FunctionDef(self, n):
            bound.add(n.name)          # binding only; don't descend

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_ClassDef(self, n):
            bound.add(n.name)

        def visit_Lambda(self, n):
            pass                        # own scope

        def visit_Import(self, n):
            for a in n.names:
                bound.add((a.asname or a.name).split(".")[0])

        def visit_ImportFrom(self, n):
            for a in n.names:
                bound.add(a.asname or a.name)

        def visit_Name(self, n):
            if isinstance(n.ctx, (ast.Store, ast.Del)):
                bound.add(n.id)

        def visit_ExceptHandler(self, n):
            if n.name:
                bound.add(n.name)
            self.generic_visit(n)

        def visit_arg(self, n):
            bound.add(n.arg)

        def visit_comprehension(self, n):
            # comprehension targets leak into our per-function approximation;
            # fine for an is-it-defined-anywhere check
            for t in ast.walk(n.target):
                if isinstance(t, ast.Name):
                    bound.add(t.id)
            self.generic_visit(n)

        def visit_Global(self, n):
            raise _Skip

        visit_Nonlocal = visit_Global

    for child in ast.iter_child_nodes(node):
        V().visit(child)
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
        a = node.args
        for arg in (a.posonlyargs + a.args + a.kwonlyargs
                    + ([a.vararg] if a.vararg else [])
                    + ([a.kwarg] if a.kwarg else [])):
            bound.add(arg.arg)
    return bound


class _Skip(Exception):
    pass


def _check_scope(node, enclosing, errors, path):
    try:
        bound = _bound_names(node)
    except _Skip:
        return
    avail = enclosing | bound

    class Loads(ast.NodeVisitor):
        def visit_Name(self, n):
            if isinstance(n.ctx, ast.Load) and n.id not in avail \
                    and not hasattr(builtins, n.id):
                errors.append(f"{path}:{n.lineno}: undefined name {n.id!r}")

        def visit_FunctionDef(self, n):
            _check_scope(n, avail, errors, path)

        visit_AsyncFunctionDef = visit_FunctionDef
        visit_Lambda = visit_FunctionDef

        def visit_ClassDef(self, n):
            # class bodies are their own (non-closing) scope; approximate
            for child in ast.iter_child_nodes(n):
                self.visit(child)

    for child in ast.iter_child_nodes(node):
        Loads().visit(child)


@pytest.mark.parametrize("path", TARGETS, ids=[os.path.relpath(p, ROOT)
                                               for p in TARGETS])
def test_no_undefined_names(path):
    tree = ast.parse(open(path).read(), filename=path)
    if any(isinstance(n, ast.ImportFrom) and
           any(a.name == "*" for a in n.names) for n in ast.walk(tree)):
        pytest.skip("star import")
    errors = []
    _check_scope(tree, {"__file__", "__name__", "__doc__"}, errors, path)
    assert not errors, "\n".join(errors)
