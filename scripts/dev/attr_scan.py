"""Runtime attribute-existence scan over the package's module accesses.

basedpyright isn't installable in this offline image, so this probe
approximates its `reportAttributeAccessIssue` check with runtime ground
truth: it walks every package source AST, resolves `module.attr` (and
`module.sub.attr`) accesses against the ACTUALLY IMPORTED modules, and
reports any attribute that does not exist at runtime. Runtime existence
is a lower bound on stub correctness (an attr can exist at runtime but
be missing from type stubs — those need typings/ entries or per-line
ignores in CI proper), but it catches the hard failures locally.

Run: python scripts/dev/attr_scan.py
"""

from __future__ import annotations

import ast
import importlib
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "audio_pattern_detector_tpu",
)


def scan_file(path: str) -> list[str]:
    src = open(path).read()
    tree = ast.parse(src, filename=path)
    # module alias -> runtime module (imports anywhere in the file)
    aliases: dict[str, object] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                try:
                    aliases[name] = importlib.import_module(
                        a.name if a.asname else a.name.split(".")[0]
                    )
                except ImportError:
                    pass
        elif isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            for a in node.names:
                try:
                    mod = importlib.import_module(node.module)
                except ImportError:
                    continue
                obj = getattr(mod, a.name, None)
                if obj is not None and hasattr(obj, "__spec__"):
                    aliases[a.asname or a.name] = obj

    problems = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Attribute):
            continue
        # Resolve dotted chains rooted at a known module alias.
        chain = []
        cur: ast.expr = node
        while isinstance(cur, ast.Attribute):
            chain.append(cur.attr)
            cur = cur.value
        if not isinstance(cur, ast.Name) or cur.id not in aliases:
            continue
        obj = aliases[cur.id]
        for attr in reversed(chain):
            if not hasattr(obj, attr):
                problems.append(
                    f"{os.path.relpath(path, os.path.dirname(PKG))}:"
                    f"{node.lineno}: {cur.id}.{'.'.join(reversed(chain))} "
                    f"(missing: {attr})"
                )
                break
            obj = getattr(obj, attr)
            if not hasattr(obj, "__spec__"):
                break  # only follow module chains; values end the walk
    return problems


def main() -> int:
    all_problems = []
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py"):
                all_problems += scan_file(os.path.join(root, f))
    for p in all_problems:
        print(p)
    print(f"{len(all_problems)} runtime-missing module attributes")
    return 1 if all_problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
