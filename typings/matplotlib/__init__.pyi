# Minimal local stubs for the optional debug-graph dependency, mirroring
# the reference's stub-backed typecheck approach (it ships
# typings/matplotlib/*.pyi rather than suppressing attribute checks).
# Only the surface models/debug.py touches is declared.

def use(backend: str, *, force: bool = ...) -> None: ...
