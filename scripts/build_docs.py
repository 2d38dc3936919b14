#!/usr/bin/env python
"""Generate markdown API docs from fss_tpu docstrings.

Reference analog: the Doxygen doc build in its CI
(/root/reference/.github/workflows/ci.yaml doc job + Doxyfile). pdoc and
mkdocs are not available in this environment, so this is a small
introspection-based generator: one markdown page per module, with module /
class / function docstrings and signatures, written to docs/api/.

Usage: PYTHONPATH=. python scripts/build_docs.py [outdir]
"""

from __future__ import annotations

import importlib
import inspect
import pathlib
import pkgutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else ""


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    for name, obj in sorted(vars(mod).items()):
        if names is not None and name not in names:
            continue
        if name.startswith("_"):
            continue
        if inspect.ismodule(obj):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue  # only objects defined here, not re-exports
        yield name, obj


def _render_function(name, fn, level="###") -> list[str]:
    out = [f"{level} `{name}{_signature(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        out += [doc, ""]
    return out


def _render_class(name, cls) -> list[str]:
    out = [f"### class `{name}{_signature(cls)}`", ""]
    doc = _doc(cls)
    if doc:
        out += [doc, ""]
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") or not callable(m):
            continue
        fn = getattr(cls, mname)
        out += [f"#### `{name}.{mname}{_signature(fn)}`", ""]
        mdoc = _doc(fn)
        if mdoc:
            out += [mdoc, ""]
    return out


def render_module(modname: str) -> str | None:
    try:
        mod = importlib.import_module(modname)
    except Exception as e:  # optional deps (native build) may be absent
        print(f"skip {modname}: {e}", file=sys.stderr)
        return None
    lines = [f"# `{modname}`", ""]
    doc = _doc(mod)
    if doc:
        lines += [doc, ""]
    classes, functions = [], []
    for name, obj in _public_members(mod):
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))
    if classes:
        lines += ["## Classes", ""]
        for name, obj in classes:
            lines += _render_class(name, obj)
    if functions:
        lines += ["## Functions", ""]
        for name, obj in functions:
            lines += _render_function(name, obj)
    if not (doc or classes or functions):
        return None
    return "\n".join(lines) + "\n"


def main():
    outdir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "docs/api")
    outdir.mkdir(parents=True, exist_ok=True)

    import fss_tpu
    modnames = ["fss_tpu"]
    for info in pkgutil.walk_packages(fss_tpu.__path__,
                                      prefix="fss_tpu."):
        if "._" not in info.name and not info.name.endswith("._"):
            modnames.append(info.name)

    index = ["# fss_tpu API reference", "",
             "Generated from docstrings by `scripts/build_docs.py` "
             "(`make docs`).", ""]
    written = 0
    for modname in sorted(modnames):
        md = render_module(modname)
        if md is None:
            continue
        fname = modname.replace(".", "_") + ".md"
        (outdir / fname).write_text(md)
        first = md.splitlines()[2] if len(md.splitlines()) > 2 else ""
        index.append(f"- [`{modname}`]({fname}) — {first[:100]}")
        written += 1
    (outdir / "index.md").write_text("\n".join(index) + "\n")
    print(f"docs: wrote {written} module pages to {outdir}")


if __name__ == "__main__":
    main()
