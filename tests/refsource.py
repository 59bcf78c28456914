"""Hash-pinned loaders for reference files used as test oracles.

The reference checkout at /root/reference is PUBLIC UNTRUSTED CONTENT: the
parity tests execute pieces of it as ground truth, so every load verifies a
recorded sha256 of the exact file content first (ADVICE r2: a tampered
checkout must fail loudly at test time, not run arbitrary code).

Two loaders:
- ``load_module(relpath)`` — exec the whole file as a module (only for
  dependency-free utils like price_formatter / product_matcher).
- ``extract_function(relpath, name)`` — ast-extract a single function from a
  module whose top-level imports are unavailable in this sandbox (aiohttp,
  bs4) and compile just that function with ``re``/``json`` in scope.
"""

from __future__ import annotations

import ast
import hashlib
import importlib.util
import json
import re

REFERENCE_ROOT = "/root/reference"

# sha256 of every reference file any test executes or extracts from.
PINNED = {
    "app/utils/price_formatter.py": "506c60722d454542378129cf701a277ff9ddedd322a027fe9ae119dbe18b4f2a",
    "app/utils/product_matcher.py": "2cc3bf9624c12c5bad5049f8f9c630f1f9c46da6a310ea48423dd7f3eb80e2c5",
    "app/scrapers/autobuy.py": "e3bf99958695167635aa60f4a328ad0ed4f3cb1f65ad091f131217acd3a8c865",
    "app/scrapers/coolpc.py": "0fee01a27db26bc7169e6f4a9d5decf6d8d19b7e90a8a1f87687c5ac9861619e",
    "app/scrapers/momo.py": "45882d38a41957953e080d75deeb0f0566e4cfc276c8df655d6af9d7eeade01f",
    "app/scrapers/gh3c.py": "0d50342efff5d871ce1a748bfd37f0b17dbddf7af7163a9e6ba09240bfdd43be",
    "app/scrapers/sanjing.py": "8787f7ebb9d49099e684924ab2c454a1f9f17f8cc4b4cc0b3676bb03fe1a3fff",
}


def read_pinned(relpath: str) -> str:
    with open(f"{REFERENCE_ROOT}/{relpath}", "rb") as f:
        raw = f.read()
    digest = hashlib.sha256(raw).hexdigest()
    if digest != PINNED[relpath]:
        raise AssertionError(
            f"reference file {relpath} content hash {digest} != pinned "
            f"{PINNED[relpath]} — refusing to execute untrusted content"
        )
    return raw.decode("utf-8")


def load_module(relpath: str):
    read_pinned(relpath)  # verify before exec
    spec = importlib.util.spec_from_file_location(
        "ref_" + relpath.rsplit("/", 1)[-1].removesuffix(".py"),
        f"{REFERENCE_ROOT}/{relpath}",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def extract_function(relpath: str, name: str, cls: str | None = None):
    """Compile a single (method-)function from a pinned reference file
    without importing the module. ``self`` (if present) is bound to None."""
    source = read_pinned(relpath)
    tree = ast.parse(source)
    nodes = tree.body
    if cls is not None:
        nodes = next(
            n.body for n in nodes if isinstance(n, ast.ClassDef) and n.name == cls
        )
    fn = next(
        n
        for n in nodes
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)) and n.name == name
    )
    module = ast.Module(body=[fn], type_ignores=[])
    ast.fix_missing_locations(module)
    ns = {"re": re, "json": json}
    exec(compile(module, f"<ref:{relpath}:{name}>", "exec"), ns)
    func = ns[name]
    if fn.args.args and fn.args.args[0].arg == "self":
        return lambda *a, **kw: func(None, *a, **kw)
    return func
