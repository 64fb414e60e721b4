#!/usr/bin/env python3
"""Probe this machine for a vendorable grpcio runtime, the way
``compat/pbshim.py`` found a vendored pure-Python protobuf (Google Cloud
SDK App Engine tree): a positive hit would let ``compat/remote.py``'s
Spark Connect submit contract gain a LIVE submit→result test instead of
the parse-contract-only coverage documented at COVERAGE.md.

Why a negative result is expected: protobuf ships a pure-Python runtime
(vendorable by sys.path append), but grpcio's core is a compiled CPython
extension (``grpc._cython.cygrpc``) — there is no pure-Python grpc, so a
vendored copy must contain a platform-and-interpreter-matched ``.so``.
The probe therefore looks for BOTH layout kinds anyway and reports what
it finds, so the COVERAGE.md gate note carries evidence instead of an
assumption.

Usage:  python tools/probe_grpc.py      # prints a JSON verdict
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

# Directory roots worth scanning: every python install tree, the Cloud SDK
# (pbshim's source), and Spark's own vendored/jars areas.
_SCAN_ROOTS = [
    "/usr/lib/google-cloud-sdk",
    "/usr/lib/python3*",
    "/usr/local/lib/python3*",
    os.path.expanduser("~/.pyenv/versions/*/lib/python3*"),
    os.environ.get("SPARK_HOME", "/opt/spark"),
    "/opt",
]


def probe() -> dict:
    out: dict = {"importable": False, "candidates": [], "cython_sos": []}
    spec = importlib.util.find_spec("grpc")
    if spec is not None and spec.origin:
        out["importable"] = True
        out["origin"] = spec.origin
        return out
    seen: set[str] = set()
    for pat in _SCAN_ROOTS:
        for root in glob.glob(pat):
            if not os.path.isdir(root) or root in seen:
                continue
            seen.add(root)
            for dirpath, dirnames, filenames in os.walk(root):
                # prune deep irrelevant trees for speed
                dirnames[:] = [
                    d for d in dirnames
                    if d not in {".git", "node_modules", "__pycache__"}
                ]
                base = os.path.basename(dirpath)
                if base == "grpc" and "__init__.py" in filenames:
                    out["candidates"].append(dirpath)
                for f in filenames:
                    if f.startswith("cygrpc") and f.endswith(".so"):
                        out["cython_sos"].append(os.path.join(dirpath, f))
    out["verdict"] = (
        "vendorable" if out["cython_sos"] and out["candidates"] else "absent"
    )
    return out


if __name__ == "__main__":
    res = probe()
    res["python"] = sys.version.split()[0]
    print(json.dumps(res, indent=2))
