#!/usr/bin/env python3
"""Minimal Spark Connect gRPC client for interpreters WITHOUT pyspark's
Python deps — runs under the Google Cloud SDK's bundled CPython 3.12,
whose site-packages ships a compiled grpcio 1.71 (found by
tools/probe_grpc.py; this container's own 3.11 has no grpcio at all).

The missing protobuf runtime is assembled pbshim-style from the SDK's own
vendored trees (nothing is copied into the repo):

- core runtime: the App Engine pure-Python ``google.protobuf`` 6.32
  (same tree ``compat/pbshim.py`` uses inside Spark workers), with the
  patch-level gencode-6.33 version gate no-op'd;
- well-known types (``any_pb2``/``timestamp_pb2``, absent from the App
  Engine tree): the SDK's second vendored protobuf under
  ``lib/third_party/cloudsdk`` carries them with imports rewritten to the
  ``cloudsdk.google.protobuf`` namespace — re-rewritten back on the fly
  and exec'd into ``google.protobuf.*`` so they register in the SAME
  descriptor pool the Connect protos resolve against;
- the Connect protos themselves: pyspark 4.1.2's generated
  ``pyspark/sql/connect/proto`` modules are pure Python; a synthetic
  package tree (empty ``pyspark/sql/connect`` parents + a symlink to the
  real proto dir) makes them importable without dragging in pyspark's
  pandas/pyarrow-requiring ``__init__`` chain.

The client submits SQL commands via ExecutePlan and drains each response
stream — result data is written server-side by the SQL itself
(INSERT OVERWRITE DIRECTORY), so no Arrow decoding (pyarrow) is needed
client-side. That is exactly the shape of the reference's submit
contract: POST a job, results land at output_uri
(src/main/java/com/gridmr/master/HttpJobServer.java:27-82).

The sql file may hold SEVERAL statements separated by a line containing
only ``;;`` — all execute in the SAME Connect session (one session_id),
so a ``SET spark.sql.files.maxPartitionBytes=...`` prologue applies to
the job statement that follows (how compat/remote.py maps the
reference's per-job ``desired_maps`` hint in delegated mode; Connect
confs are session-scoped, so nothing leaks past this session).

Usage (see tests/test_remote_live.py and compat/remote.py):
    <bundled-python3.12> connect_probe_client.py --port N --sql-file F \
        [--host H] [--session-id UUID] \
        [--appengine DIR] [--cloudsdk-protobuf DIR] [--proto-tree DIR]
"""

from __future__ import annotations

import argparse
import sys
import types
import uuid


def bootstrap_protobuf(appengine_dir: str, cloudsdk_pb_dir: str) -> None:
    sys.path.append(appengine_dir)
    from google.protobuf import runtime_version

    # patch-level gap only (gencode 6.33 vs runtime 6.32); same rationale
    # and scope as compat/pbshim.py's defusal
    runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    for name in ("any_pb2", "timestamp_pb2"):
        path = f"{cloudsdk_pb_dir}/{name}.py"
        with open(path) as fh:
            src = fh.read().replace(
                "from cloudsdk.google.protobuf", "from google.protobuf"
            )
        mod = types.ModuleType(f"google.protobuf.{name}")
        mod.__file__ = path
        sys.modules[f"google.protobuf.{name}"] = mod
        exec(compile(src, path, "exec"), mod.__dict__)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--session-id", default=None)
    ap.add_argument("--sql-file", required=True)
    ap.add_argument(
        "--appengine",
        default="/usr/lib/google-cloud-sdk/platform/google_appengine",
    )
    ap.add_argument(
        "--cloudsdk-protobuf",
        default="/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf",
    )
    ap.add_argument(
        "--proto-tree",
        help="dir whose pyspark/sql/connect/proto resolves (synthetic tree)",
    )
    args = ap.parse_args()
    if args.proto_tree:
        sys.path.insert(0, args.proto_tree)
    bootstrap_protobuf(args.appengine, args.cloudsdk_protobuf)

    import grpc
    from pyspark.sql.connect.proto import base_pb2, base_pb2_grpc

    with open(args.sql_file) as fh:
        raw = fh.read()
    statements = [s.strip() for s in raw.split("\n;;\n") if s.strip()]
    if not statements:
        print("RESPONSES:", file=sys.stderr)
        return 2
    session_id = args.session_id or str(uuid.uuid4())
    chan = grpc.insecure_channel(f"{args.host}:{args.port}")
    stub = base_pb2_grpc.SparkConnectServiceStub(chan)
    ok = True
    all_kinds = []
    for sql in statements:
        req = base_pb2.ExecutePlanRequest()
        req.session_id = session_id
        req.user_context.user_id = "gridmr-probe"
        req.plan.command.sql_command.sql = sql
        kinds = [
            resp.WhichOneof("response_type")
            for resp in stub.ExecutePlan(req, timeout=180)
        ]
        all_kinds.extend(kinds)
        ok = ok and "sql_command_result" in kinds
    print("SESSION:" + session_id)
    print("RESPONSES:" + ",".join(str(k) for k in all_kinds))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
