"""LIVE Spark Connect round-trip for the remote submit contract
(compat/remote.py) — closing the round-6/7 coverage gap ("no grpcio in
container") with the machinery tools/probe_grpc.py found: the Google
Cloud SDK's bundled CPython 3.12 ships a compiled grpcio, and its two
vendored protobuf trees assemble into a runtime for pyspark's generated
Connect protos (tools/connect_probe_client.py documents the full chain).

The test starts a REAL local Connect server (the same
spark-connect_2.13 jar a cluster runs), submits the reference's builtin
wordcount job shape over the REAL gRPC wire from a separate interpreter,
and byte-checks the output the server wrote — the submit→execute→output
path of HttpJobServer.java:27-82, which compat/remote.submit_job maps
onto Connect, exercised end to end. Client-side result fetch stays
server-side (INSERT OVERWRITE DIRECTORY) because the bundled 3.12 has no
pyarrow; that matches the reference contract anyway (results land at
output_uri, A10/A11).

Everything is probed and the whole module skips cleanly on a normally
provisioned machine (where `pip install grpcio` makes compat/remote.py
itself live-testable instead).
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import sys
import time

import pytest

_BUNDLED_PY = (
    "/usr/lib/google-cloud-sdk/platform/bundledpythonunix/bin/python3"
)
_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_CLOUDSDK_PB = (
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_python_dir() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _have_pieces() -> str | None:
    if not os.path.exists(_BUNDLED_PY):
        return "no bundled python3.12"
    if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
        return "no vendored protobuf runtime"
    for wkt in ("any_pb2.py", "timestamp_pb2.py"):
        if not os.path.exists(os.path.join(_CLOUDSDK_PB, wkt)):
            return f"no vendored {wkt}"
    probe = subprocess.run(
        [_BUNDLED_PY, "-c", "import grpc; print(grpc.__version__)"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    if probe.returncode != 0:
        return "bundled python has no importable grpc"
    return None


_SKIP = _have_pieces()
pytestmark = pytest.mark.skipif(
    _SKIP is not None, reason=f"live Connect pieces absent: {_SKIP}"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def connect_server():
    """A real local Spark Connect server (JVM-side gRPC, no Python deps)."""
    spark_py = _spark_python_dir()
    port = _free_port()
    env = dict(os.environ, SPARK_HOME=spark_py)
    proc = subprocess.Popen(
        [
            os.path.join(spark_py, "bin", "spark-submit"),
            "--master", "local[4]",
            "--class",
            "org.apache.spark.sql.connect.service.SparkConnectServer",
            "--conf", f"spark.connect.grpc.binding.port={port}",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "spark-internal",
        ],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            with socket.socket() as s:
                s.settimeout(1)
                if s.connect_ex(("localhost", port)) == 0:
                    break
            if proc.poll() is not None:
                pytest.fail("connect server exited during startup")
            time.sleep(1)
        else:
            pytest.fail("connect server never bound its port")
        yield port
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.slow
def test_live_wordcount_submit_roundtrip(connect_server, tmp_path):
    port = connect_server
    # synthetic proto tree: empty parents + symlink to pyspark's generated
    # Connect protos, importable without pyspark's pandas/pyarrow chain
    tree = tmp_path / "prototree"
    pkg = tree / "pyspark" / "sql" / "connect"
    pkg.mkdir(parents=True)
    for d in (tree / "pyspark", tree / "pyspark" / "sql", pkg):
        (d / "__init__.py").touch()
    os.symlink(
        os.path.join(_spark_python_dir(), "sql", "connect", "proto"),
        pkg / "proto",
    )

    inp = tmp_path / "input.txt"
    inp.write_text("hello world\nhello spark connect!\nworld of spark\n")
    out = tmp_path / "out"
    # the builtin wordcount job's semantics (compat normalize+tokenize =
    # map.cc:12-21): lowercase, non-alnum -> space, split, count
    sql = f"""
INSERT OVERWRITE DIRECTORY '{out}' USING csv OPTIONS (delimiter '\\t')
SELECT word, count(*) AS cnt FROM (
  SELECT explode(filter(split(lower(regexp_replace(value, '[^a-zA-Z0-9]+', ' ')), ' '), x -> x != '')) AS word
  FROM text.`{inp}`
) GROUP BY word
"""
    sql_file = tmp_path / "job.sql"
    sql_file.write_text(sql)
    res = subprocess.run(
        [
            _BUNDLED_PY,
            os.path.join(_REPO, "tools", "connect_probe_client.py"),
            "--port", str(port),
            "--sql-file", str(sql_file),
            "--proto-tree", str(tree),
            "--appengine", _APPENGINE,
            "--cloudsdk-protobuf", _CLOUDSDK_PB,
        ],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "sql_command_result" in res.stdout

    got = {}
    for f in os.listdir(out):
        if f.endswith(".csv"):
            for line in (out / f).read_text().splitlines():
                w, c = line.split("\t")
                got[w] = int(c)
    expected: dict[str, int] = {}
    import re

    for w in re.sub(r"[^a-zA-Z0-9]+", " ", inp.read_text()).lower().split():
        expected[w] = expected.get(w, 0) + 1
    assert got == expected


def test_probe_tool_reports_vendorable():
    """The committed probe evidence: on THIS machine the probe finds the
    bundled grpc; elsewhere it must still run and emit a verdict."""
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        from probe_grpc import probe
    finally:
        sys.path.pop(0)
    res = probe()
    assert res["verdict"] in ("vendorable", "absent")
    assert res["verdict"] == "vendorable"  # this container, per _have_pieces
    assert shutil.which("python3")  # sanity: tool is environment-only


def _read_tab_counts(out_dir) -> dict:
    got = {}
    for f in os.listdir(out_dir):
        if f.endswith(".csv") or f.endswith(".txt"):
            with open(os.path.join(out_dir, f)) as fh:
                for line in fh.read().splitlines():
                    w, c = line.split("\t")
                    got[w] = int(c)
    return got


def test_submit_job_live_delegated(connect_server, tmp_path):
    """THE shipped client, live: compat/remote.submit_job itself (not just
    the probe tool) runs the full reference submit contract —
    parse -> desired_maps mapping -> SQL render -> gRPC ExecutePlan ->
    output byte-check — against a real Connect server, via the delegated
    transport this grpc-less interpreter auto-selects."""
    from gridmr_spark.compat import remote

    inp = tmp_path / "input.txt"
    inp.write_text("hello world\nhello spark connect!\nworld of spark\n")
    out = tmp_path / "out"
    res = remote.submit_job(
        f"sc://localhost:{connect_server}",
        input_uris=str(inp),
        n_reducers=2,
        map_bin_uri="wordcount",
        reduce_bin_uri="wordcount",
        output_uri=str(out),
        desired_maps=2,
        min_workers=3,  # recorded-as-ignored scheduling hint
    )
    assert res["status"] == "completed"
    assert res["transport"] == "delegated"
    assert res["ignored"].get("min_workers") == 3
    import re
    import uuid as _uuid

    _uuid.UUID(res["job_id"])  # the job handle is the Connect session id
    expected: dict[str, int] = {}
    for w in re.sub(r"[^a-zA-Z0-9]+", " ", inp.read_text()).lower().split():
        expected[w] = expected.get(w, 0) + 1
    assert _read_tab_counts(out) == expected


def test_submit_job_multi_input_union(connect_server, tmp_path):
    """Several input_uris (the reference's csv input list) union into one
    job, and n_reducers=1 yields a single output partition file."""
    from gridmr_spark.compat import remote

    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("red green blue\n")
    b.write_text("green blue blue\n")
    out = tmp_path / "out"
    res = remote.submit_job(
        f"sc://localhost:{connect_server}",
        input_uris=f"{a},{b}",
        n_reducers=1,
        map_bin_uri="wordcount",
        reduce_bin_uri="wordcount",
        output_uri=str(out),
    )
    assert res["status"] == "completed"
    assert _read_tab_counts(out) == {"red": 1, "green": 2, "blue": 3}
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1  # REPARTITION(1) honored
