"""The decisive compat proof: compile the reference's UNMODIFIED example
mapper/reducer (C++ sources from /root/reference/testdata — read-only, never
copied into this repo) and run them through pipe_job. The result must equal
the DataFrame-native word count, byte-value for byte-value.

Contract being exercised end-to-end: stdin/stdout line pipes, first-tab KV
codec, hash co-location, unsorted concat reducer input, UNION ALL output
(SURVEY.md §2.A A3-A10)."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from gridmr_spark.compat import parse_tab_kv, pipe_job
from gridmr_spark.operators.text import word_count

REF_MAP = "/root/reference/testdata/map.cc"
REF_REDUCE = "/root/reference/testdata/reduce.cc"

needs_ref = pytest.mark.skipif(
    not (shutil.which("g++") and os.path.exists(REF_MAP) and os.path.exists(REF_REDUCE)),
    reason="g++ or reference sources unavailable",
)


@pytest.fixture(scope="module")
def ref_binaries(tmp_path_factory):
    d = tmp_path_factory.mktemp("refbin")
    bins = {}
    for name, src in (("map", REF_MAP), ("reduce", REF_REDUCE)):
        out = str(d / name)
        res = subprocess.run(
            ["g++", "-O2", "-std=c++17", src, "-o", out], capture_output=True
        )
        assert res.returncode == 0, res.stderr.decode()
        bins[name] = out
    return bins


@needs_ref
def test_reference_binaries_via_pipe_job(spark, sf_oracle, ref_binaries):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select("text")
    out = pipe_job(spark, docs, ref_binaries["map"], ref_binaries["reduce"], n_reducers=4)
    piped = {k: int(v) for k, v in parse_tab_kv(r.value for r in out.collect())}
    native = {
        r.word: r.cnt
        for r in word_count(
            spark.read.parquet(f"{sf_oracle}/documents.parquet"), "text"
        ).collect()
    }
    assert piped == native


@needs_ref
@pytest.mark.slow
def test_submit_cli_end_to_end(tmp_path, sf_oracle):
    """Drive the CLI exactly as a reference user would (their .cc sources,
    --compile), in a subprocess, over a text input file."""
    import duckdb

    con = duckdb.connect()
    inp = str(tmp_path / "input.txt")
    con.execute(
        f"COPY (SELECT text FROM read_parquet('{sf_oracle}/documents.parquet') LIMIT 100) "
        f"TO '{inp}' (FORMAT CSV, HEADER false, QUOTE '', DELIMITER E'\\x01')"
    )
    outdir = str(tmp_path / "out")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    res = subprocess.run(
        [
            "python", "-m", "gridmr_spark.compat.cli",
            REF_MAP, REF_REDUCE, inp, outdir,
            "--reducers", "2", "--single-file", "--compile",
        ],
        capture_output=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr.decode()[-1500:]
    parts = [f for f in os.listdir(outdir) if f.startswith("part-")]
    assert len(parts) == 1  # --single-file => final.txt parity
    counts = {}
    with open(os.path.join(outdir, parts[0])) as f:
        for k, v in parse_tab_kv(f):
            counts[k] = counts.get(k, 0) + int(v)
    # independent oracle: plain python word count over the same 100 lines
    import re
    want: dict[str, int] = {}
    with open(inp) as f:
        for line in f:
            for tok in re.sub(r"[^a-zA-Z0-9]+", " ", line).lower().split():
                want[tok] = want.get(tok, 0) + 1
    assert counts == want


def test_reduce_bin_uri_env_override_with_http_fetch(tmp_path, spark):
    """MR_REDUCE_BIN_URI parity (reference reducer.cc:71: envOr overrides the
    submitted reducer binary): the CLI must honor the env var, fetching an
    http:// reducer through the same addFile channel the reference's curl
    fetch occupies (fs.cc:42-47)."""
    import http.server
    import socketserver
    import threading

    from gridmr_spark.compat.cli import resolve_binary

    # a reducer that tags its output so we can prove IT ran
    (tmp_path / "tagged_reduce.py").write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "acc = {}\n"
        "for line in sys.stdin:\n"
        "    line = line.rstrip('\\n')\n"
        "    i = line.find('\\t')\n"
        "    if i == -1: continue\n"
        "    acc[line[:i]] = acc.get(line[:i], 0) + int(line[i+1:])\n"
        "for k, s in acc.items():\n"
        "    print(f'{k}\\t{s}')\n"
        "print('__override_ran__\\t1')\n"
    )

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), Handler) as httpd:
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            uri = f"http://127.0.0.1:{port}/tagged_reduce.py"
            local = resolve_binary(spark, uri)
            assert os.path.exists(local) and os.access(local, os.X_OK)
            # env-var override path, exactly as main() consults it
            env_reduce = os.environ.get("MR_REDUCE_BIN_URI", "ignored_default")
            assert env_reduce == "ignored_default"  # not set -> falls back
            os.environ["MR_REDUCE_BIN_URI"] = uri
            try:
                chosen = os.environ.get("MR_REDUCE_BIN_URI", "ignored_default")
                assert chosen == uri
                from gridmr_spark.compat.mapreduce import pipe_job, parse_tab_kv

                data = spark.createDataFrame([("a b a",), ("b c",)], ["value"])
                mapper = tmp_path / "map.sh"
                mapper.write_text(
                    '#!/bin/sh\ntr " " "\\n" | while read -r w; do '
                    '[ -n "$w" ] && printf "%s\\t1\\n" "$w"; done\n'
                )
                os.chmod(mapper, 0o755)
                out = pipe_job(
                    spark, data, str(mapper),
                    f"python3 {resolve_binary(spark, chosen)}", n_reducers=2,
                )
                counts = dict(parse_tab_kv(r.value for r in out.collect()))
                assert counts.get("__override_ran__") is not None  # override executed
                assert int(counts["a"]) == 2 and int(counts["b"]) == 2
            finally:
                del os.environ["MR_REDUCE_BIN_URI"]
        finally:
            httpd.shutdown()
