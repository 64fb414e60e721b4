"""Interpreter-startup bootstrap for Python workers (see compat/pbshim.py).

This directory is appended to PYTHONPATH by ``pbshim.ensure_protobuf()`` so
that every Python process the Spark JVM forks (pyspark.daemon / workers /
the transformWithState driver worker) runs the protobuf bootstrap before
any pyspark generated proto imports. The stdlib ``site`` module imports
``sitecustomize`` from ``sys.path`` at startup; failures here must never
break an interpreter, hence the blanket guard."""

try:
    import importlib.util
    import os

    # Load pbshim.py by FILE PATH, not as gridmr_spark.compat.pbshim: the
    # package __init__ imports pyspark, which has no business running at
    # interpreter startup of every forked worker.
    _pbshim_py = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "pbshim.py"
    )
    _spec = importlib.util.spec_from_file_location("_gridmr_pbshim", _pbshim_py)
    _mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    _mod._bootstrap_current_process()
except Exception:  # pragma: no cover - never break interpreter startup
    pass
