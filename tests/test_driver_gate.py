"""Emulates the DRIVER's correctness-gate canonicalizer (not our own
``gridmr_spark.testing`` one): the driver pulls both sides into pandas,
``sort_values`` over every column, and value-hashes dtype-sensitively.

Round-1 lessons this file guards against regressing:
- array/map-typed output columns crash ``sort_values``
  ("unhashable type: 'list'") and the whole row errors instead of passing;
- DuckDB wide types (HUGEINT from SUM(CASE...), DECIMAL) land in pandas as
  float64/object while Spark emits int64 — equal values, different hash.

So: every registered query's Spark output must be pandas-sortable, and for
oracle queries the pandas string form of both sides must match exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gridmr_spark.queries import load_all

REG = load_all()
ALL_NAMES = sorted(REG)
ORACLE_NAMES = sorted(n for n, q in REG.items() if q.oracle is not None)


def _driver_canon(pdf: pd.DataFrame) -> list[str]:
    """The driver's canonical form, as closely as we can emulate it:
    columns sorted by name, rows sorted by every column (this is the step
    that throws on unhashable cells), then each cell rendered through its
    pandas dtype (this is the step that is dtype-sensitive)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    pdf = pdf.sort_values(cols).reset_index(drop=True)  # raises on list/dict cells
    out = []
    for _, row in pdf.iterrows():
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NaT:
                cells.append("NULL")
            elif isinstance(v, pd.Timestamp):
                cells.append(v.isoformat())
            elif isinstance(v, np.floating):
                cells.append(repr(float(v)))
            elif isinstance(v, np.integer):
                cells.append(repr(int(v)))
            else:
                cells.append(repr(v))
        out.append("\x1f".join(cells))
    return sorted(out)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_spark_output_is_driver_canonicalizable(spark, sf_oracle, name):
    """Every query's output (oracle or rows-only) must survive the driver's
    pandas sort — no array/map/struct cells in the output schema."""
    pdf = REG[name].fn(spark, sf_oracle).toPandas()
    _driver_canon(pdf)  # must not raise


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_pandas_value_forms_match(spark, duck, sf_oracle, name):
    """Both sides rendered through pandas (the driver's path) must agree —
    catches dtype artifacts (HUGEINT->float64, DECIMAL->object) that our
    collect()-based gate in testing.py normalizes away."""
    q = REG[name]
    spdf = q.fn(spark, sf_oracle).toPandas()
    dpdf = duck.execute(q.oracle).df()
    assert _driver_canon(spdf) == _driver_canon(dpdf), name
