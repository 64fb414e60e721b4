"""Sources & sinks (SURVEY.md §2.D row 1 + §2.A A1/A2/A10 parity).

The reference reads line-oriented text from a shared POSIX filesystem
(fs.cc:42-53) with client-side ~N MB line-safe splits
(tools/gridmr_submit.py:22-54) and concatenates reducer outputs into one
final.txt (ControlServiceImpl.java:397-427). Spark subsumes all of it:
any Hadoop-compatible FS, automatic line-safe split planning via
maxPartitionBytes, and directory-of-parts output with an explicit
single-file compat flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_text(
    spark: SparkSession, path: str, chunk_mb: int | None = None
) -> DataFrame:
    """Line-oriented text scan: DataFrame[value: string], one row per line.

    chunk_mb mirrors GRIDMR_CHUNK_SIZE_MB (A1): it sets the scan split size
    (maxPartitionBytes). Spark's splits are line-safe by construction —
    records spanning split boundaries are handled by the reader, so the
    reference's client-side splitter is unnecessary.

    http(s):// URIs are accepted for A2 parity (the reference curl-fetches
    split inputs, cpp/worker/src/common/fs.cc:42-47): the file is fetched
    once via sc.addFile — which distributes it to every executor's
    SparkFiles root — then scanned like any local file. Meant for modest
    side inputs, exactly like the reference's per-split fetch; bulk data
    belongs on a shared FS/object store.
    """
    if path.startswith(("http://", "https://")):
        path = _fetch_url(spark, path)
    if chunk_mb is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(chunk_mb * 1024 * 1024))
    return spark.read.text(path)


def _fetch_url(spark: SparkSession, url: str) -> str:
    """Fetch an http(s) URI through Spark's file-distribution channel
    (sc.addFile handles the download + cluster-wide distribution; executors
    resolve the same name via SparkFiles.get). Returns a file: path usable
    by any reader. Repeated adds of the same URL are idempotent per session.
    """
    from pyspark import SparkFiles

    sc = spark.sparkContext
    name = url.rstrip("/").rsplit("/", 1)[-1] or "download"
    sc.addFile(url)
    local = SparkFiles.get(name)
    return f"file://{local}"


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    """CSV with explicit schema preferred (inferSchema double-scans at scale)."""
    opts = {"header": "true", **options}
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    """JSON-lines; pass a schema in production (inference scans everything)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Directory-of-parts by default (the scalable norm). single_file=True is
    the explicit GridMR final.txt compat flag (A10) — coalesce(1) serializes
    the write through one task, only sane for small outputs."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(path)
