"""Parquet/Iceberg table IO behind one seam.

The reference persists every frame to an HDF5 store with selectable
compression (``write_dqm_dataframes.py:17-18,61-62``) and re-reads by
key (``read_dqm_dataframes.py:16-33``).  Here: partitioned
parquet-or-Iceberg tables.  In the sandbox there is no Iceberg catalog
jar, so ``format='parquet'`` is the default; the write path is
partition-atomic either way (parquet: directory-per-partition rename;
Iceberg: snapshot commit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
    codec: str = "zstd",
) -> None:
    """Append/overwrite a partitioned table.

    ``mode='append'`` is the reference's ``--append``; ``'overwrite'``
    is ``--force`` (write_dqm_dataframes.py:24-33).  With
    ``partitionOverwriteMode=dynamic`` an overwrite only replaces the
    partitions present in ``df`` — the Iceberg
    ``overwritePartitions()`` semantic on plain parquet.
    """
    w = df.write.option("compression", codec).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def table_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:  # noqa: BLE001 — AnalysisException: path not found
        return False
