"""Physical-layout writers — the IO side of the 100 TB stance.

Two problems every petabyte-scale lake hits:

 * **Data skipping.** Parquet row-group min/max statistics only prune
   scans when values are clustered within files. Writing partitioned
   by a categorical column and SORTED by the range-predicate column
   (``write_partitioned_sorted``) turns ``WHERE event_type = 'x' AND
   ts BETWEEN ...`` into (a) partition pruning (directory level) plus
   (b) row-group skipping (footer stats level) — the scan reads a
   sliver of the bytes. This is the Hive-partition + ZORDER-lite
   layout discipline, expressed with plain ``partitionBy`` +
   ``sortWithinPartitions`` so Catalyst and any parquet reader benefit
   with no table-format dependency.

 * **Small files.** Streaming ingest and per-batch appends produce
   thousands of KB-sized files; at scale the NameNode/listing and
   per-file open costs dwarf the data. ``compact_parquet`` rewrites a
   directory to ~``target_rows_per_file`` files (size-estimated from
   the source), preserving an optional sort so compaction does not
   destroy the skipping layout.

Both are pure DataFrame writers — no driver-side row handling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_by`` with each
    output file sorted on ``sort_by``.

    ``repartitionByRange(partition cols + sort cols)`` routes each
    task a CONTIGUOUS slice of the sort-key space within its partition
    value (a hash salt would spread each file across the full range —
    sorting inside the file cannot tighten its min/max after that), so
    each parquet file carries a tight, near-disjoint min/max range on
    ``sort_by`` and range predicates skip whole files/row groups.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in partition_by + sort_by]
    if files_per_partition > 1:
        n_parts = df.select(*partition_by).distinct().count()
        staged = df.repartitionByRange(n_parts * files_per_partition, *cols)
    else:
        staged = df.repartition(*[F.col(c) for c in partition_by])
    staged = staged.sortWithinPartitions(*(partition_by + sort_by))
    staged.write.mode(mode).partitionBy(*partition_by).parquet(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a (possibly fragmented) parquet directory into
    ``ceil(rows / target_rows_per_file)`` files; returns the file
    count written. ``sort_by`` re-sorts within each output file so
    compaction preserves (or establishes) the skipping layout.

    The row count comes from parquet footers (a metadata-only job) —
    the data itself is read exactly once, by the rewrite.
    """
    df = spark.read.parquet(in_path)
    n_rows = df.count()  # footer-only: count(*) over parquet uses metadata
    n_files = max(1, -(-n_rows // target_rows_per_file))
    if sort_by:
        # range partitioning keeps output files' sort-key ranges
        # DISJOINT (hash would interleave them and void the footer
        # stats), then sorts inside each file
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


def parquet_file_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` per data file under ``path`` —
    the footer statistics a reader's row-group pruning consults.
    Test/audit helper (pyarrow, driver-side metadata only)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(root, fn)
            md = pq.ParquetFile(fp).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics is not None:
                        s = col.statistics
                        lo = s.min if lo is None or s.min < lo else lo
                        hi = s.max if hi is None or s.max > hi else hi
            out.append((fp, lo, hi))
    return out
