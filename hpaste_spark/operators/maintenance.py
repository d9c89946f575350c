"""Table-maintenance operators: TTL vacuum and snapshot compaction.

Reference: per-family ``rowTtlInSeconds`` (HbaseTable.scala:288) is an
HBase storage-config no-op for us (SURVEY §1.4) — the behavioral
equivalent is a vacuum job that drops expired cells based on their
write timestamps, run on whatever schedule the deployment wants.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vacuum_ttl(table, spark: SparkSession, now: _dt.datetime | None = None) -> int:
    """Drop cells older than each family's TTL; rows that lose every
    cell disappear.  Returns the new snapshot version (0 = no TTLs
    declared, nothing to do)."""
    ttl_fams = [f for f in table.families.values() if f.row_ttl_seconds]
    if not ttl_fams:
        return 0
    now = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    df = table.to_df(spark)

    def _fresh(cutoff):
        return lambda k, ts: ts >= F.lit(cutoff)

    def _key_in(keys_col):
        return lambda k, v: F.array_contains(keys_col, k)

    for fam in table.families.values():
        cutoff = (
            now - _dt.timedelta(seconds=fam.row_ttl_seconds) if fam.row_ttl_seconds else None
        )
        if cutoff is None:
            continue
        ts_col = F.col(fam.ts_name)
        keep_ts = F.map_filter(ts_col, _fresh(cutoff))
        if fam.is_map_family:
            df = df.withColumn(fam.name, F.map_filter(F.col(fam.name), _key_in(F.map_keys(keep_ts))))
        else:
            for c in fam.columns.values():
                cell_ts = F.element_at(ts_col, c.qualifier)
                df = df.withColumn(
                    c.qualifier,
                    F.when(cell_ts.isNull() | (cell_ts >= F.lit(cutoff)), F.col(c.qualifier)),
                )
        df = df.withColumn(fam.ts_name, keep_ts)
    # drop rows with no live cells left
    alive = None
    for fam in table.families.values():
        fam_alive = (
            F.size(F.coalesce(F.col(fam.name), F.map_from_arrays(F.array(), F.array()))) > 0
            if fam.is_map_family
            else None
        )
        if not fam.is_map_family:
            for c in fam.columns.values():
                term = F.col(c.qualifier).isNotNull()
                fam_alive = term if fam_alive is None else (fam_alive | term)
        if fam_alive is not None:
            alive = fam_alive if alive is None else (alive | fam_alive)
    if alive is not None:
        df = df.filter(alive)
    return table.overwrite(df)


def compact(table, spark: SparkSession, num_files: int | None = None) -> int:
    """Rewrite the current snapshot with a target file count (the HBase
    major-compaction analog; small-file cleanup after many merge
    batches)."""
    df = table.to_df(spark)
    if num_files:
        df = df.repartition(num_files)
    return table.overwrite(df)
