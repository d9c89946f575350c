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


def changes_between(table, spark: SparkSession, from_version: int, to_version: int):
    """Change-data feed between two snapshots: one row per changed
    rowkey with ``_change`` ∈ {insert, update, delete} plus the
    to-version cell values (from-version values for deletes).

    Built on snapshot time travel (ParquetStorage.read(version=N)) —
    a full-outer join of the two immutable snapshots on ``rowkey``,
    so the diff is a single co-partitioned shuffle at any scale and
    never driver-materialized.  The reference has no CDC; its closest
    shape is re-scanning with a time-range filter (Query2.scala:
    493-495), which misses deletes entirely.
    """
    from pyspark.sql import functions as F

    from pyspark.sql import types as T

    st = table.storage
    old = st.read(spark, table.spark_schema(), version=from_version)
    new = st.read(spark, table.spark_schema(), version=to_version)
    data_cols = [c for c in new.columns if c != "rowkey"]

    # comparison twin of the value struct: MapType columns are not
    # orderable (<=> refuses them), so canonicalize each map to a
    # key-sorted entry array — orderable and order-insensitive
    def cmp_struct(df):
        parts = []
        for f in df.schema.fields:
            if f.name == "rowkey":
                continue
            c = F.col(f.name)
            if isinstance(f.dataType, T.MapType):
                c = F.array_sort(F.map_entries(c))
            parts.append(c.alias(f.name))
        return F.struct(*parts)

    o = old.select("rowkey", F.struct(*data_cols).alias("_old"), cmp_struct(old).alias("_oldc"))
    n = new.select("rowkey", F.struct(*data_cols).alias("_new"), cmp_struct(new).alias("_newc"))
    j = o.join(n, "rowkey", "full_outer")
    classified = j.select(
        "rowkey",
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("_change"),
        F.coalesce(F.col("_new"), F.col("_old")).alias("_vals"),
    ).filter(
        # unchanged rows are not part of the feed; null-safe struct
        # compare — plain != yields NULL (row silently dropped) when a
        # cell is null on one side only
        (F.col("_change") != "update") | (~F.col("_oldc").eqNullSafe(F.col("_newc")))
    )
    return classified.select(
        "rowkey", "_change", *[F.col("_vals")[c].alias(c) for c in data_cols]
    )


#: the parquet-meta standing artifacts and their layout-compaction
#: seams: family → (primary data dir, module, compact function).  The
#: ANN families (IVF/PQ/IVFADC, JSON meta + journals) have their own
#: richer pass — similarity.ann_maintain — with a drift monitor; these
#: three are EXACT structures (band rows / bloom bits / HDR counters),
#: so the only maintenance question is file layout.
_STANDING_FAMILIES = {
    "lsh": ("bands", "hpaste_spark.operators.dedup", "compact_lsh_index"),
    "bloom": ("bits", "hpaste_spark.operators.dedup", "compact_bloom_filter"),
    "hdr": ("sketch", "hpaste_spark.operators.sketches", "compact_hdr_baseline"),
}


def standing_artifact_maintain(
    spark: SparkSession,
    path: str,
    family: str,
    max_files_per_dir: int = 64,
    apply: bool = False,
) -> dict:
    """ONE-CALL maintenance pass for the parquet-meta standing
    artifacts (round 13 — `similarity.ann_maintain`'s sibling for the
    LSH band index, Bloom blocklist, and HDR baseline, completing the
    loop story for every standing artifact in the repo): fsck first
    (`artifacts.check_artifact(repair=True)` — clears parked `*_old` /
    `*_compact_tmp` leftovers of a crashed swap; these artifacts'
    appends are journal-free BY DESIGN because their torn states are
    benign — band rows only inflate candidate counts, bloom inserts
    are idempotent, HDR partials are additive), then the small-files
    signal (`artifacts.artifact_stats` file counts on the family's
    data dir — appends add one fragment per delta, and the listing +
    footer-open cost is O(#files) per read), then, when over threshold
    and ``apply=True``, the family's layout compaction — which takes
    its own `append_lock`, rewrites the relation (rows unchanged;
    HDR's rewrite is the idempotent hdr_merge), and swaps rename-aside.

    No drift leg: these are exact structures; there is no geometry to
    go stale (the reason ann_maintain is the richer pass).  Returns
    the ann_maintain-shaped report dict: ``{"family", "fsck",
    "stats", "small_files", "action", "plan", "applied",
    "version_after"}``.
    """
    import importlib

    from hpaste_spark.operators import artifacts

    if family not in _STANDING_FAMILIES:
        raise ValueError(
            f"unknown standing-artifact family {family!r} — one of "
            f"{sorted(_STANDING_FAMILIES)} (ANN indexes use "
            "similarity.ann_maintain)"
        )
    data_dir, mod_name, fn_name = _STANDING_FAMILIES[family]
    fsck = artifacts.check_artifact(
        path, repair=True, max_files_per_dir=max_files_per_dir
    )
    stats = artifacts.artifact_stats(path)
    if data_dir not in stats["data_dirs"]:
        raise ValueError(
            f"artifact at {path} has no {data_dir}/ dir — not a "
            f"{family} artifact (dirs: {sorted(stats['data_dirs'])})"
        )
    small_files = stats["data_dirs"][data_dir] > max_files_per_dir
    action = "compact" if small_files else "none"
    plan = f"{fn_name}(path)" if small_files else "none"
    applied = False
    version_after = None
    if apply and small_files:
        compact = getattr(importlib.import_module(mod_name), fn_name)
        version_after = compact(spark, path)
        applied = True
    return {
        "family": family,
        "fsck": fsck,
        "stats": stats,
        "small_files": small_files,
        "action": action,
        "plan": plan,
        "applied": applied,
        "version_after": version_after,
    }
