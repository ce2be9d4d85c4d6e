"""Bucketed-layout plan gates: joins and aggregations over tables written
with `storage.write_bucketed` must read co-located buckets — zero
exchanges on the bucketed key, and zero sorts when the buckets are
written sorted. This is the write-once-shuffle-never posture for the
repeated fact-fact joins of a 100 TB workload (storage.py docstring)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stateflow_spark.catalog import load
from stateflow_spark.storage import read_bucketed, write_bucketed
from tests.conftest import SF_DIR
from tests.test_plans import explain_str

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """lineitem + orders bucketed (and in-bucket sorted) on orderkey.

    Sorted-bucket scans only report their ordering to the planner under
    spark.sql.legacy.bucketedTableScan.outputOrdering (off by default
    since 3.0 because multi-file buckets would still need a merge);
    write_bucketed guarantees one file per bucket, which is exactly the
    layout the flag is safe and profitable for — see storage.py."""
    prev = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        load(spark, SF_DIR, "lineitem"),
        "li_b",
        ["l_orderkey"],
        N_BUCKETS,
        str(base / "li"),
        sort_keys=["l_orderkey"],
    )
    write_bucketed(
        load(spark, SF_DIR, "orders"),
        "ord_b",
        ["o_orderkey"],
        N_BUCKETS,
        str(base / "ord"),
        sort_keys=["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev)


def test_bucketed_join_no_exchange_no_sort(spark, bucketed):
    """Same bucket count + same key on both sides: the sort-merge join
    streams straight off the bucket files — no Exchange, no Sort."""
    li = read_bucketed(spark, "li_b")
    # at sf0.001 orders is broadcast-sized so Spark would pick BHJ; the
    # merge hint reproduces the 100 TB planner choice (both sides too big
    # to broadcast) that bucketing exists to serve
    ords = read_bucketed(spark, "ord_b").hint("merge")
    j = li.join(ords, li.l_orderkey == ords.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderdate"
    )
    plan = explain_str(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # in-bucket sortBy satisfies the SMJ's ordering requirement too
    assert "(\n) Sort" not in plan and " Sort " not in plan, plan
    # and the result is the same join Spark computes from raw parquet
    raw = load(spark, SF_DIR, "lineitem").join(
        load(spark, SF_DIR, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert j.count() == raw.count()


def test_bucketed_groupby_no_exchange(spark, bucketed):
    """Aggregation on the bucket key reuses the on-disk partitioning: the
    final HashAggregate runs directly over the scan."""
    agg = (
        read_bucketed(spark, "li_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = explain_str(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == (
        load(spark, SF_DIR, "lineitem").select("l_orderkey").distinct().count()
    )


def test_unbucketed_baseline_does_shuffle(spark, bucketed):
    """Control: the identical join from raw parquet carries two exchanges —
    the cost bucketing moved to write time."""
    li = load(spark, SF_DIR, "lineitem")
    ords = load(spark, SF_DIR, "orders")
    plan = explain_str(
        li.join(ords, li.l_orderkey == ords.o_orderkey).select(
            "l_orderkey", "o_orderdate"
        )
    )
    assert "Exchange" in plan


def test_partitioned_layout_prunes_scan(spark, tmp_path):
    """A date predicate over a date-partitioned layout must become a
    PartitionFilter (directory pruning), reading exactly the matching
    partitions — never a row filter over the full scan."""
    from stateflow_spark.storage import write_partitioned

    e = load(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    write_partitioned(e, path, ["event_date"])

    n_days = e.select("event_date").distinct().count()
    one_day = e.agg(F.min("event_date")).first()[0]
    q = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one_day))
    plan = explain_str(q)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in pf[0], plan
    # the scan's file index selects 1 of n_days partitions
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:  # partition count printed by the file index (version-dependent)
        assert int(m.group(1)) == 1, plan
    assert n_days > 1
    assert q.count() == e.filter(F.col("event_date") == F.lit(one_day)).count()


def test_lsh_index_layout_probe_is_partition_pruned(spark, tmp_path):
    """The stored form of sim_hyperplane_lsh: precompute each vector's 3
    band signatures ONCE, store the banded table (3 rows per vector)
    hive-partitioned by (band, sig), and a query probe — 3 (band, sig)
    lookups — becomes pure partition pruning: it reads 3 directories of
    the 3×16 and decodes nothing else. This is the 'signatures are
    computed once and stored as the bucketing layout' posture the inline
    query's docstring promises, demonstrated."""
    from pyspark.sql import functions as FF

    from stateflow_spark.queries.similarity import _SRP_BANDS, _srp_band_sig
    from stateflow_spark.storage import write_partitioned

    corpus = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", FF.col("embedding").cast("array<double>").alias("v"))
    )
    banded = None
    for b in range(_SRP_BANDS):
        part = corpus.select(
            "vec_id", FF.lit(b).alias("band"), _srp_band_sig(b).alias("sig")
        )
        banded = part if banded is None else banded.unionByName(part)
    path = str(tmp_path / "lsh_index")
    write_partitioned(banded, path, ["band", "sig"])

    qsigs = {
        b: corpus.filter(FF.col("vec_id") == 0)
        .select(_srp_band_sig(b).alias("s"))
        .first()
        .s
        for b in range(_SRP_BANDS)
    }
    idx = spark.read.parquet(path)
    probe_pred = None
    for b, s in qsigs.items():
        m = (FF.col("band") == b) & (FF.col("sig") == s)
        probe_pred = m if probe_pred is None else (probe_pred | m)
    probe = idx.filter(probe_pred)
    plan = explain_str(probe)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "band" in pf[0] and "sig" in pf[0], plan
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:
        assert int(m.group(1)) <= _SRP_BANDS, plan
    # the probed candidate set equals the inline query's band-match set
    inline = (
        corpus.select(
            "vec_id",
            *[_srp_band_sig(b).alias(f"s{b}") for b in range(_SRP_BANDS)],
        )
        .filter(
            (FF.col("s0") == qsigs[0])
            | (FF.col("s1") == qsigs[1])
            | (FF.col("s2") == qsigs[2])
        )
        .select("vec_id")
        .distinct()
    )
    got = {r.vec_id for r in probe.select("vec_id").distinct().collect()}
    want = {r.vec_id for r in inline.collect()}
    assert got == want


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    from stateflow_spark.storage import compact

    path = str(tmp_path / "fragmented")
    e = load(spark, SF_DIR, "events")
    e.repartition(64).write.mode("overwrite").parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 32  # genuinely fragmented
    checksum_before = spark.read.parquet(path).agg(
        F.sum("event_id"), F.count("*")
    ).first()
    n = compact(spark, path, target_file_bytes=1 << 30)
    after = len(glob.glob(path + "/*.parquet"))
    assert after == n == 1
    assert spark.read.parquet(path).agg(
        F.sum("event_id"), F.count("*")
    ).first() == checksum_before


def test_compaction_recovers_from_crashed_swap(spark, tmp_path):
    """A stale `.old` from a crashed prior compaction must not wedge the
    next one (round-5 ADVICE)."""
    from stateflow_spark.storage import compact

    path = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(path)
    os.makedirs(path + ".old")
    spark.range(1).write.mode("overwrite").parquet(path + ".old")
    compact(spark, path, target_file_bytes=1 << 30)
    assert spark.read.parquet(path).count() == 100
    assert not os.path.isdir(path + ".old")


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order clustering on (user_id, hour) must make parquet footer
    min/max stats selective on BOTH columns. On a 256×256 grid split
    into 16 z-range files, each file is a compact curve tile covering
    ~1/4 of each dimension's range — so a point predicate on user_id
    admits ~25% of files, where the time-sorted baseline admits 100%
    (every file spans all users). Footer stats are read directly with
    pyarrow — exactly the information Spark's parquet reader uses to
    skip row groups."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from stateflow_spark.storage import write_zordered

    side = 256
    grid = (
        spark.range(side * side)
        .select(
            (F.col("id") % side).alias("user_id"),
            (F.col("id") / side).cast("bigint").alias("hour"),
        )
        .withColumn("value", (F.col("user_id") * 7 + F.col("hour")).cast("double"))
    )
    n_files = 16

    zpath = str(tmp_path / "zorder")
    write_zordered(grid, zpath, "user_id", "hour", n_files, bits=8)
    tpath = str(tmp_path / "timesorted")
    (
        grid.repartitionByRange(n_files, "hour")
        .sortWithinPartitions("hour")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    def admit_fraction(path, column, values):
        files = glob.glob(path + "/*.parquet")
        assert len(files) >= n_files // 2, files
        total = 0
        for v in values:
            hits = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                idx = md.schema.names.index(column)
                admits = any(
                    md.row_group(rg).column(idx).statistics.min
                    <= v
                    <= md.row_group(rg).column(idx).statistics.max
                    for rg in range(md.num_row_groups)
                )
                hits += admits
            total += hits / len(files)
        return total / len(values)

    users = [3, 64, 130, 200, 255]
    z_user = admit_fraction(zpath, "user_id", users)
    t_user = admit_fraction(tpath, "user_id", users)
    # time-sorted: every file spans the whole user range; z-order: a
    # point user hits only the curve tiles containing that user's rows
    assert t_user > 0.9, t_user
    assert z_user < 0.5, z_user

    # and the z-layout still prunes on hour (both dims clustered), where
    # pruning on the time-sorted layout is perfect by construction
    hours = [0, 100, 255]
    z_hour = admit_fraction(zpath, "hour", hours)
    assert z_hour < 0.5, z_hour

    # round-trip: the layout reorders, never loses rows
    assert spark.read.parquet(zpath).count() == side * side


def test_star_join_dynamic_partition_pruning(spark, tmp_path):
    """Star-schema join against a hive-partitioned fact table: a selective
    dim-side filter must prune fact PARTITIONS AT RUNTIME (dynamic
    partition pruning — the broadcast's key set becomes a partition
    filter on the fact scan). At 100 TB this is the difference between
    scanning 3 date partitions and scanning all 20; static pruning
    (test_partitioned_layout_prunes_scan) cannot see a filter that only
    exists on the other join side."""
    fact = spark.range(0, 20_000).selectExpr(
        "id", "CAST(id % 20 AS INT) AS dk", "id * 2 AS v"
    )
    fact.write.partitionBy("dk").mode("overwrite").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.range(0, 20).selectExpr(
        "CAST(id AS INT) AS dk",
        "CASE WHEN id < 3 THEN 'keep' ELSE 'drop' END AS flag",
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("flag") == "keep")
    j = f.join(d, "dk").groupBy("dk").agg(F.sum("v").alias("sv"))

    plan = explain_str(j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning is REAL: only the 3 surviving partitions' rows flow
    rows = j.collect()
    assert {r.dk for r in rows} == {0, 1, 2}
    assert all(r.sv > 0 for r in rows)
