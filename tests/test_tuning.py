"""Spill-aware conf sizing (plans/tuning.py)."""

import pytest
from pyspark.sql import functions as F

from sparkh3.plans import tuning

MIB = 1 << 20
GIB = 1 << 30
TIB = 1 << 40


class TestSizing:
    def test_size_derived_vs_wave_floor(self):
        # tiny shuffle: floored at 3 waves over the cluster
        assert tuning.shuffle_partitions(1 * GIB, 32) == 96
        # big shuffle: size-derived
        assert tuning.shuffle_partitions(100 * GIB, 32) == 800
        # cap binds at the 100 TB point
        assert tuning.shuffle_partitions(100 * TIB, 8000) == 200_000

    def test_monotone_in_bytes(self):
        prev = 0
        for b in (0, 1 * GIB, 1 * TIB, 10 * TIB, 100 * TIB):
            cur = tuning.shuffle_partitions(b, 64)
            assert cur >= prev
            prev = cur

    def test_max_partition_bytes_clamps(self):
        # 64 GiB / 8 cores: 0.6*8GiB/4 = 1.2GiB -> clamp 512MiB
        assert tuning.max_partition_bytes(64 * GIB, 8) == 512 * MIB
        # 512 MiB / 8 cores: 0.6*64MiB/4 = 9.6MiB -> floor 16MiB
        assert tuning.max_partition_bytes(512 * MIB, 8) == 16 * MIB
        with pytest.raises(ValueError):
            tuning.max_partition_bytes(0, 8)
        with pytest.raises(ValueError):
            tuning.shuffle_partitions(-1, 8)

    def test_recommended_conf_100tb(self):
        """The design point in the brief: 1000 executors x 8 cores x
        64 GiB against 100 TB."""
        conf = tuning.recommended_conf(
            100 * TIB, executors=1000, cores_per_executor=8,
            executor_mem_bytes=64 * GIB, shuffle_ratio=0.5,
        )
        n = int(conf["spark.sql.shuffle.partitions"])
        assert 24_000 <= n <= 200_000
        eff = int(conf["sparkh3.effectiveShufflePartitionBytes"])
        # under the cap each partition stays within ~4x the 128MiB target
        assert eff <= 4 * 128 * MIB
        assert conf["spark.sql.adaptive.skewJoin.enabled"] == "true"
        assert "sparkh3.spillRisk" not in conf

    def test_spill_risk_flagged(self):
        conf = tuning.recommended_conf(
            100 * TIB, executors=10, cores_per_executor=8,
            executor_mem_bytes=8 * GIB, shuffle_ratio=1.0,
        )
        assert "sparkh3.spillRisk" in conf

    def test_conf_applies_to_session(self, spark):
        conf = tuning.recommended_conf(
            1 * GIB, executors=1, cores_per_executor=4,
            executor_mem_bytes=4 * GIB,
        )
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            for k, v in conf.items():
                if k.startswith("spark."):
                    spark.conf.set(k, v)
            df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
            # AQE coalesces below the static count; the static count is
            # the configured upper bound
            assert int(spark.conf.get("spark.sql.shuffle.partitions")) == int(
                conf["spark.sql.shuffle.partitions"]
            )
            assert df.count() == 7
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    def test_parse_mem(self):
        assert tuning.parse_mem("4g") == 4 * GIB
        assert tuning.parse_mem("512M") == 512 * MIB
        assert tuning.parse_mem("1024") == 1024
        # JavaUtils grammar: trailing 'b' after a digit means plain bytes
        assert tuning.parse_mem("1024b") == 1024
        assert tuning.parse_mem("8gb") == 8 * GIB
        assert tuning.parse_mem("64kB") == 64 * 1024
