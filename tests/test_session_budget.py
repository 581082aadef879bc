"""rows_per_task_budget (round 11, VERDICT r10 item 2): the memory-
derived replacement for the hard-coded '~8M rows/task' fused-stage
sizing literal. The derivation must be pinned exactly — a silent change
here re-sizes every staged iterative query's bucket layout."""

from __future__ import annotations

from makerdao_dw_spark import session as S


class _FakeConf:
    def __init__(self, d):
        self._d = d

    def get(self, k, default=None):
        return self._d.get(k, default)


class _FakeSC:
    def __init__(self, master, conf, parallelism=1):
        self.master = master
        self._conf = conf
        self.defaultParallelism = parallelism

    def getConf(self):
        return self._conf


class _FakeSpark:
    def __init__(self, sc):
        self.sparkContext = sc


def _expected(heap_bytes, slots, row_bytes, fraction=0.6, floor=1_000_000):
    usable = heap_bytes - 300 * (1 << 20)
    per_task = usable * fraction / slots / S._FUSED_STAGE_CONSUMERS
    return max(floor, int(per_task // row_bytes))


def test_mem_bytes_parsing():
    assert S._mem_bytes("8g") == 8 * (1 << 30)
    assert S._mem_bytes("512m") == 512 * (1 << 20)
    assert S._mem_bytes("48G") == 48 * (1 << 30)
    assert S._mem_bytes("1536mb") == 1536 * (1 << 20)
    assert S._mem_bytes("2t") == 2 * (1 << 40)
    assert S._mem_bytes("1048576") == 1048576  # bare numbers are bytes
    assert S._mem_bytes("1.5g") == int(1.5 * (1 << 30))


def test_budget_local_master_uses_driver_memory():
    """Under local[*] the executor IS the driver JVM: heap comes from
    spark.driver.memory, concurrency from defaultParallelism."""
    fake = _FakeSpark(
        _FakeSC("local[32]", _FakeConf({"spark.driver.memory": "48g"}), 32)
    )
    got = S.rows_per_task_budget(fake, 24)
    assert got == _expected(48 * (1 << 30), 32, 24)
    # the sf100-harness calibration point: ~9.5M rows of 24-byte state,
    # inside the measured-safe regime (8-9M completes; 37.5M OOMs) and
    # far under the naive pool math (~38M) that the fused-stage divisor
    # corrects for
    assert 8_000_000 <= got <= 11_000_000, got


def test_budget_cluster_master_uses_executor_memory_and_cores():
    fake = _FakeSpark(
        _FakeSC(
            "yarn",
            _FakeConf(
                {
                    "spark.executor.memory": "16g",
                    "spark.executor.cores": "4",
                    "spark.task.cpus": "2",
                }
            ),
            200,  # cluster-wide parallelism must be IGNORED here
        )
    )
    # 2 concurrent tasks per executor (4 cores / 2 cpus per task)
    assert S.rows_per_task_budget(fake, 24) == _expected(16 * (1 << 30), 2, 24)


def test_budget_floor_keeps_tiny_heaps_sane():
    """A 1g vanilla-driver session must not explode the bucket count:
    below the floor, spilling a few MB beats thousands of buckets."""
    fake = _FakeSpark(_FakeSC("local[32]", _FakeConf({}), 32))  # 1g default
    assert S.rows_per_task_budget(fake, 24) == 1_000_000
    # and the floor is overridable
    assert S.rows_per_task_budget(fake, 24, floor=10) == _expected(
        1 << 30, 32, 24, floor=10
    )


def test_budget_respects_memory_fraction_conf():
    fake = _FakeSpark(
        _FakeSC(
            "local[8]",
            _FakeConf({"spark.driver.memory": "8g", "spark.memory.fraction": "0.3"}),
            8,
        )
    )
    assert S.rows_per_task_budget(fake, 24) == _expected(
        8 * (1 << 30), 8, 24, fraction=0.3
    )


def test_budget_on_real_session(spark):
    """The helper must run against a live session and scale inversely
    with row width (its only data-dependent input)."""
    b24 = S.rows_per_task_budget(spark, 24)
    b48 = S.rows_per_task_budget(spark, 48)
    assert b24 >= b48 >= 1_000_000
