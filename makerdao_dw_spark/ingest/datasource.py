"""Python DataSource (Spark 4 API) for the block-header source.

`backfill_blocks` (pipeline.py, reference eth-blocks.py:59-71) expresses
A1 as range-grid + mapInPandas. This module expresses the SAME source as
a first-class pluggable format — ``spark.read.format("ethblocks")`` —
via the Spark 4 Python DataSource API: the engine-native way to ship a
connector, with partition planning owned by the source (one
InputPartition per block window, so a 1000-executor cluster fans the
backfill out with no driver-side grid DataFrame).

The RPC endpoint is constructed lazily inside ``read`` on the executor;
here that's the deterministic MockChain (every block a pure function of
(seed, n) — rpc.py), in production an HTTP JSON-RPC client built from
the same options dict.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .pipeline import BLOCK_SCHEMA, _windows

if TYPE_CHECKING:  # pragma: no cover
    pass


class _BlockRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EthBlocksReader(DataSourceReader):
    def __init__(self, options: dict):
        self.from_block = int(options.get("from_block", 0))
        self.to_block = int(options["to_block"])
        self.step = int(options.get("step", 500))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        return [_BlockRange(f, t) for f, t in _windows(self.from_block, self.to_block, self.step)]

    def read(self, partition: _BlockRange) -> Iterator[tuple]:
        # block HEADERS are a pure function of (seed, n): a contract-less
        # MockChain yields identical rows without loading/compiling the
        # reference ABI fixtures per partition (maker_chain did — per-task
        # I/O plus a hidden executor dependency on the fixture files)
        from .rpc import MockChain

        chain = MockChain(head=self.to_block, seed=self.seed)
        for n in range(partition.start, partition.end + 1):
            b = chain.get_block(n)
            yield (
                b["number"],
                b["hash"][2:],
                b["miner"][2:].lower(),
                b["nonce"][2:],
                b["gasLimit"],
                b["gasUsed"],
                b["difficulty"],
                b["extraData"][2:],
                b["timestamp"],
                b["size"],
            )


class EthBlocksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ethblocks"

    def schema(self) -> StructType:
        return BLOCK_SCHEMA

    def reader(self, schema: StructType) -> EthBlocksReader:
        return EthBlocksReader(self.options)


def read_blocks_source(
    spark: SparkSession, from_block: int, to_block: int, step: int = 500, seed: int = 42
) -> DataFrame:
    """Register the format (idempotent) and load the header table with
    `time` converted to a proper timestamp (A18), matching
    backfill_blocks output exactly."""
    spark.dataSource.register(EthBlocksDataSource)
    df = (
        spark.read.format("ethblocks")
        .option("from_block", from_block)
        .option("to_block", to_block)
        .option("step", step)
        .option("seed", seed)
        .load()
    )
    return df.withColumn("time", F.timestamp_seconds("time"))


# --------------------------------------------------------------------------
# Streaming variant: offset-managed micro-batch source (A14 resume as
# engine-native checkpointed offsets, A15 batch sizing as rate limiting)
# --------------------------------------------------------------------------
class EthBlocksStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch block-header tail-follower. Offsets are `{"block": n}`
    dicts (exclusive high-water mark) checkpointed by the engine — the
    DataSource-native replacement for the reference's max(block_number)
    resume probe (reference classes.py:32-50). Each `read(start)` serves
    at most `blocks_per_trigger` blocks past `start` — the reference's
    `blocksStep` (reference config.conf:9) / Kafka's maxOffsetsPerTrigger
    — and because the pace is computed FROM the checkpointed start
    offset, restarts resume exactly (a reader-local cursor would replay
    ranges after a restart).

    Architecture note (why Simple): bulk history belongs to the batch
    `ethblocks` format above (source-owned InputPartitions, full cluster
    fan-out); the streaming tail is small per trigger by definition, so
    the simple reader's driver-side fetch + engine-distributed replay is
    the right cost model — mirroring how file/Kafka tails are followed.
    `readBetweenOffsets` replays a committed range deterministically
    (blocks are pure functions of (seed, n)) for exactly-once recovery.
    """

    def __init__(self, options: dict):
        self.from_block = int(options.get("from_block", 0))
        self.head = int(options["to_block"])
        self.per_trigger = int(options.get("blocks_per_trigger", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"block": self.from_block}

    def _rows(self, lo: int, hi: int):
        from .rpc import MockChain  # headers only — see EthBlocksReader.read

        chain = MockChain(head=self.head, seed=self.seed)
        for n in range(lo, hi):
            b = chain.get_block(n)
            yield (
                b["number"],
                b["hash"][2:],
                b["miner"][2:].lower(),
                b["nonce"][2:],
                b["gasLimit"],
                b["gasUsed"],
                b["difficulty"],
                b["extraData"][2:],
                b["timestamp"],
                b["size"],
            )

    def read(self, start: dict):
        lo = start["block"]
        hi = min(self.head + 1, lo + self.per_trigger)
        if hi <= lo:
            return iter([]), {"block": lo}
        # materialized (not a generator): the engine's prefetch cache
        # copies the iterator, and a trigger's range is small by design
        return iter(list(self._rows(lo, hi))), {"block": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["block"], end["block"])

    def commit(self, end: dict) -> None:
        # ranges are re-readable pure functions of (seed, n): nothing to
        # release; exactly-once = offset checkpoint + deterministic replay
        pass


class EthBlocksStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ethblocks_stream"

    def schema(self) -> StructType:
        return BLOCK_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> EthBlocksStreamReader:
        return EthBlocksStreamReader(self.options)


def read_blocks_stream(
    spark: SparkSession,
    from_block: int,
    to_block: int,
    blocks_per_trigger: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Streaming DataFrame of block headers with engine-checkpointed
    offsets; schema identical to `read_blocks_source`."""
    spark.dataSource.register(EthBlocksStreamDataSource)
    df = (
        spark.readStream.format("ethblocks_stream")
        .option("from_block", from_block)
        .option("to_block", to_block)
        .option("blocks_per_trigger", blocks_per_trigger)
        .option("seed", seed)
        .load()
    )
    return df.withColumn("time", F.timestamp_seconds("time"))


# ---------------------------------------------------------------------------
# Python DataSource WRITER: transactional JSONL sink
# ---------------------------------------------------------------------------
class _StagedFile:
    """Commit message: one staged file + its row count."""

    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


def _jsonl_writer_classes():
    """Writer classes built lazily (WriterCommitMessage import kept out
    of module import path for symmetry with the reader's lazy RPC)."""
    import json
    import os
    import uuid

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class StagedCommit(WriterCommitMessage, _StagedFile):
        pass

    class JsonlWriter(DataSourceWriter):
        """Two-phase commit, the Spark-4 writer-protocol form of the
        reference's per-range transaction (A19, classes.py:24-26):
        every task writes to _staging/<uuid>; only the DRIVER's
        commit() publishes staged files (atomic rename) and writes the
        _MANIFEST with per-file row counts; abort() removes the
        staging dir, so a failed/speculated task can never leave a
        half-written file visible to readers."""

        def __init__(self, options: dict, overwrite: bool = False):
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            staging = os.path.join(self.path, "_staging")
            os.makedirs(staging, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.jsonl"
            staged = os.path.join(staging, name)
            n = 0
            with open(staged, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return StagedCommit(staged, n)

        def commit(self, messages):
            import shutil

            # Crash-consistent ordering (tests/test_crash_consistency.py):
            # the manifest is the SINGLE commit point and is replaced
            # atomically, so a reader that goes through it (the sink's
            # contract) observes exactly pre-state or post-state.
            #   phase 1: publish staged files — not yet committed, a
            #            crash leaves only manifest-unreferenced files;
            #   phase 2: atomic manifest replace (tmp + os.replace);
            #   phase 3: garbage-collect — old files superseded by an
            #            overwrite and the staging dir. A crash here
            #            leaves harmless unreferenced orphans, never a
            #            torn table (the pre-r5 order deleted old files
            #            FIRST and rewrote the manifest in place — a
            #            crash could lose pre-state or tear the JSON).
            manifest_path = os.path.join(self.path, "_MANIFEST.json")
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    prev = json.load(f)
            else:
                prev = []
            new = []
            for m in messages:
                final = os.path.join(self.path, os.path.basename(m.staged))
                os.replace(m.staged, final)
                new.append({"file": os.path.basename(final), "rows": m.rows})
            manifest = new if self.overwrite else prev + new
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(manifest, key=lambda x: x["file"]), f)
            os.replace(tmp, manifest_path)  # THE commit point
            if self.overwrite:
                keep = {e["file"] for e in manifest}
                for fn in os.listdir(self.path):
                    if fn.endswith(".jsonl") and fn not in keep:
                        os.remove(os.path.join(self.path, fn))
            # anything still staged belongs to failed or speculative
            # attempts and is by definition uncommitted
            shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

        def abort(self, messages):
            import shutil

            shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    return JsonlWriter


def read_committed_jsonl(path: str) -> list[dict]:
    """THE reader contract for the jsonl sink: only files referenced by
    `_MANIFEST.json` are visible. Published-but-unreferenced files (a
    crash between phase 1 and the atomic manifest replace) and staged
    files are invisible, so a reader observes exactly pre-state or
    post-state of any commit — the property fault-injected in
    tests/test_crash_consistency.py. Returns the committed rows as
    dicts, in manifest file order."""
    import json as _json
    import os

    manifest_path = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(manifest_path):
        return []
    with open(manifest_path) as f:
        manifest = _json.load(f)
    rows: list[dict] = []
    for entry in manifest:
        with open(os.path.join(path, entry["file"])) as f:
            rows.extend(_json.loads(line) for line in f if line.strip())
    return rows


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", ...).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema: StructType, overwrite: bool):
        return _jsonl_writer_classes()(self.options, overwrite)


def register_jsonl_sink(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
