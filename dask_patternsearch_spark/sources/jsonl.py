"""Custom Python data source: gzip-aware JSON-lines shards.

PySpark 4's ``pyspark.sql.datasource`` API lets a format Spark lacks
plug into the DataFrame reader/writer like any built-in source -- this
module registers ``jsonl_shards``, the layout training corpora actually
ship in (one ``.jsonl`` / ``.jsonl.gz`` file per shard, one JSON object
per line), WITHOUT a decompress-and-convert staging hop.

Scale posture:

* one :class:`InputPartition` per shard file -- Spark schedules shards
  across executors exactly like parquet splits (gzip is not splittable,
  so file grain IS the parallelism grain; shard writers already target
  file sizes for this reason);
* an explicit ``schema`` option is REQUIRED for reads: schema inference
  over text at 100 TB is a full extra scan, the same rule
  ``sources.io.read_table`` applies to CSV;
* rows stream through a generator (never a whole-file list), so memory
  per task is one line + gzip buffers regardless of shard size;
* the writer emits one shard per input partition and reports per-shard
  row counts back through :class:`WriterCommitMessage` -- repartition
  upstream to choose the shard count.

Usage::

    spark.dataSource.register(JsonlShards)
    df = (spark.read.format("jsonl_shards")
          .schema("doc_id long, text string")
          .option("path", "/data/corpus").load())
    (df.write.format("jsonl_shards").mode("overwrite")
       .option("path", "/data/out").option("compress", "true").save())
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclasses.dataclass
class _ShardPartition(InputPartition):
    path: str


@dataclasses.dataclass
class _ShardCommit(WriterCommitMessage):
    path: str
    n_rows: int


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode + "t", encoding="utf-8")
    return open(path, mode, encoding="utf-8")


class _JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        self._fields = [f.name for f in schema.fields]
        pattern = options.get("pattern", "*.jsonl*")
        self._files = sorted(
            glob.glob(os.path.join(path, pattern))
            if os.path.isdir(path)
            else glob.glob(path)
        )

    def partitions(self):
        # one partition per shard file: gzip streams are not splittable,
        # so the file is the unit of parallelism (as for every engine)
        return [_ShardPartition(p) for p in self._files]

    def read(self, partition: _ShardPartition):
        with _open(partition.path, "r") as fh:
            for line in fh:
                if not line.strip():
                    continue
                obj = json.loads(line)
                yield tuple(obj.get(f) for f in self._fields)


class _JsonlWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import time

        self._path = options.get("path")
        if not self._path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        self._fields = [f.name for f in schema.fields]
        self._gz = options.get("compress", "false").lower() == "true"
        self._overwrite = overwrite
        # Per-JOB token in every shard name: partition ids repeat across
        # jobs, so `shard-{pid}` alone would silently clobber a previous
        # append's shards.  Millisecond-epoch keeps names lexically
        # increasing across jobs, which the streaming reader's offset
        # contract relies on; two same-millisecond jobs (or an NTP step
        # backwards) would break both uniqueness and ordering, so the
        # token is bumped past the highest already on disk.  (Constructed
        # driver-side, shipped to every task via writer serialization --
        # all tasks of one job share it.)
        ms = int(time.time() * 1000)
        try:
            prior = max(
                (int(name.split("-")[1])
                 for name in os.listdir(self._path)
                 if name.startswith("shard-") and name.count("-") >= 2
                 and name.split("-")[1].isdigit()),
                default=0,
            )
        except OSError:
            prior = 0
        self._job = f"{max(ms, prior + 1):013d}-{uuid.uuid4().hex[:8]}"

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self._path, exist_ok=True)
        ext = ".jsonl.gz" if self._gz else ".jsonl"
        # task-attempt temp name + atomic rename on success: a retried or
        # speculated task never leaves a half-written shard visible
        final = os.path.join(self._path, f"shard-{self._job}-{pid:05d}{ext}")
        tmp = final + f".tmp-{os.getpid()}"
        n = 0
        opener = (
            (lambda p: gzip.open(p, "wt", encoding="utf-8"))
            if self._gz
            else (lambda p: open(p, "w", encoding="utf-8"))
        )
        with opener(tmp) as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self._fields, row)),
                                    separators=(",", ":")) + "\n")
                n += 1
        os.replace(tmp, final)
        return _ShardCommit(final, n)

    def commit(self, messages):
        written = {m.path for m in messages if m is not None}
        if self._overwrite:
            # overwrite semantics: stale shards from a previous (possibly
            # wider) write must not survive, or readers see mixed outputs
            for f in glob.glob(os.path.join(self._path, "*.jsonl*")):
                if f not in written and ".tmp-" not in f:
                    os.remove(f)
        shards = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        manifest_path = os.path.join(self._path, "_MANIFEST.json")
        if not self._overwrite and os.path.exists(manifest_path):
            # append: MERGE with the previous manifest (keeping only
            # entries whose shards still exist) -- replacing it would
            # orphan every earlier write's shards from the manifest view
            with open(manifest_path) as fh:
                prior = json.load(fh).get("shards", [])
            shards = [
                s for s in prior
                if s["path"] not in written and os.path.exists(s["path"])
            ] + shards
        manifest = {"shards": shards}
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=1)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming ingest of an append-only shard directory: each
    micro-batch reads the files that appeared since the last offset.

    The offset is ``{"idx": N}`` over the LEXICALLY SORTED listing, so it
    stays O(1) regardless of corpus size -- the contract is that shards
    arrive with lexically increasing names (date/sequence-stamped shard
    files, the layout every shard writer here emits).  A mid-listing
    late arrival would be skipped; ingest pipelines that cannot
    guarantee naming order need a manifest/ledger source instead.
    """

    def __init__(self, schema: StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_shards requires .option('path', ...)")
        self._path = path
        self._pattern = options.get("pattern", "*.jsonl*")
        self._fields = [f.name for f in schema.fields]

    def _files(self):
        return sorted(glob.glob(os.path.join(self._path, self._pattern)))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start: dict):
        files = self._files()
        idx = start.get("idx", 0)
        # materialized, not a generator: the simple stream reader runs
        # driver-side and Spark pickles the batch into its prefetch cache
        rows = []
        for p in files[idx:]:
            with _open(p, "r") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    obj = json.loads(line)
                    rows.append(tuple(obj.get(f) for f in self._fields))
        return rows, {"idx": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        for p in files[start.get("idx", 0):end.get("idx", 0)]:
            with _open(p, "r") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    obj = json.loads(line)
                    yield tuple(obj.get(f) for f in self._fields)


class JsonlShards(DataSource):
    """``jsonl_shards`` data source (see module docstring)."""

    @classmethod
    def name(cls):
        return "jsonl_shards"

    def schema(self):
        raise NotImplementedError(
            "jsonl_shards requires an explicit .schema(...): schema "
            "inference over 100 TB of text is a full extra scan"
        )

    def reader(self, schema: StructType):
        return _JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return _JsonlWriter(schema, self.options, overwrite)

    def simpleStreamReader(self, schema: StructType):
        return _JsonlStreamReader(schema, self.options)
