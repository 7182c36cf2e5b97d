"""Custom Python DataSourceWriter (Spark 4 extension point): a
manifest-committed JSONL sink demonstrating the two-phase commit
protocol every production sink needs.

The 100 TB concern this encodes: a job writing thousands of shards must
never expose partial output. The protocol here is the standard one —
tasks write shards under temporary names and report them in their
commit message; only the driver-side ``commit()`` publishes a manifest
naming the complete shard set. Readers trust the manifest, so an
aborted/failed job (``abort()`` removes its shards) is invisible. This
is the same atomic-publish shape as Hive's _SUCCESS + manifest or a
table format's snapshot commit, expressed through
``pyspark.sql.datasource``.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


@dataclass
class ShardCommit(WriterCommitMessage):
    shard: str
    rows: int
    tmp: str = ""


class ManifestJsonSink(DataSource):
    """``df.write.format("manifestjson").option("path", p).save()``"""

    @classmethod
    def name(cls) -> str:
        return "manifestjson"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _ManifestWriter(self.options, overwrite)


class _ManifestWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = True) -> None:
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> ShardCommit:
        # shards are written under a DOTTED temp name and promoted at
        # commit: a task that dies mid-write must never leave a
        # final-looking *.jsonl that no manifest references but every
        # naive glob reads (the module's no-stray-output invariant)
        os.makedirs(self.path, exist_ok=True)
        shard = f"shard-{uuid.uuid4().hex}.jsonl"
        tmp = f".tmp-{shard}"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return ShardCommit(shard=shard, rows=n, tmp=tmp)

    def commit(self, messages) -> None:
        # a zero-task job (empty 0-partition input) runs no write(), so
        # the dir may not exist yet — an empty manifest still publishes
        os.makedirs(self.path, exist_ok=True)
        shards = []
        if not self.overwrite:
            # append honors the previous snapshot (r8 review: the flag
            # was silently ignored — .mode('append') destroyed the prior
            # write's committed shards): the new manifest carries the
            # old shard entries forward and the sweep keeps their files.
            # A corrupt/partial previous manifest reads as "first write"
            # rather than crashing the commit, and carried entries whose
            # shard file no longer exists (crash between a prior
            # publish and sweep, then manual cleanup) are dropped so
            # phantom shards never inflate total_rows (ADVICE r8).
            try:
                prior = read_manifest(self.path)["shards"]
                if not isinstance(prior, list):
                    prior = []
            except (FileNotFoundError, json.JSONDecodeError, KeyError,
                    TypeError):
                prior = []
            # every field is validated, not just presence of the dict:
            # an entry with an empty/absent 'shard' joins os.path.join
            # into the directory itself (which exists), and an absent
            # 'rows' crashes total_rows later — either way a malformed
            # prior entry must drop here, not crash the commit or
            # persist as a phantom (r9 self-review)
            shards.extend(
                s for s in prior
                if isinstance(s, dict)
                and isinstance(s.get("shard"), str) and s["shard"]
                and isinstance(s.get("rows"), int)
                and os.path.isfile(os.path.join(self.path, s["shard"]))
            )
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, m.tmp),
                os.path.join(self.path, m.shard),
            )
            shards.append({"shard": m.shard, "rows": m.rows})
        manifest = {
            "shards": shards,
            "total_rows": sum(s["rows"] for s in shards),
        }
        tmp = os.path.join(self.path, f".{MANIFEST}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, MANIFEST))  # atomic publish
        # sweep AFTER publish (r8 review: sweeping first destroyed the
        # OLD manifest's shards before the new manifest existed — a
        # crash in that window left a manifest referencing deleted
        # files, the exact partial-exposure state the protocol
        # prevents). Post-publish, a crash mid-sweep only leaves
        # unreferenced strays, which the next commit re-sweeps; a
        # manifest-trusting reader is consistent at every instant.
        # Swept: unreferenced *.jsonl (previous overwritten snapshot),
        # .tmp-* from dead/speculative tasks, and ._MANIFEST.json.*
        # temps from a commit that crashed before its os.replace.
        keep = {s["shard"] for s in shards}
        for name in os.listdir(self.path):
            stale_final = name.endswith(".jsonl") and name not in keep
            stale_tmp = name.startswith(".tmp-shard-")
            stale_mtmp = name.startswith(f".{MANIFEST}.")
            if stale_final or stale_tmp or stale_mtmp:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp or m.shard))
                except OSError:
                    pass


def register(spark) -> None:
    spark.dataSource.register(ManifestJsonSink)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
