"""Query result cache: reuse materialized results for semantically
identical plans over unchanged inputs.

BI layers re-issue the same dashboard queries constantly; a warehouse
engine answers them from a result cache instead of rescanning (the
reference's Trino/warehouse layer gets this from its BI tier — here it
is a first-class engine feature, like `tables/rollup.answer_from_rollup`
but exact rather than grain-rewritten).

Keying: md5 over (canonical optimized logical plan, schema, input
fingerprint). The optimized plan string normalizes away alias ids via
regex (Catalyst suffixes `#123` differ run to run); the input
fingerprint folds each referenced file's (path, size, mtime) — the same
signal Spark's own file index uses — so ANY change to an input table
(append, overwrite, compaction) misses the cache naturally rather than
via explicit invalidation hooks. Entries are parquet directories under
the cache root; a hit is a plain parquet scan of the result, which is
the point: serving a dashboard query costs one |result|-sized read.

The cache is write-through and crash-safe by construction: an entry is
staged to `<key>.tmp` and atomically renamed into place, and a torn
entry is simply a miss.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_EXPR_ID = re.compile(r"#\d+L?")
_PLAN_ID = re.compile(r"plan_id=\d+")


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0


class ResultCache:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.stats = CacheStats()
        os.makedirs(root, exist_ok=True)

    # -- keying ------------------------------------------------------------

    def _input_fingerprint(self, df: DataFrame) -> str:
        """Fold (path, size, mtime) of every input file of the plan."""
        files = sorted(df.inputFiles())
        h = hashlib.md5()
        for f in files:
            path = f[len("file:"):] if f.startswith("file:") else f
            h.update(f.encode())
            try:
                st = os.stat(path)
                h.update(f":{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(b":gone")
        return h.hexdigest()

    def key_for(self, df: DataFrame) -> str:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        plan = _EXPR_ID.sub("#", plan)
        plan = _PLAN_ID.sub("plan_id=", plan)
        payload = "\n".join([plan, df.schema.json(), self._input_fingerprint(df)])
        return hashlib.md5(payload.encode()).hexdigest()

    # -- serve -------------------------------------------------------------

    def get_or_compute(self, df: DataFrame) -> DataFrame:
        """Return the cached result for an equivalent plan, else compute,
        persist, and return a reader over the fresh entry."""
        key = self.key_for(df)
        entry = os.path.join(self.root, key)
        if os.path.isdir(entry) and os.path.exists(os.path.join(entry, "_SUCCESS")):
            self.stats.hits += 1
            return self.spark.read.schema(df.schema).parquet(entry)
        self.stats.misses += 1
        tmp = entry + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(entry, ignore_errors=True)
        os.rename(tmp, entry)
        return self.spark.read.schema(df.schema).parquet(entry)

    def evict_all(self) -> int:
        n = 0
        for name in os.listdir(self.root):
            p = os.path.join(self.root, name)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                n += 1
        return n
