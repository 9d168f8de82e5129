"""Single-node throughput comparison against a faithful proxy of the
reference's execution model.

The reference (Go, /root/reference/) cannot run in this container (no
Go toolchain; the legacy Hadoop variants need a cluster), so this tool
reimplements its EXACT data path in Python, structurally 1:1 with
internal/worker/worker.go:

  map (worker.go:75-103):  one task per whole input file (os.ReadFile
      equivalent), tokenize on non-alphabetic runs preserving case
      (MapFunc, worker.go:24-38), emit ("word","1") pairs, hash each
      key with FNV-1a-32 & 0x7fffffff (ihash, worker.go:167-171) mod
      nReduce, JSON-encode each bucket to mr-{map}-{bucket} files
      (worker.go:90-101).
  reduce (worker.go:105-143): read every mr-{m}-{r} stream, group into
      key -> [values], sort keys, apply len(values) (ReduceFunc,
      worker.go:41-44), write "key count" text lines.

It then runs OUR engine's word count (the `tokenize` registry query
semantics, via read_text_files + operators.wordcount) over the SAME
text files and reports both wall times and MB/s in one JSON line.

Caveat stated plainly: the proxy is Python, the reference is Go —
treat the proxy as a LOWER bound on the reference's speed (Go's JSON
codec and tokenizer are faster; the per-record JSON-on-shared-FS
shuffle, the architecture's dominant cost at scale, is identical).

Usage: python tools/reference_proxy.py [sf_dir] [n_files] [n_reduce] [replication]
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKEN_RE = re.compile(r"[^a-zA-Z]+")


def fnv1a31(s: str) -> int:
    """FNV-1a-32 masked to 31 bits — bit-parity with ihash
    (/root/reference/internal/worker/worker.go:167-171)."""
    h = 2166136261
    for b in s.encode():
        h = ((h ^ b) * 16777619) % (1 << 32)
    return h & 0x7FFFFFFF


def proxy_mapreduce(files: list[str], n_reduce: int, workdir: str) -> float:
    """The reference's two-phase lifecycle, sequentially, one process —
    its single-node throughput shape (the demo runs 2 workers on one
    host; task execution is sequential per worker)."""
    t0 = time.time()
    # Map phase: one task per file, JSON bucket files on "shared FS".
    for m, path in enumerate(files):
        with open(path, encoding="utf-8") as f:
            contents = f.read()
        kvs = [(w, "1") for w in TOKEN_RE.split(contents) if w]
        buckets: list[list[tuple[str, str]]] = [[] for _ in range(n_reduce)]
        for k, v in kvs:
            buckets[fnv1a31(k) % n_reduce].append((k, v))
        for r in range(n_reduce):
            with open(f"{workdir}/mr-{m}-{r}", "w", encoding="utf-8") as out:
                for k, v in buckets[r]:
                    out.write(json.dumps({"Key": k, "Value": v}) + "\n")
    # Reduce phase: group all map outputs per bucket, sort, count.
    for r in range(n_reduce):
        grouped: dict[str, list[str]] = {}
        for m in range(len(files)):
            with open(f"{workdir}/mr-{m}-{r}", encoding="utf-8") as f:
                for line in f:
                    kv = json.loads(line)
                    grouped.setdefault(kv["Key"], []).append(kv["Value"])
        with open(f"{workdir}/mr-out-{r}", "w", encoding="utf-8") as out:
            for k in sorted(grouped):
                out.write(f"{k} {len(grouped[k])}\n")
    return time.time() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_reduce = int(sys.argv[3]) if len(sys.argv) > 3 else 10  # reference default
    replication = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    import duckdb

    from dist_mapreduce_spark.operators.wordcount import word_count
    from dist_mapreduce_spark.session import get_spark
    from dist_mapreduce_spark.sources.tables import read_text_files

    with tempfile.TemporaryDirectory() as tmp:
        # Render the documents corpus to n_files whole-text shards —
        # the reference's input format (one map task per file).
        texts = [
            r[0]
            for r in duckdb.sql(
                f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
            ).fetchall()
        ] * replication
        files = []
        for i in range(n_files):
            p = f"{tmp}/shard-{i:04d}.txt"
            with open(p, "w", encoding="utf-8") as f:
                f.write("\n".join(texts[i::n_files]))
            files.append(p)
        total_mb = sum(os.path.getsize(p) for p in files) / 1e6

        shuffle_dir = f"{tmp}/shuffle"
        os.makedirs(shuffle_dir)
        proxy_s = proxy_mapreduce(files, n_reduce, shuffle_dir)

        spark = get_spark("reference_proxy")
        df = read_text_files(spark, files)
        word_count(df).count()  # warm plan shape (JIT/codegen, same files)
        t0 = time.time()
        n_words = word_count(df).count()
        spark_s = time.time() - t0

        # Same answer? (proxy output is the per-bucket text files)
        proxy_words = 0
        for r in range(n_reduce):
            with open(f"{shuffle_dir}/mr-out-{r}", encoding="utf-8") as f:
                proxy_words += sum(1 for _ in f)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "corpus_mb": round(total_mb, 2),
                    "distinct_words_proxy": proxy_words,
                    "distinct_words_spark": n_words,
                    "match": proxy_words == n_words,
                    "reference_proxy_sec": round(proxy_s, 3),
                    "spark_sec": round(spark_s, 3),
                    "proxy_mb_s": round(total_mb / proxy_s, 2),
                    "spark_mb_s": round(total_mb / spark_s, 2),
                    "speedup": round(proxy_s / spark_s, 2),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
