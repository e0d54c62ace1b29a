"""CLI driver — the reference's console entry point (``htid2rsync``,
utils.py:250-307) generalized: id utilities plus runnable pipelines, suitable
for ``python -m htrc_feature_reader_ray ...`` (and therefore for
``ray job submit -- python -m htrc_feature_reader_ray run-flagship ...``).

Owns its Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="htrc_feature_reader_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("clean-id", help="filesystem-safe encode ids")
    enc.add_argument("ids", nargs="+")
    dec = sub.add_parser("extract-id", help="decode cleaned ids/filenames")
    dec.add_argument("ids", nargs="+")
    shard = sub.add_parser("shard-path", help="bucketed lake path for ids")
    shard.add_argument("ids", nargs="+")

    flag = sub.add_parser("run-flagship", help="run the flagship pipeline")
    flag.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    flag.add_argument("--num-cpus", type=int, default=None)
    flag.add_argument("--out", default=None, help="write parquet here")

    lake = sub.add_parser("save-lake", help="extract + persist feature lakes")
    lake.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    lake.add_argument("--out", required=True)
    lake.add_argument("--num-cpus", type=int, default=None)
    lake.add_argument("--num-buckets", type=int, default=16)

    dedup = sub.add_parser(
        "dedup-docs",
        help="near-dup pairs + clusters over a documents parquet",
    )
    dedup.add_argument("--docs", required=True,
                       help="parquet with (doc_id, text)")
    dedup.add_argument("--out", required=True,
                       help="writes <out>/pairs and <out>/clusters parquet")
    dedup.add_argument("--threshold", type=float, default=0.5)
    dedup.add_argument("--num-perm", type=int, default=128)
    dedup.add_argument("--bands", type=int, default=64)
    dedup.add_argument("--num-cpus", type=int, default=None)

    meta = sub.add_parser(
        "extract-metadata",
        help="schema-versioned metadata extraction -> parquet",
    )
    meta.add_argument("--docs", required=True,
                      help="parquet with (doc_id, meta_json) — or pass "
                           "--synthesize to derive meta_json from a "
                           "documents table")
    meta.add_argument("--out", required=True)
    meta.add_argument("--synthesize", action="store_true")
    meta.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "clean-id":
        from htrc_feature_reader_ray.functions.ids import clean_id

        for i in args.ids:
            print(clean_id(i))
        return 0
    if args.cmd == "extract-id":
        from htrc_feature_reader_ray.functions.ids import extract_id

        for i in args.ids:
            print(extract_id(i))
        return 0
    if args.cmd == "shard-path":
        from htrc_feature_reader_ray.functions.ids import shard_path

        for i in args.ids:
            print(shard_path(i))
        return 0

    if args.cmd == "run-flagship":
        _ensure_ray(args.num_cpus)
        from htrc_feature_reader_ray.pipelines.flagship import flagship

        ds = flagship(args.sf_dir)
        if args.out:
            # resumable sink: url-hash-bucketed parquet + lineage manifest
            # (one dir per key range, atomic rename — never one giant file)
            from htrc_feature_reader_ray.state.lineage import write_partitioned

            manifest = write_partitioned(
                ds, args.out, key="url", num_buckets=32,
                inputs=[f"{args.sf_dir}/documents.parquet"],
            )
            print(json.dumps(
                {"rows": manifest["row_count"], "out": args.out}
            ))
        else:
            print(json.dumps({"rows": ds.count()}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "save-lake":
        _ensure_ray(args.num_cpus)
        from htrc_feature_reader_ray.pipelines.etl import save_feature_lake

        manifests = save_feature_lake(
            args.sf_dir, args.out, num_buckets=args.num_buckets
        )
        print(json.dumps({t: m["row_count"] for t, m in manifests.items()}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "dedup-docs":
        _ensure_ray(args.num_cpus)
        import pyarrow.parquet as pq

        import ray
        import ray.data
        from htrc_feature_reader_ray.stages.dedup import (
            dedup_clusters,
            minhash_dedup_pairs,
        )

        docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
        pairs = minhash_dedup_pairs(
            docs, threshold=args.threshold, num_perm=args.num_perm,
            bands=args.bands,
            corpus_rows=pq.ParquetFile(args.docs).metadata.num_rows
            if args.docs.endswith(".parquet") else None,
        ).materialize()
        clusters = dedup_clusters(pairs)
        pairs.write_parquet(f"{args.out}/pairs")
        clusters.write_parquet(f"{args.out}/clusters")
        print(json.dumps(
            {"pairs": pairs.count(), "clusters": clusters.count()}
        ))
        ray.shutdown()
        return 0

    if args.cmd == "extract-metadata":
        _ensure_ray(args.num_cpus)
        import ray
        import ray.data
        from htrc_feature_reader_ray.stages.metadata import (
            extract_metadata,
            synthesize_meta_json,
        )

        if args.synthesize:
            src = ray.data.read_parquet(
                args.docs, columns=["doc_id", "lang", "source", "n_chars"]
            ).map_batches(synthesize_meta_json, batch_format="pyarrow")
        else:
            src = ray.data.read_parquet(args.docs)
        out = extract_metadata(src)
        out.write_parquet(args.out)
        print(json.dumps({"rows": out.count(), "out": args.out}))
        ray.shutdown()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
