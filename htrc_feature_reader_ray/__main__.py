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
    flag.add_argument("--checkpoint", default=None,
                      help="work dir for the chained per-stage lineage"
                           " checkpoints (rerun resumes from the first"
                           " incomplete stage)")

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

    pack = sub.add_parser(
        "pack-shards",
        help="pack documents into token-budget training shards "
             "(shard_id=K/ parquet lake + manifest)",
    )
    pack.add_argument("--docs", required=True,
                      help="parquet with (doc_id, text)")
    pack.add_argument("--out", required=True)
    pack.add_argument("--budget", type=int, default=65536,
                      help="tokens per shard")
    pack.add_argument("--num-cpus", type=int, default=None)
    pack.add_argument("--num-buckets", type=int, default=32)

    cur = sub.add_parser(
        "curate-docs",
        help="language + quality filter + near-dup-loser removal -> "
             "kept documents parquet",
    )
    cur.add_argument("--docs", required=True,
                     help="parquet with (doc_id, text)")
    cur.add_argument("--out", required=True)
    cur.add_argument("--lang", default="en")
    cur.add_argument("--min-tokens", type=int, default=30)
    cur.add_argument("--max-stopword-ratio", type=float, default=0.5)
    cur.add_argument("--dedup-threshold", type=float, default=0.5)
    cur.add_argument("--num-cpus", type=int, default=None)

    tok = sub.add_parser(
        "train-tokenizer",
        help="train a subword tokenizer (bpe | wordpiece | unigram) on a "
             "documents parquet -> vocab/merges parquet",
    )
    tok.add_argument("--docs", required=True,
                     help="parquet with a text column")
    tok.add_argument("--out", required=True)
    tok.add_argument("--algo", choices=("bpe", "wordpiece", "unigram"),
                     default="unigram")
    tok.add_argument("--rounds", type=int, default=None,
                     help="merge/EM rounds (default: 8 bpe/wordpiece, "
                          "2 unigram)")
    tok.add_argument("--num-cpus", type=int, default=None)

    aud = sub.add_parser(
        "audit-corpus",
        help="pre-training audit report (distribution health, batch-shape"
             " economics, mixture ESS, eval suite, split drift) -> one"
             " parquet per section",
    )
    aud.add_argument("--docs", required=True,
                     help="parquet with (doc_id, text, lang, source,"
                          " n_chars)")
    aud.add_argument("--events", required=True,
                     help="parquet with (event_id, ts)")
    aud.add_argument("--out", required=True)
    aud.add_argument("--num-cpus", type=int, default=None)

    uaud = sub.add_parser(
        "audit-users",
        help="user-activity audit (growth accounting, cadence dispersion,"
             " circadian/weekly shape, dormancy) -> one parquet per"
             " section",
    )
    uaud.add_argument("--events", required=True,
                      help="parquet with (user_id, ts)")
    uaud.add_argument("--out", required=True)
    uaud.add_argument("--num-cpus", type=int, default=None)

    eaud = sub.add_parser(
        "audit-embeddings",
        help="embedding-corpus audit (isotropy, PCA axis, covariance,"
             " int8 quant error, Matryoshka curve, silhouette, hubness,"
             " reciprocal matches) -> one parquet per section",
    )
    eaud.add_argument("--sf-dir", required=True,
                      help="directory with embeddings.parquet")
    eaud.add_argument("--out", required=True)
    eaud.add_argument("--num-cpus", type=int, default=None)

    vaud = sub.add_parser(
        "audit-eval",
        help="scorer-quality audit (PR curve, gains, CART stump,"
             " calibration bins, Brier split, isotonic map, conformal"
             " cut-offs, rank separation, omnibus, cutoff battery,"
             " bootstrap CIs) -> one parquet per section",
    )
    vaud.add_argument("--sf-dir", required=True,
                      help="directory with documents.parquet")
    vaud.add_argument("--out", required=True)
    vaud.add_argument("--num-cpus", type=int, default=None)

    paud = sub.add_parser(
        "audit-privacy",
        help="privacy-release audit (k-anonymity, entropy l-diversity,"
             " t-closeness violations; per-source PII scrub counts;"
             " Luhn-validated card runs) -> one parquet per section",
    )
    paud.add_argument("--sf-dir", required=True,
                      help="directory with events.parquet +"
                           " documents.parquet")
    paud.add_argument("--out", required=True)
    paud.add_argument("--num-cpus", type=int, default=None)

    gaud = sub.add_parser(
        "audit-graph",
        help="link-graph audit (components, degree shape, cohesion,"
             " crawl health, importance, link suggestions) -> one parquet"
             " per section",
    )
    gaud.add_argument("--sf-dir", required=True,
                      help="directory with the pages fixture tables")
    gaud.add_argument("--out", required=True)
    gaud.add_argument("--num-cpus", type=int, default=None)

    ing = sub.add_parser(
        "ingest-lake",
        help="bulk-fetch ids from a source volume tree into a resumable"
             " pages lake (download_file analog; per-bucket skip-complete"
             " resume)",
    )
    ing.add_argument("ids", nargs="*", help="volume ids/urls")
    ing.add_argument("--ids-file", default=None,
                     help="newline-separated id manifest (rsync"
                          " --files-from shape)")
    ing.add_argument("--src-tree", required=True,
                     help="source volume tree root (the offline stand-in"
                          " for the remote endpoint)")
    ing.add_argument("--codec", default=None,
                     choices=["gz", "bz2", "none"])
    ing.add_argument("--out", required=True)
    ing.add_argument("--num-buckets", type=int, default=16)
    ing.add_argument("--on-error", default="skip",
                     choices=["skip", "raise"])
    ing.add_argument("--num-cpus", type=int, default=None)

    fav = sub.add_parser(
        "files-available",
        help="existence pre-check of ids against a local volume tree"
             " (files_available analog)",
    )
    fav.add_argument("ids", nargs="*")
    fav.add_argument("--ids-file", default=None)
    fav.add_argument("--root", required=True, help="volume tree root")
    fav.add_argument("--codec", default=None, choices=["gz", "bz2", "none"])

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
        if args.checkpoint:
            # END-TO-END lineage resume: three chained checkpointed
            # stages; a rerun (or a run killed between stages) reads
            # every complete stage and rebuilds only what's missing —
            # the `ray job submit` shape the north rule asks for
            import ray

            from htrc_feature_reader_ray.pipelines.flagship import (
                flagship_checkpointed,
            )

            ds, results = flagship_checkpointed(
                args.sf_dir, args.checkpoint)
            print(json.dumps({
                "rows": ds.count(),
                "stages": {r["name"]: ("hit" if r["hit"] else "built")
                           for r in results},
                "checkpoint": args.checkpoint,
            }, sort_keys=True))
            ray.shutdown()
            return 0
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

    if args.cmd == "pack-shards":
        _ensure_ray(args.num_cpus)
        import ray
        from htrc_feature_reader_ray.pipelines.export import (
            write_training_shards,
        )

        manifest = write_training_shards(
            args.docs, args.out, budget=args.budget,
            num_buckets=args.num_buckets,
        )
        print(json.dumps(
            {"rows": manifest["row_count"],
             "shards": len(manifest["buckets"]), "out": args.out}
        ))
        ray.shutdown()
        return 0

    if args.cmd == "curate-docs":
        _ensure_ray(args.num_cpus)
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        import ray
        import ray.data
        from htrc_feature_reader_ray.stages.dedup import (
            dedup_clusters,
            minhash_dedup_pairs,
        )
        from htrc_feature_reader_ray.stages.partition import bucket_join
        from htrc_feature_reader_ray.stages.textstats import (
            langid,
            quality_score,
        )

        def docs():
            return ray.data.read_parquet(
                args.docs, columns=["doc_id", "text"]
            )

        quality = quality_score(docs())
        lang = langid(docs()).map_batches(
            lambda t: t.rename_columns(["lang_doc_id", "pred_lang"]),
            batch_format="pyarrow",
        )
        feats = bucket_join(quality, lang, left_key="doc_id",
                            right_key="lang_doc_id", num_buckets=16)
        want_lang, min_tok, max_stop = (
            args.lang, args.min_tokens, args.max_stopword_ratio,
        )

        def keep(batch):
            m = pc.and_(
                pc.and_(
                    pc.equal(batch.column("pred_lang"), want_lang),
                    pc.greater_equal(batch.column("n_tokens"), min_tok),
                ),
                pc.less_equal(batch.column("stopword_ratio"), max_stop),
            )
            return batch.filter(m).select(["doc_id"])

        filtered = feats.map_batches(keep, batch_format="pyarrow")
        pairs = minhash_dedup_pairs(
            docs(), threshold=args.dedup_threshold, num_perm=128, bands=64,
            corpus_rows=pq.ParquetFile(args.docs).metadata.num_rows,
        )
        losers = dedup_clusters(pairs).map_batches(
            lambda t: t.filter(
                pc.not_equal(t.column("doc_id"), t.column("cluster_id"))
            ).select(["doc_id"]).rename_columns(["loser_id"]),
            batch_format="pyarrow",
        )
        kept_ids = bucket_join(filtered, losers, left_key="doc_id",
                               right_key="loser_id", how="anti",
                               num_buckets=16)
        kept = bucket_join(kept_ids, docs(), left_key="doc_id",
                           right_key="doc_id", num_buckets=16)
        # bucketed lake + manifest; row count comes from the write's own
        # parquet footers — no second read of the output
        from htrc_feature_reader_ray.state.lineage import write_partitioned

        manifest = write_partitioned(
            kept, args.out, key="doc_id", num_buckets=16,
            inputs=[args.docs],
            params={"lang": want_lang, "min_tokens": min_tok,
                    "max_stopword_ratio": max_stop,
                    "dedup_threshold": args.dedup_threshold},
        )
        print(json.dumps({"kept": manifest["row_count"], "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "train-tokenizer":
        _ensure_ray(args.num_cpus)
        import ray
        import ray.data

        docs = ray.data.read_parquet(args.docs, columns=["text"])
        if args.algo == "bpe":
            from htrc_feature_reader_ray.stages.vocab import bpe_train

            table = bpe_train(docs, rounds=args.rounds or 8)
        elif args.algo == "wordpiece":
            from htrc_feature_reader_ray.stages.vocab import wordpiece_train

            table = wordpiece_train(docs, rounds=args.rounds or 8)
        else:
            from htrc_feature_reader_ray.stages.vocab import unigram_train

            table = unigram_train(docs, rounds=args.rounds or 2)
        table.to_parquet(args.out, index=False)
        print(json.dumps(
            {"rows": len(table), "algo": args.algo, "out": args.out}
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

    if args.cmd == "audit-corpus":
        _ensure_ray(args.num_cpus)
        import os

        import ray

        from examples.corpus_audit import audit_corpus

        rep = audit_corpus(args.docs, args.events)
        os.makedirs(args.out, exist_ok=True)
        sizes = {}
        for name, frame in rep.items():
            path = os.path.join(args.out, f"{name}.parquet")
            frame.to_parquet(path, index=False)
            sizes[name] = len(frame)
        print(json.dumps({"sections": sizes, "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "audit-eval":
        _ensure_ray(args.num_cpus)
        import os

        import ray

        from examples.eval_audit import audit_eval

        rep = audit_eval(args.sf_dir)
        os.makedirs(args.out, exist_ok=True)
        sizes = {}
        for name, frame in rep.items():
            path = os.path.join(args.out, f"{name}.parquet")
            frame.to_parquet(path, index=False)
            sizes[name] = len(frame)
        print(json.dumps({"sections": sizes, "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "audit-embeddings":
        _ensure_ray(args.num_cpus)
        import os

        import ray

        from examples.embedding_audit import audit_embeddings

        rep = audit_embeddings(args.sf_dir)
        os.makedirs(args.out, exist_ok=True)
        sizes = {}
        for name, frame in rep.items():
            path = os.path.join(args.out, f"{name}.parquet")
            frame.to_parquet(path, index=False)
            sizes[name] = len(frame)
        print(json.dumps({"sections": sizes, "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "audit-privacy":
        _ensure_ray(args.num_cpus)
        import os

        import ray

        from examples.privacy_audit import audit_privacy

        rep = audit_privacy(args.sf_dir)
        os.makedirs(args.out, exist_ok=True)
        sizes = {}
        for name, frame in rep.items():
            path = os.path.join(args.out, f"{name}.parquet")
            frame.to_parquet(path, index=False)
            sizes[name] = len(frame)
        print(json.dumps({"sections": sizes, "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "audit-graph":
        _ensure_ray(args.num_cpus)
        import os

        import ray

        from examples.link_graph_audit import audit_graph

        rep = audit_graph(args.sf_dir)
        os.makedirs(args.out, exist_ok=True)
        sizes = {}
        for name, frame in rep.items():
            path = os.path.join(args.out, f"{name}.parquet")
            frame.to_parquet(path, index=False)
            sizes[name] = len(frame)
        print(json.dumps({"sections": sizes, "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd == "audit-users":
        _ensure_ray(args.num_cpus)
        import os

        import ray

        from examples.user_activity_audit import audit_users

        rep = audit_users(args.events)
        os.makedirs(args.out, exist_ok=True)
        sizes = {}
        for name, frame in rep.items():
            path = os.path.join(args.out, f"{name}.parquet")
            frame.to_parquet(path, index=False)
            sizes[name] = len(frame)
        print(json.dumps({"sections": sizes, "out": args.out}))
        ray.shutdown()
        return 0

    if args.cmd in ("ingest-lake", "files-available"):
        ids = list(args.ids)
        if args.ids_file:
            with open(args.ids_file) as f:
                ids += [ln.strip() for ln in f if ln.strip()]
        if not ids:
            print("no ids given", file=sys.stderr)
            return 2
        codec = None if args.codec in (None, "none") else args.codec

        from htrc_feature_reader_ray.sources.jsonvol import TreeResolver

        if args.cmd == "files-available":
            from htrc_feature_reader_ray.pipelines.ingest import (
                files_available,
            )

            print(json.dumps(files_available(
                ids, TreeResolver(args.root, codec=codec)),
                sort_keys=True))
            return 0

        _ensure_ray(args.num_cpus)
        import ray

        from htrc_feature_reader_ray.pipelines.ingest import fetch_to_lake

        root = args.src_tree
        summary = fetch_to_lake(
            ids, lambda: TreeResolver(root, codec=codec), args.out,
            num_buckets=args.num_buckets, on_error=args.on_error)
        print(json.dumps(summary, sort_keys=True))
        ray.shutdown()
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
