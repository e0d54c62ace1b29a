"""Training-data preparation: the last mile between a curated corpus and a
trainer — deterministic split, epoch shuffle order, tokenizer vocabulary,
integer re-encoding, and context-window chunking, composed from the engine's
oracled operators (each verified individually by the driver gate; this file
shows the composition).

Pipeline (all Ray-Data streaming, zero driver materialization of the corpus):

  1. ``hash_split``             leakage-safe train/val/test on the SOURCE
                                entity (near-dups within a source can't
                                straddle the boundary)
  2. ``build_vocab``            frequency-ranked token ids from the TRAIN
                                split only (no eval leakage into the vocab)
  3. ``token_windows``          width/stride context windows per document
  4. ``encode_tokens``          integer id sequences against the broadcast
                                vocab (OOV -> -1)
  5. ``deterministic_shuffle``  reproducible per-epoch global order

Run: python examples/training_prep.py [docs_parquet] [out_dir]
"""

import sys


def prepare(docs_path: str, out_dir: str, *, width: int = 64,
            stride: int = 48, epoch_salt: str = "ep0:"):
    import pyarrow.compute as pc
    import ray.data

    from htrc_feature_reader_ray.stages.chunk import token_windows
    from htrc_feature_reader_ray.stages.sample import (
        deterministic_shuffle,
        hash_split,
    )
    from htrc_feature_reader_ray.stages.vocab import build_vocab, encode_tokens

    def docs(cols):
        return ray.data.read_parquet(docs_path, columns=cols)

    # 1. entity-keyed split (zero shuffle; pure function of the data)
    split = hash_split(
        docs(["doc_id", "source", "text"]),
        fractions={"train": 0.9, "val": 0.05, "test": 0.05},
        by="source", salt="v1:",
    )
    # vectorized Arrow filter (never a per-row Python predicate)
    train = split.map_batches(
        lambda t: t.filter(pc.equal(t.column("split"), "train")),
        batch_format="pyarrow",
    )

    # 2. vocabulary from the train split ONLY
    vocab = build_vocab(
        train.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ),
        min_count=2,
    )

    # 3. context windows over the train split
    windows = token_windows(
        train.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ),
        width=width, stride=stride,
    )

    # 4. reproducible epoch order over the WINDOWS (win_key is unique per
    #    window — shuffle ranks sequences, not token rows)
    keyed = windows.map_batches(pa_key, batch_format="pyarrow")
    shuffled = deterministic_shuffle(
        keyed, id_col="win_key", salt=epoch_salt, num_buckets=32
    )

    # 5. integer re-encoding of each window's text (windows are the
    #    encoder's documents). Two-table layout: windows/ carries the epoch
    #    order, tokens/ the id sequences — a trainer streams windows/ in
    #    shuffle_pos order and reads each window's tokens by win_key.
    encoded = encode_tokens(
        keyed, vocab, text_col="window_text", id_col="win_key",
        keep_token=False,
    )
    shuffled.drop_columns(["window_text"]).write_parquet(f"{out_dir}/windows")
    encoded.write_parquet(f"{out_dir}/tokens")
    return out_dir


def pa_key(t):
    """(doc_id, window_id) -> one string key column the encoder/shuffler
    can hash (engine ops key on a single id column)."""
    import pyarrow.compute as pc

    key = pc.binary_join_element_wise(
        pc.cast(t.column("doc_id"), "string"),
        pc.cast(t.column("window_id"), "string"),
        ":",
    )
    return t.append_column("win_key", key)


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    docs = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.001/documents.parquet")
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_prep"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    print(prepare(docs, out))
    ray.shutdown()
