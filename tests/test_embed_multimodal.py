import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from htrc_feature_reader_ray.stages.embed import (
    ChunkEmbedder,
    HashEmbeddingModel,
    chunk_embeddings,
)
from htrc_feature_reader_ray.stages.multimodal import (
    DecodeImage,
    FakeImageCodec,
    decode_images,
    frame_sample,
    synth_media,
)


def test_hash_embedding_deterministic():
    m = HashEmbeddingModel(dim=16)
    v1 = m.vectors(np.array(["dog", "cat"], dtype=object))
    v2 = m.vectors(np.array(["dog", "cat"], dtype=object))
    assert np.allclose(v1, v2)
    assert not np.allclose(v1[0], v1[1])
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0)


def test_chunk_embedder_weighting_exact():
    df = pd.DataFrame(
        {
            "url": ["u"] * 3,
            "chunk": [1, 1, 1],
            "token": ["dog", "cat", "the"],  # 'the' is a stopword
            "count": [3, 1, 10],
        }
    )
    emb = ChunkEmbedder(dim=16)(df)
    m = HashEmbeddingModel(dim=16)
    vd, vc = m.vectors(np.array(["dog", "cat"], dtype=object))
    expect = np.log1p(3) * vd + np.log1p(1) * vc
    assert np.allclose(np.asarray(emb.loc[0, "embedding"]), expect)


def test_chunk_embeddings_dataset(sf_dir):
    from htrc_feature_reader_ray.stages.chunk import chunked_tokenlist
    from htrc_feature_reader_ray.stages.extract import tokens_from_pages

    tokens = tokens_from_pages(sf_dir, via_html=False)
    chunks = chunked_tokenlist(tokens, target=40, num_buckets=8)
    out = chunk_embeddings(chunks, dim=8, concurrency=2).to_pandas()
    assert {"url", "chunk", "embedding"} <= set(out.columns)
    # one embedding per (url, chunk)
    assert not out.duplicated(["url", "chunk"]).any()
    assert all(len(e) == 8 for e in out["embedding"])


def test_decode_image_requires_codec():
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed: auto-binding supplies a codec")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        DecodeImage()


def test_decode_images_with_fake_codec():
    media = synth_media(32)
    ds = ray.data.from_arrow(media)
    out = decode_images(ds, codec_factory=FakeImageCodec, concurrency=2).to_pandas()
    assert len(out) == 32
    assert (out["n_pixels"] == 16 * 8).all()
    # deterministic: same payload -> same stats
    codec = FakeImageCodec()
    px = codec.decode(media.column("payload")[0].as_py(), 16, 8)
    assert abs(out.loc[0, "mean_intensity"] - px.mean()) < 1e-12


def test_frame_sample_explode():
    ds = ray.data.from_arrow(synth_media(16))
    out = frame_sample(ds, every_ms=1000).to_pandas()
    per = out.groupby("media_id").size()
    # duration (i%7+1)*1500ms -> floor(d/1000) frames
    for i in range(16):
        assert per[i] == ((i % 7 + 1) * 1500) // 1000


def test_embedder_cache_overflow_recovers():
    """Cache reset on overflow must recompute EVERY token of the call, not
    just the previously-missing ones (regression: KeyError after clear)."""
    import pandas as pd
    from htrc_feature_reader_ray.stages.embed import ChunkEmbedder

    emb = ChunkEmbedder(group_cols=["g"], dim=4, stop=False)
    emb._CACHE_LIMIT = 4
    df1 = pd.DataFrame(
        {"g": ["a"] * 3, "token": ["t1", "t2", "t3"], "count": [1, 1, 1]}
    )
    emb(df1)  # caches t1..t3
    df2 = pd.DataFrame(
        {"g": ["b"] * 5,
         "token": ["t1", "t2", "n1", "n2", "n3"],  # mix cached + new
         "count": [1] * 5}
    )
    out = emb(df2)  # overflow -> clear -> must still embed t1/t2
    assert len(out) == 1
    assert len(out["embedding"].iloc[0]) == 4


def test_resize_images_nearest_neighbor_exact():
    import numpy as np
    import pyarrow as pa
    from htrc_feature_reader_ray.stages.multimodal import (
        FakeImageCodec,
        ResizeImages,
        resize_images,
        synth_media,
    )

    # scalar exactness: 4x4 -> 2x2 picks rows/cols 0 and 2
    r = ResizeImages(out_w=2, out_h=2, codec_factory=FakeImageCodec)
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert r.resize(px).tolist() == [[0, 2], [8, 10]]

    media = ray.data.from_arrow(synth_media(16))
    out = resize_images(
        media, out_w=4, out_h=2, codec_factory=FakeImageCodec,
        concurrency=(1, 2),
    ).to_pandas()
    assert len(out) == 16
    assert (out["width"] == 4).all() and (out["height"] == 2).all()
    assert out["payload"].map(len).eq(8).all()  # 4x2 uint8 bytes
    # deterministic: equals decode+resize done directly
    codec = FakeImageCodec()
    src = synth_media(16).to_pylist()[0]
    direct = ResizeImages(out_w=4, out_h=2, codec_factory=FakeImageCodec)
    exp = direct.resize(codec.decode(src["payload"], src["width"], src["height"]))
    got = np.frombuffer(
        out.loc[out["media_id"] == src["media_id"], "payload"].iloc[0],
        dtype=np.uint8,
    ).reshape(2, 4)
    assert np.array_equal(got, exp)


def test_ahash_images_exact_and_hamming():
    import pyarrow as pa

    from htrc_feature_reader_ray.stages.multimodal import ahash_images

    # two identical gradients + one inverted: identical images share the
    # hash, the inverted one is (nearly) its complement
    g = bytes(range(64))
    inv = bytes(255 - b for b in range(64))
    media = pa.table({
        "media_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array([g, g, inv], type=pa.binary()),
    })
    out = (ahash_images(ray.data.from_arrow(media)).to_pandas()
           .set_index("media_id"))
    assert out.loc[1].tolist() == out.loc[2].tolist()
    # gradient 0..63: mean cross-multiply pixel*64 > sum(2016) -> pixels
    # >= 32 are ones -> lo half all zero, hi half all one
    assert out.loc[1, "phash_lo"] == 0
    assert out.loc[1, "phash_hi"] == (1 << 32) - 1
    assert out.loc[1, "n_ones"] == 32
    # inverted gradient flips every bit except exact-tie handling:
    # pixels 255..192: > mean(223.5*64=14304) -> 224..255 = first 32
    assert out.loc[3, "phash_lo"] == (1 << 32) - 1
    assert out.loc[3, "phash_hi"] == 0

    # wrong payload width is a loud error
    bad = pa.table({
        "media_id": pa.array([9], type=pa.int64()),
        "payload": pa.array([b"abc"], type=pa.binary()),
    })
    import pytest

    with pytest.raises(Exception):
        ahash_images(ray.data.from_arrow(bad)).to_pandas()


# ---------------------------------------------------------------------------
# banded-Hamming near-dup image pairs


def _synthetic_hashes(n=120):
    """aHash table from deterministic 8x8 payloads: groups of 10 share a
    base image with one tweaked byte per member."""
    import ray.data

    from htrc_feature_reader_ray.stages.multimodal import ahash_images

    ids = np.arange(n, dtype=np.int64)
    px = ((ids[:, None] // 10) * 31
          + np.arange(64, dtype=np.int64)[None, :] * 7) % 251
    rows = np.arange(n)
    px[rows, ids % 8] = (px[rows, ids % 8] + ids % 10) % 256
    payloads = [row.astype(np.uint8).tobytes() for row in px]
    media = ray.data.from_arrow(pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(payloads, pa.binary()),
    }))
    return ahash_images(media)


def test_phash_dedup_pairs_matches_brute_force():
    from htrc_feature_reader_ray.stages.dedup import _popcount64
    from htrc_feature_reader_ray.stages.multimodal import phash_dedup_pairs

    h = _synthetic_hashes()
    hp = h.to_pandas().sort_values("media_id").reset_index(drop=True)
    u = (hp["phash_hi"].to_numpy().astype(np.uint64) << np.uint64(32)) \
        | hp["phash_lo"].to_numpy().astype(np.uint64)
    ids = hp["media_id"].to_numpy()
    iu, ju = np.triu_indices(len(u), k=1)
    ham = _popcount64(u[iu] ^ u[ju])
    sel = ham <= 6
    want = pd.DataFrame({
        "a": ids[iu[sel]], "b": ids[ju[sel]], "hamming": ham[sel],
    }).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(want) > 50  # fixture really produces near-dups

    got = (
        phash_dedup_pairs(h, max_hamming=6, num_buckets=8)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_phash_dedup_pairs_exact_dup_and_empty():
    import ray.data

    from htrc_feature_reader_ray.stages.multimodal import phash_dedup_pairs

    # max_hamming=0 (a single 64-bit band): exact-duplicate hashes only
    h = ray.data.from_pandas(pd.DataFrame({
        "media_id": [1, 2, 3],
        "phash_hi": [7, 7, 9],
        "phash_lo": [3, 3, 3],
    }))
    out = phash_dedup_pairs(h, max_hamming=0, num_buckets=4).to_pandas()
    assert out.values.tolist() == [[1, 2, 0]]

    empty = h.filter(lambda r: False)
    out = phash_dedup_pairs(empty, max_hamming=6, num_buckets=4).to_pandas()
    assert len(out) == 0


def test_sniff_content_type_branches():
    import ray.data

    from htrc_feature_reader_ray.stages.multimodal import sniff_content_type

    pl = [b"\xff\xd8\xff rest", b"\x89PNG\r\n\x1a\nxx", b"GIF87a..",
          b"%PDF-1.7", b"RIFF1234WEBPdata", b"RIFF1234WAVEdata",
          b"RIFF1234XXXXdata", b"\xff\xd8", b"<html><body>",
          b"<!DOCTYPE html><p>", b"plain words", b"", b"PK\x03\x04zz",
          b"\x1f\x8bgz", b"\xef\xbb\xbfbom"]
    ds = ray.data.from_arrow(pa.table({
        "media_id": pa.array(range(len(pl)), pa.int64()),
        "payload": pa.array(pl, pa.binary()),
    }))
    out = (sniff_content_type(ds).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    assert out["sniffed_type"].tolist() == [
        "image/jpeg", "image/png", "image/gif", "application/pdf",
        "image/webp", "audio/wav", "application/octet-stream",
        "application/octet-stream", "text/html", "text/html",
        "application/octet-stream", "application/octet-stream",
        "application/zip", "application/gzip", "text/plain"]
    assert out["payload_bytes"].tolist() == [len(p) for p in pl]


# ---------------------------------------------------------------------------
# frozen codec protocols: PIL-shaped adapter + audio + per-frame decode


def _fake_pil_module():
    """Second fake mimicking the PIL-shaped API (`open(BytesIO) -> img`
    with an array-convertible image): proves ANY object satisfying the
    protocol slots into the adapter. Defined INSIDE a function so
    cloudpickle ships the classes by VALUE to Ray workers (a
    test-module-level class would pickle by reference to a module the
    workers can't import — the actor pool would restart forever)."""

    class _FakePilImage:
        def __init__(self, arr):
            self._arr = np.ascontiguousarray(arr)
            self.__array_interface__ = self._arr.__array_interface__

    class _FakePilModule:
        @staticmethod
        def open(fp):
            data = np.frombuffer(fp.read(), dtype=np.uint8)
            h, w = 4, 6
            n = h * w * 3
            reps = -(-n // max(1, len(data)))
            return _FakePilImage(np.tile(data, reps)[:n].reshape(h, w, 3))

    return _FakePilModule


def test_pil_shaped_adapter_slots_into_decode_stage():
    from htrc_feature_reader_ray.stages.multimodal import PilShapedCodec

    _FakePilModule = _fake_pil_module()
    payload = bytes(range(40))
    codec = PilShapedCodec(_FakePilModule)
    px = codec.decode(payload, 6, 4)
    assert px.shape == (4, 6) and px.dtype == np.uint8
    # grayscale collapse is the exact integer channel mean
    rgb = np.asarray(_FakePilModule.open(__import__("io").BytesIO(payload)))
    want = (rgb.sum(axis=2, dtype=np.int64) // 3).astype(np.uint8)
    assert (px == want).all()

    # and the adapter satisfies the frozen protocol end-to-end through
    # the SAME actor stage the fakes use
    media = synth_media(8)
    ds = ray.data.from_arrow(media)
    out = decode_images(
        ds, codec_factory=lambda: PilShapedCodec(_FakePilModule),
        concurrency=2).to_pandas()
    assert len(out) == 8
    assert (out["n_pixels"] == 24).all()  # adapter's own (4, 6) geometry


def test_decode_audio_exact_and_requires_codec():
    from htrc_feature_reader_ray.stages.multimodal import (
        DecodeAudio,
        FakeAudioCodec,
        decode_audio,
    )

    try:
        import soundfile  # noqa: F401
        pytest.skip("soundfile installed: auto-binding supplies a codec")
    except ImportError:
        with pytest.raises(NotImplementedError):
            DecodeAudio()

    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array(
            [b"\x01\x02\x03\x04\x05", b"", b"\xff\xff"],
            type=pa.binary()),
        "sample_rate": pa.array([8000, 16000, 8000], type=pa.int32()),
    })
    out = (decode_audio(ray.data.from_arrow(tbl),
                        codec_factory=FakeAudioCodec, concurrency=1)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    # row 0: LE int16 pairs (0x0201, 0x0403), odd byte dropped
    assert out.loc[0, "n_samples"] == 2
    assert out.loc[0, "sample_sum"] == 0x0201 + 0x0403
    assert out.loc[0, "peak_abs"] == 0x0403
    assert out.loc[0, "duration_ms"] == 2 * 1000 // 8000
    # row 1: empty clip -> all zeros
    assert tuple(out.loc[1, ["n_samples", "sample_sum", "peak_abs"]]) \
        == (0, 0, 0)
    # row 2: 0xffff is -1 as int16 -> sum -1, peak 1
    assert out.loc[2, "sample_sum"] == -1 and out.loc[2, "peak_abs"] == 1


def test_sample_frames_decodes_planned_grid():
    from htrc_feature_reader_ray.stages.multimodal import (
        FakeVideoCodec,
        SampleFrames,
        sample_frames,
    )

    with pytest.raises(NotImplementedError):
        SampleFrames()

    media = synth_media(12)
    ds = ray.data.from_arrow(media)
    out = (sample_frames(ds, codec_factory=FakeVideoCodec, every_ms=1000)
           .to_pandas())
    # row grid == frame_sample's plan exactly
    plan = frame_sample(ds, every_ms=1000).to_pandas()
    assert (out[["media_id", "frame_ms"]]
            .sort_values(["media_id", "frame_ms"]).to_numpy().tolist()
            == plan.sort_values(["media_id", "frame_ms"])
            .to_numpy().tolist())
    # per-frame pixel_sum replays the circular tile from offset frame_ms
    codec = FakeVideoCodec()
    row = out.sort_values(["media_id", "frame_ms"]).iloc[3]
    payload = media.column("payload")[int(row["media_id"])].as_py()
    px = codec.decode_frame(payload, int(row["frame_ms"]), 16, 8)
    assert int(row["pixel_sum"]) == int(px.sum(dtype=np.int64))
    assert int(row["n_pixels"]) == 16 * 8
    # frames of one clip genuinely differ (offset walks the payload)
    sums = out[out["media_id"] == out["media_id"].max()]["pixel_sum"]
    assert len(sums) == 1 or sums.nunique() > 1


# ---------------------------------------------------------------------------
# MmapWordVectors: real-model loader contract (memory-mapped gensim shape)


def test_mmap_word_vectors_loader_contract(tmp_path):
    from htrc_feature_reader_ray.stages.embed import (
        ChunkEmbedder,
        MmapWordVectors,
    )

    rng = np.random.RandomState(3)
    toks = ["alpha", "beta", "gamma"]
    mat = rng.randn(3, 4)
    path = str(tmp_path / "wem")
    MmapWordVectors.save(path, toks, mat)

    m = MmapWordVectors(path)
    assert m.dim == 4
    # np.load(mmap_mode='r') really memory-maps (shared read-only pages)
    assert isinstance(m.mat, np.memmap)
    assert list(m.contains(np.array(["alpha", "nope", "gamma"],
                                    dtype=object))) == [True, False, True]
    v = m.vectors(np.array(["beta", "nope"], dtype=object))
    assert np.allclose(v[0], mat[1]) and (v[1] == 0).all()

    # slots into the SAME embedder stage; OOV contributes nothing and
    # doesn't count toward min_tokens (zero-vector placeholder)
    df = pd.DataFrame({
        "url": ["u1"] * 3 + ["u2"] * 2,
        "chunk": [1, 1, 1, 1, 1],
        "token": ["alpha", "beta", "zzz_oov", "zzz_oov", "qqq_oov"],
        "count": [2, 1, 5, 3, 3],
    })
    emb = ChunkEmbedder(model_factory=lambda: MmapWordVectors(path),
                        min_tokens=1, stop=False)
    out = emb(df).sort_values("url").reset_index(drop=True)
    assert len(out) == 2
    want_u1 = np.log1p(2) * mat[0] + np.log1p(1) * mat[1]
    assert np.allclose(np.stack(out["embedding"])[0], want_u1)
    # u2 is all-OOV: present with the zero-vector placeholder
    assert (np.stack(out["embedding"])[1] == 0).all()

    # format guards
    with pytest.raises(ValueError, match="vocab has"):
        MmapWordVectors.save(path + "_bad", toks, mat)
        with open(path + "_bad.vocab", "w") as f:
            f.write("only_one")
        MmapWordVectors(path + "_bad")


def test_mmap_word_vectors_through_actor_pool(tmp_path):
    """The mmap model loads once per actor in __init__ and the actor-pool
    pipeline produces the same embeddings as a driver-side ChunkEmbedder."""
    from htrc_feature_reader_ray.stages.embed import (
        ChunkEmbedder,
        MmapWordVectors,
        chunk_embeddings,
    )

    rng = np.random.RandomState(4)
    toks = [f"t{i}" for i in range(20)]
    path = str(tmp_path / "wem2")
    MmapWordVectors.save(path, toks, rng.randn(20, 6))

    rows = pd.DataFrame({
        "url": np.repeat([f"u{i}" for i in range(10)], 4),
        "chunk": 1,
        "token": rng.choice(toks + ["oov1", "oov2"], 40),
        "count": rng.randint(1, 5, 40),
    })
    ds = ray.data.from_pandas(rows)  # single block: groups batch-local
    got = (chunk_embeddings(ds, dim=6,
                            model_factory=lambda: MmapWordVectors(path),
                            stop=False)
           .to_pandas().sort_values("url").reset_index(drop=True))
    want = (ChunkEmbedder(model_factory=lambda: MmapWordVectors(path),
                          stop=False)(rows)
            .sort_values("url").reset_index(drop=True))
    assert len(got) == 10
    assert np.allclose(np.stack(got["embedding"]),
                       np.stack(want["embedding"]))


def test_codec_auto_binding_via_injected_modules():
    """The r4 auto-binding wiring, proved WITHOUT the real libs: an
    injected PIL-shaped / soundfile-shaped module flows factory ->
    stage; with nothing importable the factories return None and the
    stages keep their documented NotImplementedError stub."""
    from htrc_feature_reader_ray.stages.multimodal import (
        DecodeAudio,
        DecodeImage,
        default_audio_codec_factory,
        default_image_codec_factory,
    )

    fake_pil = _fake_pil_module()
    st = DecodeImage(codec_factory=default_image_codec_factory(
        pil_module=fake_pil))
    px = st.codec.decode(bytes(range(40)), 6, 4)
    assert px.shape == (4, 6) and px.dtype == np.uint8

    class _FakeSoundfile:
        @staticmethod
        def read(fp, dtype):
            assert dtype == "int16"
            raw = np.frombuffer(fp.read(), dtype="<i2")
            return raw[: len(raw) & ~1].reshape(-1, 2), 8000

    sta = DecodeAudio(codec_factory=default_audio_codec_factory(
        sf_module=_FakeSoundfile))
    payload = np.array([100, 200, -300, 501], dtype="<i2").tobytes()
    mono = sta.codec.decode(payload, 8000)
    # exact integer channel mean (Python floor: (-300+501)//2 = 100)
    assert mono.tolist() == [(100 + 200) // 2, (-300 + 501) // 2]
    assert mono.dtype == np.dtype("<i2")


def _has_pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="PIL not in this container")
def test_real_pil_auto_binding_roundtrip():
    """Runs only where PIL exists: DecodeImage() with NO factory must
    auto-bind and decode a real PNG."""
    import io

    import PIL.Image

    img = PIL.Image.fromarray(
        np.arange(24, dtype=np.uint8).reshape(4, 6))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    st = DecodeImage()
    px = st.codec.decode(buf.getvalue(), 6, 4)
    assert (px == np.arange(24, dtype=np.uint8).reshape(4, 6)).all()


def test_keyed_vectors_shaped_model_and_loader(tmp_path):
    """gensim-format auto-binding via a KeyedVectors-shaped fake: the
    adapter satisfies the ChunkEmbedder model protocol and agrees with
    MmapWordVectors on the same data; load_word_vectors prefers the
    mmap pair when present and errors helpfully with neither."""
    from htrc_feature_reader_ray.stages.embed import (
        KeyedVectorsShapedModel,
        MmapWordVectors,
        load_word_vectors,
    )

    rng = np.random.RandomState(11)
    toks = [f"t{i}" for i in range(8)]
    mat = rng.randn(8, 5)

    class _FakeKV:
        vector_size = 5
        key_to_index = {t: i for i, t in enumerate(toks)}

        def __getitem__(self, t):
            return mat[self.key_to_index[t]]

    m = KeyedVectorsShapedModel(_FakeKV())
    assert m.dim == 5
    q = np.array(["t3", "oov", "t0"], dtype=object)
    assert m.contains(q).tolist() == [True, False, True]
    v = m.vectors(q)
    assert np.allclose(v[0], mat[3]) and (v[1] == 0).all()

    # mmap pair wins when present (multi-actor page-cache format)
    path = str(tmp_path / "kvmodel")
    MmapWordVectors.save(path, toks, mat)
    got = load_word_vectors(path)
    assert isinstance(got, MmapWordVectors)
    assert np.allclose(got.vectors(q), m.vectors(q))
    assert got.contains(q).tolist() == m.contains(q).tolist()

    # gensim path: the injected module's KeyedVectors.load is used
    class _FakeGensimModels:
        class KeyedVectors:
            @staticmethod
            def load(p, mmap=None):
                assert mmap == "r"
                return _FakeKV()

    got2 = load_word_vectors(str(tmp_path / "no_pair"),
                             gensim_models=_FakeGensimModels)
    assert isinstance(got2, KeyedVectorsShapedModel)
    assert np.allclose(got2.vectors(q), m.vectors(q))

    # neither available -> the documented stub error
    with pytest.raises(NotImplementedError):
        load_word_vectors(str(tmp_path / "nothing_here"))
