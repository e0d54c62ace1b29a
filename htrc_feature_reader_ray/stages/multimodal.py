"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Ray-side plumbing — schemas, actor-pool signatures, memory-aware batch
sizing, output layout — is real and tested; the actual codec calls are
STUBBED (no image/audio libraries in this container): ``DecodeImage`` raises
``NotImplementedError`` unless given a decoder, and ``FakeImageCodec``
provides a deterministic stand-in so pipelines are exercised end-to-end.

Design rules encoded here (SURVEY 'Multimodal columns' requirement):
  * payloads stay ``binary`` columns; metadata is typed scalar columns —
    never Python objects;
  * decode/feature stages are ACTOR POOLS (codec init is expensive);
  * batch_size is small (payloads are wide): a batch × concurrency must fit
    the worker heap — callers size it from payload_bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),        # opaque encoded bytes
        ("width", pa.int32()),           # typed metadata, nullable
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def media_batch_size(payload_bytes: int, *, worker_heap_bytes: int = 512 << 20,
                     safety: int = 4) -> int:
    """Memory-aware batch size: decoded payloads expand ~safety×; keep a
    batch within a fraction of the worker heap."""
    return max(1, int(worker_heap_bytes / (payload_bytes * safety)))


# ---------------------------------------------------------------------------
# FROZEN decoder protocols — the bind-later contract for real codecs.
#
# Any object satisfying the relevant protocol slots into the actor stages
# unchanged (pass its factory as ``codec_factory``); the fakes below and the
# PIL-shaped adapter prove the contract in-sandbox, a real PIL/libvips/
# soundfile binding satisfies it outside.
#
#   image codec:  decode(payload: bytes, width: int, height: int)
#                     -> np.ndarray[uint8, (height, width)]
#   audio codec:  decode(payload: bytes, sample_rate: int)
#                     -> np.ndarray[int16, (n_samples,)]   (PCM mono)
#   video codec:  decode_frame(payload: bytes, frame_ms: int,
#                              width: int, height: int)
#                     -> np.ndarray[uint8, (height, width)]
# ---------------------------------------------------------------------------


class FakeImageCodec:
    """Deterministic stand-in codec: 'decodes' payload bytes to a fake pixel
    array whose stats depend only on the bytes (so tests are exact)."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n = max(1, int(width) * int(height))
        reps = -(-n // max(1, len(arr)))
        return np.tile(arr, reps)[:n].reshape(int(height), int(width))


class PilShapedCodec:
    """Adapter binding any PIL-shaped imaging API to the frozen image
    protocol: the wrapped module needs only ``open(io.BytesIO(payload))``
    returning an array-convertible image (``np.asarray(img)`` — PIL
    images satisfy this via ``__array_interface__``). Outside the sandbox
    this is ``PilShapedCodec(PIL.Image)``; in tests a fake PIL-shaped
    module proves the adapter contract. Grayscale output: RGB-shaped
    arrays collapse by exact integer mean (sum // channels)."""

    def __init__(self, pil_module) -> None:
        self.pil = pil_module

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        import io

        img = self.pil.open(io.BytesIO(payload))
        arr = np.asarray(img)
        if arr.ndim == 3:  # (h, w, channels) -> exact-integer grayscale
            arr = (arr.sum(axis=2, dtype=np.int64)
                   // arr.shape[2]).astype(np.uint8)
        return arr.astype(np.uint8, copy=False)


class SoundfileShapedCodec:
    """Adapter binding any soundfile-shaped audio API to the frozen
    audio protocol: the wrapped module needs only
    ``read(io.BytesIO(payload), dtype='int16')`` returning
    ``(samples, sample_rate)`` — libsndfile's Python binding satisfies
    this; in tests a fake soundfile-shaped module proves the adapter.
    Multi-channel input collapses to mono by exact integer mean
    (sum // channels), mirroring :class:`PilShapedCodec`'s grayscale
    rule."""

    def __init__(self, sf_module) -> None:
        self.sf = sf_module

    def decode(self, payload: bytes, sample_rate: int) -> np.ndarray:
        import io

        data, _sr = self.sf.read(io.BytesIO(payload), dtype="int16")
        arr = np.asarray(data)
        if arr.ndim == 2:  # (n, channels) -> exact-integer mono
            arr = (arr.sum(axis=1, dtype=np.int64)
                   // arr.shape[1])
        return arr.astype("<i2", copy=False)


def default_image_codec_factory(pil_module=None):
    """Auto-binding: a :class:`PilShapedCodec` factory over ``PIL.Image``
    when it is importable, else ``None`` (this container has no imaging
    lib — the stages then keep their documented NotImplementedError
    stub). Pass ``pil_module`` to bind another PIL-shaped API (tests
    inject a fake to prove the wiring without PIL)."""
    if pil_module is None:
        try:
            from PIL import Image as pil_module  # type: ignore
        except ImportError:
            return None
    mod = pil_module
    return lambda: PilShapedCodec(mod)


def default_audio_codec_factory(sf_module=None):
    """Auto-binding: a :class:`SoundfileShapedCodec` factory over
    ``soundfile`` when importable, else ``None`` — the audio twin of
    :func:`default_image_codec_factory`."""
    if sf_module is None:
        try:
            import soundfile as sf_module  # type: ignore
        except ImportError:
            return None
    mod = sf_module
    return lambda: SoundfileShapedCodec(mod)


class FakeAudioCodec:
    """Deterministic audio stand-in: payload bytes -> little-endian int16
    PCM mono samples (odd trailing byte dropped) — byte-exact, so every
    downstream feature is SQL-replayable from the payload bytes."""

    def decode(self, payload: bytes, sample_rate: int) -> np.ndarray:
        return np.frombuffer(
            payload[: len(payload) & ~1], dtype="<i2")


class FakeVideoCodec:
    """Deterministic video stand-in: the frame at ``frame_ms`` is the
    payload bytes tiled circularly starting at offset ``frame_ms mod
    len(payload)`` — frames genuinely differ by timestamp while staying
    exactly replayable (the image fake is the frame_ms=0 case)."""

    def decode_frame(self, payload: bytes, frame_ms: int,
                     width: int, height: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            arr = np.zeros(1, dtype=np.uint8)
        n = max(1, int(width) * int(height))
        idx = (int(frame_ms) + np.arange(n, dtype=np.int64)) % len(arr)
        return arr[idx].reshape(int(height), int(width))


class DecodeImage:
    """Actor-pool stage: image payload -> per-image features
    (mean/std intensity, n_pixels). Codec loaded ONCE per actor.

    With no codec available this raises NotImplementedError at init —
    the documented stub behavior for this container."""

    def __init__(self, codec_factory=None) -> None:
        if codec_factory is None:
            codec_factory = default_image_codec_factory()
        if codec_factory is None:
            raise NotImplementedError(
                "no image codec in this environment (PIL not importable);"
                " pass codec_factory=FakeImageCodec for the deterministic"
                " stub"
            )
        self.codec = codec_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        mean = np.empty(len(payloads))
        std = np.empty(len(payloads))
        npix = np.empty(len(payloads), dtype=np.int64)
        psum = np.empty(len(payloads), dtype=np.int64)
        for i, (p, w, h) in enumerate(zip(payloads, ws, hs)):
            px = self.codec.decode(p, w, h)
            mean[i] = float(px.mean())
            std[i] = float(px.std())
            npix[i] = px.size
            psum[i] = int(px.sum(dtype=np.int64))  # exact (oracle-checkable)
        return pa.table(
            {
                "media_id": ids,
                "mean_intensity": pa.array(mean, type=pa.float64()),
                "std_intensity": pa.array(std, type=pa.float64()),
                "n_pixels": pa.array(npix, type=pa.int64()),
                "pixel_sum": pa.array(psum, type=pa.int64()),
            }
        )


def decode_images(media_ds, *, codec_factory=None, concurrency=(1, 4),
                  payload_bytes: int = 1 << 20):
    """Run the image-decode actor pool over a media Dataset (binary payload
    column). Batch size derived from payload size (memory-aware)."""
    return media_ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs=dict(codec_factory=codec_factory),
        batch_format="pyarrow",
        batch_size=media_batch_size(payload_bytes),
        concurrency=concurrency,
    )


class ResizeImages:
    """Actor-pool stage: decode -> nearest-neighbor resize -> raw-pixel
    payload with updated typed metadata. The RESIZE math is real numpy
    (nearest-neighbor index sampling — no codec needed beyond decode);
    output payload is the raw resized pixel bytes (row-major uint8), the
    universal interchange the next stage (feature extraction, model input)
    consumes without a codec."""

    def __init__(self, *, out_w: int, out_h: int, codec_factory=None) -> None:
        if codec_factory is None:
            codec_factory = default_image_codec_factory()
        if codec_factory is None:
            raise NotImplementedError(
                "no image codec in this environment (PIL not importable);"
                " pass codec_factory=FakeImageCodec for the deterministic"
                " stub"
            )
        self.codec = codec_factory()
        self.out_w = int(out_w)
        self.out_h = int(out_h)

    def resize(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape
        rows = (np.arange(self.out_h) * h) // self.out_h
        cols = (np.arange(self.out_w) * w) // self.out_w
        return px[rows[:, None], cols[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        out = [
            self.resize(self.codec.decode(p, w, h)).astype(np.uint8).tobytes()
            for p, w, h in zip(payloads, ws, hs)
        ]
        n = len(out)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload": pa.array(out, type=pa.binary()),
                "width": pa.array(
                    np.full(n, self.out_w, dtype=np.int32)
                ),
                "height": pa.array(
                    np.full(n, self.out_h, dtype=np.int32)
                ),
            }
        )


def resize_images(media_ds, *, out_w: int, out_h: int, codec_factory=None,
                  concurrency=(1, 4), payload_bytes: int = 1 << 20):
    """Run the resize actor pool (memory-aware batch size, codec loaded once
    per actor)."""
    return media_ds.map_batches(
        ResizeImages,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h,
                                   codec_factory=codec_factory),
        batch_format="pyarrow",
        batch_size=media_batch_size(payload_bytes),
        concurrency=concurrency,
    )


class DecodeAudio:
    """Actor-pool stage symmetric to :class:`DecodeImage`: audio payload →
    per-clip features ``(media_id, n_samples, duration_ms, sample_sum,
    peak_abs)``. Codec loaded ONCE per actor; all projections are exact
    integers (oracle-checkable): ``duration_ms = n·1000 // sample_rate``,
    ``sample_sum = Σ samples`` (int64), ``peak_abs = max |sample|`` (0 for
    an empty clip).

    With no codec available this raises NotImplementedError at init —
    the documented stub behavior for this container; pass
    ``codec_factory=FakeAudioCodec`` for the deterministic stand-in or
    any object satisfying the frozen audio protocol."""

    def __init__(self, codec_factory=None) -> None:
        if codec_factory is None:
            codec_factory = default_audio_codec_factory()
        if codec_factory is None:
            raise NotImplementedError(
                "no audio codec in this environment (soundfile not"
                " importable); pass codec_factory=FakeAudioCodec for the"
                " deterministic stub"
            )
        self.codec = codec_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        srs = batch.column("sample_rate").to_pylist()
        k = len(payloads)
        n = np.empty(k, dtype=np.int64)
        dur = np.empty(k, dtype=np.int64)
        ssum = np.empty(k, dtype=np.int64)
        peak = np.empty(k, dtype=np.int64)
        for i, (p, sr) in enumerate(zip(payloads, srs)):
            s = self.codec.decode(p, sr)
            n[i] = len(s)
            dur[i] = len(s) * 1000 // max(int(sr), 1)
            ssum[i] = int(s.sum(dtype=np.int64))
            peak[i] = int(np.abs(s.astype(np.int64)).max()) if len(s) else 0
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_samples": pa.array(n, type=pa.int64()),
            "duration_ms": pa.array(dur, type=pa.int64()),
            "sample_sum": pa.array(ssum, type=pa.int64()),
            "peak_abs": pa.array(peak, type=pa.int64()),
        })


def decode_audio(media_ds, *, codec_factory=None, concurrency=(1, 4),
                 payload_bytes: int = 1 << 20):
    """Run the audio-decode actor pool (memory-aware batch size, codec
    loaded once per actor) — the :func:`decode_images` sibling."""
    return media_ds.map_batches(
        DecodeAudio,
        fn_constructor_kwargs=dict(codec_factory=codec_factory),
        batch_format="pyarrow",
        batch_size=media_batch_size(payload_bytes),
        concurrency=concurrency,
    )


class SampleFrames:
    """Actor-pool stage: video payload → one row PER SAMPLED FRAME with
    exact per-frame features — :func:`frame_sample` plans the timestamp
    grid (``max(1, duration_ms // every_ms)`` frames at ``every_ms``
    steps); this stage additionally DECODES each planned frame through
    the frozen video protocol (``decode_frame``) and projects
    ``(media_id, frame_ms, n_pixels, pixel_sum)``. Codec loaded once per
    actor; with no codec this raises NotImplementedError at init
    (``FakeVideoCodec`` is the deterministic stand-in)."""

    def __init__(self, codec_factory=None, *, every_ms: int = 1000) -> None:
        if codec_factory is None:
            raise NotImplementedError(
                "no video codec in this environment; pass "
                "codec_factory=FakeVideoCodec for the deterministic stub"
            )
        self.codec = codec_factory()
        self.every_ms = int(every_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        o_id, o_ms, o_np, o_ps = [], [], [], []
        for i, (p, w, h) in enumerate(zip(payloads, ws, hs)):
            n_frames = max(1, int(np.nan_to_num(dur[i])) // self.every_ms)
            for f in range(n_frames):
                ms = f * self.every_ms
                px = self.codec.decode_frame(p, ms, w, h)
                o_id.append(int(ids[i]))
                o_ms.append(ms)
                o_np.append(px.size)
                o_ps.append(int(px.sum(dtype=np.int64)))
        return pa.table({
            "media_id": pa.array(o_id, type=pa.int64()),
            "frame_ms": pa.array(o_ms, type=pa.int64()),
            "n_pixels": pa.array(o_np, type=pa.int64()),
            "pixel_sum": pa.array(o_ps, type=pa.int64()),
        })


def sample_frames(media_ds, *, codec_factory=None, every_ms: int = 1000,
                  concurrency=(1, 4), payload_bytes: int = 1 << 20):
    """Run the frame-sample+decode actor pool (memory-aware batch size;
    output rows = planned frame grid of :func:`frame_sample`)."""
    return media_ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs=dict(codec_factory=codec_factory,
                                   every_ms=every_ms),
        batch_format="pyarrow",
        batch_size=media_batch_size(payload_bytes),
        concurrency=concurrency,
    )


def frame_sample(media_ds, *, every_ms: int = 1000):
    """Video frame-sampling plan: one output row per sampled frame timestamp
    (the decode itself is stubbed; the explode/planning is real)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        counts = np.maximum(1, (np.nan_to_num(dur) // every_ms).astype(np.int64))
        out_id = np.repeat(ids, counts)
        offsets = np.concatenate(
            [np.arange(c) * every_ms for c in counts]
        ).astype(np.int64)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_ms": pa.array(offsets, type=pa.int64()),
            }
        )

    return media_ds.map_batches(fn, batch_format="pyarrow")


def synth_media(n: int = 64, *, seed: int = 7) -> pa.Table:
    """Deterministic media fixture matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "url": [f"https://m.example.com/{i}" for i in range(n)],
        "kind": ["image" if i % 2 == 0 else "video" for i in range(n)],
        "payload": [rng.bytes(128 + (i % 5) * 64) for i in range(n)],
        "width": np.full(n, 16, dtype=np.int32),
        "height": np.full(n, 8, dtype=np.int32),
        "sample_rate": np.full(n, 0, dtype=np.int32),
        "duration_ms": np.asarray([(i % 7 + 1) * 1500 for i in range(n)], dtype=np.int32),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


def ahash_images(media_ds, *, grid: int = 8):
    """Average-hash perceptual fingerprint over RAW resized pixels — the
    standard near-duplicate-image sketch (aHash): bit_i = pixel_i above
    the image mean, packed row-major. Consumes the ``ResizeImages``
    output contract (payload = row-major uint8, width = height = grid),
    so the full pipeline is decode → resize(grid×grid) → ahash, all
    codec-free after the decode.

    Exactness contract: the mean comparison is the INTEGER cross-multiply
    ``pixel·grid² > Σpixels`` (strict; ties are 0) — no float mean, so
    the hash is bit-identical on any engine. The 64-bit hash is emitted
    as two BIGINT halves (``phash_hi``/``phash_lo``) to stay in signed
    SQL range without masking a bit away. Stateless vectorized
    ``map_batches`` (one frombuffer + reshape per batch), zero exchange.

    Output ``(media_id, phash_hi, phash_lo, n_ones)``. Hamming distance
    between two images = popcount(hi⊕hi') + popcount(lo⊕lo')."""
    n_px = grid * grid
    half = n_px // 2

    def ahash(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        buf = b"".join(payloads.to_pylist())
        k = batch.num_rows
        if len(buf) != k * n_px:
            raise ValueError(
                f"ahash_images expects {n_px}-byte raw payloads "
                f"(ResizeImages grid={grid} output); got "
                f"{len(buf)} bytes for {k} rows")
        d = np.frombuffer(buf, dtype=np.uint8).reshape(k, n_px)
        tot = d.sum(axis=1, dtype=np.int64)
        bits = (d.astype(np.int64) * n_px) > tot[:, None]
        w_lo = (1 << np.arange(half, dtype=np.int64))
        lo = (bits[:, :half] * w_lo).sum(axis=1)
        hi = (bits[:, half:] * w_lo).sum(axis=1)
        return pa.table({
            "media_id": batch.column("media_id"),
            "phash_hi": pa.array(hi, type=pa.int64()),
            "phash_lo": pa.array(lo, type=pa.int64()),
            "n_ones": pa.array(bits.sum(axis=1).astype(np.int64)),
        })

    return media_ds.map_batches(ahash, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# banded-Hamming near-duplicate image pairs over aHash fingerprints


def phash_dedup_pairs(hashes, *, max_hamming: int = 6,
                      id_col: str = "media_id", num_buckets: int = 32):
    """EXACT near-duplicate image pairs from :func:`ahash_images` output:
    every (a, b, hamming) with ``a < b`` and
    ``hamming = popcount(hash_a XOR hash_b) <= max_hamming``.

    Exactness by pigeonhole: the 64 hash bits split into
    ``B = max_hamming + 1`` contiguous bands, so two hashes within
    ``max_hamming`` differing bits agree EXACTLY on at least one band —
    banding here is a completeness-preserving partitioner, not a recall
    trade-off (contrast minhash LSH, where banding is probabilistic).
    Candidates surface only inside (band, value) groups; the Hamming verify
    is a map-side popcount in the same kernel.  A pair matching several
    bands is emitted only by its FIRST matching band (earlier-band equality
    recomputed from the carried halves), so output is globally distinct
    with zero extra exchange.

    Scale shape: one exchange of B × 40-byte (band, value, id, hi, lo)
    rows; pair emission is quadratic only within a (band, value) group —
    with ~64/B-bit bands, group size is corpus/2^(64/B)-ish except for
    genuinely duplicated imagery, which is exactly what the op exists to
    surface.  Payload bytes never cross.

    Output: (a, b, hamming), int64."""
    from htrc_feature_reader_ray.stages.dedup import _popcount64
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    n_bands = max_hamming + 1
    if not 1 <= n_bands <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    base = 64 // n_bands
    widths = np.full(n_bands, base, dtype=np.uint64)
    widths[: 64 % n_bands] += 1
    offs = np.concatenate(([0], np.cumsum(widths)[:-1])).astype(np.uint64)
    # (1 << 64) - 1 overflows int64; build masks in uint64
    masks = np.where(
        widths == 64,
        np.uint64(0xFFFFFFFFFFFFFFFF),
        (np.uint64(1) << widths) - np.uint64(1),
    )

    def _full(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
        return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)

    def explode(batch: pa.Table) -> pa.Table:
        k = len(batch)
        hi = batch.column("phash_hi").to_numpy()
        lo = batch.column("phash_lo").to_numpy()
        u = _full(hi, lo)
        vals = ((u[:, None] >> offs[None, :]) & masks[None, :])
        return pa.table({
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), k)),
            "val": pa.array(vals.reshape(-1).view(np.int64)),
            id_col: pa.array(np.repeat(
                batch.column(id_col).to_numpy(), n_bands)),
            "hi": pa.array(np.repeat(hi, n_bands), pa.int64()),
            "lo": pa.array(np.repeat(lo, n_bands), pa.int64()),
        })

    empty = pd.DataFrame({
        "a": pd.Series(dtype="int64"),
        "b": pd.Series(dtype="int64"),
        "hamming": pd.Series(dtype="int64"),
    })

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (band, _val), g in df.groupby(["band", "val"], sort=False):
            m = len(g)
            if m < 2:
                continue
            ids = g[id_col].to_numpy()
            u = _full(g["hi"].to_numpy(), g["lo"].to_numpy())
            iu, ju = np.triu_indices(m, k=1)
            keep = np.ones(len(iu), dtype=bool)
            for eb in range(int(band)):  # first-matching-band dedup
                bv = (u >> offs[eb]) & masks[eb]
                keep &= bv[iu] != bv[ju]
            if not keep.any():
                continue
            iu, ju = iu[keep], ju[keep]
            ham = _popcount64(u[iu] ^ u[ju])
            sel = ham <= max_hamming
            if not sel.any():
                continue
            ia, ib = ids[iu[sel]], ids[ju[sel]]
            outs.append(pd.DataFrame({
                "a": np.minimum(ia, ib),
                "b": np.maximum(ia, ib),
                "hamming": ham[sel],
            }))
        return pd.concat(outs, ignore_index=True) if outs else empty.copy()

    exploded = hashes.map_batches(explode, batch_format="pyarrow")
    return bucketed_map_groups(exploded, "val", pairs_in_bucket,
                               num_buckets=num_buckets)


def phash_pairs_sql(hashes_cte: str, *, max_hamming: int = 6,
                    id_col: str = "media_id", hi: str = "phash_hi",
                    lo: str = "phash_lo") -> str:
    """Brute-force SQL mirror of :func:`phash_dedup_pairs` over a CTE/
    subquery producing (id, hi, lo) rows — the banded engine path and this
    all-pairs replay are provably the same set (pigeonhole completeness +
    in-kernel verify)."""
    ham = (f"bit_count(xor(a.{hi}, b.{hi})) + "
           f"bit_count(xor(a.{lo}, b.{lo}))")
    return f"""
        SELECT a.{id_col} AS a, b.{id_col} AS b,
               ({ham})::BIGINT AS hamming
        FROM ({hashes_cte}) a JOIN ({hashes_cte}) b
          ON a.{id_col} < b.{id_col}
        WHERE {ham} <= {max_hamming}"""


# ---------------------------------------------------------------------------
# content-type sniffing from payload magic numbers


# (prefix bytes, offset, sniffed type) in priority order — first match wins.
# Public magic numbers (the usual WHATWG-MIMESNIFF / file(1) table entries);
# RIFF containers additionally dispatch on the format tag at offset 8.
MAGIC_TYPES: tuple = (
    (b"\xff\xd8\xff", 0, "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", 0, "image/png"),
    (b"GIF87a", 0, "image/gif"),
    (b"GIF89a", 0, "image/gif"),
    (b"%PDF-", 0, "application/pdf"),
    (b"PK\x03\x04", 0, "application/zip"),
    (b"\x1f\x8b", 0, "application/gzip"),
    (b"OggS", 0, "application/ogg"),
    (b"\xef\xbb\xbf", 0, "text/plain"),
    (b"<!DOCTYPE html", 0, "text/html"),
    (b"<html", 0, "text/html"),
)
RIFF_TYPES: tuple = (
    (b"WEBP", "image/webp"),
    (b"WAVE", "audio/wav"),
    (b"AVI ", "video/avi"),
)


def sniff_content_type(media_ds, *, payload_col: str = "payload",
                       id_col: str = "media_id"):
    """Magic-number content-type detection over opaque binary payloads —
    the routing step before any decode stage: crawl Content-Type headers
    lie, so a 100 TB media pipeline dispatches each payload to its decoder
    (or quarantines it) by what the BYTES say.  First matching prefix in
    the documented :data:`MAGIC_TYPES` priority order wins; RIFF containers
    dispatch on the format tag at offset 8 (:data:`RIFF_TYPES`); no match
    (including a truncated magic or an unknown RIFF tag) falls back to
    ``application/octet-stream``.

    Output: (id, ``sniffed_type``, ``payload_bytes``).  Stateless
    vectorized pass — one Arrow ``binary_slice`` + ``equal`` kernel per
    table entry, zero exchange, payloads never leave their batch."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(payload_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        k = len(batch)
        out = np.full(k, "application/octet-stream", dtype=object)
        undecided = np.ones(k, dtype=bool)
        for prefix, off, typ in MAGIC_TYPES:
            sl = pc.binary_slice(col, off, off + len(prefix))
            m = pc.equal(sl, pa.scalar(prefix, pa.binary()))
            m = m.to_numpy(zero_copy_only=False) & undecided
            out[m] = typ
            undecided &= ~m
        riff = (pc.binary_slice(col, 0, 4)
                .to_numpy(zero_copy_only=False) == b"RIFF") & undecided
        if riff.any():
            tag = pc.binary_slice(col, 8, 12).to_numpy(zero_copy_only=False)
            for tag_bytes, typ in RIFF_TYPES:
                m = riff & (tag == tag_bytes)
                out[m] = typ
        return pa.table({
            id_col: batch.column(id_col),
            "sniffed_type": pa.array(out, pa.string()),
            "payload_bytes": pc.binary_length(col).cast(pa.int64()),
        })

    return media_ds.map_batches(fn, batch_format="pyarrow")
