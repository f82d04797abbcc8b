"""Deterministic synthetic media table (image/audio/video binary columns).

One media row per documents-table row (seeded by doc_id, order-independent):
  ~70% raw-RGB images, ~15% raw-PCM16 audio, ~10% raw-frame video,
  ~5% "real" mimes (image/jpeg) with junk payloads that exercise the
  stubbed-codec error path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from qwen_ocr_ray.sources.pagepack import pack_pages
from qwen_ocr_ray.sources.synth_pages import _mix
from qwen_ocr_ray.stages.multimodal import PNG, RAW_PCM16, RAW_RGB, RAW_VIDEO

# bump when only the MEDIA generator changes (pages caches stay valid)
MEDIA_VERSION = 2

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def _image(doc_id: int) -> tuple[bytes, int, int]:
    r = _mix(77, doc_id)
    w, h = 48 + r % 64, 48 + (r >> 8) % 64
    img = np.empty((h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :, 0] = (xx * (1 + r % 5)) % 256
    img[:, :, 1] = (yy * (1 + (r >> 4) % 5)) % 256
    img[:, :, 2] = ((xx + yy + r) % 256)
    return img.tobytes(), w, h


def _audio(doc_id: int) -> tuple[bytes, int]:
    r = _mix(78, doc_id)
    sr = 8000
    n = sr // 2 + r % sr  # 0.5-1.5 s
    t = np.arange(n)
    freq = 100 + r % 800
    wave = (np.sin(2 * np.pi * freq * t / sr) * (5000 + r % 20000)).astype("<i2")
    return wave.tobytes(), sr


def _video(doc_id: int) -> tuple[bytes, int]:
    r = _mix(79, doc_id)
    n_frames = 6 + r % 18
    frames = []
    for f in range(n_frames):
        rf = _mix(79, doc_id, f)
        img = np.full((24, 32, 3), (rf % 200, (rf >> 8) % 200, (rf >> 16) % 200), dtype=np.uint8)
        frames.append((32, 24, img.tobytes()))
    return pack_pages(frames), n_frames


def generate_media_table(doc_ids: list[int]) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in MEDIA_SCHEMA.names}
    for doc_id in doc_ids:
        r = _mix(76, doc_id) % 100
        cols["media_id"].append(doc_id)
        if r < 70:
            payload, w, h = _image(doc_id)
            cols["mime"].append(RAW_RGB)
            cols["payload"].append(payload)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["sample_rate"].append(None)
            cols["n_frames"].append(None)
        elif r < 85:
            payload, sr = _audio(doc_id)
            cols["mime"].append(RAW_PCM16)
            cols["payload"].append(payload)
            cols["width"].append(None)
            cols["height"].append(None)
            cols["sample_rate"].append(sr)
            cols["n_frames"].append(None)
        elif r < 95:
            payload, nf = _video(doc_id)
            cols["mime"].append(RAW_VIDEO)
            cols["payload"].append(payload)
            cols["width"].append(32)
            cols["height"].append(24)
            cols["sample_rate"].append(None)
            cols["n_frames"].append(nf)
        elif r < 97:
            # real-codec path: PNG-encoded image (functions/png.py)
            from qwen_ocr_ray.functions.png import encode_png

            raw, w, h = _image(doc_id)
            cols["mime"].append(PNG)
            cols["payload"].append(encode_png(raw, w, h))
            cols["width"].append(w)
            cols["height"].append(h)
            cols["sample_rate"].append(None)
            cols["n_frames"].append(None)
        else:
            cols["mime"].append("image/jpeg")  # stubbed codec path
            cols["payload"].append(b"\xff\xd8\xff\xe0junk" + bytes([doc_id % 256] * 16))
            cols["width"].append(None)
            cols["height"].append(None)
            cols["sample_rate"].append(None)
            cols["n_frames"].append(None)
    return pa.table(cols, schema=MEDIA_SCHEMA)


def _write_oracle_sidecars(table: pa.Table, out_dir: str) -> None:
    """Side tables that let a SQL oracle check the media feature pipelines.

    ``audio_samples.parquet``: (media_id, idx, sample) — DuckDB recomputes
    duration/RMS/zero-crossings from raw samples, fully independent of the
    engine's binary-payload decode path.

    ``image_expected.parquet``: ImageFeatures applied at generation time —
    a golden for the DISTRIBUTED run (routing, batching, decode round-trip),
    same role as the extraction golden table.
    """
    import numpy as np

    pcm = table.filter(pa.compute.equal(table["mime"], RAW_PCM16))
    mids, idxs, samples = [], [], []
    for mid, payload in zip(pcm["media_id"].to_pylist(), pcm["payload"].to_pylist()):
        w = np.frombuffer(payload, dtype="<i2")
        mids.append(np.full(len(w), mid, dtype=np.int64))
        idxs.append(np.arange(len(w), dtype=np.int64))
        samples.append(w.astype(np.int32))
    samples_tbl = pa.table(
        {
            "media_id": pa.array(np.concatenate(mids) if mids else [], pa.int64()),
            "idx": pa.array(np.concatenate(idxs) if idxs else [], pa.int64()),
            "sample": pa.array(np.concatenate(samples) if samples else [], pa.int32()),
        }
    )
    tmp = os.path.join(out_dir, f"audio_samples.tmp.{os.getpid()}")
    pq.write_table(samples_tbl, tmp, row_group_size=65536)
    os.replace(tmp, os.path.join(out_dir, "audio_samples.parquet"))

    from qwen_ocr_ray.stages.multimodal import IMAGE_MIMES, ImageFeatures

    imgs = table.filter(
        pa.compute.is_in(table["mime"], value_set=pa.array(IMAGE_MIMES))
    )
    feats = ImageFeatures()(imgs)
    tmp = os.path.join(out_dir, f"image_expected.tmp.{os.getpid()}")
    pq.write_table(feats, tmp, row_group_size=1024)
    os.replace(tmp, os.path.join(out_dir, "image_expected.parquet"))


def media_tag(sf_dir: str) -> str:
    from qwen_ocr_ray.sources.synth_pages import GEN_VERSION

    return (
        os.path.basename(os.path.normpath(sf_dir))
        + f"_v{GEN_VERSION}m{MEDIA_VERSION}"
    )


def ensure_media_dataset(sf_dir: str, cache_root: str = "/tmp/qor_media") -> str:
    tag = media_tag(sf_dir)
    out_dir = os.path.join(cache_root, tag)
    path = os.path.join(out_dir, "media.parquet")
    sidecars = [os.path.join(out_dir, f) for f in
                ("audio_samples.parquet", "image_expected.parquet")]
    if os.path.exists(path) and all(os.path.exists(p) for p in sidecars):
        return path
    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(path):
        table = pq.read_table(path)
    else:
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        table = generate_media_table(docs["doc_id"].to_pylist())
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp, row_group_size=1024)
        os.replace(tmp, path)
    _write_oracle_sidecars(table, out_dir)
    return path
