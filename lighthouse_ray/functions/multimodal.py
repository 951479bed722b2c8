"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``large_binary`` columns with
typed metadata alongside.  The decode/feature-extract kernels are
actor-pool ``map_batches`` stages whose Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested; the
actual codec calls are stubbed — the image/audio libraries are not in
this container — behind an import-try that falls back to a
deterministic fake (dimensions derived from the payload bytes), or
raises ``NotImplementedError`` in strict mode.

Batch-size note: binary payloads are large — size ``batch_size`` so
``batch_size x concurrency x payload`` fits the worker heap (the
default 64 here assumes ~MB-scale payloads).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

MEDIA_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("format", pa.string()),
    ]
)


# minimal valid 1x1 GIF used to probe whether a real decoder works at
# all (probing with b"" would raise UnidentifiedImageError even when
# PIL is installed and wrongly conclude no decoder exists)
_PROBE_IMAGE = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff!\xf9\x04"
    b"\x00\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
)


def _try_real_decode(payload: bytes):
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img.format or "unknown"
    except Exception:
        # ImportError (no decoder) and decode errors on corrupt payloads
        # both fall through to the strict/fake path in the caller
        return None


def fake_decode_dims(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for image decode: pseudo-dimensions from
    the payload length (mirrorable in SQL for the plumbing oracle)."""
    n = len(payload)
    return 64 + n % 1856, 64 + (n * 7) % 1856, "fake"


class ImageMetaStage:
    """Actor-pool stage: binary payload -> typed media metadata.

    ``strict=True`` raises NotImplementedError when no real decoder is
    importable (production posture); default falls back to the
    deterministic fake so the distributed plumbing stays testable.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id", strict: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.strict = strict
        self.have_real = _try_real_decode(_PROBE_IMAGE) is not None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        w, h, fmt = [], [], []
        for p in payloads:
            res = _try_real_decode(p) if self.have_real else None
            if res is None:
                if self.strict:
                    raise NotImplementedError(
                        "no image decoder available in this environment; "
                        "install Pillow or run with strict=False"
                    )
                res = fake_decode_dims(p)
            w.append(res[0])
            h.append(res[1])
            fmt.append(res[2])
        return pa.table(
            {
                "media_id": pa.array([str(i) for i in ids], type=pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
                "width": pa.array(w, type=pa.int32()),
                "height": pa.array(h, type=pa.int32()),
                "format": pa.array(fmt, type=pa.string()),
            }
        )


def extract_media_meta(ds, payload_col: str = "payload", id_col: str = "media_id",
                       concurrency=(1, 4), batch_size: int = 64):
    """The actor-pool plumbing: small batches (payloads are big), state
    (decoder handles) built once per actor."""
    return ds.map_batches(
        ImageMetaStage,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_stub(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Video frame-sampling stub: deterministic pseudo-frames (hashes of
    byte stripes) standing in for decoded frames."""
    n = max(1, len(payload) // (1 << 16))
    return [
        hashlib.blake2b(payload[i :: every_n] or b"\0", digest_size=16).digest()
        for i in range(min(n, 8))
    ]
