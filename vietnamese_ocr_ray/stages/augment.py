"""Optional train-time augmentation stage (SURVEY.md §2.2 M6).

The reference applies a p~0.5 albumentations pipeline during training
(GridDistortion / Defocus / PixelDropout / GaussNoise /
RandomBrightnessContrast / ImageCompression / Curve / SafeRotate,
src/utils/transform.py:22-43). Extraction never uses it, so this stage
is NOT part of the flagship pipeline — it exists as the documented
"optional seeded map_batches stage": a NumPy subset (pixel dropout,
brightness/contrast, gaussian noise) with every random draw derived
from a stable per-``media_ref`` seed, so augmented corpora are
reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vietnamese_ocr_ray.preprocess import _stable_u64, binary_column_view


def augment_image(
    img: np.ndarray,
    media_ref: str,
    *,
    dropout_prob: float = 0.01,
    drop_value: int = 255,
    noise_std: float = 10.0,
    brightness_limit: float = 0.1,
    contrast_limit: float = 0.2,
    p: float = 0.5,
) -> np.ndarray:
    """Seeded analog of the reference's PixelDropout(0.01, 255) +
    GaussNoise(10) + RandomBrightnessContrast(.1, .2), each applied
    with probability ``p`` (src/utils/transform.py:31-36)."""
    rng = np.random.default_rng(_stable_u64("aug:" + media_ref))
    out = img.astype(np.float32)
    if rng.random() < p:  # pixel dropout
        mask = rng.random(out.shape) < dropout_prob
        out[mask] = drop_value
    if rng.random() < p:  # gaussian noise
        out = out + rng.normal(0.0, noise_std, out.shape).astype(np.float32)
    if rng.random() < p:  # brightness / contrast
        alpha = 1.0 + rng.uniform(-contrast_limit, contrast_limit)
        beta = rng.uniform(-brightness_limit, brightness_limit) * 255.0
        out = out * alpha + beta
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class AugmentMedia:
    """Actor-pool stage over MEDIA_SCHEMA rows: replaces ``image`` with
    its seeded augmentation (same shape). Deterministic: rerunning the
    stage — on any partitioning — produces identical bytes."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        hs = batch.column("height").to_numpy(zero_copy_only=False)
        ws = batch.column("width").to_numpy(zero_copy_only=False)
        flat, offs = binary_column_view(batch.column("image"))
        out = []
        for i, ref in enumerate(refs):
            img = flat[offs[i] : offs[i + 1]].reshape(int(hs[i]), int(ws[i]))
            out.append(augment_image(img, ref, **self.kwargs).tobytes())
        return batch.set_column(
            batch.schema.get_field_index("image"), "image", pa.array(out, pa.binary())
        )


def augment_media(ds, concurrency=(1, 8), batch_size: int = 1024, **kwargs):

    return ds.map_batches(
        AugmentMedia,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=kwargs,
    )
