"""Colorized prediction dumps — the notebooks' "save output coloured maps
for analysis" workflow (Plot_Tsne_Notebook cell 0; Colorize usage in
transform.py:82-105). Writes one RGB PNG per val image: argmax predictions
(and optionally the ground truth) through the Cityscapes+IDD palette."""
from __future__ import annotations

import os

import numpy as np

from ..data.colorize import colorize
from ..data.transforms import prepare_batch


def save_predictions(
    apply_fn,
    params,
    bn,
    source,
    *,
    task: int,
    num_classes: int,
    out_dir: str,
    max_images: int | None = None,
    save_gt: bool = False,
    batch_size: int = 1,
    height: int = 512,
    width: int = 1024,
) -> list[str]:
    """Returns the written file paths (named after the source images)."""
    import jax
    import jax.numpy as jnp

    from PIL import Image

    from ..data.loader import Loader

    fwd = jax.jit(
        lambda p, s, x: jnp.argmax(apply_fn(p, s, x, task, training=False)[0], axis=-1)
    )
    os.makedirs(out_dir, exist_ok=True)
    loader = Loader(source, batch_size=batch_size, height=height, width=width)
    pairs = getattr(source, "pairs", None)
    written: list[str] = []
    done = False
    for b, (imgs, lbls, valid) in enumerate(loader):
        x, y = prepare_batch(jnp.asarray(imgs), jnp.asarray(lbls), num_classes=num_classes)
        preds = np.asarray(fwd(params, bn, x))
        for i in range(preds.shape[0]):
            if not valid[i]:
                continue
            idx = b * batch_size + i
            if pairs is not None:
                stem = os.path.splitext(os.path.basename(pairs[idx][0]))[0]
            else:
                stem = f"{source.name}_{idx:05d}"
            path = os.path.join(out_dir, f"{stem}_pred.png")
            Image.fromarray(colorize(preds[i], num_classes)).save(path)
            written.append(path)
            if save_gt:
                gt_path = os.path.join(out_dir, f"{stem}_gt.png")
                Image.fromarray(colorize(np.asarray(y[i]), num_classes)).save(gt_path)
                written.append(gt_path)
            if max_images is not None and len(written) >= max_images * (2 if save_gt else 1):
                done = True
                break
        if done:
            break
    return written
