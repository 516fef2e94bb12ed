"""Preprocessing: host-side decode/resize, device-side augment/normalize/relabel.

The reference's MyCoTransform (duplicated in every trainer,
train_RAPFT_step1.py:53-86) does, per sample, on the host:
    Resize (512,1024) bilinear/nearest -> [train only] hflip p=0.5 +
    random translate tx,ty in [-2,2] px -> ToTensor (/255) ->
    Relabel(255 -> NUM_CLASSES-1)

Here only decode+resize stay on the host (PIL, for bit-parity with
torchvision's PIL-backed Resize); everything else runs on device, batched,
inside the train step's jit — flip/translate are a handful of fused
gather/select ops, effectively free next to the conv stack, and the H2D
transfer ships uint8 (4x smaller than f32).

Translation fidelity: the reference implements translation as ImageOps.expand
+ crop. For *positive* shifts the new border is filled with 0 (image) / 255
(label -> becomes the ignore class after relabel). For *negative* shifts PIL's
crop pads beyond the edge with 0 for both image AND label — i.e. the "fill
with 255" only applies on two of the four edges. `augment_batch` replicates
this exactly (fill_pos for top/left, 0 for bottom/right).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

MAX_TRANSLATE = 2  # pixels, each axis (train_RAPFT_step1.py:66-68)


# ---------------------------------------------------------------------------
# Host side
# ---------------------------------------------------------------------------

def decode_pair(
    img_path: str,
    label_path: str,
    *,
    height: int,
    width: int,
    label_map: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode + resize one (image, label) pair -> (u8 [H,W,3], u8 [H,W]).

    Uses the native C++ decoder (mdilss_tpu/native) when available — fused
    decode+resize, bit-exact with the PIL path (tests/test_native_decoder.py)
    — and falls back to PIL per file for anything it does not handle.
    The label LUT commutes with nearest resize, so it applies after.
    """
    from ..native import get_decoder

    dec = get_decoder()
    img = lbl = None
    if dec is not None:
        try:
            with open(img_path, "rb") as f:
                raw = f.read()
            img = np.frombuffer(
                dec.decode_image(raw, height, width), np.uint8
            ).reshape(height, width, 3)
        except ValueError:
            img = None
        try:
            with open(label_path, "rb") as f:
                raw = f.read()
            lbl = np.frombuffer(
                dec.decode_label(raw, height, width), np.uint8
            )
            lbl = (label_map[lbl] if label_map is not None else lbl).reshape(height, width)
        except ValueError:
            lbl = None
    if img is None:
        with open(img_path, "rb") as f:
            pil = Image.open(f).convert("RGB").resize((width, height), Image.BILINEAR)
        img = np.asarray(pil, np.uint8)
    if lbl is None:
        with open(label_path, "rb") as f:
            pil = Image.open(f).convert("P")
            if label_map is not None:
                pil = Image.fromarray(label_map[np.array(pil)])
            pil = pil.resize((width, height), Image.NEAREST)
        lbl = np.asarray(pil, np.uint8)
    return img, lbl


# ---------------------------------------------------------------------------
# Device side (all jitted; caller fuses into the train step)
# ---------------------------------------------------------------------------

def _translate2d(x: jax.Array, tx: jax.Array, ty: jax.Array, fill_pos: jax.Array):
    """Shift [H,W,...] content right/down by (tx, ty) in [-2, 2].

    Top/left fill with `fill_pos` (positive shifts), bottom/right with 0
    (negative shifts) — PIL expand+crop semantics, see module docstring.
    """
    h, w = x.shape[0], x.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    rolled = jnp.roll(x, (ty, tx), axis=(0, 1))
    border_pos = (rows < ty) | (cols < tx)  # ty/tx > 0: new top/left area
    border_neg = (rows >= h + ty) | (cols >= w + tx)  # ty/tx < 0: new bottom/right
    while border_pos.ndim < x.ndim:
        border_pos = border_pos[..., None]
        border_neg = border_neg[..., None]
    out = jnp.where(border_pos, jnp.asarray(fill_pos, x.dtype), rolled)
    return jnp.where(border_neg, jnp.asarray(0, x.dtype), out)


@partial(jax.jit, static_argnames=("num_classes", "out_dtype"))
def augment_batch(images_u8, labels_u8, rng, *, num_classes: int,
                  out_dtype=jnp.float32):
    """Train-time augment on device: hflip p=.5, translate +-2px, /255,
    relabel 255 -> num_classes-1.

    images_u8 [N,H,W,3] uint8, labels_u8 [N,H,W] uint8.
    Returns (images in [0,1], labels int32). `out_dtype` sets the image
    output dtype: a bf16 trainer passes bf16 so this jit writes half the
    bytes and the step's own input cast becomes a no-op — values are
    identical to casting later (the divide still runs in f32, then rounds).
    """
    n = images_u8.shape[0]
    k_flip, k_tx, k_ty = jax.random.split(rng, 3)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    tx = jax.random.randint(k_tx, (n,), -MAX_TRANSLATE, MAX_TRANSLATE + 1)
    ty = jax.random.randint(k_ty, (n,), -MAX_TRANSLATE, MAX_TRANSLATE + 1)

    imgs = jnp.where(flip[:, None, None, None], images_u8[:, :, ::-1], images_u8)
    lbls = jnp.where(flip[:, None, None], labels_u8[:, :, ::-1], labels_u8)
    imgs = jax.vmap(lambda x, a, b: _translate2d(x, a, b, 0))(imgs, tx, ty)
    lbls = jax.vmap(lambda x, a, b: _translate2d(x, a, b, 255))(lbls, tx, ty)
    return _finalize(imgs, lbls, num_classes, out_dtype)


@partial(jax.jit, static_argnames=("num_classes",))
def prepare_batch(images_u8, labels_u8, *, num_classes: int):
    """Eval-time: /255 + relabel only (MyCoTransform(augment=False))."""
    return _finalize(images_u8, labels_u8, num_classes)


def _finalize(imgs_u8, lbls_u8, num_classes: int, out_dtype=jnp.float32):
    images = (imgs_u8.astype(jnp.float32) / 255.0).astype(out_dtype)
    labels = lbls_u8.astype(jnp.int32)
    labels = jnp.where(labels == 255, num_classes - 1, labels)
    return images, labels
