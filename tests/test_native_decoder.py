"""Native C++ decoder (mdilss_tpu/native) vs the PIL oracle: bit-exact
decode+resize for every format the data pipeline produces, and decode_pair
end-to-end equivalence."""
import io
import os

import numpy as np
import pytest
from PIL import Image

from mdilss_tpu.native import get_decoder

dec = get_decoder()
pytestmark = pytest.mark.skipif(dec is None, reason="native decoder unavailable")


def _png(arr, mode=None):
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, "PNG")
    return buf.getvalue()


@pytest.mark.parametrize("in_hw,out_hw", [
    ((37, 53), (16, 24)),      # downscale, odd sizes
    ((64, 128), (512, 1024)),  # upscale
    ((256, 512), (96, 192)),   # production-like downscale ratio
    ((32, 64), (32, 64)),      # identity
])
def test_png_image_bit_exact(rng, in_hw, out_hw):
    arr = rng.integers(0, 256, (*in_hw, 3), np.uint8)
    (oh, ow) = out_hw
    got = np.frombuffer(dec.decode_image(_png(arr), oh, ow), np.uint8).reshape(oh, ow, 3)
    want = np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)


def test_jpeg_image_bit_exact(rng):
    arr = rng.integers(0, 256, (64, 96, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90)
    raw = buf.getvalue()
    got = np.frombuffer(dec.decode_image(raw, 32, 48), np.uint8).reshape(32, 48, 3)
    want = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB").resize((48, 32), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)


def test_gray_label_nearest_bit_exact(rng):
    lbl = rng.integers(0, 27, (77, 131), np.uint8)
    lbl[0, :5] = 255  # ignore pixels
    raw = _png(lbl, mode="L")
    got = np.frombuffer(dec.decode_label(raw, 33, 57), np.uint8).reshape(33, 57)
    want = np.asarray(Image.open(io.BytesIO(raw)).convert("P").resize((57, 33), Image.NEAREST))
    np.testing.assert_array_equal(got, want)


def test_palette_label_raw_indices(rng):
    lbl = rng.integers(0, 27, (17, 19), np.uint8)
    raw = _png(lbl, mode="P")  # PIL compacts the palette on save
    got = np.frombuffer(dec.decode_label(raw, 17, 19), np.uint8).reshape(17, 19)
    want = np.asarray(Image.open(io.BytesIO(raw)).convert("P"))
    np.testing.assert_array_equal(got, want)


def test_rgba_png_drops_alpha(rng):
    arr = rng.integers(0, 256, (20, 30, 4), np.uint8)
    raw = _png(arr, mode="RGBA")
    got = np.frombuffer(dec.decode_image(raw, 10, 15), np.uint8).reshape(10, 15, 3)
    want = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB").resize((15, 10), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)


def test_rgb_label_rejected(rng):
    raw = _png(rng.integers(0, 256, (8, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        dec.decode_label(raw, 4, 4)


def test_decode_pair_matches_pil(rng, tmp_path):
    from mdilss_tpu.data.transforms import decode_pair

    img = rng.integers(0, 256, (100, 150, 3), np.uint8)
    lbl = rng.integers(0, 27, (100, 150), np.uint8)
    ip = str(tmp_path / "img.png")
    lp = str(tmp_path / "lbl.png")
    Image.fromarray(img).save(ip)
    Image.fromarray(lbl, mode="L").save(lp)
    lut = np.arange(256, dtype=np.uint8)
    lut[26] = 3  # exercise the label remap
    got_i, got_l = decode_pair(ip, lp, height=40, width=60, label_map=lut)

    want_i = np.asarray(Image.open(ip).convert("RGB").resize((60, 40), Image.BILINEAR))
    pil_l = Image.open(lp).convert("P")
    pil_l = Image.fromarray(lut[np.array(pil_l)]).resize((60, 40), Image.NEAREST)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_l, np.asarray(pil_l))

    # PIL fallback path produces identical output
    os.environ["MDILSS_NO_NATIVE"] = "1"
    import mdilss_tpu.native as nat

    old = (nat._tried, nat._decoder)
    nat._tried, nat._decoder = True, None
    try:
        fb_i, fb_l = decode_pair(ip, lp, height=40, width=60, label_map=lut)
        np.testing.assert_array_equal(fb_i, got_i)
        np.testing.assert_array_equal(fb_l, got_l)
    finally:
        nat._tried, nat._decoder = old
        del os.environ["MDILSS_NO_NATIVE"]
