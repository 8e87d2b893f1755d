"""Image pipeline: python vs native C runtime produce identical bytes."""

import numpy as np
import pytest

from kajo_tpu import runtime
from kajo_tpu.utils import image


@pytest.fixture(scope="module")
def hdr():
    rng = np.random.default_rng(0)
    img = rng.uniform(-0.2, 2.0, (17, 23, 4)).astype(np.float32)
    return img


def test_tonemap_reference_pipeline(hdr):
    out = image.tonemap(hdr)
    # clamp before gamma; alpha forced opaque; floor(x*255+.5) rounding
    v = np.clip(hdr[..., :3], 0, 1) ** (1 / 2.2)
    expected = (v * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out[..., :3], expected)
    assert (out[..., 3] == 255).all()


def test_native_tonemap_matches_python(hdr):
    native = runtime.tonemap(hdr)
    if native is None:
        pytest.skip("no C compiler")
    py = image.tonemap(hdr)
    diff = np.abs(native.astype(int) - py.astype(int))
    assert diff.max() <= 1  # powf vs np.power may differ by one ulp pre-round
    assert (diff != 0).mean() < 0.01


def test_native_png_roundtrip(hdr):
    rgba8 = image.tonemap(hdr)
    data = runtime.encode_png(rgba8)
    if data is None:
        pytest.skip("no C compiler")
    import io
    from PIL import Image

    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(back, rgba8)


def test_python_png_roundtrip(hdr):
    rgba8 = image.tonemap(hdr)
    data = image.encode_png(rgba8)
    import io
    from PIL import Image

    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(back, rgba8)


def test_native_accumulate(hdr):
    total = np.zeros_like(hdr)
    disp = runtime.accumulate(total, hdr, 1)
    if disp is None:
        pytest.skip("no C compiler")
    np.testing.assert_allclose(total, hdr, rtol=1e-6)
    py = image.tonemap(hdr)
    assert np.abs(disp.astype(int) - py.astype(int)).max() <= 1
