"""Native C++ data-plane: build, decode golden vs PIL, parallel batch fill."""

import numpy as np
import pytest

from layout2img_tpu.data import native


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    import PIL.Image

    rng = np.random.default_rng(0)
    # smooth image so JPEG loss is small
    base = rng.random((12, 16, 3))
    img = np.kron(base, np.ones((20, 20, 1)))[:220, :300]
    arr = (img * 255).astype(np.uint8)
    path = tmp_path_factory.mktemp("native") / "test.jpg"
    PIL.Image.fromarray(arr).save(path, quality=95)
    return str(path)


def test_native_builds():
    assert native.native_available(), getattr(native, "_build_error", None)


def test_decode_matches_pil(jpeg_file):
    import PIL.Image

    got = native.load_image(jpeg_file, 64)
    with PIL.Image.open(jpeg_file) as im:
        want = np.asarray(
            im.convert("RGB").resize((64, 64), PIL.Image.BILINEAR), np.float32
        )
    want = (want / 255.0 - 0.5) * 2
    assert got.shape == (64, 64, 3)
    # PIL uses fixed-point filtering; allow small tolerance
    assert np.abs(got - want).mean() < 0.02
    assert np.abs(got - want).max() < 0.15


def test_flip(jpeg_file):
    a = native.load_image(jpeg_file, 32)
    b = native.load_image(jpeg_file, 32, flip=True)
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-5)


def test_batch_parallel_equals_sequential(jpeg_file):
    n = 12
    paths = [jpeg_file] * n
    flips = [i % 2 == 1 for i in range(n)]
    batch = native.load_batch(paths, 48, flips, threads=4)
    assert batch.shape == (n, 48, 48, 3)
    single0 = native.load_image(jpeg_file, 48, False)
    single1 = native.load_image(jpeg_file, 48, True)
    np.testing.assert_array_equal(batch[0], single0)
    np.testing.assert_array_equal(batch[1], single1)
    np.testing.assert_array_equal(batch[10], single0)


def test_shuffle_deterministic_permutation():
    a = native.shuffle_indices(42, 1000)
    b = native.shuffle_indices(42, 1000)
    c = native.shuffle_indices(43, 1000)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))
