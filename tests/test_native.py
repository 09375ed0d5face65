"""Native host-compute tier (slcl_tpu/native): build, correctness, fallback.

The C++ SLIC is an independent implementation of the same algorithm family
as the numpy fallback (grid-seeded (y, x, intensity) k-means), so the tests
assert behavioral contracts — valid assignments, within-segment variance
reduction, determinism, segment_replace == numpy oracle — rather than
bit-parity between the two k-means.
"""
import numpy as np
import pytest

from slcl_tpu import native
from slcl_tpu.data import transforms as T


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native tier unavailable (no g++?)")
    return True


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    base = np.zeros((96, 128), np.float32)
    base[20:60, 30:90] = 1.0  # a structured region, not pure noise
    return base + 0.1 * rng.standard_normal((96, 128)).astype(np.float32)


def test_slic_assign_valid_and_deterministic(lib_ok, img):
    a1 = native.slic_assign(img, grid=6, iters=3)
    a2 = native.slic_assign(img, grid=6, iters=3)
    assert a1.shape == img.shape and a1.dtype == np.int32
    assert a1.min() >= 0 and a1.max() < 36
    np.testing.assert_array_equal(a1, a2)
    # every pixel assigned; segments are spatially coherent-ish: the mean
    # within-segment intensity variance must be well below the global one
    glob = img.var()
    within = 0.0
    for k in np.unique(a1):
        m = a1 == k
        within += img[m].var() * m.sum()
    within /= img.size
    assert within < 0.7 * glob


def test_slic_matches_numpy_fallback_quality(lib_ok, img):
    """Native (local-search SLIC) and numpy (global k-means) differ in
    assignment but must achieve comparable clustering quality."""
    def within_var(a):
        tot = 0.0
        for k in np.unique(a):
            m = a == k
            tot += img[m].var() * m.sum()
        return tot / img.size

    wn = within_var(native.slic_assign(img, grid=6, iters=3))
    wp = within_var(T._slic_assign_numpy(img, g=6, iters=2))
    assert wn <= wp * 1.5


def test_segment_replace_matches_numpy_oracle(lib_ok, img):
    assign = native.slic_assign(img, grid=5, iters=2)
    rng = np.random.default_rng(3)
    replace = rng.random(25) < 0.5
    out = native.segment_replace(img, assign, replace)
    # numpy oracle
    flat = assign.ravel()
    cnt = np.maximum(np.bincount(flat, minlength=25), 1).astype(np.float64)
    means = (np.bincount(flat, img.ravel(), 25) / cnt).astype(np.float32)
    ref = np.where(replace[assign], means[assign], img)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # non-replaced pixels untouched
    keep = ~replace[assign]
    np.testing.assert_array_equal(out[keep], img[keep])


def test_segment_replace_multichannel(lib_ok, img):
    img3 = np.stack([img, img * 2, img + 1], -1).astype(np.float32)
    assign = native.slic_assign(img, grid=4, iters=2)
    replace = np.ones(16, bool)
    out = native.segment_replace(img3, assign, replace)
    assert out.shape == img3.shape
    # channel relations preserved by per-channel means
    np.testing.assert_allclose(out[..., 1], 2 * out[..., 0], rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(out[..., 2], out[..., 0] + 1, rtol=1e-4,
                               atol=1e-4)


def test_superpixels_uses_fallback_when_disabled(monkeypatch, img):
    """SLCL_NATIVE=0 -> transforms.superpixels still works (numpy path)."""
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)  # load() returns None
    out = T.superpixels(img, np.random.default_rng(0), n_segments=36,
                        p_replace=1.0, iters=1)
    assert out.shape == img.shape and np.isfinite(out).all()
    assert out.std() <= img.std() + 1e-6  # mean-replacement smooths


def test_superpixels_native_and_fallback_same_contract(lib_ok, img):
    """Same rng -> same replacement decisions; both paths smooth the image
    and preserve the intensity range."""
    for forced_off in (False, True):
        if forced_off:
            native_lib, native_tried = native._LIB, native._TRIED
            native._LIB, native._TRIED = None, True
        try:
            out = T.superpixels(img, np.random.default_rng(7),
                                n_segments=64, p_replace=0.8, iters=2)
        finally:
            if forced_off:
                native._LIB, native._TRIED = native_lib, native_tried
        assert out.min() >= img.min() - 1e-5
        assert out.max() <= img.max() + 1e-5
        assert out.std() < img.std()
