"""Native async .npy writer: format parity with numpy, concurrency, errors."""

import numpy as np
import pytest

from nlsolvers_tpu import native

try:
    native.load_library()
    HAVE_NATIVE = True
except native.NativeUnavailable:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="no C++ toolchain available")


@needs_native
@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64,
                                   np.complex128, np.int32, np.int64])
def test_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 9)).astype(dtype)
    with native.AsyncNpyWriter(1) as w:
        w.submit(tmp_path / "a.npy", a)
        w.flush()
        assert w.errors == 0
    b = np.load(tmp_path / "a.npy")
    assert b.dtype == a.dtype and b.shape == a.shape
    np.testing.assert_array_equal(a, b)


@needs_native
@pytest.mark.parametrize("shape", [(5,), (1, 1), (2, 3, 4), (2, 3, 4, 5)])
def test_roundtrip_shapes(tmp_path, shape):
    a = np.arange(int(np.prod(shape)), dtype=np.float64).reshape(shape)
    native.write_npy_sync(tmp_path / "s.npy", a)
    b = np.load(tmp_path / "s.npy")
    assert b.shape == shape
    np.testing.assert_array_equal(a, b)


@needs_native
def test_many_concurrent_writes(tmp_path):
    rng = np.random.default_rng(1)
    arrays = [rng.standard_normal((32, 32)).astype(np.float32)
              for _ in range(50)]
    with native.AsyncNpyWriter(4) as w:
        for i, a in enumerate(arrays):
            w.submit(tmp_path / f"f{i:03d}.npy", a)
        w.flush()
        assert w.pending == 0 and w.errors == 0
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(np.load(tmp_path / f"f{i:03d}.npy"), a)


@needs_native
def test_submit_copies_buffer(tmp_path):
    """Mutating the source after submit must not corrupt the written file."""
    a = np.ones((64, 64), np.float64)
    with native.AsyncNpyWriter(1) as w:
        w.submit(tmp_path / "c.npy", a)
        a[:] = -1.0
        w.flush()
    np.testing.assert_array_equal(np.load(tmp_path / "c.npy"),
                                  np.ones((64, 64)))


@needs_native
def test_error_counting(tmp_path):
    with native.AsyncNpyWriter(1) as w:
        w.submit(tmp_path / "no_such_dir" / "x.npy", np.ones(3))
        w.flush()
        assert w.errors == 1


def test_sync_fallback_without_native(tmp_path, monkeypatch):
    """write_npy_sync falls back to numpy.save when the toolchain is gone."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_error", "forced for test")
    native.write_npy_sync(tmp_path / "fb.npy", np.arange(4.0))
    np.testing.assert_array_equal(np.load(tmp_path / "fb.npy"),
                                  np.arange(4.0))
