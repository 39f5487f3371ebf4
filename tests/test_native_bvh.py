"""Native C++ BVH builder must match the Python reference builder exactly."""
import numpy as np
import pytest

from kajiya_tpu.rt.bvh import build_bvh, build_bvh_native


def _boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return c - h, c + h


@pytest.fixture(scope="module")
def toolchain():
    try:
        from kajiya_tpu.native import load

        load("bvh_builder")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"no native toolchain: {e}")


class TestNativeParity:
    @pytest.mark.parametrize("n", [3, 17, 1000, 4097])
    def test_identical_topology(self, toolchain, n):
        tmin, tmax = _boxes(n, seed=n)
        py, py_levels = build_bvh(tmin, tmax, leaf_size=4)
        cc, cc_levels = build_bvh_native(tmin, tmax, leaf_size=4)
        np.testing.assert_array_equal(py.tri_order, cc.tri_order)
        np.testing.assert_array_equal(py.node_first, cc.node_first)
        np.testing.assert_array_equal(py.node_count, cc.node_count)
        np.testing.assert_array_equal(py.node_skip, cc.node_skip)
        np.testing.assert_allclose(py.node_min, cc.node_min, rtol=1e-6)
        np.testing.assert_allclose(py.node_max, cc.node_max, rtol=1e-6)
        assert len(py_levels) == len(cc_levels)
        for (a, b, c), (d, e, f) in zip(py_levels, cc_levels):
            np.testing.assert_array_equal(a, d)
            np.testing.assert_array_equal(b, e)
            np.testing.assert_array_equal(c, f)

    def test_native_speed_on_large_input(self, toolchain):
        import time

        tmin, tmax = _boxes(200_000, seed=5)
        t0 = time.perf_counter()
        cc, _ = build_bvh_native(tmin, tmax, leaf_size=4)
        dt = time.perf_counter() - t0
        assert cc.node_min.shape[0] > 50_000
        assert dt < 5.0, f"native build too slow: {dt:.2f}s"
