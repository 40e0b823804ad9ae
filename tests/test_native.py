"""Native C++ host-IO library tests (build, parse parity, gather parity,
and integration with the PLY reader)."""
import numpy as np
import pytest

from pcfm.native import get_lib, parse_ascii_rows, subsample_gather


@pytest.fixture(scope="module")
def lib():
    lb = get_lib()
    if lb is None:
        pytest.skip("native toolchain unavailable")
    return lb


def test_parse_ascii_matches_numpy(lib):
    rng = np.random.RandomState(0)
    arr = rng.randn(500, 6).astype(np.float32)
    body = "\n".join(" ".join(f"{v:.6f}" for v in row) for row in arr)
    got = parse_ascii_rows(body.encode(), 6, 500)
    np.testing.assert_allclose(got, np.round(arr, 6), atol=2e-6)


def test_parse_ascii_int_columns(lib):
    body = b"1.5 2.5 3.5 10 20 30\n-1 -2 -3 0 255 128\n"
    got = parse_ascii_rows(body, 6, 2)
    np.testing.assert_allclose(got, [[1.5, 2.5, 3.5, 10, 20, 30],
                                     [-1, -2, -3, 0, 255, 128]])


def test_subsample_gather_matches_numpy(lib):
    rng = np.random.RandomState(0)
    src = rng.randn(1000, 3).astype(np.float32)
    idx = rng.randint(0, 1000, size=5000).astype(np.int64)
    np.testing.assert_array_equal(subsample_gather(src, idx), src[idx])


def test_ascii_ply_roundtrip_uses_native(lib, tmp_path):
    from pcfm.data import load_ply, save_point_cloud_ply_rgb
    rng = np.random.RandomState(0)
    xyz = rng.randn(2000, 3).astype(np.float32)
    rgb = rng.rand(2000, 3).astype(np.float32)
    p = str(tmp_path / "big.ply")
    save_point_cloud_ply_rgb(xyz, rgb, p)
    got, gotrgb = load_ply(p)
    np.testing.assert_allclose(got, xyz, atol=1e-5)
    want = (np.clip(rgb, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(gotrgb, want)
