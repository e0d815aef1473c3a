"""C++ grid-subsampling op vs numpy fallback."""
import numpy as np

from adaptpoint_tpu.ops.cpu.grid_subsample import (_numpy_grid_subsample,
                                                   grid_subsample)


def test_grid_subsample_basic(rng_np):
    pts = rng_np.standard_normal((1000, 3)).astype(np.float32)
    feats = rng_np.standard_normal((1000, 4)).astype(np.float32)
    out_p, out_f = grid_subsample(pts, feats, sample_dl=0.5)
    assert out_p.shape[0] < 1000 and out_p.shape[1] == 3
    assert out_f.shape == (out_p.shape[0], 4)
    # barycenters stay inside the cloud bounds
    assert (out_p.min(0) >= pts.min(0) - 1e-5).all()
    assert (out_p.max(0) <= pts.max(0) + 1e-5).all()


def test_grid_subsample_matches_numpy(rng_np):
    pts = rng_np.standard_normal((500, 3)).astype(np.float32)
    feats = rng_np.standard_normal((500, 2)).astype(np.float32)
    p1, f1 = grid_subsample(pts, feats, sample_dl=0.4)
    p2, f2 = _numpy_grid_subsample(pts, feats, 0.4)
    assert p1.shape == p2.shape
    # compare as sets (voxel enumeration order may differ)
    o1 = np.lexsort(p1.T)
    o2 = np.lexsort(p2.T)
    assert np.allclose(p1[o1], p2[o2], atol=1e-5)
    assert np.allclose(f1[o1], f2[o2], atol=1e-5)


def test_grid_subsample_single_voxel():
    pts = np.zeros((10, 3), np.float32)
    out_p, _ = grid_subsample(pts, None, sample_dl=1.0)
    assert out_p.shape == (1, 3)
    assert np.allclose(out_p, 0)


def test_kdtree_knn_matches_bruteforce(rng_np):
    from adaptpoint_tpu.ops.cpu.kdtree_knn import kdtree_knn, _numpy_knn
    support = rng_np.standard_normal((500, 3)).astype(np.float32)
    queries = rng_np.standard_normal((40, 3)).astype(np.float32)
    idx, d2 = kdtree_knn(support, queries, 8)
    ridx, rd2 = _numpy_knn(support, queries, 8)
    assert np.allclose(np.sort(d2, 1), np.sort(rd2, 1), atol=1e-5)
    # same neighbor sets (ties aside)
    for a, b in zip(idx, ridx):
        assert set(a.tolist()) == set(b.tolist())


def test_knn_search_batched():
    from adaptpoint_tpu.ops.cpu.kdtree_knn import knn_search, _numpy_knn
    rng = np.random.default_rng(0)
    s = rng.standard_normal((2, 300, 3)).astype(np.float32)
    q = rng.standard_normal((2, 50, 3)).astype(np.float32)
    idx = knn_search(s, q, 8)
    ref = np.stack([_numpy_knn(a, b, 8)[0] for a, b in zip(s, q)])
    assert idx.shape == (2, 50, 8) and (idx == ref).all()
    # unbatched 2D path
    idx2 = knn_search(s[0], q[0], 8)
    assert (idx2 == ref[0]).all()
