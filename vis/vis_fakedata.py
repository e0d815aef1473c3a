"""Viewer for the fake-cloud dumps written during AdaptPoint training.

Parity: vis/vis_fakedata.py in the reference (open3d viewer of the per-epoch
minibatch h5 dumps). Uses open3d when available, else matplotlib 3D scatter.

Usage: python vis/vis_fakedata.py <run_dir>/fakedata/epochN/minibatchM.h5 [idx]
"""
import sys


def load(path):
    import h5py
    import numpy as np
    with h5py.File(path, "r") as f:
        return {k: np.asarray(f[k]) for k in f.keys()}


def show(clouds, titles):
    try:
        import open3d as o3d
        geoms = []
        offset = 0.0
        for c in clouds:
            pc = o3d.geometry.PointCloud()
            pts = c.copy()
            pts[:, 0] += offset
            pc.points = o3d.utility.Vector3dVector(pts)
            geoms.append(pc)
            offset += 2.5
        o3d.visualization.draw_geometries(geoms)
    except ImportError:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(5 * len(clouds), 5))
        for i, (c, t) in enumerate(zip(clouds, titles)):
            ax = fig.add_subplot(1, len(clouds), i + 1, projection="3d")
            ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=1)
            ax.set_title(t)
        out = "fakedata_vis.png"
        fig.savefig(out, dpi=120)
        print(f"saved {out}")


def main():
    path = sys.argv[1]
    idx = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    data = load(path)
    clouds, titles = [], []
    for key in ("raw", "raw_pointwolf", "pointcloud"):
        if key in data:
            clouds.append(data[key][idx])
            titles.append(key)
    print("label:", data.get("label", [None])[idx])
    show(clouds, titles)


if __name__ == "__main__":
    main()
