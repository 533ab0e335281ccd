"""Shared synthetic-scene builders for geometry/SfM tests."""
import numpy as np


def make_scene(rng, n_views=4, n_pts=64, img=512.0):
    """Cameras on a ring looking at points near the origin."""
    K = np.array([[500.0, 0, img / 2], [0, 500.0, img / 2], [0, 0, 1.0]])
    pts = rng.uniform(-0.3, 0.3, (n_pts, 3))
    Ts = []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 8)
        center = np.array([2.0 * np.sin(ang), 0.3 * rng.standard_normal(), 2.0 * np.cos(ang)])
        z = -center / np.linalg.norm(center)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1).T  # world->cam
        t = -R @ center
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    return K, pts, np.stack(Ts)


def project_np(K, T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    uv = pc[:, :2] / pc[:, 2:3]
    return uv @ K[:2, :2].T + K[:2, 2], pc[:, 2]
