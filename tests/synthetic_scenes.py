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


def render_cube_view(K, T, tex, half=0.2, img=128):
    """Render a textured cube (center origin, half-size ``half``) under
    world->cam pose ``T`` with a per-face slice of ``tex`` (square uint8).

    A convex cube's visible faces never overlap on screen, so each face is
    one plane-homography warp composited by its own coverage mask — no
    z-buffer needed. Returns a uint8 [img, img] grayscale view.
    """
    import cv2
    import numpy as np

    R, t = T[:3, :3], T[:3, 3]
    cam_c = -R.T @ t
    out = np.zeros((img, img), np.uint8)
    th, tw = tex.shape
    fh = th // 2  # 2x3 grid of face textures
    fw = tw // 3
    faces = []
    for axis in range(3):
        for s in (-1.0, 1.0):
            n = np.zeros(3)
            n[axis] = s
            b1 = np.zeros(3)
            b1[(axis + 1) % 3] = 1.0
            b2 = np.cross(n, b1)
            faces.append((n * half, b1, b2, n))
    for fi, (o, b1, b2, n) in enumerate(faces):
        if np.dot(n, cam_c - o) <= 1e-6:
            continue  # back-facing
        ftex = tex[
            (fi // 3) * fh : (fi // 3 + 1) * fh,
            (fi % 3) * fw : (fi % 3 + 1) * fw,
        ]
        h, w = ftex.shape
        # texture pixel (u, v) -> world: o - half*b1 - half*b2 + u*sx*b1 + v*sy*b2
        origin = o - half * b1 - half * b2
        sx, sy = 2 * half / w, 2 * half / h
        M = K @ np.stack(
            [R @ b1 * sx, R @ b2 * sy, R @ origin + t], axis=1
        )
        face_img = cv2.warpPerspective(ftex, M, (img, img))
        mask = cv2.warpPerspective(
            np.full((h, w), 255, np.uint8), M, (img, img)
        )
        sel = mask > 127
        out[sel] = face_img[sel]
    return out


def make_cube_scene_object(
    data_dir, obj, seq_names, frames_per_seq, img, rng, half=0.2
):
    """Write a OnePose-format object: a textured cube viewed from an
    interleaved camera ring (sequences alternate ring positions so held-out
    sequences sit between mapped views). Non-planar by construction — the
    SfM cloud spans 2-3 cube faces per view, so PnP is well-posed (the
    single-plane variant hits the planar pose ambiguity)."""
    import os

    import cv2
    import numpy as np

    n_total = frames_per_seq * len(seq_names)
    K, _, Ts = make_scene(rng, n_views=n_total, n_pts=8, img=float(img))
    blk = max(img // 32, 4)
    cells = 32
    tex = (
        np.kron(rng.random((2 * cells, 3 * cells)), np.ones((blk, blk))) * 205
        + 50
    ).astype(np.uint8)
    for s, seq in enumerate(seq_names):
        seq_dir = os.path.join(data_dir, obj, seq)
        for sub in ("color", "intrin_ba", "poses_ba"):
            os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
        for j in range(frames_per_seq):
            i = j * len(seq_names) + s
            im = render_cube_view(K, Ts[i], tex, half=half, img=img)
            cv2.imwrite(os.path.join(seq_dir, "color", f"{j}.png"), im)
            np.savetxt(os.path.join(seq_dir, "intrin_ba", f"{j}.txt"), K)
            np.savetxt(os.path.join(seq_dir, "poses_ba", f"{j}.txt"), Ts[i])
    corners = np.array(
        [
            [x, y, z]
            for z in (-half, half)
            for y in (-half, half)
            for x in (-half, half)
        ]
    )
    np.savetxt(os.path.join(data_dir, obj, "box3d_corners.txt"), corners)
    return K, Ts
