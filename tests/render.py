"""Synthetic image renderer for end-to-end pipeline tests: a world of landmarks,
each stamped with a unique random texture patch, projected per frame."""
import numpy as np


class DotWorld:
    def __init__(self, rng, n_wall=500, n_front=150, F=300.0, W=480, H=360,
                 patch=9):
        self.F, self.W, self.H = F, W, H
        wall = np.stack([rng.uniform(-8, 8, n_wall), rng.uniform(-5, 5, n_wall),
                         rng.uniform(5.5, 7.0, n_wall)], 1)
        front = np.stack([rng.uniform(-5, 5, n_front), rng.uniform(-3, 3, n_front),
                          rng.uniform(3.0, 5.0, n_front)], 1)
        self.pts = np.concatenate([wall, front]).astype(np.float32)
        n = len(self.pts)
        self.patches = rng.uniform(40, 255, size=(n, patch, patch)).astype(np.float32)
        self.r = patch // 2

    def render(self, Rwc, Cw, background=35.0, with_depth=False):
        F, W, H, r = self.F, self.W, self.H, self.r
        img = np.full((H, W), background, np.float32)
        dep = np.zeros((H, W), np.float32)
        Pc = (np.asarray(Rwc).T @ (self.pts - np.asarray(Cw)).T).T
        vis = Pc[:, 2] > 0.5
        u = (F * Pc[:, 0] / np.maximum(Pc[:, 2], 1e-6) + W / 2).astype(int)
        v = (F * Pc[:, 1] / np.maximum(Pc[:, 2], 1e-6) + H / 2).astype(int)
        for i in np.nonzero(vis)[0]:
            if r + 1 <= u[i] < W - r - 1 and r + 1 <= v[i] < H - r - 1:
                img[v[i] - r:v[i] + r + 1, u[i] - r:u[i] + r + 1] = self.patches[i]
                dep[v[i] - r:v[i] + r + 1, u[i] - r:u[i] + r + 1] = Pc[i, 2]
        return (img, dep) if with_depth else img

    def render_stereo(self, Rwc, Cw, baseline=0.11, background=35.0):
        """Rectified pair: right camera displaced by +baseline along camera x."""
        left = self.render(Rwc, Cw, background)
        C_right = np.asarray(Cw) + np.asarray(Rwc) @ np.array([baseline, 0, 0], np.float32)
        right = self.render(Rwc, C_right, background)
        return left, right
