"""Photometric augmentation registry for training images.

Behavioral port of reference ``src/utils/utils_phoaug.py:11-125``
(``build_augmentor`` with 'dark' / 'mobile' styles backed by albumentations).
Implemented in numpy so the host loader has no extra dependencies; each
augmentor maps a [H, W] float grayscale in [0, 1] to the same shape.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _rand_brightness_contrast(img, rng, b=0.4, c=0.3):
    alpha = 1.0 + rng.uniform(-c, c)
    beta = rng.uniform(-b, b)
    return np.clip(img * alpha + beta, 0.0, 1.0)


def _gauss_noise(img, rng, sigma_max=0.06):
    return np.clip(img + rng.normal(0, rng.uniform(0, sigma_max), img.shape), 0, 1)


def _motion_blur(img, rng, max_k=5):
    k = int(rng.integers(2, max_k + 1))
    horiz = rng.random() < 0.5
    kernel = np.ones(k) / k
    out = img.copy()
    if horiz:
        for i in range(img.shape[0]):
            out[i] = np.convolve(img[i], kernel, mode="same")
    else:
        for j in range(img.shape[1]):
            out[:, j] = np.convolve(img[:, j], kernel, mode="same")
    return out


def _iso_noise(img, rng):
    # luminance-dependent shot noise approximation
    sigma = rng.uniform(0.01, 0.05)
    return np.clip(img + rng.normal(0, sigma, img.shape) * np.sqrt(img + 1e-3), 0, 1)


class DarkAug:
    """Low-light style: strong brightness/contrast jitter + blur + noise
    (reference 'dark' augmentor)."""

    def __init__(self, seed: Optional[int] = None, p: float = 0.75):
        self.rng = np.random.default_rng(seed)
        self.p = p

    def __call__(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng
        if rng.random() < self.p:
            img = _rand_brightness_contrast(img, rng, b=0.6, c=0.4)
        if rng.random() < 0.1:
            img = _motion_blur(img, rng, max_k=7)
        if rng.random() < 0.25:
            img = _gauss_noise(img, rng)
        return img


class MobileAug:
    """Mobile-capture style: motion blur + ISO noise (reference 'mobile')."""

    def __init__(self, seed: Optional[int] = None):
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        rng = self.rng
        if rng.random() < 0.25:
            img = _motion_blur(img, rng)
        if rng.random() < 0.25:
            img = _iso_noise(img, rng)
        if rng.random() < 0.5:
            img = _rand_brightness_contrast(img, rng)
        return img


def build_augmentor(
    method: Optional[str] = None, seed: Optional[int] = None
) -> Optional[Callable]:
    """Registry mirroring the reference's ``build_augmentor`` names."""
    if method is None or method in ("none", "None"):
        return None
    if method == "dark":
        return DarkAug(seed)
    if method == "mobile":
        return MobileAug(seed)
    raise ValueError(f"Invalid augmentation method: {method}")
