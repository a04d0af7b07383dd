"""Face RandAugment — solarize-free op pools, PIL-based, host-side.

Clean reimplementation of the reference's timm fork
(``util/rand_aa_face.py``): the distinguishing changes are Solarize /
SolarizeAdd removed from both transform pools (faces degrade under
solarization — ``rand_aa_face.py:541-542,561-562``) and the config-string
entry point ``rand_augment_transform('rand-m{N}-mstd0.5-inc1', ...)``
(``rand_aa_face.py:628-672``). Magnitude semantics follow timm: level in
[0,10], per-op apply prob 0.5, optional gaussian magnitude noise.
"""

from __future__ import annotations

import random
import re
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)
_INTERP = (Image.BILINEAR, Image.BICUBIC)


def _interp():
    return random.choice(_INTERP)


def _randomly_negate(v):
    return -v if random.random() > 0.5 else v


# ---- PIL ops -------------------------------------------------------------

def shear_x(img, factor):
    return img.transform(img.size, Image.AFFINE, (1, factor, 0, 0, 1, 0),
                         resample=_interp(), fillcolor=_FILL)


def shear_y(img, factor):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, factor, 1, 0),
                         resample=_interp(), fillcolor=_FILL)


def translate_x_rel(img, pct):
    pixels = pct * img.size[0]
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0),
                         resample=_interp(), fillcolor=_FILL)


def translate_y_rel(img, pct):
    pixels = pct * img.size[1]
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels),
                         resample=_interp(), fillcolor=_FILL)


def rotate(img, degrees):
    return img.rotate(degrees, resample=_interp(), fillcolor=_FILL)


def auto_contrast(img, *_):
    return ImageOps.autocontrast(img)


def invert(img, *_):
    return ImageOps.invert(img)


def equalize(img, *_):
    return ImageOps.equalize(img)


def posterize(img, bits):
    return img if bits >= 8 else ImageOps.posterize(img, int(bits))


def solarize(img, thresh):
    return ImageOps.solarize(img, thresh)


def solarize_add(img, add, thresh=128):
    lut = [min(255, i + int(add)) if i < thresh else i for i in range(256)]
    if img.mode in ("L", "RGB"):
        return img.point(lut * 3 if img.mode == "RGB" else lut)
    return img


def color(img, factor):
    return ImageEnhance.Color(img).enhance(factor)


def contrast(img, factor):
    return ImageEnhance.Contrast(img).enhance(factor)


def brightness(img, factor):
    return ImageEnhance.Brightness(img).enhance(factor)


def sharpness(img, factor):
    return ImageEnhance.Sharpness(img).enhance(factor)


# ---- level mappers (timm semantics) ---------------------------------------

def _rotate_level(level, _):
    return (_randomly_negate(level / _MAX_LEVEL * 30.0),)


def _shear_level(level, _):
    return (_randomly_negate(level / _MAX_LEVEL * 0.3),)


def _translate_rel_level(level, _):
    return (_randomly_negate(level / _MAX_LEVEL * 0.45),)


def _enhance_increasing_level(level, _):
    return (1.0 + _randomly_negate(level / _MAX_LEVEL * 0.9),)


def _enhance_level(level, _):
    return (level / _MAX_LEVEL * 1.8 + 0.1,)


def _posterize_level(level, _):
    return (int(level / _MAX_LEVEL * 4),)


def _posterize_increasing_level(level, h):
    return (4 - _posterize_level(level, h)[0],)


def _posterize_original_level(level, _):
    # AutoAugment-paper range: 4 bits kept at m=0 up to 8 at m=10
    return (int(level / _MAX_LEVEL * 4) + 4,)


def _solarize_level(level, _):
    return (int(level / _MAX_LEVEL * 256),)


def _solarize_increasing_level(level, h):
    return (256 - _solarize_level(level, h)[0],)


def _solarize_add_level(level, _):
    return (int(level / _MAX_LEVEL * 110),)


def _none_level(level, _):
    return ()


NAME_TO_OP: Dict[str, Callable] = {
    "AutoContrast": auto_contrast,
    "Equalize": equalize,
    "Invert": invert,
    "Rotate": rotate,
    "Posterize": posterize,
    "PosterizeIncreasing": posterize,
    "PosterizeOriginal": posterize,
    "Solarize": solarize,
    "SolarizeIncreasing": solarize,
    "SolarizeAdd": solarize_add,
    "Color": color,
    "ColorIncreasing": color,
    "Contrast": contrast,
    "ContrastIncreasing": contrast,
    "Brightness": brightness,
    "BrightnessIncreasing": brightness,
    "Sharpness": sharpness,
    "SharpnessIncreasing": sharpness,
    "ShearX": shear_x,
    "ShearY": shear_y,
    "TranslateXRel": translate_x_rel,
    "TranslateYRel": translate_y_rel,
}

LEVEL_FN: Dict[str, Callable] = {
    "AutoContrast": _none_level,
    "Equalize": _none_level,
    "Invert": _none_level,
    "Rotate": _rotate_level,
    "Posterize": _posterize_level,
    "PosterizeIncreasing": _posterize_increasing_level,
    "PosterizeOriginal": _posterize_original_level,
    "Solarize": _solarize_level,
    "SolarizeIncreasing": _solarize_increasing_level,
    "SolarizeAdd": _solarize_add_level,
    "Color": _enhance_level,
    "ColorIncreasing": _enhance_increasing_level,
    "Contrast": _enhance_level,
    "ContrastIncreasing": _enhance_increasing_level,
    "Brightness": _enhance_level,
    "BrightnessIncreasing": _enhance_increasing_level,
    "Sharpness": _enhance_level,
    "SharpnessIncreasing": _enhance_increasing_level,
    "ShearX": _shear_level,
    "ShearY": _shear_level,
    "TranslateXRel": _translate_rel_level,
    "TranslateYRel": _translate_rel_level,
}

# Solarize/SolarizeAdd intentionally absent (face-specific pools,
# rand_aa_face.py:535-572)
FACE_RAND_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
    "Color", "Contrast", "Brightness", "Sharpness",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]
FACE_RAND_INCREASING_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "ColorIncreasing", "ContrastIncreasing", "BrightnessIncreasing",
    "SharpnessIncreasing", "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]


class AugmentOp:
    def __init__(self, name: str, prob=0.5, magnitude=10, magnitude_std=0.0):
        self.name = name
        self.fn = NAME_TO_OP[name]
        self.level_fn = LEVEL_FN[name]
        self.prob = prob
        self.magnitude = magnitude
        self.magnitude_std = magnitude_std

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.prob < 1.0 and random.random() > self.prob:
            return img
        magnitude = self.magnitude
        if self.magnitude_std == float("inf"):
            magnitude = random.uniform(0, magnitude)
        elif self.magnitude_std > 0:
            magnitude = random.gauss(magnitude, self.magnitude_std)
        magnitude = min(_MAX_LEVEL, max(0.0, magnitude))
        return self.fn(img, *self.level_fn(magnitude, None))


class RandAugment:
    def __init__(self, ops: List[AugmentOp], num_layers: int = 2):
        self.ops = ops
        self.num_layers = num_layers

    def __call__(self, img: Image.Image) -> Image.Image:
        for op in np.random.choice(self.ops, self.num_layers, replace=True):
            img = op(img)
        return img


def rand_augment_transform(config_str: str, hparams: Optional[dict] = None) -> RandAugment:
    """Parse ``rand-m{N}[-n{L}][-mstd{S}][-inc1]`` (``rand_aa_face.py:628-672``).

    The shipped configs are ``rand-m1-mstd0.5-inc1`` (WebFace) and
    ``rand-m2-mstd0.5-inc1`` (MS1MV3) — ``train_largescale.py:505-506``.
    """
    hparams = dict(hparams or {})
    magnitude, num_layers = _MAX_LEVEL, 2
    transforms = FACE_RAND_TRANSFORMS
    parts = config_str.split("-")
    assert parts[0] == "rand"
    for c in parts[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            hparams["magnitude_std"] = float(val)
        elif key == "inc":
            if bool(int(val)):
                transforms = FACE_RAND_INCREASING_TRANSFORMS
        elif key == "m":
            magnitude = int(val)
        elif key == "n":
            num_layers = int(val)
        elif key == "w":
            pass  # weighted op choice: not used by shipped configs
        else:
            raise ValueError(f"unknown RandAugment section {c!r}")
    ops = [
        AugmentOp(n, prob=0.5, magnitude=magnitude,
                  magnitude_std=hparams.get("magnitude_std", 0.0))
        for n in transforms
    ]
    return RandAugment(ops, num_layers)


# ---------------------------------------------------------------------------
# AutoAugment policies + AugMix (present in the reference's timm fork,
# rand_aa_face.py:347-478,674-808; published AutoAugment-paper / TPU
# EfficientNet constants)
# ---------------------------------------------------------------------------

# (name, prob, magnitude) sub-policy pairs. The reference's face edit keeps
# the solarize sub-policies COMMENTED OUT of 'original' (rand_aa_face.py:
# 416-436) while v0/v0r/originalr retain them — mirrored faithfully.
_POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

_POLICY_ORIGINAL = [
    [("PosterizeOriginal", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeOriginal", 0.6, 7), ("PosterizeOriginal", 0.6, 6)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("PosterizeOriginal", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Equalize", 0.6, 8), ("PosterizeOriginal", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]

# originalr: the solarize-bearing full paper policy with increasing posterize
_POLICY_ORIGINALR = [
    [("PosterizeIncreasing", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeIncreasing", 0.6, 7), ("PosterizeIncreasing", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("PosterizeIncreasing", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("PosterizeIncreasing", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]


def _policy_v0r():
    # v0 with research posterize (bits discarded increase with magnitude)
    sub = {"Posterize": "PosterizeIncreasing"}
    return [[(sub.get(n, n), p, m) for n, p, m in sp] for sp in _POLICY_V0]


def auto_augment_policy(name: str = "v0", magnitude_std: float = 0.0):
    tables = {
        "v0": _POLICY_V0,
        "v0r": _policy_v0r(),
        "original": _POLICY_ORIGINAL,
        "originalr": _POLICY_ORIGINALR,
    }
    if name not in tables:
        raise ValueError(f"unknown AA policy {name!r}")
    return [
        [AugmentOp(n, prob=p, magnitude=m, magnitude_std=magnitude_std)
         for n, p, m in sp]
        for sp in tables[name]
    ]


class AutoAugment:
    """One random sub-policy (pair of ops) per image
    (``rand_aa_face.py:494-504``)."""

    def __init__(self, policy):
        self.policy = policy

    def __call__(self, img: Image.Image) -> Image.Image:
        for op in random.choice(self.policy):
            img = op(img)
        return img


def auto_augment_transform(config_str: str, hparams: Optional[dict] = None) -> AutoAugment:
    """Parse ``{policy}[-mstd{S}]`` e.g. 'original-mstd0.5'
    (``rand_aa_face.py:506-538``)."""
    hparams = dict(hparams or {})
    parts = config_str.split("-")
    policy_name = parts[0]
    for c in parts[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            hparams.setdefault("magnitude_std", float(val))
        else:
            raise ValueError(f"unknown AutoAugment section {c!r}")
    return AutoAugment(
        auto_augment_policy(policy_name, hparams.get("magnitude_std", 0.0))
    )


# AugMix (arXiv 1912.02781; reference rand_aa_face.py:674-808)
AUGMIX_TRANSFORMS = [
    "AutoContrast", "ColorIncreasing", "ContrastIncreasing",
    "BrightnessIncreasing", "SharpnessIncreasing", "Equalize", "Rotate",
    "PosterizeIncreasing", "SolarizeIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]


def augmix_ops(magnitude: float = 10):
    # AugMix samples each op's magnitude uniformly (magnitude_std=inf)
    return [
        AugmentOp(n, prob=1.0, magnitude=magnitude, magnitude_std=float("inf"))
        for n in AUGMIX_TRANSFORMS
    ]


class AugMixAugment:
    """width Dirichlet-weighted chains of depth ops, blended with the
    original by Beta(alpha, alpha) (``rand_aa_face.py:699-763``)."""

    def __init__(self, ops, alpha=1.0, width=3, depth=-1):
        self.ops = ops
        self.alpha = alpha
        self.width = width
        self.depth = depth

    def __call__(self, img: Image.Image) -> Image.Image:
        mixing_weights = np.float32(np.random.dirichlet([self.alpha] * self.width))
        m = np.float32(np.random.beta(self.alpha, self.alpha))
        shape = img.size[1], img.size[0], len(img.getbands())
        mixed = np.zeros(shape, np.float32)
        for mw in mixing_weights:
            depth = self.depth if self.depth > 0 else np.random.randint(1, 4)
            img_aug = img
            for op in np.random.choice(self.ops, depth, replace=True):
                img_aug = op(img_aug)
            mixed += mw * np.asarray(img_aug, np.float32)
        mixed = Image.fromarray(np.clip(mixed, 0, 255.0).astype(np.uint8))
        return Image.blend(img, mixed, float(m))


def augment_and_mix_transform(config_str: str, hparams: Optional[dict] = None) -> AugMixAugment:
    """Parse ``augmix[-m{M}][-w{W}][-d{D}][-a{A}]`` (``rand_aa_face.py:765-808``)."""
    magnitude, width, depth, alpha = 3, 3, -1, 1.0
    parts = config_str.split("-")
    assert parts[0] == "augmix", config_str
    for c in parts[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "m":
            magnitude = int(val)
        elif key == "w":
            width = int(val)
        elif key == "d":
            depth = int(val)
        elif key == "a":
            alpha = float(val)
        elif key != "mstd":
            raise ValueError(f"unknown AugMix section {c!r}")
    return AugMixAugment(augmix_ops(magnitude), alpha=alpha, width=width, depth=depth)
