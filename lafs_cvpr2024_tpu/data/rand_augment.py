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


def _none_level(level, _):
    return ()


NAME_TO_OP: Dict[str, Callable] = {
    "AutoContrast": auto_contrast,
    "Equalize": equalize,
    "Invert": invert,
    "Rotate": rotate,
    "Posterize": posterize,
    "PosterizeIncreasing": posterize,
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
        if self.magnitude_std > 0:
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
