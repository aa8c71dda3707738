from .provider import Provider, ThreadedSampler, collate
from .consistency import (
    simple_augment, simple_augment_reverse, flip_ema_rule,
    convert_consistency_flip_jax,
    add_gauss_noise, add_gauss_blur, add_intensity, add_mask,
    IMAGENET_MEAN, IMAGENET_STD, normalize_imagenet, denormalize_imagenet,
)
from .cvppp import CVPPPTrain, CVPPPValidation
from .bbbc import BBBCTrain, BBBCValidation
from .ac3ac4 import AC3AC4Train, AC3AC4ValidVolume
