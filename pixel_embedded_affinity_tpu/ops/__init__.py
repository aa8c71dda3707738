from .offsets import gen_offsets, multi_offset, SHIFTS_3D, offsets_3d
from .affinity_np import (
    gen_affs,
    seg_to_aff_3d,
    weight_binary_ratio,
    seg_widen_border,
    seg_to_instance_bd,
    weight_unet2d,
    weight_unet3d,
    relabel,
    remove_small,
    label_pyramid,
)
from .emb2aff import (
    normalize_embedding,
    embedding_to_affinity_2d,
    embedding_to_affinity_3d,
    affinity_2d_small_batch,
    cross_affinity_2d,
)
from .affinity_jax import (
    gen_affs_jax, weight_binary_ratio_jax, label_pyramid_jax,
    build_targets_2d_jax,
)
from .spixel import poolfeat, upfeat, compute_semantic_pos_loss
from .losses_extra import local_embedding_loss
